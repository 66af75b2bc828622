#!/usr/bin/env python
"""The reference's fizz_buzz_sink topology, runnable on this engine:
generator → classify pipe → validating sink, with the send-barrier and
auto-lineage exactly as /root/reference/tests/fizz_buzz_sink.rs wires
them. Run: python examples/fizzbuzz_topology.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_event_streams_spark.queries.reference import fizzbuzz_label
from async_event_streams_spark.session import get_spark
from async_event_streams_spark.topics import Topic, TopicRegistry, pipe


def main() -> None:
    spark = get_spark(app_name="fizzbuzz-example", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fizzbuzz-")
    reg = TopicRegistry()

    numbers = Topic(spark, "numbers", "n long", root, reg)
    labeled = Topic(spark, "labeled", "n long, label string", root, reg)

    # classify pipe (the reference's Filter sink re-publishing labels)
    pipe(
        numbers,
        fn=lambda df: df.select(
            "source_event_id", "n", fizzbuzz_label(F.col("n")).alias("label")
        ),
        target=labeled,
        name="classify",
    )

    # validating sink (the reference's Sink::validate)
    received: list[tuple[int, str]] = []
    pipe(
        labeled,
        sink_fn=lambda df, b: received.extend(
            (r.n, r.label) for r in df.collect()
        ),
        name="validate",
    )

    count = 100
    numbers.send([{"n": n} for n in range(count)], barrier="chain")

    assert len(received) == count
    for n, label in received:
        expected = (
            "fizzbuzz" if n % 15 == 0
            else "buzz" if n % 5 == 0
            else "fizz" if n % 3 == 0
            else "number"
        )
        assert label == expected, (n, label)
    print(f"OK: {count} events classified and validated; "
          f"sample: {sorted(received)[:5]}")

    numbers.close()
    labeled.close()
    spark.stop()


if __name__ == "__main__":
    main()
