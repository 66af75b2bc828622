"""B1 streaming variant: the built-in rate source as a sequence
generator feeding the engine's classify transform (SURVEY.md §2-B1:
'streaming: format("rate")')."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_event_streams_spark.queries.reference import fizzbuzz_label
from async_event_streams_spark.streaming import run_stream_to_memory


def test_rate_source_generator_classifies(spark):
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .select(F.col("value").alias("n"))
        .select("n", fizzbuzz_label(F.col("n")).alias("label"))
    )
    query, tbl = run_stream_to_memory(stream, output_mode="append")
    try:
        query.processAllAvailable()
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            query.processAllAvailable()
            rows = spark.sql(f"SELECT * FROM {tbl}").collect()
            if len(rows) >= 30:
                break
            time.sleep(0.3)
        assert len(rows) >= 30
        for r in rows:
            n = r.n
            expected = (
                "fizzbuzz" if n % 15 == 0
                else "buzz" if n % 5 == 0
                else "fizz" if n % 3 == 0
                else "number"
            )
            assert r.label == expected, (n, r.label)
    finally:
        query.stop()
