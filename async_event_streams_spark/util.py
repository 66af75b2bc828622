"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_buckets(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Drop rows whose bucket (the group defined by `keys`) holds more
    than `cap` members — the guard that keeps LSH-style self-joins from
    going quadratic on degenerate keys. Shape matters at scale: the
    oversized-key set is found with a groupBy (map-side partial counts,
    shuffling only key+count), and removed with a BROADCAST left-anti
    join — the data itself never shuffles for the guard, unlike a
    count-over-window which would shuffle and sort the full relation
    before the real join even starts."""
    big = df.groupBy(*keys).count().filter(F.col("count") > cap).select(*keys)
    return df.join(F.broadcast(big), keys, "left_anti")


def materialize(df: DataFrame) -> DataFrame:
    """Pin a computed intermediate before reusing it in multiple plan
    branches (self-joins over sketch/signature tables). Without this,
    each branch recomputes the full lineage — for the md5-sketch dedup
    queries that measured ~4× slower. At cluster scale the same role is
    played by writing the intermediate table; localCheckpoint is the
    in-session equivalent (materialized partitions, truncated lineage).
    """
    return df.localCheckpoint(eager=False)
