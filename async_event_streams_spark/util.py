"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Pin a computed intermediate before reusing it in multiple plan
    branches (self-joins over sketch/signature tables). Without this,
    each branch recomputes the full lineage — for the md5-sketch dedup
    queries that measured ~4× slower. At cluster scale the same role is
    played by writing the intermediate table; localCheckpoint is the
    in-session equivalent (materialized partitions, truncated lineage).
    """
    return df.localCheckpoint(eager=False)
