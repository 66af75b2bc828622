"""Parquet table loader for the driver's synthetic star schema + streams.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under the
scale-factor directory. Schemas are fixed (FIXTURES.md §B); we rely on
parquet's embedded schema (no inference pass) and let Catalyst push
filters/projections into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# engine targets (they grow ~linearly but stay << fact tables).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

# Adaptive scan FAN-OUT for the two tables whose consumers do heavy
# per-row higher-order work (tokenize/shingle/md5 chains over text,
# array folds over embeddings). The synthetic single-file tables are
# written as ONE parquet row group up through 500k rows (pyarrow's
# default max_rows_per_group is 1Mi), and Spark cannot split inside a
# row group — so every tokenize stage in the engine ran ONE task
# regardless of cores (found by the r13 sf10 probe: a 32-core box
# spending minutes in a single straggler). When the file layout yields
# big row groups, one cheap round-robin repartition after the scan
# unlocks the full core count for every downstream HOF stage; the rule
# self-disables on properly-laid-out data (many files / many row
# groups — the only layout that exists at cluster scale), so no real
# deployment ever pays the extra exchange.
FANOUT_TABLES = frozenset({"documents", "embeddings"})
FANOUT_ROWS_PER_TASK = 1_000  # ≥ ~0.25 s of HOF work per task
FANOUT_MAX_BYTES = 2 << 30  # never shuffle a >2 GiB single file for this


def _fanout_partitions(spark: SparkSession, path: str) -> int:
    """Target partition count when `path` is a single parquet file
    whose row groups are too coarse to feed the cores; 0 = leave the
    scan alone."""
    import os

    try:
        size = os.path.getsize(path)  # raises for directory datasets
    except OSError:
        return 0
    if size > FANOUT_MAX_BYTES:
        return 0
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
    except Exception:
        return 0
    cores = spark.sparkContext.defaultParallelism
    if meta.num_row_groups >= max(2, cores // 2):
        return 0  # splittable enough already
    rows = meta.num_rows
    if rows // max(1, meta.num_row_groups) <= FANOUT_ROWS_PER_TASK:
        return 0  # row groups already small enough
    n = min(cores, rows // FANOUT_ROWS_PER_TASK)
    # below 4-way the exchange costs more than the parallelism buys
    # (sf0.1 embeddings = 2k rows -> 2-way fan-out measured 2.4-3.6x
    # SLOWER across its consumers: one extra shuffle + stage per query
    # for work that was already sub-second)
    return n if n >= 4 else 0


# Analyzed-plan cache: a DataFrame is an immutable logical plan, so the
# (session, dir, table) triple can be built once and reused — each
# spark.read.parquet call otherwise costs ~0.1 s of driver<->JVM
# roundtrips (reader setup, schema fetch, file listing), which at one
# call per query becomes the dominant fixed overhead of short queries.
# Keyed by id(spark), with the session object PINNED in the value: a
# pinned session can't be garbage-collected, so CPython can never hand
# its id to a new session (no stale hit); the identity check makes that
# explicit. Entries of stopped sessions are evicted on cache misses so
# the cache doesn't grow without bound across sessions.
_TABLE_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def _session_stopped(sess: SparkSession) -> bool:
    try:
        return sess.sparkContext._jsc.sc().isStopped()
    except Exception:
        return True  # dead gateway == stopped


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    stale = [
        k
        for k, (sess, _) in _TABLE_CACHE.items()
        if sess is not spark and _session_stopped(sess)
    ]
    for k in stale:
        _TABLE_CACHE.pop(k, None)
    # The driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
    # parquet reader rejects by default. Set the legacy conf here (runtime
    # SQL conf) so reads work on ANY session, including the driver's own
    # — then convert the long nanos back to timestamps below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC so timestamp rendering and year()/date_trunc() agree with
    # the (naive-timestamp) SQL oracle regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    df = _normalize_nanos(spark.read.parquet(path))
    if name in FANOUT_TABLES:
        n = _fanout_partitions(spark, path)
        if n:
            df = df.repartition(n)
    _TABLE_CACHE[key] = (spark, df)
    return df


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Convert TIMESTAMP(NANOS) columns (read as long nanos via
    spark.sql.legacy.parquet.nanosAsLong) to microsecond timestamps,
    matching how DuckDB truncates them. Integer `div` — float division
    would lose precision (epoch nanos ≈ 1.7e18 > 2^53)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for field in df.schema.fields:
        if field.name in ("ts",) and isinstance(field.dataType, LongType):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"{field.name} div 1000")),
            )
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def create_views(spark: SparkSession, sf_dir: str) -> tuple[str, ...]:
    """SQL front door: register every dataset table as a temp view (same
    normalized DataFrames as `table()`, same analyzed-plan cache), so
    `spark.sql("SELECT ... FROM lineitem ...")` works directly — the
    whole engine surface is reachable from plain SQL, not only the
    DataFrame API. Returns the registered view names."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return TABLE_NAMES


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against the dataset views (registering them
    idempotently first). Catalyst treats the view bodies as inline
    subplans, so pushdown/pruning behave exactly as in the DataFrame
    path."""
    create_views(spark, sf_dir)
    return spark.sql(query)
