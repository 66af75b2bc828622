"""Differential comparison harness: Spark result vs DuckDB oracle.

Replicates the driver's check (BASELINE.md t2): row count, column-name
set, and an order-insensitive value hash — computed by sorting columns
by name, canonicalizing values (float64 repr, µs timestamps), sorting
rows, and hashing. Strict by design: if this passes, the driver's
hash-compare should too.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from async_event_streams_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}.0"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    rows = [
        "|".join(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for r in canonicalize(df):
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    hash_match: bool
    detail: str = ""


def _dtype_key(dt) -> str:
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime"
    if s in ("object", "string"):
        return "object"
    return s


def dtypes_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Columns whose dtypes disagree (int32 vs int64 etc.) — the driver
    compares schemas, so these are latent failures even when values
    stringify identically."""
    bad = []
    for c in spark_pdf.columns:
        if c in oracle_pdf.columns:
            a, b = _dtype_key(spark_pdf[c].dtype), _dtype_key(oracle_pdf[c].dtype)
            if a != b:
                bad.append(f"{c}: spark={a} oracle={b}")
    return bad


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    cols_ok = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    dtype_mismatch = dtypes_match(spark_pdf, oracle_pdf) if cols_ok else []
    if dtype_mismatch:
        return CompareResult(
            name=name,
            ok=False,
            spark_rows=len(spark_pdf),
            oracle_rows=len(oracle_pdf),
            columns_match=False,
            hash_match=False,
            detail=f"dtype mismatch: {dtype_mismatch}",
        )
    rows_ok = len(spark_pdf) == len(oracle_pdf)
    hash_ok = False
    detail = ""
    if cols_ok and rows_ok:
        hs, ho = value_hash(spark_pdf), value_hash(oracle_pdf)
        hash_ok = hs == ho
        if not hash_ok:
            s_rows, o_rows = canonicalize(spark_pdf), canonicalize(oracle_pdf)
            only_s = [r for r in s_rows if r not in set(o_rows)][:3]
            only_o = [r for r in o_rows if r not in set(s_rows)][:3]
            detail = f"spark-only={only_s} oracle-only={only_o} cols={sorted(spark_pdf.columns)}"
    elif not cols_ok:
        detail = f"spark cols={sorted(spark_pdf.columns)} oracle cols={sorted(oracle_pdf.columns)}"
    else:
        detail = f"rows spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    return CompareResult(
        name=name,
        ok=cols_ok and rows_ok and hash_ok,
        spark_rows=len(spark_pdf),
        oracle_rows=len(oracle_pdf),
        columns_match=cols_ok,
        hash_match=hash_ok,
        detail=detail,
    )
