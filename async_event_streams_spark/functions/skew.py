"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles joins, but a groupBy on a key where
one value carries most of the rows still funnels that key's partials
into one reducer. Salting splits each key into `n_salts` sub-keys for
the first (heavy) aggregation, then combines the tiny partials — the
hot key's work spreads across n_salts tasks. Cost: a second (cheap)
shuffle over ~keys×n_salts rows.

Supported aggregates are the decomposable ones (sum/count/min/max, and
avg via sum+count) — exactly the set for which two-stage combining is
algebraically exact, so results equal the unsalted plan bit-for-bit
for integer/count aggregates (float sums may differ in rounding, same
as any partial-aggregation reorder).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) with a salt stage.

    `aggs` maps output column → (fn, input column), fn in
    {sum, count, min, max, avg}. Example:

        salted_agg(events, ["user_id"],
                   {"n": ("count", "*"), "total": ("sum", "value"),
                    "avg_value": ("avg", "value")})
    """
    partial_cols: list[Column] = []
    combine_cols: list[Column] = []
    final_cols: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partial_cols += [
                F.sum(col).alias(f"__{out}_sum"),
                F.count(col).alias(f"__{out}_cnt"),
            ]
            combine_cols += [
                F.sum(f"__{out}_sum").alias(f"__{out}_sum"),
                F.sum(f"__{out}_cnt").alias(f"__{out}_cnt"),
            ]
            final_cols.append(
                (F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")).alias(out)
            )
        elif fn in _PARTIAL:
            partial_cols.append(_PARTIAL[fn](col).alias(f"__{out}"))
            combine_cols.append(_COMBINE[fn](f"__{out}").alias(f"__{out}"))
            final_cols.append(F.col(f"__{out}").alias(out))
        else:
            raise ValueError(f"unsupported agg {fn!r} (decomposable only)")

    salt = (F.rand(seed=0) * n_salts).cast("int").alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *partial_cols
    )
    combined = partial.groupBy(*keys).agg(*combine_cols)
    return combined.select(*keys, *final_cols)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt the FACT side randomly, REPLICATE the
    dim side once per salt, join on (keys + salt). A hot join key's
    fact rows spread across n_salts tasks instead of funneling into
    one reducer; results equal the unsalted join exactly (every fact
    row still meets every matching dim row exactly once, in the salt
    replica it drew).

    When to reach for this instead of AQE's skew-join splitting
    (enabled in session.py): AQE splits a skewed SHUFFLE join at
    runtime, but a broadcast-ineligible dim joined under a
    deterministic hot key still funnels that key's rows through one
    task's shuffle write; salting spreads the JOIN work itself. It
    does NOT protect a downstream groupBy on the same bare key (the
    salt is dropped on return, so that aggregate re-shuffles on the
    unsalted key) — for grouped-aggregate skew use `salted_agg`.
    Cost: |dim| × n_salts replicated rows — only sane for
    dimension-sized right sides (for fact×fact skew, prefer AQE).

    `how` supports inner/left joins (the fact side keeps exactly its
    row multiplicity; right/full would duplicate unmatched dim rows
    per salt replica and are rejected)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}"
        )
    for side, df in (("fact", fact), ("dim", dim)):
        if "__salt" in df.columns:
            raise ValueError(
                f"salted_join: {side} side already has a __salt column "
                "(reserved) — rename or drop it first"
            )
    salt = (F.rand(seed=0) * n_salts).cast("int")
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.select("*", salts)
    return fact_s.join(dim_s, [*keys, "__salt"], how).drop("__salt")
