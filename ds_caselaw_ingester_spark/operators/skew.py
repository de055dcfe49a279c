"""Skew mitigation: salted two-phase aggregation for hot keys.

When NOT to salt (Spark already handles it):
- plain algebraic aggs (sum/count/min/max): partial aggregation combines
  map-side, so a hot key ships one partial row per task, not its rows;
- skewed JOIN keys: AQE's skew-join splitting (on in session.py) splits
  oversized partitions at runtime.

When salting IS the answer: per-key DISTINCT state. count_distinct(user)
for a hot key concentrates that key's whole distinct-set in one reduce
task (Expand gives one row per (key, value) — partial aggregation cannot
collapse them). Salting by pmod(hash(value), B) splits the distinct-set
into B DISJOINT shards — shard counts are exact and their sum is the
exact distinct count, while the hot key's state now lands on B tasks.

At 100 TB, B should be sized so hot_key_distincts / B fits one task
(~hundreds of MB of state); non-hot keys pay one extra tiny exchange of
B partial rows each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def value_salt(value_col: Column, buckets: int) -> Column:
    """Deterministic shard id for a value: same value -> same shard, so
    per-shard distinct-sets are disjoint and shard counts add exactly.
    (Internal hash only — never surfaces in results, so engine parity is
    unaffected.)"""
    return F.pmod(F.xxhash64(value_col), F.lit(buckets))


def salted_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    out_name: str,
    buckets: int = 16,
    extra_algebraic: dict[str, Column] | None = None,
) -> DataFrame:
    """Exact count_distinct(distinct_col) per group via two-phase salted
    aggregation; optional algebraic aggs (sum/count) ride along in the
    same two shuffles (phase 1 computes them per shard, phase 2 re-folds:
    count->sum, sum->sum).

    extra_algebraic: {out_name: (phase1_agg_expr, refold is sum)} — the
    phase-2 refold is always SUM, which is correct for count and sum.
    """
    phase1_aggs = [F.count_distinct(F.col(distinct_col)).alias("_dc")]
    for name, expr in (extra_algebraic or {}).items():
        phase1_aggs.append(expr.alias(f"_x_{name}"))
    per_shard = df.withColumn("_salt", value_salt(F.col(distinct_col), buckets)).groupBy(
        *group_cols, "_salt"
    ).agg(*phase1_aggs)
    phase2_aggs = [F.sum("_dc").alias(out_name)]
    for name in (extra_algebraic or {}):
        phase2_aggs.append(F.sum(f"_x_{name}").alias(name))
    return per_shard.groupBy(*group_cols).agg(*phase2_aggs)
