"""Deterministic sampling operators for training-data curation.

Pipelines need REPRODUCIBLE samples (a rerun must pick the same rows —
`df.sample()` is seed-stable only for identical partitioning, which no
100 TB pipeline can promise across reruns). Both operators key the
decision off a content-derived hash, so the sample is a pure function
of the data:

- hash_sample: Bernoulli-style p-sampling via md5(key) — keep a row iff
  the first 13 hex digits of its key hash, as an integer, fall under
  p * 2^52. Map-side only, no shuffle, and trivially pushed into any
  scan-side filter chain.
- stratified_hash_sample: the same test with a PER-GROUP p (small dict,
  e.g. downsample the dominant language, keep the rare ones) — the
  per-group rates become a CASE expression, still map-side.
- group_topk: per-group deterministic top-k (rank by an explicit
  ordering column, e.g. quality_score) — the "keep the k best per
  bucket" curation step. One window over a single shuffle on the group
  key; ties broken by the id column so reruns are stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^13 = 2^52: the hash-fraction denominator. 13 hex digits fit a
# signed 64-bit integer exactly in every engine (no sign/overflow edge).
_HASH_SPACE = float(16**13)


def hash_fraction(key: Column) -> Column:
    """Uniform [0, 1) value derived from md5(key) — the reproducible
    stand-in for rand(). DuckDB equivalent:
    ('0x' || substr(md5(key), 1, 13))::BIGINT / 16.0^13."""
    return hash52_long(key.cast("string")).cast("double") / F.lit(_HASH_SPACE)


def hash_fraction_open(key: Column) -> Column:
    """Uniform value in the OPEN interval (0, 1): (h + 0.5) / 2^52.
    Use where a downstream log/log-log must stay finite (e.g. Gumbel
    noise, −ln(−ln u)) — hash_fraction can return exactly 0.
    DuckDB: (('0x' || substr(md5(key), 1, 13))::BIGINT + 0.5) / 16.0^13."""
    h = hash52_long(key.cast("string")).cast("double")
    return (h + F.lit(0.5)) / F.lit(_HASH_SPACE)


def hash52_long(key: Column) -> Column:
    """THE shared 13-hex-md5 → 52-bit long primitive (exact in a double
    AND a BIGINT) behind every hash-derived decision in this repo
    (sampling gates, feature hashers, cardinality sketches). One
    definition so a change to the hash width cannot silently fork the
    replay formulas. Callers choose their own key canonicalization
    (e.g. cast to string) BEFORE passing the column in.
    DuckDB: ('0x' || substr(md5(key), 1, 13))::BIGINT;
    Python: int(hashlib.md5(key.encode()).hexdigest()[:13], 16)."""
    return F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("bigint")


def hash_bucket(key: Column, num_buckets: int) -> Column:
    """Deterministic bucket id in [0, num_buckets) from hash52_long.
    DuckDB: ('0x' || substr(md5(key), 1, 13))::BIGINT % B;
    Python: py_hash_bucket below."""
    return hash52_long(key) % F.lit(num_buckets)


def py_hash_bucket(key: str, num_buckets: int) -> int:
    """Pure-Python replay of hash_bucket."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:13], 16) % num_buckets


def hash_sample(df: DataFrame, key_col: str, p: float) -> DataFrame:
    """Keep each row with probability p, decided by the row's key hash —
    deterministic across reruns, partitionings, and engines."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"sampling fraction must be in [0, 1], got {p}")
    return df.where(hash_fraction(F.col(key_col)) < p)


def stratified_hash_sample(
    df: DataFrame, key_col: str, group_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-group deterministic sampling: group -> keep-rate. Groups not
    in `rates` are DROPPED (an explicit allowlist beats silently keeping
    unknown strata at full volume). The rates dict is plan-side — it
    becomes one CASE expression, nothing is joined or shuffled."""
    for g, p in rates.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {p}")
    frac = hash_fraction(F.col(key_col))
    rate: Column = F.lit(-1.0)  # unknown stratum -> keep nothing
    expr = None
    for g, p in rates.items():
        cond = F.col(group_col) == g
        expr = F.when(cond, F.lit(p)) if expr is None else expr.when(cond, F.lit(p))
    rate = expr.otherwise(rate) if expr is not None else rate
    return df.where(frac < rate)


def group_topk(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Deterministic per-group top-k: rank by order_col (ties broken by
    id_col ascending so reruns agree), keep rank <= k. One shuffle on
    the group key; the window ranks within each group without a global
    sort. For heavily skewed groups at extreme scale, pre-filter with an
    approximate per-group threshold before the exact window."""
    ordering = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if descending
        else [F.col(order_col).asc(), F.col(id_col).asc()]
    )
    w = Window.partitionBy(group_col).orderBy(*ordering)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )
