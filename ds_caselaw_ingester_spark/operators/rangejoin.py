"""Point-in-interval range join via time bucketing.

Spark has no native interval/range join; the naive formulation
(`points JOIN intervals ON ts >= start AND ts < end`) is a cross product
with a post-filter — O(|points| × |intervals|), unusable at scale unless
one side broadcasts.

The scalable composition: quantize time into fixed buckets, explode each
interval to the buckets it covers, map each point to its bucket, equi-join
on the bucket id (hash shuffle, O(points + interval·cover) rows), then
apply the EXACT range predicate to the candidates. The bucket join is a
superset prefilter — correctness never depends on bucket alignment, only
candidate volume does. Pick the bucket width near the median interval
length: too small explodes intervals, too large inflates candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start <= ts < end (end-exclusive). Output: interval columns + point
    columns, candidates generated through the bucket equi-join.
    `how='left_outer'` keeps empty intervals (point columns NULL)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how={how!r}")
    b = F.lit(bucket_seconds)
    # left_outer needs a row identity for the anti-join: keying on the
    # interval's own columns is null-unsafe (NULL <=> NULL mismatch in a
    # join key) and collapses duplicate interval rows. A synthetic id is
    # the only correct key — and it must be PINNED: both the joined
    # branch and the anti-join re-evaluate this subtree, and
    # monotonically_increasing_id is nondeterministic across
    # evaluations (partition layout, task retries), so without the
    # localCheckpoint the two branches could assign different ids —
    # matched intervals reappearing as "missing" and unmatched ones
    # vanishing.
    iv = (
        intervals.withColumn(
            "_iid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)
        if how == "left_outer"
        else intervals
    )
    ib = iv.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    pb = points.withColumn("_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b))
    exact = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    joined = ib.join(pb, "_bucket").where(exact).drop("_bucket")
    if how == "inner":
        return joined
    # left-outer: re-attach intervals whose id matched nothing
    missing = iv.join(joined.select("_iid").distinct(), "_iid", "left_anti")
    for c in points.columns:
        missing = missing.withColumn(c, F.lit(None).cast(dict(points.dtypes)[c]))
    return joined.unionByName(missing).drop("_iid")
