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
    b = F.lit(bucket_seconds)
    ib = intervals.withColumn(
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
    if how != "left_outer":
        raise ValueError(f"unsupported how={how!r}")
    # left-outer: re-attach intervals that matched nothing
    matched = joined
    missing = intervals.join(
        matched.select(*intervals.columns).distinct(), intervals.columns, "left_anti"
    )
    for c in points.columns:
        missing = missing.withColumn(c, F.lit(None).cast(dict(points.dtypes)[c]))
    return matched.unionByName(missing)
