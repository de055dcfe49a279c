"""Backward as-of join — a time-series operator Spark lacks natively,
composed from existing DataFrame ops (union + one ordered window), per
the custom-operator ladder: composition first, Pandas UDF only if
semantics demand it (they don't here).

For each left row, attach the LATEST right row with
right_ts <= left_ts for the same key (DuckDB/pandas `merge_asof`
backward semantics, inclusive).

Plan shape — the reason this formulation scales: both inputs are
unioned and shuffled ONCE on the key, then a single running
last(ignorenulls) window computes every match in one sorted pass.
The naive alternative (range join: left ⋈ right on key AND right_ts <=
left_ts, then max-per-left-row) materializes O(|left| × matches)
intermediate rows — quadratic for active keys; this stays O(|left| +
|right|).

Tie rules: right rows sort BEFORE left rows at equal timestamps
(inclusive <=); among equal-timestamp right rows the highest
`right_tie` wins (deterministic last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tie: str | None = None,
) -> DataFrame:
    """Columns of `left` are preserved; every non-key/non-ts column of
    `right` is appended (NULL where no right row precedes the left row).
    `right_tie`: a right column ordering equal-timestamp right rows."""
    right_value_cols = [c for c in right.columns if c not in (key, right_ts)]
    l = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r = right.withColumn("_t", F.col(right_ts)).withColumn("_side", F.lit(0))
    both = l.unionByName(r, allowMissingColumns=True)
    order = [F.col("_t").asc(), F.col("_side").asc()]
    if right_tie is not None:
        order.append(F.col(right_tie).asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_value_cols
        ],
    )
    return (
        filled.where(F.col("_side") == 1)
        .drop("_t", "_side", *right_value_cols)
        .select(
            *left.columns,
            *[F.col(f"_asof_{c}").alias(c) for c in right_value_cols],
        )
    )
