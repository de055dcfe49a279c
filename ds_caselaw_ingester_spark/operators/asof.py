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
    `right_tie`: a right column ordering equal-timestamp right rows.

    The right row travels as ONE struct through the running fill:
    last(ignorenulls) applied per COLUMN would mix columns from
    different right rows whenever the latest row carries NULLs
    (verified: right rows (tag='old', val=100) then (tag='new',
    val=NULL) produced the never-existed (tag='new', val=100), where
    DuckDB's ASOF JOIN — the pinned oracle semantics — returns
    (tag='new', val=NULL)). A struct is non-NULL whenever the right ROW
    exists, so the fill picks whole rows and NULL values inside them
    survive."""
    right_value_cols = [c for c in right.columns if c not in (key, right_ts)]
    overlap = set(right_value_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"asof_join_backward: column(s) {sorted(overlap)} exist on both "
            "sides; the union-based fill would conflate them and the output "
            "would carry duplicate names — rename one side first"
        )
    l = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r = right.withColumn("_t", F.col(right_ts)).withColumn(
        "_side", F.lit(0)
    ).withColumn("_rrow", F.struct(*[F.col(c) for c in right_value_cols]))
    both = l.unionByName(r.drop(*right_value_cols), allowMissingColumns=True)
    order = [F.col("_t").asc(), F.col("_side").asc()]
    if right_tie is not None:
        order.append(F.col("_rrow")[right_tie].asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        "*", F.last(F.col("_rrow"), ignorenulls=True).over(w).alias("_asof")
    )
    return (
        filled.where(F.col("_side") == 1)
        .select(
            *left.columns,
            *[F.col("_asof")[c].alias(c) for c in right_value_cols],
        )
    )
