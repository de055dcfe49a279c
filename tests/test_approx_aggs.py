"""Approximate aggregates (the one §2.8 category without a registered
row — the sketches are engine-internal, so DuckDB value-parity is not
meaningful; the contract is an ERROR BOUND against the exact answer,
which is what these pin):

- approx_count_distinct (HyperLogLog++): relative error within a
  multiple of the configured rsd on real event data.
- percentile_approx (KLL-ish quantile sketch): rank error within the
  configured accuracy budget.

Both sketches are deterministic for a given dataset, so the bounds are
stable assertions, not flaky statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.sources.catalog import table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = table(spark, SF, "events")
    row = ev.select(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    rel_err = abs(row.approx - row.exact) / row.exact
    # HLL++ rsd is a standard deviation, not a hard cap; 3x is a
    # conservative deterministic bound for this dataset
    assert rel_err <= 3 * 0.02, (row.exact, row.approx, rel_err)


def test_percentile_approx_rank_error_bounded(spark):
    ev = table(spark, SF, "events").where(F.col("value").isNotNull())
    n = ev.count()
    accuracy = 1000  # rank error <= n / accuracy
    row = ev.select(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.percentile_approx("value", 0.5, accuracy).alias("approx"),
    ).collect()[0]
    # convert the value error to a rank error: count how many values sit
    # between the exact and approximate medians
    lo, hi = sorted((row.exact, row.approx))
    between = ev.where(F.col("value").between(lo, hi)).count()
    assert between <= n / accuracy + 1, (row.exact, row.approx, between, n)
