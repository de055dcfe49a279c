"""Bucketed-layout checks: the write pre-pays the join shuffle, and the
physical plan proves it (no exchange on bucketed sides), with results
identical to the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.bucketing import bucketed, write_bucketed
from ds_caselaw_ingester_spark.sources.catalog import table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    items = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "b_orders", str(root / "orders"), ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        items, "b_lineitem", str(root / "lineitem"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield orders, items
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Both sides bucketed on the join key with equal bucket counts:
    the sort-merge join runs bucket-local — ZERO exchanges anywhere in
    the plan. This is the 100 TB prize: the per-query O(fact) shuffle
    is gone, paid once at write."""
    # hint("merge"): at sf0.001 the planner would broadcast the tiny
    # side and skip bucketing entirely ("Bucketed: false — disabled by
    # query planner"); at 100 TB neither fact side fits a broadcast, so
    # the hint reproduces the at-scale plan shape the layout exists for.
    joined = bucketed(spark, "b_orders").hint("merge").join(
        bucketed(spark, "b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    orders, items = bucketed_pair
    fast = (
        bucketed(spark, "b_orders")
        .join(
            bucketed(spark, "b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    plain = (
        orders.join(items, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    """A groupBy on the bucket key also rides the layout: partial and
    final aggregation collapse into bucket-local work, no shuffle."""
    agg = (
        bucketed(spark, "b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_one_side_bucketed_shuffles_only_the_other(spark, sf_dir, bucketed_pair):
    """Fact ⋈ delta: only the unbucketed (delta) side exchanges — half
    the shuffle volume of the plain join, with no rewrite of the fact."""
    delta = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    joined = bucketed(spark, "b_orders").hint("merge").join(
        delta, F.col("o_orderkey") == F.col("l_orderkey")
    )
    plan = _plan(joined)
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1, plan
    assert "l_orderkey" in exchanges[0], plan


def test_path_read_loses_bucketing(spark, bucketed_pair, tmp_path):
    """The failure mode the module docstring warns about, pinned: the
    same files read by PATH (no catalog) re-plan a full two-sided
    shuffle — bucket metadata lives in the catalog, not the parquet."""
    loc = (
        spark.sql("DESCRIBE FORMATTED b_orders")
        .where(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    raw = spark.read.parquet(loc.replace("file:", ""))
    joined = raw.hint("merge").join(
        bucketed(spark, "b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = _plan(joined)
    assert "Exchange hashpartitioning" in plan, plan


def test_append_with_mismatched_bucket_count_is_rejected(spark, sf_dir, tmp_path):
    """The corruption path the writer must refuse: appending under a
    DIFFERENT bucket count would leave files hashed under two
    incompatible specs in one directory. The catalog entry survives the
    append (no drop), so Spark validates and rejects the mismatch;
    a matching append succeeds and stays bucket-local."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(orders, "b_app", str(tmp_path / "t"), ["o_orderkey"], 8)
    with pytest.raises(AnalysisException):
        write_bucketed(
            orders, "b_app", str(tmp_path / "t"), ["o_orderkey"], 16, mode="append"
        )
    write_bucketed(
        orders, "b_app", str(tmp_path / "t"), ["o_orderkey"], 8, mode="append"
    )
    assert bucketed(spark, "b_app").count() == 2 * orders.count()
    agg = bucketed(spark, "b_app").groupBy("o_orderkey").count()
    assert "Exchange" not in _plan(agg)
    spark.sql("DROP TABLE IF EXISTS b_app")
