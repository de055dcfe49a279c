"""Expectations: planted violations are counted exactly, clean columns
pass, the whole battery runs as ONE aggregation job, and FK orphans
surface through the anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.expectations import (
    approx_unique,
    audit_table,
    between,
    in_set,
    matches,
    not_null,
    referential,
    unique,
)
from ds_caselaw_ingester_spark.sources.catalog import table


def test_real_tables_pass_their_contracts(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    rep = audit_table(
        orders,
        [
            not_null("o_orderkey"),
            unique("o_orderkey"),
            not_null("o_custkey"),
            between("o_totalprice", 0, 10_000_000),
        ],
        table="orders",
    ).collect()
    assert all(r["passed"] for r in rep), rep
    assert {r["check"] for r in rep} == {"not_null", "unique", "between"}
    assert all(r["total_rows"] == orders.count() for r in rep)


def test_planted_violations_are_counted_exactly(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -5.0),     # between violation
        (2, "zz", 20.0),    # duplicate id + in_set violation
        (None, "a", 30.0),  # null id
        (4, None, 40.0),    # null category: ignored by in_set (null-tolerant)
    ]
    df = spark.createDataFrame(rows, "id long, cat string, price double")
    rep = {
        (r["check"], r["column"]): r["violations"]
        for r in audit_table(
            df,
            [
                not_null("id"),
                unique("id"),
                in_set("cat", ["a", "b"]),
                between("price", 0, 100),
                matches("cat", "^[a-y]+$"),
            ],
        ).collect()
    }
    assert rep[("not_null", "id")] == 1
    assert rep[("unique", "id")] == 1       # one extra occurrence of 2
    assert rep[("in_set", "cat")] == 1      # "zz"
    assert rep[("between", "price")] == 1   # -5.0
    assert rep[("matches", "cat")] == 1     # "zz"


def test_battery_is_one_job(spark, sf_dir):
    """All row checks share one aggregation: the compiled plan contains
    exactly one Aggregate over one scan (uniqueness adds an Expand, not
    a second pass)."""
    orders = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        c.violations.cast("long").alias(f"_c{i}")
        for i, c in enumerate(
            [not_null("o_orderkey"), between("o_totalprice", 0, 10_000_000),
             matches("o_orderstatus", "^[A-Z]$")]
        )
    ]
    plan = orders.agg(*aggs)._sc._jvm.PythonSQLUtils.explainString(
        orders.agg(*aggs)._jdf.queryExecution(), "simple"
    )
    assert plan.count("FileScan") == 1, plan


def test_approx_unique_clamps_and_detects(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(1000)] + [(5,)] * 50, "id long"
    )
    rep = audit_table(df, [approx_unique("id")]).collect()[0]
    assert not rep["passed"]
    assert rep["violations"] > 0
    clean = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    rep2 = audit_table(clean, [approx_unique("id", rsd=0.01)]).collect()[0]
    assert rep2["violations"] >= 0  # clamped, never negative


def test_referential_orphans(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    ok = referential(orders, "o_custkey", customer, "c_custkey", "orders").collect()[0]
    assert ok["passed"]
    # remove some parents: orphans must surface
    broken = customer.where(F.col("c_custkey") % 7 != 0)
    bad = referential(orders, "o_custkey", broken, "c_custkey", "orders").collect()[0]
    assert not bad["passed"] and bad["violations"] > 0


def test_in_set_with_none_in_allowed_still_counts_violations(spark):
    """Review regression: a None in the allowed list (the natural
    'nulls are fine' spelling) previously poisoned the check via SQL
    three-valued IN — every out-of-set value went uncounted and the
    audit green-lit bad columns."""
    from ds_caselaw_ingester_spark.operators.expectations import (
        audit_table,
        in_set,
    )

    df = spark.createDataFrame(
        [("a",), ("c",), (None,)], "status string"
    )
    report = {
        r["check"]: r
        for r in audit_table(df, [in_set("status", ["a", "b", None])]).collect()
    }
    row = report["in_set"]
    assert row["violations"] == 1  # exactly the 'c' row
    assert not row["passed"]


def test_referential_is_one_job_and_counts_match(spark):
    from ds_caselaw_ingester_spark.operators.expectations import referential

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = referential(child, "fk", parent, "pk", table="t").collect()[0]
    assert row["total_rows"] == 4
    assert row["violations"] == 1  # fk=99; NULL fk is not an orphan
    assert not row["passed"]
