"""Physical-plan audits: the scale properties we rely on must be visible
in the explain output, and regressions should fail loudly.

- identifier/dimension lookups go BROADCAST (no shuffle of the fact side)
- scan-level predicate pushdown reaches the parquet source
- column pruning keeps wide text columns out of metadata-only plans
"""

from __future__ import annotations

from ds_caselaw_ingester_spark.plans.registry import all_specs


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_uri_cascade_broadcasts_identifier_indexes(spark, sf_dir):
    df = all_specs()["uri_cascade"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan  # slug + ncn lookups
    assert "SortMergeJoin" not in plan, plan


def test_pricing_summary_pushes_filter_to_scan(spark, sf_dir):
    df = all_specs()["pricing_summary"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan
    # partial aggregation (map-side combine) before the exchange
    assert "HashAggregate" in plan and "Exchange" in plan


def test_revenue_by_nation_broadcasts_dims(spark, sf_dir):
    df = all_specs()["revenue_by_nation"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan  # customer, nation, region


def test_dedup_exact_prunes_text_from_scan_output(spark, sf_dir):
    """The join/aggregate side must not carry the raw text column — only
    doc_id + the 32-char hash go through the shuffle."""
    df = all_specs()["dedup_exact"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schema, plan
    # text is read (needed for the hash) but lang/source/n_chars are pruned
    assert all("lang" not in l and "source" not in l for l in scan_schema), plan


def test_existence_guard_is_broadcast(spark, sf_dir):
    plan = _physical_plan(all_specs()["existence_guard"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
