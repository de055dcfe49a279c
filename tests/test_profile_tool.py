"""The runtime profiler must execute the query's OWN plan and surface
non-empty operator metrics (the count()/write() trap it exists to
avoid)."""

from __future__ import annotations


def test_profile_plan_surfaces_runtime_metrics(spark, sf_dir):
    import tools.profile_query as P
    from ds_caselaw_ingester_spark.plans.registry import all_specs

    df = all_specs()["pricing_summary"].fn(spark, sf_dir)
    for _ in df.toLocalIterator():
        pass
    rows = P.profile_plan(df)
    names = [nm for _, nm, _ in rows]
    assert any(nm.startswith("Scan") for nm in names), names
    scans = [m for _, nm, m in rows if nm.startswith("Scan")]
    assert any(m.get("numOutputRows", 0) > 0 for m in scans), scans
    assert any(m.get("filesSize", 0) > 0 for m in scans), scans
