"""The driver-contract invariants that bit us in rounds 3-4, pinned:
exactly 50 registered queries (the driver records at most 50
CORRECTNESS rows — row 51 is silently dropped), every one carrying a
DuckDB oracle, and the __spark_entry__ surface exposing all three
callables consistently."""

from __future__ import annotations


def test_registry_is_exactly_fifty_all_oracled():
    from ds_caselaw_ingester_spark.plans.registry import all_specs

    specs = all_specs()
    assert len(specs) == 50, sorted(specs)
    missing = [n for n, s in specs.items() if not s.oracle]
    assert not missing, missing


def test_entry_surface_is_consistent():
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == 50
    assert callable(E.entry)
    # column-name contract: every oracle is non-empty SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_bench_paired_loader_reads_both_artifact_shapes(tmp_path):
    """bench.py auto-pairs against the newest committed BENCH_r*.json;
    the loader must read bench's own output shape AND the driver's
    wrapper (per-query line embedded in the captured stdout `tail`),
    and the summary must exclude flagged queries from the host-factor
    estimate."""
    import json

    import bench

    own = tmp_path / "own.json"
    own.write_text(json.dumps({
        "queries": {"a": 1.0, "b": 2.0},
        "suite_spread": {"flagged": ["b"]},
    }))
    q, fl, sf = bench._load_old_queries(str(own))
    assert q == {"a": 1.0, "b": 2.0} and fl == {"b"}

    inner = json.dumps({"metric": "total_query_wall_seconds",
                        "queries": {"a": 1.0, "b": 2.0, "c": 4.0},
                        "suite_spread": {"flagged": ["c"]}})
    wrapped = tmp_path / "BENCH_r99.json"
    wrapped.write_text(json.dumps({
        "n": 99, "rc": 0,
        "tail": "[Stage 5:>  ]\r\r" + inner + "\n" + json.dumps(
            {"metric": "total_query_wall_seconds", "value": 7.0}) + "\n",
    }))
    q2, fl2, _sf2 = bench._load_old_queries(str(wrapped))
    assert q2 == {"a": 1.0, "b": 2.0, "c": 4.0} and fl2 == {"c"}

    # paired summary: uniform 1.1x host factor, flagged-in-old excluded
    s = bench._paired_summary(
        {"a": 1.1, "b": 2.2, "c": 400.0}, set(), 0.1, str(wrapped)
    )
    assert s["n_compared"] == 2  # c flagged in the old artifact
    assert abs(s["host_factor_median_ratio"] - 1.1) < 1e-9

    # mismatched scale refuses to pair (sf1 sweep vs an sf0.1 baseline)
    wrapped_sf = tmp_path / "BENCH_r98.json"
    wrapped_sf.write_text(json.dumps({"queries": {"a": 1.0}, "sf": 0.1}))
    assert bench._paired_summary({"a": 1.1}, set(), 1.0, str(wrapped_sf)) is None
    assert (
        bench._paired_summary({"a": 1.1}, set(), 0.1, str(wrapped_sf))
        is not None
    )
