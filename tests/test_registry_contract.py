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
