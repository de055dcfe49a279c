"""The examples/ demo must stay runnable end to end — it is the repo's
executable documentation."""

from __future__ import annotations

import sys


def test_demo_runs_end_to_end(spark, sf_dir, capsys):
    sys.argv = ["demo", sf_dir]
    import examples.curate_and_index as demo

    demo.main()
    out = capsys.readouterr().out
    for tag in ("[1 report]", "[2 curate]", "[3 export]", "[4 index]", "[5 search]"):
        assert tag in out, out


def test_incremental_dedup_demo_runs_end_to_end(spark, sf_dir, capsys):
    import examples.incremental_dedup as demo

    result = demo.main(spark, sf_dir)
    out = capsys.readouterr().out
    for tag in ("1. day-0", "2. cell index", "3. day-1", "4. lexical"):
        assert tag in out, out
    assert result["incremental_pairs"] > 0  # planted re-encodes must pair
