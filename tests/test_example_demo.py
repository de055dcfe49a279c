"""The examples/ demo must stay runnable end to end — it is the repo's
executable documentation."""

from __future__ import annotations

import sys


def test_demo_runs_end_to_end(spark, sf_dir, capsys):
    sys.argv = ["demo", sf_dir]
    import examples.curate_and_index as demo

    demo.main()
    out = capsys.readouterr().out
    for tag in (
        "[1 report]",
        "[2 curate]",
        "[3 export]",
        "[4 pca]",
        "[5 index]",
        "[6 search]",
    ):
        assert tag in out, out


def test_incremental_dedup_demo_runs_end_to_end(spark, sf_dir, capsys):
    import examples.incremental_dedup as demo

    result = demo.main(spark, sf_dir)
    out = capsys.readouterr().out
    for tag in ("1. day-0", "2. cell index", "3. day-1", "4. lexical"):
        assert tag in out, out
    assert result["incremental_pairs"] > 0  # planted re-encodes must pair


def test_streaming_dedup_sink_demo_runs_end_to_end(spark, sf_dir, capsys, tmp_path):
    import examples.streaming_dedup_sink as demo

    result = demo.main(spark, "/root/testdata/sf0.001", str(tmp_path))
    out = capsys.readouterr().out
    for tag in ("1. bootstrap quantizer", "2. index", "3. pair log"):
        assert tag in out, out
    assert result["cross"] > 0  # day-1 re-encodes pair against day-0
    assert result["cells"] > 1


def test_streaming_curation_sink_demo_runs_end_to_end(spark, capsys, tmp_path):
    """The curation-sink lifecycle demo (auto-sized buckets, pruned
    probe, dual-side compaction, gate-drift refuse -> rebuild ->
    restart) must stay runnable — round 10 switched it to
    n_buckets='auto'."""
    import examples.streaming_curation_sink as demo

    result = demo.main(spark, "/root/testdata/sf0.001", str(tmp_path))
    out = capsys.readouterr().out
    for tag in ("0. auto-sized", "1-2. epochs", "3. compaction", "4. drifted gate"):
        assert tag in out, out
    assert result["refused"] is True
    assert result["post_kept"] == 0  # every re-submission rejected post-rebuild
    assert result["fold_i"] > 0 and result["fold_c"] > 0
