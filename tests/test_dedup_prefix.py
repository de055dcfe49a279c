"""exact_jaccard_pairs_prefix (AllPairs/PPJoin prefix filtering) must be
VALUE-IDENTICAL to the baseline inverted-index exact_jaccard_pairs —
prefix filtering is a completeness-preserving candidate generator, never
an approximation."""

from __future__ import annotations

import pytest

from ds_caselaw_ingester_spark.operators.dedup import (
    doc_shingles,
    exact_jaccard_pairs,
    exact_jaccard_pairs_prefix,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (4, "completely different words entirely here now friends"),
    (5, "the quick brown fox leaps over the lazy dog today"),  # near 1
    (6, "one two three"),  # single shingle
    (7, "one two three"),  # its exact dup
    (8, "the the the the the the the the"),  # degenerate hot gram
    (9, "the the the the the the the the"),
]


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_prefix_filtering_matches_baseline(spark, threshold):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sh = doc_shingles(df, "doc_id", "text", n=3)
    base = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in exact_jaccard_pairs(sh, "doc_id", threshold=threshold).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in exact_jaccard_pairs_prefix(sh, "doc_id", threshold=threshold).collect()
    }
    assert pref == base
    assert base  # sanity: the fixture produces matches
