"""BM25 operator unit tests (the full DuckDB oracle gate lives in the
registered bm25_search row)."""

from __future__ import annotations

from ds_caselaw_ingester_spark.operators.search import bm25_topk


def test_null_text_docs_are_outside_the_corpus(spark):
    """Review regression: a NULL-text doc was previously counted in
    n_docs (count(*)) but not in total_dl (sum skips NULL) — idf and
    avgdl disagreed on the doc set and diverged from the DuckDB
    oracle. NULL-text rows are now excluded from the corpus entirely:
    adding one must not move any score."""
    rows = [
        (1, "spark merge window spark"),
        (2, "spark alpha beta"),
        (3, "gamma delta window"),
    ]
    clean = spark.createDataFrame(rows, "doc_id long, text string")
    with_null = spark.createDataFrame(
        rows + [(4, None)], "doc_id long, text string"
    )
    terms = ["spark", "window"]
    a = sorted(map(tuple, bm25_topk(clean, "doc_id", "text", terms, 10).collect()))
    b = sorted(map(tuple, bm25_topk(with_null, "doc_id", "text", terms, 10).collect()))
    assert a == b and a
