"""Snapshot comparison ops (operators/snapshot.py): DuckDB oracle
parity for corpus_diff and vocab_shift, bit-exact JSD replay
(Python AND DuckDB), and the metric contracts (zero on identical
corpora, symmetry, empty-corpus refusal)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.snapshot import (
    corpus_diff,
    js_divergence,
    py_js_divergence,
    vocab_shift,
)
from tests.conftest import SF_SMOKE as SF_DIR


def _snapshots(spark):
    """old = even ids; new = ids not divisible by 3, with every 10th
    doc's text perturbed — yields all four diff statuses."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 3 != 0").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" x")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return old, new


def test_corpus_diff_matches_duckdb(spark):
    old, new = _snapshots(spark)
    got = sorted(map(tuple, corpus_diff(old, new).collect()))
    sql = f"""
WITH docs AS (SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')),
o AS (SELECT doc_id, md5(text) AS old_hash FROM docs WHERE doc_id % 2 = 0),
n AS (SELECT doc_id,
             md5(CASE WHEN doc_id % 10 = 0 THEN text || ' x' ELSE text END) AS new_hash
      FROM docs WHERE doc_id % 3 != 0)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash = new_hash THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_hash, new_hash
FROM o FULL JOIN n ON o.doc_id = n.doc_id
ORDER BY 1
"""
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
    statuses = {s for _, s, _, _ in got}
    assert statuses == {"added", "removed", "changed", "unchanged"}


def test_vocab_shift_matches_duckdb(spark):
    old, new = _snapshots(spark)
    got = sorted(map(tuple, vocab_shift(old, new, alpha=0.5).collect()))
    sql = f"""
WITH docs AS (SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')),
o AS (SELECT doc_id, text FROM docs WHERE doc_id % 2 = 0),
n AS (SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' x' ELSE text END AS text
      FROM docs WHERE doc_id % 3 != 0),
oc AS (SELECT f AS token, count(*) AS n_old
       FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS f FROM o)
       GROUP BY 1),
nc AS (SELECT f AS token, count(*) AS n_new
       FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS f FROM n)
       GROUP BY 1),
j AS (SELECT coalesce(oc.token, nc.token) AS token,
             coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
      FROM oc FULL JOIN nc ON oc.token = nc.token),
tot AS (SELECT sum(n_old) + 0.5 * count(*) AS d_old,
               sum(n_new) + 0.5 * count(*) AS d_new FROM j)
SELECT token, n_old, n_new,
       round(log2(((n_new + 0.5) / tot.d_new) / ((n_old + 0.5) / tot.d_old)), 4) AS log2_ratio
FROM j, tot
ORDER BY 1
"""
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2]
        assert g[3] == pytest.approx(w[3], abs=1e-9)
    # the planted ' x' suffix makes 'x' a top grower
    ratios = {t: r for t, _, _, r in got}
    assert ratios["x"] > 0


def test_jsd_matches_python_and_duckdb(spark):
    old_texts = ["the cat sat", "on the mat", "the end"]
    new_texts = ["the dog ran", "on the mat", "a new start", "the dog again"]
    old = spark.createDataFrame(
        [(i, t) for i, t in enumerate(old_texts)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_texts)], "doc_id long, text string"
    )
    got = js_divergence(old, new)
    assert got == py_js_divergence(old_texts, new_texts)
    sql = """
WITH o(text) AS (VALUES ('the cat sat'), ('on the mat'), ('the end')),
n(text) AS (VALUES ('the dog ran'), ('on the mat'), ('a new start'), ('the dog again')),
oc AS (SELECT f AS token, count(*) AS n_old
       FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS f FROM o)
       GROUP BY 1),
nc AS (SELECT f AS token, count(*) AS n_new
       FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS f FROM n)
       GROUP BY 1),
j AS (SELECT coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
      FROM oc FULL JOIN nc ON oc.token = nc.token),
tot AS (SELECT sum(n_old)::DOUBLE AS no, sum(n_new)::DOUBLE AS nn FROM j)
SELECT round(sum(CAST(floor((
         CASE WHEN n_old > 0
              THEN 0.5 * (n_old / tot.no) * log2((n_old / tot.no) / ((n_old / tot.no + n_new / tot.nn) / 2.0))
              ELSE 0.0 END
       + CASE WHEN n_new > 0
              THEN 0.5 * (n_new / tot.nn) * log2((n_new / tot.nn) / ((n_old / tot.no + n_new / tot.nn) / 2.0))
              ELSE 0.0 END) * 1000000000 + 0.5) AS BIGINT)) / 1000000000.0, 6)
FROM j, tot
"""
    assert got == duckdb.sql(sql).fetchone()[0]
    # identical corpora: exactly zero; and JSD is symmetric (the
    # per-token contribution is symmetric in (p, q), so the nano sums
    # are IDENTICAL, not merely close)
    assert js_divergence(old, old) == 0.0
    assert js_divergence(new, old) == got


def test_jsd_bounds_and_empty(spark):
    a = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "cc dd")], "doc_id long, text string")
    # disjoint vocabularies: maximal divergence = 1 bit
    assert js_divergence(a, b) == 1.0
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        js_divergence(a, empty)


def test_corpus_diff_null_text_presence(spark):
    """Presence must come from join-side markers, not hash nullity: a
    NULL-text doc present only in OLD is 'removed' (the hash-nullity
    form reported it 'added'); NULL -> real text is 'changed'; NULL on
    both sides is 'unchanged' (both snapshots agree content is absent)."""
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "real"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "now real"), (3, "real"), (4, None), (5, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "changed",
        3: "unchanged",
        4: "unchanged",
        5: "added",
    }


def test_vocab_shift_empty_corpora_refuse(spark):
    import pytest as _pytest

    e = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="at least one token"):
        vocab_shift(e, e)


def test_jsd_property_arbitrary_corpora(spark):
    """Hypothesis: on arbitrary small corpora (shared vocab, repeats,
    whitespace noise) the engine JSD equals the pure-Python replay
    bit-for-bit, stays in [0, 1], and is symmetric."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
    corpus = st.lists(
        st.lists(words, min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=12, deadline=None)
    @given(corpus, corpus)
    def _check(old_texts, new_texts):
        old = spark.createDataFrame(
            [(i, t) for i, t in enumerate(old_texts)], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(i, t) for i, t in enumerate(new_texts)], "doc_id long, text string"
        )
        got = js_divergence(old, new)
        assert got == py_js_divergence(old_texts, new_texts)
        assert 0.0 <= got <= 1.0
        assert js_divergence(new, old) == got

    _check()
