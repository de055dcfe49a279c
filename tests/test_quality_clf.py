"""fastText-style hashed linear quality classifier: replay-exact
training (pure-Python replay, shared rounding schedule), functional
separation, and a DuckDB oracle on the scoring path."""

from __future__ import annotations

import duckdb
import pytest

from ds_caselaw_ingester_spark.operators.quality_clf import (
    QualityModel,
    py_replay_train,
    score_quality,
    train_quality_classifier,
)

GOOD = [
    "the quarterly report shows measured growth in every region",
    "careful analysis of the data reveals a consistent trend",
    "the committee reviewed the evidence and published findings",
    "researchers documented the experiment with full methodology",
]
BAD = [
    "click click buy now buy now cheap cheap cheap",
    "winner winner free free free click here now now",
    "buy cheap buy cheap click click click here here",
    "free money free money click now click now click",
]


def _frame(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_train_is_replay_exact(spark):
    rows, docs = _frame(spark)
    model = train_quality_classifier(docs, dim=1 << 12, iters=8, lr=2.0)
    replay = py_replay_train(
        [(i, t, y) for i, t, y in rows], dim=1 << 12, iters=8, lr=2.0
    )
    assert model.bias == replay.bias
    assert model.weights == replay.weights  # bit-for-bit, both rounded @8


def test_classifier_separates(spark):
    rows, docs = _frame(spark)
    model = train_quality_classifier(docs, dim=1 << 12, iters=20, lr=2.0)
    scored = {r["doc_id"]: r["quality_p"] for r in score_quality(docs, model).collect()}
    good_p = [scored[i] for i in range(len(GOOD))]
    bad_p = [scored[100 + i] for i in range(len(BAD))]
    assert min(good_p) > 0.5 > max(bad_p)
    # held-out shapes: unseen doc built from good vocabulary outscores
    # unseen doc built from bad vocabulary
    unseen = spark.createDataFrame(
        [(1, "the report shows consistent findings"), (2, "free cheap click now")],
        "doc_id long, text string",
    )
    u = {r["doc_id"]: r["quality_p"] for r in score_quality(unseen, model).collect()}
    assert u[1] > u[2]


def test_empty_and_missing_docs_score_at_bias(spark):
    model = QualityModel(dim=64, bias=0.0, weights={1: 5.0})
    docs = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    got = {r["doc_id"]: r["quality_p"] for r in score_quality(docs, model).collect()}
    assert got[1] == 0.5 and got[2] == 0.5  # sigmoid(bias=0)


def test_score_matches_duckdb_oracle(spark, sf_dir):
    """Scoring with a pinned sparse model over the real documents table
    must hash-match a DuckDB replay: same md5 hash, same VALUES weight
    table, same rounding."""
    model = QualityModel(
        dim=4096,
        bias=-0.25,
        weights={17: 1.5, 903: -2.0, 2048: 0.75, 4095: 0.5},
    )
    got = {
        r["doc_id"]: r["quality_p"]
        for r in score_quality(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"),
            model,
        ).collect()
    }
    vals = ", ".join(f"({i}, {w!r})" for i, w in sorted(model.weights.items()))
    sql = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tok
  FROM read_parquet('{sf_dir}/documents.parquet')
),
terms AS (
  SELECT doc_id,
         list_concat(tok,
           CASE WHEN len(tok) >= 2
                THEN list_transform(generate_series(1, len(tok) - 1),
                                    i -> array_to_string(list_slice(tok, i, i + 1), ' '))
                ELSE []::VARCHAR[] END) AS t
  FROM base
),
feat AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(u.term), 1, 13))::BIGINT % 4096 AS INTEGER) AS idx,
         CAST(count(*) AS DOUBLE) / max(len(t)) AS x
  FROM terms, unnest(t) AS u(term)
  GROUP BY doc_id, idx
),
margin AS (
  SELECT f.doc_id, round(sum(f.x * w.w) + (-0.25), 6) AS m
  FROM feat f JOIN (VALUES {vals}) AS w(idx, w) ON f.idx = w.idx
  GROUP BY f.doc_id
)
SELECT b.doc_id,
       round(1.0 / (1.0 + exp(-coalesce(m.m, -0.25))), 6) AS quality_p
FROM base b LEFT JOIN margin m USING (doc_id)
"""
    want = dict(duckdb.sql(sql).fetchall())
    assert got == want


def test_replay_exact_on_unicode_whitespace(spark):
    """U+00A0 (NBSP) is whitespace to Python's str.split()/re \\s but
    NOT to the JVM's ASCII \\s — the replay must tokenize with
    py_tokens (the ASCII class) or its features diverge from Spark's
    on exactly this input (review-found)."""
    rows = [
        (0, "clean prose stays one token", 1),
        (1, "spam spam spam buy now", 0),
        (2, "a b line separator too", 1),
    ]
    from ds_caselaw_ingester_spark.operators.textstats import py_tokens

    # sanity: the fixture really is JVM-vs-Python-divergent input
    assert any(len(t.split()) != len(py_tokens(t)) for _, t, _ in rows)
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_quality_classifier(docs, dim=1 << 10, iters=4, lr=2.0)
    replay = py_replay_train(rows, dim=1 << 10, iters=4, lr=2.0)
    assert model.bias == replay.bias
    assert model.weights == replay.weights
