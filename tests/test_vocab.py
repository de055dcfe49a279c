"""Corpus vocabulary: DuckDB replay of the frequency aggregation, exact
top-k ordering with tie-breaks, and the TakeOrdered plan pin (a global
vocabulary sort shuffle is the scale bug this operator must not have)."""

from __future__ import annotations

import duckdb

from ds_caselaw_ingester_spark.operators.vocab import token_frequencies, vocab_topk
from ds_caselaw_ingester_spark.sources.catalog import table

SF = "/root/testdata/sf0.001"


def test_token_frequencies_match_duckdb(spark):
    docs = table(spark, SF, "documents").select("doc_id", "text")
    got = {
        (r.token, r.n_occurrences, r.n_docs)
        for r in token_frequencies(docs, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = {
        tuple(row)
        for row in con.execute(
            """
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS token
              FROM documents WHERE trim(text) <> ''
            )
            SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
            FROM tok GROUP BY token
            """
        ).fetchall()
    }
    assert got == want
    assert got


def test_vocab_topk_order_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b z")],
        "doc_id long, text string",
    )
    got = [
        (r.token, r.n_occurrences, r.n_docs)
        for r in vocab_topk(df, "doc_id", "text", 3).collect()
    ]
    # b: 4 occ / 2 docs; a: 3 occ / 2 docs; then the 1-occ tie breaks
    # alphabetically -> c before z
    assert got == [("b", 4, 2), ("a", 3, 2), ("c", 1, 1)]


def test_vocab_topk_plans_take_ordered(spark):
    docs = table(spark, SF, "documents").select("doc_id", "text")
    df = vocab_topk(docs, "doc_id", "text", 100)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
