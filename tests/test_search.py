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


def test_rrf_fusion_matches_hand_computation(spark):
    """RRF (Cormack 2009): score(d) = sum 1/(60 + rank_d), micro-rounded
    per list. Pinned against an exact Python computation."""
    from ds_caselaw_ingester_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 3)], "doc_id long, rank int"
    )
    got = {r["doc_id"]: (r["rrf_score"], r["rank"]) for r in
           rrf_fuse([lex, dense], k=10).collect()}

    def rr(rank):
        return round(1.0 / (60 + rank) * 1e6) / 1e6

    want = {
        1: rr(1) + rr(2),
        2: rr(2),
        3: rr(3) + rr(1),
        9: rr(3),
    }
    for d, s in want.items():
        assert abs(got[d][0] - s) < 1e-9, (d, got[d], s)
    # doc 1 (ranks 1+2) outranks doc 3 (ranks 1+3) outranks the
    # single-list docs; unmatched doc 9 trails
    assert got[1][1] == 1 and got[3][1] == 2 and got[9][1] == 4
    assert got[1][0] > got[3][0] > got[2][0]


def test_hybrid_retrieval_composes_lexical_and_dense(spark, sf_dir):
    """End-to-end: fuse bm25_topk with a dense cosine top-k over the
    same corpus — the hybrid stack the module docstring promises. The
    fused list must surface documents from BOTH shortlists."""
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.search import rrf_fuse
    from ds_caselaw_ingester_spark.operators.similarity import cosine_topk
    from ds_caselaw_ingester_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    lex = bm25_topk(docs, "doc_id", "text", ["spark", "window"], 10)
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    q = emb.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    dense = cosine_topk(q, c, k=10).select(
        F.col("c_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([lex, dense], k=15).collect()
    assert fused and len(fused) <= 15
    fused_ids = {r["doc_id"] for r in fused}
    lex_ids = {r["doc_id"] for r in lex.collect()}
    dense_ids = {r["doc_id"] for r in dense.collect()}
    assert fused_ids & lex_ids and fused_ids & dense_ids


def test_rrf_fuse_per_query_partitions_the_fusion(spark):
    """ADVICE r7: multi-query shortlists (q_id, doc_id, rank) must fuse
    PER QUERY, not sum reciprocal ranks across queries into one list.
    With query_col set, each query's fused ranking must equal the
    single-query fusion of its own slices."""
    from ds_caselaw_ingester_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 10, 2)],
        "q_id int, doc_id int, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (2, 10, 1), (2, 21, 2)],
        "q_id int, doc_id int, rank int",
    )
    fused = rrf_fuse([a, b], k=3, query_col="q_id")
    got = {
        (r["q_id"], r["doc_id"], r["rank"], r["rrf_score"])
        for r in fused.collect()
    }
    # per-query reference: fuse each query's slice as a single list
    want = set()
    for q in (1, 2):
        fa = a.where(f"q_id = {q}").drop("q_id")
        fb = b.where(f"q_id = {q}").drop("q_id")
        for r in rrf_fuse([fa, fb], k=3).collect():
            want.add((q, r["doc_id"], r["rank"], r["rrf_score"]))
    assert got == want
    # doc 11 appears in both of query 1's lists -> tops query 1;
    # doc 10 appears in both of query 2's lists -> tops query 2
    by_q = {(r["q_id"], r["rank"]): r["doc_id"] for r in fused.collect()}
    assert by_q[(1, 1)] == 11 and by_q[(2, 1)] == 10


def test_rrf_fuse_rejects_multiquery_frame_without_query_col(spark):
    """The misuse the query dimension exists to prevent: passing a
    multi-query frame with query_col=None must raise (duplicated rank
    within one input), not silently fuse garbage."""
    import pytest

    from ds_caselaw_ingester_spark.operators.search import rrf_fuse

    multi = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "q_id int, doc_id int, rank int"
    )
    with pytest.raises(ValueError, match="query_col"):
        rrf_fuse([multi], k=5)


def test_bm25_topk_queries_matches_duckdb_oracle(spark, sf_dir):
    """Multi-query BM25 against the DuckDB replay (same micro-rounded
    integer-sum convention as the registered bm25_search): per-query
    ranks hash-equal, duplicate terms within a query deduplicated."""
    import duckdb

    from ds_caselaw_ingester_spark.operators.search import (
        bm25_queries_oracle_sql,
        bm25_topk_queries,
    )
    from ds_caselaw_ingester_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = spark.createDataFrame(
        [
            (1, ["spark", "window"]),
            (2, ["merge", "merge", "window"]),  # dup term: must not double-count
            (3, ["zzz-no-such-token"]),
        ],
        "q_id int, terms array<string>",
    )
    got = sorted(
        (r["q_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk_queries(
            docs, "doc_id", "text", queries, k=7
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW queries AS SELECT * FROM (VALUES "
        "(1, 'spark'), (1, 'window'), (2, 'merge'), (2, 'window'), "
        "(3, 'zzz-no-such-token')) t(q_id, token)"
    )
    want = sorted(tuple(r) for r in con.execute(
        bm25_queries_oracle_sql(7)
    ).fetchall())
    assert got == want and got
    # q_id 3 matches nothing; 1 and 2 both produced ranked lists
    qids = {q for q, *_ in got}
    assert qids == {1, 2}


def test_per_query_hybrid_composes_bm25_multi_and_dense(spark, sf_dir):
    """The full per-query hybrid stack: multi-query BM25 + per-query
    dense cosine shortlists fused with rrf_fuse(query_col=...) — one
    fused top-k PER query, each equal to fusing that query's slices
    alone."""
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.search import (
        bm25_topk_queries,
        rrf_fuse,
    )
    from ds_caselaw_ingester_spark.operators.similarity import cosine_topk
    from ds_caselaw_ingester_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = spark.createDataFrame(
        [(1, ["spark", "window"]), (2, ["merge", "table"])],
        "q_id int, terms array<string>",
    )
    lex = bm25_topk_queries(docs, "doc_id", "text", queries, k=5).select(
        "q_id", "doc_id", "rank"
    )
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    q = emb.where(F.col("vec_id").isin([1, 2])).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    dense = cosine_topk(q, c, k=5).select(
        "q_id", F.col("c_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([lex, dense], k=5, query_col="q_id")
    rows = fused.collect()
    assert {r["q_id"] for r in rows} == {1, 2}
    for qid in (1, 2):
        per = rrf_fuse(
            [lex.where(F.col("q_id") == qid).drop("q_id"),
             dense.where(F.col("q_id") == qid).drop("q_id")],
            k=5,
        )
        want = {(r["doc_id"], r["rank"], r["rrf_score"]) for r in per.collect()}
        gotq = {
            (r["doc_id"], r["rank"], r["rrf_score"])
            for r in rows if r["q_id"] == qid
        }
        assert gotq == want and gotq


def test_bm25_queries_nondeterministic_frame_is_evaluated_once(spark):
    """ADVICE r14 regression: qterms' single evaluation is what keeps a
    nondeterministic queries frame correct — the prune (via all_terms)
    and the scoring join MUST see the same rows. Since round 13 that
    pin is a LAZY localCheckpoint materialized by the tf checkpoint's
    all_terms broadcast (operators/search.py); if that eager tf
    checkpoint is ever made lazy or reordered, the frame would be
    evaluated twice and scores would go silently wrong. The
    accumulator-backed UDF below counts row evaluations: exactly one
    pass over the 3 query rows, even though the frame is marked
    nondeterministic."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    from ds_caselaw_ingester_spark.operators.search import bm25_topk_queries

    docs = spark.createDataFrame(
        [
            (1, "spark merge window spark"),
            (2, "spark alpha beta"),
            (3, "gamma delta window merge"),
        ],
        "doc_id long, text string",
    )
    acc = spark.sparkContext.accumulator(0)

    def _count_and_pass(terms):
        acc.add(1)
        return terms

    counting = F.udf(
        _count_and_pass, ArrayType(StringType())
    ).asNondeterministic()
    queries = spark.createDataFrame(
        [(1, ["spark", "window"]), (2, ["merge"]), (3, ["window", "gamma"])],
        "q_id int, terms array<string>",
    ).select("q_id", counting("terms").alias("terms"))

    got = sorted(
        (r["q_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk_queries(docs, "doc_id", "text", queries, k=5).collect()
    )
    # one evaluation of the 3-row frame, not one per consumer
    assert acc.value == 3, (
        f"queries frame evaluated {acc.value} row-times for 3 rows — "
        "the prune and the scoring join observed separate evaluations"
    )
    # and the single evaluation produced a coherent result: every query
    # matched, ranks start at 1 per query
    by_q = {}
    for q, d, s, r in got:
        by_q.setdefault(q, []).append(r)
    assert set(by_q) == {1, 2, 3}
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
