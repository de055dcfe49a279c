"""Document chunking: DuckDB replay of the window arithmetic, exact
window semantics on hand-built cases, and coverage/reconstruction
properties (every token lands in a chunk; overlap regions agree)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.chunking import chunk_documents
from ds_caselaw_ingester_spark.sources.catalog import table

SF = "/root/testdata/sf0.001"


def test_chunks_match_duckdb_oracle(spark):
    docs = table(spark, SF, "documents").select("doc_id", "text")
    got = {
        (r.doc_id, r.chunk_index, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(docs, "doc_id", "text", 32, 8).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = {
        tuple(row)
        for row in con.execute(
            """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tok
              FROM documents
            )
            SELECT doc_id,
                   CAST((s - 1) // 24 AS INTEGER) AS chunk_index,
                   array_to_string(list_slice(tok, s, s + 31), ' ') AS chunk_text,
                   CAST(len(list_slice(tok, s, s + 31)) AS INTEGER) AS n_chunk_tokens
            FROM toks, unnest(generate_series(1, len(tok), 24)) AS t(s)
            WHERE len(tok) > 0
            """
        ).fetchall()
    }
    assert got == want
    assert got  # non-degenerate


def test_window_semantics_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "x")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_index, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, "doc_id", "text", 4, 1).collect()
    )
    # stride 3: windows at 1,4,7 — final windows shorter; empty doc emits none
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),
        (1, 2, "g", 1),
        (3, 0, "x", 1),
    ]


def test_every_token_covered_and_overlap_agrees(spark):
    text = " ".join(f"t{i}" for i in range(101))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r.chunk_index, r.chunk_text.split(" "))
        for r in chunk_documents(df, "doc_id", "text", 16, 4).collect()
    )
    rebuilt = []
    for idx, toks in chunks:
        if idx == 0:
            rebuilt.extend(toks)
        else:
            assert rebuilt[-4:] == toks[:4]  # overlap region must agree
            rebuilt.extend(toks[4:])
    assert rebuilt == text.split(" ")  # exact reconstruction, nothing lost


def test_parameter_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 0, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 8, 8)
