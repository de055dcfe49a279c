"""Sequence packing: budget respected, nothing lost or duplicated,
oversized chunks isolated, fill bookkeeping consistent, deterministic
reruns."""

from __future__ import annotations

from ds_caselaw_ingester_spark.operators.chunking import chunk_documents
from ds_caselaw_ingester_spark.operators.packing import pack_sequences


def _packs(rows):
    packs = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r)
    return packs


def test_budget_and_conservation(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40))) for i in range(30)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=0)
    n_chunks = chunks.count()
    rows = pack_sequences(chunks, budget=48).collect()

    # conservation: every chunk packed exactly once
    assert len(rows) == n_chunks
    assert len({(r.doc_id, r.chunk_index) for r in rows}) == n_chunks

    for pack_id, members in _packs(rows).items():
        total = sum(r.n_chunk_tokens for r in members)
        # budget respected (all chunks here are <= budget)
        assert total <= 48, (pack_id, total)
        # fill bookkeeping matches the actual total, on every member row
        assert all(r.pack_fill == total for r in members)
        # slots are 0..n-1
        assert sorted(r.pack_slot for r in members) == list(range(len(members)))


def test_oversized_chunk_gets_singleton_pack(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{j}" for j in range(100))), (2, "a b c")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=0)
    rows = pack_sequences(chunks, budget=10).collect()
    big = [r for r in rows if r.n_chunk_tokens > 10]
    assert big  # the 64-token chunks exceed the budget
    for r in big:
        members = [x for x in rows if x.pack_id == r.pack_id]
        assert len(members) == 1  # isolated, never silently dropped


def test_packing_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(10 + i))) for i in range(20)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=8, overlap=0)
    a = sorted(
        (r.pack_id, r.doc_id, r.chunk_index)
        for r in pack_sequences(chunks, budget=24).collect()
    )
    b = sorted(
        (r.pack_id, r.doc_id, r.chunk_index)
        for r in pack_sequences(chunks, budget=24).collect()
    )
    assert a == b


def test_empty_partitions_do_not_crash(spark):
    """mapInPandas receives genuinely empty partitions when AQE
    coalescing is off (or keys < partitions); the packer must treat an
    exhausted Arrow iterator as no-op, not pd.concat([]) (regression:
    `if it` is always truthy for an iterator)."""
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    )
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=0)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        rows = pack_sequences(chunks, budget=8).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert {(r.doc_id, r.chunk_index) for r in rows} == {(1, 0), (2, 0)}


def test_string_keys_and_input_column_names_survive(spark):
    """Review regression: pack_sequences crashed on non-integer keys
    (int(d) coercion) and renamed output columns to doc_id regardless
    of the input names. Keys keep their type and name."""
    chunks = spark.createDataFrame(
        [("uri/a", 0, 5), ("uri/a", 1, 5), ("uri/b", 0, 7)],
        "uri string, idx int, n_tok int",
    )
    rows = pack_sequences(
        chunks, budget=10, key_col="uri", index_col="idx", tokens_col="n_tok"
    ).collect()
    assert {r["uri"] for r in rows} == {"uri/a", "uri/b"}
    # conservation: every chunk assigned exactly once
    assert sorted((r["uri"], r["idx"]) for r in rows) == [
        ("uri/a", 0), ("uri/a", 1), ("uri/b", 0)
    ]
    for r in rows:
        assert r["pack_fill"] <= 10
