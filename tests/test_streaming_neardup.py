"""Streaming near-dup detection: cross-trigger bucket state finds pairs
whose members arrived in different micro-batches, and the streamed pair
set over a real corpus equals the batch MinHash-LSH detector's."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from conftest import few_shuffle_partitions as _few_shuffle_partitions
from ds_caselaw_ingester_spark.streaming.neardup import neardup_pairs_stream

SF = "/root/testdata/sf0.001"



def _run_stream(spark, src, out, ckpt, min_rows, timeout_s=120):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        neardup_pairs_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    # pending processing-time state timers keep availableNow alive:
    # poll the sink until it reaches min_rows AND stays stable for three
    # consecutive polls (per-band duplicate rows can exceed min_rows
    # after the FIRST trigger — stability proves the later triggers
    # drained), then stop (same pattern as the stateful dedup test)
    deadline = time.time() + timeout_s
    last, stable = -1, 0
    while time.time() < deadline:
        try:
            n = spark.read.parquet(str(out)).count()
        except Exception:
            n = -1
        stable = stable + 1 if (n == last and n >= min_rows) else 0
        last = n
        if stable >= 3:
            break
        time.sleep(2)
    q.stop()
    q.awaitTermination(60)
    return spark.read.parquet(str(out))


def test_cross_trigger_pairs_found(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base + "tail"
    other = "one two three four five six seven eight nine ten " * 3
    src = tmp_path / "docs"
    src.mkdir()
    with open(src / "t0.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": base}) + "\n")
        f.write(json.dumps({"doc_id": 4, "text": other}) + "\n")
    with open(src / "t1.json", "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": near}) + "\n")
    for i, name in enumerate(["t0.json", "t1.json"]):
        os.utime(src / name, (1700000000 + i * 10,) * 2)

    with _few_shuffle_partitions(spark):
        got = _run_stream(
            spark, src, tmp_path / "out", tmp_path / "ckpt", min_rows=1
        )
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    # doc 2 arrived a TRIGGER LATER than doc 1 — only persistent bucket
    # state can pair them
    assert (1, 2) in pairs
    assert all(4 not in p for p in pairs)


def test_streamed_pairs_equal_batch_detector(spark, tmp_path):
    from ds_caselaw_ingester_spark.operators.dedup import (
        doc_shingles,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 250)
    )
    rows = docs.collect()
    # batch detector on the same frame
    batch_pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            lsh_bands(minhash_signatures(doc_shingles(docs, "doc_id", "text"), "doc_id"), "doc_id"),
            "doc_id",
        ).collect()
    }

    src = tmp_path / "docs"
    src.mkdir()
    half = len(rows) // 2
    for name, chunk, ts in (
        ("t0.json", rows[:half], 1700000000),
        ("t1.json", rows[half:], 1700000010),
    ):
        with open(src / name, "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
        os.utime(src / name, (ts, ts))

    with _few_shuffle_partitions(spark):
        got = _run_stream(
            spark, src, tmp_path / "out", tmp_path / "ckpt",
            min_rows=max(1, len(batch_pairs)),
        )
    stream_pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    # same signatures, same banding, bucket state spanning triggers ->
    # identical candidate pair set (stream emits per band; set-dedup here
    # mirrors the batch pipeline's distinct)
    assert stream_pairs == batch_pairs
    assert batch_pairs  # the corpus has planted near-dups; non-degenerate
