"""Streaming semantic dedup: the maintained cell index + per-epoch pair
log must converge to the batch operator's decisions — pairs found
across micro-batch boundaries, replace semantics on re-ingestion, and
crash-recoverable index swaps."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import few_shuffle_partitions as _few_shuffle_partitions
from ds_caselaw_ingester_spark.streaming.semdedup_sink import (
    apply_semdedup_batch,
    run_semdedup_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = emb.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.lit(0.0)), F.slice(F.col("v"), 2, F.size(F.col("v")) - 1)
        ).alias("v"),
    )
    return emb, planted


@pytest.fixture(scope="module")
def quantizer(spark, corpus):
    from ds_caselaw_ingester_spark.operators.similarity import kmeans_fit

    emb, _ = corpus
    return kmeans_fit(
        emb.where(F.col("vec_id") % 4 == 0), "v", "vec_id", k=8, max_iter=2
    )


def _all_pairs(spark, pairs_path):
    return {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs_path).collect()
    }


def test_two_batches_find_cross_batch_pairs(spark, corpus, quantizer, tmp_path):
    """Bases arrive in batch 1, their planted near-dups in batch 2: the
    pair log must contain the cross-batch (base, planted) pairs, and
    the union over epochs must equal the one-shot recompute's pair
    set."""
    from ds_caselaw_ingester_spark.operators.semdedup import (
        semantic_dedup_incremental,
        semdedup_build_index,
    )

    emb, planted = corpus
    idx = str(tmp_path / "index")
    prs = str(tmp_path / "pairs")
    apply_semdedup_batch(
        emb, idx, prs, "v", "vec_id", quantizer, threshold=0.9, epoch_id=0
    )
    apply_semdedup_batch(
        planted, idx, prs, "v", "vec_id", quantizer, threshold=0.9, epoch_id=1
    )
    got = _all_pairs(spark, prs)
    # cross-batch: every planted near-dup that shares its base's cell
    # must appear — compute the expectation with the batch operator
    full = semdedup_build_index(
        emb.unionByName(planted), "v", "vec_id", quantizer
    )
    empty = full.limit(0)
    ref, _ = semantic_dedup_incremental(
        empty, emb.unionByName(planted), "v", "vec_id", quantizer, threshold=0.9
    )
    want = {(r["id_a"], r["id_b"]) for r in ref.collect()}
    assert got == want and got
    cross_batch = {(a, b) for a, b in got if b == a + 100000}
    assert cross_batch  # pairs spanning the two micro-batches

    # index holds exactly one row per id
    index = spark.read.parquet(idx)
    assert index.count() == emb.count() + planted.count()


def test_epoch_replay_is_idempotent(spark, corpus, quantizer, tmp_path):
    """Redelivery of a micro-batch (same epoch_id) must converge: the
    epoch's pair directory is overwritten, not double-appended, and the
    index keeps one row per id (replace semantics)."""
    emb, planted = corpus
    idx = str(tmp_path / "index")
    prs = str(tmp_path / "pairs")
    apply_semdedup_batch(
        emb, idx, prs, "v", "vec_id", quantizer, threshold=0.9, epoch_id=0
    )
    apply_semdedup_batch(
        planted, idx, prs, "v", "vec_id", quantizer, threshold=0.9, epoch_id=1
    )
    first = _all_pairs(spark, prs)
    n_index = spark.read.parquet(idx).count()
    # redeliver epoch 1
    apply_semdedup_batch(
        planted, idx, prs, "v", "vec_id", quantizer, threshold=0.9, epoch_id=1
    )
    assert _all_pairs(spark, prs) == first
    assert spark.read.parquet(idx).count() == n_index


def test_index_crash_between_renames_recovers(spark, corpus, quantizer, tmp_path):
    """The index swap inherits recover_swap: a crash that leaves the
    index only in .old must be restored by the next batch, never
    bootstrapped over."""
    emb, planted = corpus
    idx = str(tmp_path / "index")
    prs = str(tmp_path / "pairs")
    apply_semdedup_batch(
        emb, idx, prs, "v", "vec_id", quantizer, threshold=0.9, epoch_id=0
    )
    n0 = spark.read.parquet(idx).count()
    os.rename(idx, idx + ".old")  # crash point: local moved aside, no tmp
    apply_semdedup_batch(
        planted, idx, prs, "v", "vec_id", quantizer, threshold=0.9, epoch_id=1
    )
    index = spark.read.parquet(idx)
    assert index.count() == n0 + planted.count()
    assert not os.path.exists(idx + ".old")
    # the probe ran against the RECOVERED index: cross-batch pairs exist
    assert any(b == a + 100000 for a, b in _all_pairs(spark, prs))


def test_streaming_end_to_end_matches_batch(spark, corpus, quantizer, tmp_path):
    """Real readStream run (file source, one file per trigger): the
    union of per-epoch pair logs equals the one-shot recompute."""
    import time

    from ds_caselaw_ingester_spark.operators.semdedup import (
        semantic_dedup_incremental,
        semdedup_build_index,
    )

    emb, planted = corpus
    src = str(tmp_path / "src")
    emb.coalesce(1).write.parquet(os.path.join(src, "b0"))
    planted.coalesce(1).write.parquet(os.path.join(src, "b1"))
    idx = str(tmp_path / "index")
    prs = str(tmp_path / "pairs")
    with _few_shuffle_partitions(spark):
        stream = (
            spark.readStream.schema("vec_id long, v array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = run_semdedup_stream(
            stream, idx, prs, str(tmp_path / "ckpt"), "v", "vec_id",
            quantizer, threshold=0.9,
        )
        q.awaitTermination(180)
    got = _all_pairs(spark, prs)
    full_corpus = emb.unionByName(planted)
    empty = semdedup_build_index(
        full_corpus, "v", "vec_id", quantizer
    ).limit(0)
    ref, _ = semantic_dedup_incremental(
        empty, full_corpus, "v", "vec_id", quantizer, threshold=0.9
    )
    assert got == {(r["id_a"], r["id_b"]) for r in ref.collect()} and got
