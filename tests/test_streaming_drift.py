"""Streaming drift monitor: the maintained count table must converge
to the batch aggregation over everything streamed, redelivered epochs
must not double-count, and the scored JSD must equal the batch
js_divergence over the same corpora."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.snapshot import (
    js_divergence,
    token_counts,
)
from ds_caselaw_ingester_spark.streaming.drift import (
    apply_drift_batch,
    drift_score,
    run_drift_monitor,
    write_reference,
)

SF = "/root/testdata/sf0.001"


def _counts(spark, path):
    return {
        r["token"]: r["n"] for r in spark.read.parquet(path).collect()
    }


def test_batches_converge_to_batch_counts(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    b1 = docs.where("doc_id % 2 = 0")
    b2 = docs.where("doc_id % 2 = 1")
    cp = str(tmp_path / "counts")
    apply_drift_batch(b1, cp, epoch_id=0)
    apply_drift_batch(b2, cp, epoch_id=1)
    want = {r["token"]: r["n"] for r in token_counts(docs).collect()}
    assert _counts(spark, cp) == want


def test_redelivered_epoch_is_a_detected_noop(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    cp = str(tmp_path / "counts")
    apply_drift_batch(docs, cp, epoch_id=0)
    once = _counts(spark, cp)
    assert once == {"a": 2, "b": 2, "c": 1}
    # crash-after-commit replay: same epoch arrives again
    apply_drift_batch(docs, cp, epoch_id=0)
    assert _counts(spark, cp) == once
    assert open(os.path.join(cp, "_applied_epoch")).read() == "0"
    # the next epoch still applies
    apply_drift_batch(docs.where("doc_id = 2"), cp, epoch_id=1)
    assert _counts(spark, cp) == {"a": 2, "b": 3, "c": 2}


def test_drift_score_equals_batch_jsd(spark, tmp_path):
    ref_docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    stream_docs = spark.read.parquet(f"{SF}/documents.parquet").where(
        "doc_id % 3 = 0"
    ).limit(40)
    rp, cp = str(tmp_path / "ref"), str(tmp_path / "counts")
    write_reference(ref_docs, rp)
    apply_drift_batch(stream_docs, cp, epoch_id=0)
    assert drift_score(spark, cp, rp) == js_divergence(ref_docs, stream_docs)


def test_run_drift_monitor_end_to_end(spark, tmp_path):
    """File-source stream, one file per trigger: the monitor scores
    every epoch and the final cumulative JSD equals the batch value
    over everything streamed."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    src = str(tmp_path / "src")
    docs.where("doc_id % 2 = 0").coalesce(1).write.parquet(src)
    docs.where("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    rp = str(tmp_path / "ref")
    write_reference(docs.where("doc_id % 5 = 0"), rp)
    cp = str(tmp_path / "counts")
    scores = []
    q = run_drift_monitor(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        cp,
        rp,
        checkpoint=str(tmp_path / "ckpt"),
        score_every=1,
        warn_threshold=2.0,  # JSD <= 1: never warns in this test
        on_score=lambda e, j: scores.append((e, j)),
    )
    q.processAllAvailable()
    q.stop()
    assert len(scores) >= 1
    want = js_divergence(docs.where("doc_id % 5 = 0"), docs)
    assert scores[-1][1] == want
    # and the maintained table equals the batch aggregation
    got = _counts(spark, cp)
    assert got == {r["token"]: r["n"] for r in token_counts(docs).collect()}
