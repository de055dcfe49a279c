"""Streaming dedup-sink demo: a micro-batched embedding feed maintained
as a CELL-PARTITIONED SemDeDup index with an auto-bootstrapped
quantizer, including the full retrain lifecycle.

    python examples/streaming_dedup_sink.py [sf_dir]

Stages (each prints a one-line result):
1. file-source embedding stream, one parquet file per trigger
2. first batch bootstraps: k derived from batch size x the growth
   margin (sizing.semdedup_num_clusters), quantizer persisted inside
   the index directory (restart-safe)
3. later batches probe new-vs-index and swap ONLY the touched
   centroid_id= partitions (write amplification tracks the increment,
   not the corpus — BENCH_SF1.md r8: 1.7-10.7% of index bytes)
4. the per-epoch pair log unions to the one-shot recompute's pair set
5. retrain lifecycle: quiesce the stream, retrain_semdedup_index
   re-sizes the quantizer from the index's own vectors and swaps
   index + quantizer atomically, then the RESTARTED stream ('auto'
   loads the new quantizer from the same checkpoint) keeps finding
   near-dups planted against pre-retrain bases
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ds_caselaw_ingester_spark.streaming.semdedup_sink import (  # noqa: E402
    _QUANTIZER_FILE,
    retrain_semdedup_index,
    run_semdedup_stream,
)


def main(spark, sf_dir: str, work_dir: str) -> dict:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # re-encode a slice as near-duplicates arriving in a later batch
    planted = emb.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1000000000).alias("vec_id"),
        F.concat(
            F.array(F.lit(0.0)), F.slice(F.col("v"), 2, F.size(F.col("v")) - 1)
        ).alias("v"),
    )
    src = os.path.join(work_dir, "feed")
    emb.coalesce(1).write.parquet(os.path.join(src, "day0"))
    planted.coalesce(1).write.parquet(os.path.join(src, "day1"))

    idx = os.path.join(work_dir, "index")
    prs = os.path.join(work_dir, "pairs")
    ckpt = os.path.join(work_dir, "ckpt")
    stream = (
        spark.readStream.schema("vec_id long, v array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = run_semdedup_stream(stream, idx, prs, ckpt, "v", "vec_id", "auto", threshold=0.9)
    q.awaitTermination(300)

    import json

    qfile = os.path.join(idx, _QUANTIZER_FILE)
    k = len(json.load(open(qfile)))
    cells = sorted(e for e in os.listdir(idx) if e.startswith("centroid_id="))
    n_idx = spark.read.parquet(idx).count()
    pairs = spark.read.parquet(prs)
    n_pairs = pairs.count()
    n_cross = pairs.where(
        (F.col("id_b") - F.col("id_a")) == 1000000000
    ).count()
    print(f"1. bootstrap quantizer: k={k} (persisted {qfile})")
    print(f"2. index: {n_idx} vectors across {len(cells)} cell partitions")
    print(f"3. pair log: {n_pairs} near-dup pairs, {n_cross} spanning the two days")

    # -- stage 5: the retrain lifecycle (the WARN's documented remedy) --
    # stream is quiesced (the availableNow query above has terminated);
    # re-size for the corpus the stream actually grew into
    cents = retrain_semdedup_index(spark, idx, "v", "vec_id", k=max(2 * k, k + 4))
    cells2 = sorted(e for e in os.listdir(idx) if e.startswith("centroid_id="))
    assert spark.read.parquet(idx).count() == n_idx  # rebuild lost nothing
    # day2: more near-dups of ORIGINAL bases, arriving after the retrain
    day2 = emb.where(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 2000000000).alias("vec_id"),
        F.concat(
            F.array(F.lit(0.0)), F.slice(F.col("v"), 2, F.size(F.col("v")) - 1)
        ).alias("v"),
    )
    day2.coalesce(1).write.parquet(os.path.join(src, "day2"))
    stream2 = (
        spark.readStream.schema("vec_id long, v array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    # SAME checkpoint: only the new day2 file is processed; 'auto'
    # loads the retrained quantizer from inside the swapped index dir
    q2 = run_semdedup_stream(stream2, idx, prs, ckpt, "v", "vec_id", "auto", threshold=0.9)
    q2.awaitTermination(300)
    post_cross = (
        spark.read.parquet(prs)
        .where((F.col("id_b") - F.col("id_a")) == 2000000000)
        .count()
    )
    print(
        f"5. retrain: k {k} -> {len(cents)} ({len(cells)} -> {len(cells2)} "
        f"cells); restarted stream found {post_cross} near-dups of "
        "pre-retrain bases"
    )
    return {
        "k": k,
        "cells": len(cells),
        "pairs": n_pairs,
        "cross": n_cross,
        "k2": len(cents),
        "post_cross": post_cross,
    }


if __name__ == "__main__":
    import tempfile

    from ds_caselaw_ingester_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-dedup-sink-demo")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as wd:
        out = main(spark, sf, wd)
    assert out["cross"] > 0
    assert out["k2"] > out["k"] and out["post_cross"] > 0
