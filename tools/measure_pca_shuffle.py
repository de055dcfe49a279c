"""Measure the SemDeDup stage's shuffle volume with and without a PCA
reduction in front of it (r9 verdict queue #3's 'done' criterion).

Runs the exact stage curate_corpus executes — kmeans_fit quantizer
training + semantic_dedup pair search — over the sf embeddings table,
once on the raw 64-dim vectors and once PCA-projected to k dims, and
reports per-phase shuffle read/write bytes from Spark's status REST API
(the UI is enabled on a private port for this tool only; the engine's
sessions keep it off).

Usage: python tools/measure_pca_shuffle.py [sf_dir] [k] [replicate]
`replicate` unions that many deterministically-perturbed copies of the
embeddings table first (the repo's ×N stress convention — sf0.1 holds
only 2,000 vectors, where scheduler overhead drowns the shuffle
signal). Prints one JSON line; paste the numbers into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4049


def _get(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}") as r:
        return json.loads(r.read())


def _stages():
    app = _get("/applications")[0]["id"]
    return _get(f"/applications/{app}/stages?status=complete")


def _shuffle_totals(stages, after_stage_id: int):
    w = sum(s["shuffleWriteBytes"] for s in stages if s["stageId"] > after_stage_id)
    r = sum(s["shuffleReadBytes"] for s in stages if s["stageId"] > after_stage_id)
    return r, w


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.pca import pca_fit, pca_project
    from ds_caselaw_ingester_spark.operators.semdedup import semantic_dedup
    from ds_caselaw_ingester_spark.operators.similarity import kmeans_fit

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k_dims = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("measure_pca_shuffle")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v")
    )
    if replicate > 1:
        # deterministic per-copy perturbation (scale by 1 + i/1000) so
        # the replicated corpus is not degenerate for kmeans
        copies = [
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.transform(
                    F.col("_v"), lambda c: c * F.lit(1.0 + i / 1000.0)
                ).alias("_v"),
            )
            for i in range(replicate)
        ]
        from functools import reduce

        base = reduce(lambda a, b: a.unionByName(b), copies)
    emb = base.repartition(32).localCheckpoint(eager=True)
    n = emb.count()
    dim = len(emb.first()["_v"])
    model = pca_fit(emb, "_v", dim, k=k_dims)

    def stage(vecs, kq: int):
        cents = kmeans_fit(vecs, "_v", "vec_id", k=kq, max_iter=3, round_centroids=6)
        sem = semantic_dedup(vecs, "_v", "vec_id", cents, threshold=0.95)
        sem.write.mode("overwrite").format("noop").save()

    kq = max(4, int(n ** 0.5) // 8)
    out = {"sf_dir": sf_dir, "n_vectors": n, "dim": dim, "pca_k": k_dims, "kmeans_k": kq}

    marker = max((s["stageId"] for s in _stages()), default=-1)
    stage(emb, kq)
    raw_r, raw_w = _shuffle_totals(_stages(), marker)
    out["raw_shuffle_read_mb"] = round(raw_r / 1e6, 2)
    out["raw_shuffle_write_mb"] = round(raw_w / 1e6, 2)

    proj = pca_project(emb, "_v", model, out_col="_p").select(
        "vec_id", F.col("_p").alias("_v")
    )
    marker = max(s["stageId"] for s in _stages())
    stage(proj, kq)
    p_r, p_w = _shuffle_totals(_stages(), marker)
    out["pca_shuffle_read_mb"] = round(p_r / 1e6, 2)
    out["pca_shuffle_write_mb"] = round(p_w / 1e6, 2)
    out["write_ratio"] = round(raw_w / p_w, 2) if p_w else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
