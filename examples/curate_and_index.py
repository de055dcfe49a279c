"""End-to-end demo: curate a corpus, build a compressed vector index,
and search it — every stage is an operator from this repo.

    python examples/curate_and_index.py [sf_dir]

Stages (each prints a one-line result):
1. corpus health report            (operators/report.py)
2. curation composite              (operators/curation.py:
   scrub -> langid gate -> quality gate -> lexical dedup ->
   PCA-reduced SemDeDup -> chunk)
3. deterministic shard export      (operators/export.py)
4. PCA reduction                   (operators/pca.py: 64 -> 32 dims,
   the pre-quantization transform — smaller codebooks, cheaper cells;
   the SAME model drives stage 2's semantic stage via pca_model=)
5. PQ index build + save           (operators/pq.py, over PCA vectors)
6. IVFADC search over the index    (coarse cells -> ADC -> rerank)

The langid gate is trained in-demo (quality_clf feature="char",
max_chars=512 — the fastText-langid architecture on the repo's
replay-exact trainer) from a handful of labeled sentences; production
would train once and broadcast the model everywhere the gates run.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ds_caselaw_ingester_spark.operators.curation import curate_corpus  # noqa: E402
from ds_caselaw_ingester_spark.operators.export import export_shuffled  # noqa: E402
from ds_caselaw_ingester_spark.operators.pq import (  # noqa: E402
    ivfadc_topk,
    pq_encode,
    pq_fit,
    save_index,
)
from ds_caselaw_ingester_spark.operators.pca import (  # noqa: E402
    pca_fit,
    pca_project,
)
from ds_caselaw_ingester_spark.operators.quality_clf import (  # noqa: E402
    train_quality_classifier,
)
from ds_caselaw_ingester_spark.operators.report import corpus_report  # noqa: E402
from ds_caselaw_ingester_spark.operators.similarity import kmeans_fit  # noqa: E402
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402
from ds_caselaw_ingester_spark.sources.catalog import spread, table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curate_and_index_demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="demo_")

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    # 1. health report — the dials before any curation decision
    rep = {r["metric"]: r["value"] for r in corpus_report(docs, corpus="demo").collect()}
    print(
        f"[1 report] {int(rep['n_docs'])} docs, {int(rep['total_tokens'])} tokens, "
        f"exact-dup {rep['exact_dup_frac']:.1%}, short {rep['short_doc_frac']:.1%}"
    )

    # 2. curation composite (embeddings keyed to doc ids for the demo).
    # The langid gate runs FIRST among the learned gates (CCNet order),
    # capped to the document head; the semantic stage projects through
    # the stage-4 PCA model map-side before any embedding shuffle.
    langid = train_quality_classifier(
        spark.createDataFrame(
            [(0, "the report shows steady growth across the region", 1),
             (1, "researchers published the findings after careful review", 1),
             (2, "a committee examined the evidence and issued guidance", 1),
             (100, "der bericht zeigt ein stetiges wachstum in der region", 0),
             (101, "die forscher veroeffentlichten die ergebnisse", 0),
             (102, "ein ausschuss prueft die beweise und leitlinien", 0)],
            "doc_id long, text string, label int",
        ),
        dim=1 << 13, iters=8, feature="char", max_chars=512,
    )
    pca = pca_fit(emb, "v", 64, k=32)
    doc_emb = emb.select(F.col("vec_id").alias("doc_id"), F.col("v").alias("embedding"))
    chunks = curate_corpus(
        docs, chunk_tokens=64, overlap=8, embeddings=doc_emb, semdedup_k=8,
        langid_model=langid, min_lang_p=0.5, pca_model=pca,
    )
    n_chunks = chunks.count()
    n_docs = chunks.select("doc_id").distinct().count()
    print(f"[2 curate] {n_docs} surviving docs -> {n_chunks} training chunks "
          f"(langid-gated, SemDeDup in {len(pca['components'])}-dim PCA space)")

    # 3. reproducible shard export (the trainer hand-off)
    export_shuffled(chunks.withColumn("chunk_id",
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_index"))),
        "chunk_id", f"{work}/shards", num_shards=4)
    print(f"[3 export] 4 deterministic shards under {work}/shards")

    # 4. PCA (fitted above, shared with stage 2): project map-side —
    # every downstream stage (coarse cells, codebooks, ADC) runs on 32
    # dims
    emb_p = pca_project(emb, "v", pca, out_col="pv").select(
        "vec_id", F.col("pv").alias("v")
    ).localCheckpoint(eager=True)
    print(f"[4 pca] 64 -> 32 dims, explained variance "
          f"{sum(pca['explained']):.2f}")

    # 5. compressed vector index: PQ codes + trained coarse cells
    train = spread(emb_p.where(F.col("vec_id") % 4 == 0), "vec_id")
    cb = pq_fit(train, "v", "vec_id", m=16, k=16)
    coarse = kmeans_fit(train, "v", "vec_id", k=8, max_iter=3, tol=0.0,
                        round_centroids=6)
    encoded = pq_encode(
        emb_p.select(F.col("vec_id").alias("c_id"), "v"), "v", "c_id", cb
    )
    encoded.write.mode("overwrite").parquet(f"{work}/index/codes")
    save_index(f"{work}/index", cb, coarse_centroids=coarse)
    print(f"[5 index] {encoded.count()} vectors at 16 bytes + norm under {work}/index")

    # 6. search: project the query, coarse cells -> ADC -> exact rerank
    queries = emb_p.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cand = emb_p.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    hits = ivfadc_topk(
        queries, spark.read.parquet(f"{work}/index/codes"), cand, coarse, cb,
        k=3, nprobe=5, shortlist=50,
    ).collect()
    for q in sorted({r["q_id"] for r in hits}):
        top = [f"{r['c_id']}({r['cosine']:.3f})" for r in hits if r["q_id"] == q]
        print(f"[6 search] q{q}: {' '.join(top)}")


if __name__ == "__main__":
    main()
