"""Day-over-day dedup demo: bootstrap an auto-sized dedup index on day
0, then probe a day-1 increment against it — every stage an operator
from this repo, every knob derived from corpus statistics.

    python examples/incremental_dedup.py [sf_dir]

Stages (each prints a one-line result):
1. auto-sized quantizer + full SemDeDup     (semantic_dedup_auto:
   k = ceil(n/1000), sample grows with k, cell-skew check logged)
2. persisted cell index                     (semdedup_build_index)
3. day-1 increment probe                    (semantic_dedup_incremental:
   new-vs-index pairs only, replace semantics)
4. lexical near-dup over the same day-1 docs with the
   duplication-aware df-cap                 (exact_jaccard_pairs
   max_doc_freq="auto" + hot_gram_drop_stats)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ds_caselaw_ingester_spark.operators.dedup import (  # noqa: E402
    doc_shingles,
    exact_jaccard_pairs,
    hot_gram_drop_stats,
)
from ds_caselaw_ingester_spark.operators.semdedup import (  # noqa: E402
    semantic_dedup_auto,
    semantic_dedup_incremental,
    semdedup_build_index,
)
from ds_caselaw_ingester_spark.operators.similarity import kmeans_fit  # noqa: E402
from ds_caselaw_ingester_spark.operators.sizing import (  # noqa: E402
    semdedup_num_clusters,
)
from ds_caselaw_ingester_spark.sources.catalog import spread, table  # noqa: E402


def main(spark, sf_dir: str) -> dict:
    emb = spread(
        table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        "vec_id",
    )

    # 1. day-0 corpus dedup, everything auto-sized
    day0 = semantic_dedup_auto(emb, "v", "vec_id", threshold=0.95)
    n_dups = day0.where("is_duplicate").count()
    print(f"1. day-0 SemDeDup: {day0.count()} vectors, {n_dups} duplicates")

    # 2. persist the cell index for tomorrow (quantizer is FIXED for
    # the index's life — retraining means rebuilding)
    n = emb.count()
    k = semdedup_num_clusters(n)
    cents = kmeans_fit(
        emb.where(F.col("vec_id") % 4 == 0), "v", "vec_id", k=k, max_iter=3,
        round_centroids=6,
    )
    index = semdedup_build_index(emb, "v", "vec_id", cents)
    print(f"2. cell index: {index.count()} rows over k={k} cells")

    # 3. day-1 increment: re-encodes of existing docs (first component
    # zeroed -> cosine ~0.99 to their source)
    increment = emb.where(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 500000).alias("vec_id"),
        F.concat(
            F.array(F.lit(0.0)), F.slice(F.col("v"), 2, F.size(F.col("v")) - 1)
        ).alias("v"),
    )
    pairs, updated = semantic_dedup_incremental(
        index, increment, "v", "vec_id", cents, threshold=0.9
    )
    n_pairs = pairs.count()
    print(
        f"3. day-1 probe: {increment.count()} new vectors -> {n_pairs} "
        f"near-dup pairs against the index; updated index {updated.count()} rows"
    )

    # 4. lexical pass over day-1 documents with the duplication-aware cap
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    shingles = doc_shingles(docs, "doc_id", "text", n=3)
    lex_pairs = exact_jaccard_pairs(
        shingles, "doc_id", threshold=0.8, max_doc_freq="auto"
    ).count()
    drops = hot_gram_drop_stats(shingles, "doc_id", max_doc_freq=50)
    print(
        f"4. lexical near-dup (auto df-cap): {lex_pairs} pairs; a fixed "
        f"cap of 50 would have dropped {drops['n_hot_dropped']} hot grams"
    )
    return {
        "day0_dups": n_dups,
        "incremental_pairs": n_pairs,
        "lexical_pairs": lex_pairs,
    }


if __name__ == "__main__":
    from ds_caselaw_ingester_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark("incremental-dedup-demo"), sf)
