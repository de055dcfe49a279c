"""End-to-end data selection + trainer handoff:

    documents --leakage-safe split (near-dup components never straddle
    train/val)--> train docs --curate (gates + dedup + DSIR target
    selection)--> chunks --deterministic shuffled shards-->
    _manifest.json --verify

Run:
    python examples/select_and_export.py [sf_dir] [out_dir]

Everything is a pure function of the input data — rerunning produces
byte-identical shards and an identical manifest, which is the property
that makes a training corpus auditable."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_caselaw_ingester_spark.operators.curation import curate_corpus  # noqa: E402
from ds_caselaw_ingester_spark.operators.export import (  # noqa: E402
    export_shuffled,
    verify_export,
    write_manifest,
)
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/select_and_export"
    spark = get_spark("select-and-export")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # hold out an eval split FIRST, keyed by near-dup COMPONENT so a
    # duplicated document can never sit in train with its copy in val —
    # the split an eval set scored for memorization would invalidate
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.cluster import leakage_safe_split
    from ds_caselaw_ingester_spark.plans.registry import all_specs

    pairs = (
        all_specs()["minhash_lsh_pairs"]
        .fn(spark, sf_dir)
        .where(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    split = leakage_safe_split(
        docs, pairs, {"train": 0.95, "val": 0.05}, salt="demo"
    )
    train_docs = docs.join(
        split.where("split = 'train'").select("doc_id"), "doc_id"
    )
    n_val = split.where("split = 'val'").count()

    # target = "more like these": here a deterministic sample standing in
    # for a curated seed set / benchmark train split
    target = train_docs.where("doc_id % 97 = 0")

    chunks = curate_corpus(
        train_docs,
        min_tokens=8,
        chunk_tokens=64,
        overlap=8,
        boilerplate_min_df=2,
        dsir_target=target,
        # below the survivor count on every sf the demo runs at, so the
        # selection stage actually binds instead of passing everything
        dsir_keep=100,
    )
    # shard key = (doc, chunk) so chunks of one doc scatter — adjacent
    # training rows must not correlate
    keyed = chunks.selectExpr(
        "concat(doc_id, ':', chunk_index) AS chunk_id",
        "doc_id",
        "chunk_index",
        "chunk_text",
        "n_chunk_tokens",
    )
    export_shuffled(keyed, "chunk_id", out_dir, num_shards=8)
    manifest = write_manifest(spark, out_dir)
    verify_export(spark, out_dir)
    print(
        f"exported {manifest['total_rows']} chunks into "
        f"{manifest['num_shards']} verified shards under {out_dir} "
        f"({n_val} docs held out leakage-safe for eval)"
    )


if __name__ == "__main__":
    main()
