"""End-to-end data selection + trainer handoff:

    documents --curate (gates + dedup + DSIR target selection)-->
    chunks --deterministic shuffled shards--> _manifest.json --verify

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
    # target = "more like these": here a deterministic sample standing in
    # for a curated seed set / benchmark train split
    target = docs.where("doc_id % 97 = 0")

    chunks = curate_corpus(
        docs,
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
        f"{manifest['num_shards']} verified shards under {out_dir}"
    )


if __name__ == "__main__":
    main()
