"""Shuffled export: lossless, deterministic across runs and input
partitionings, decorrelated from input order, balanced shards."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.export import export_shuffled, shuffled_shards
from ds_caselaw_ingester_spark.sources.catalog import table

N_SHARDS = 8


def test_export_is_lossless_and_balanced(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    export_shuffled(docs, "doc_id", out, N_SHARDS)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(r["doc_id"] for r in back.select("doc_id").collect()) == set(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == N_SHARDS
    # md5 keys are uniform, so range shards are balanced: no shard more
    # than 2x the mean
    sizes = sorted(os.path.getsize(os.path.join(out, f)) for f in files)
    assert sizes[-1] < 2 * (sum(sizes) / len(sizes)), sizes


def test_order_is_deterministic_and_partitioning_invariant(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    a = [
        r["doc_id"]
        for r in shuffled_shards(docs, "doc_id", N_SHARDS).select("doc_id").collect()
    ]
    b = [
        r["doc_id"]
        for r in shuffled_shards(docs.repartition(13), "doc_id", N_SHARDS)
        .select("doc_id")
        .collect()
    ]
    assert a == b, "shuffle order must not depend on input partitioning"


def test_order_is_decorrelated_from_input_order(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    ids = [
        r["doc_id"]
        for r in shuffled_shards(docs, "doc_id", N_SHARDS).select("doc_id").collect()
    ]
    n = len(ids)
    assert sorted(ids) != ids, "export must not be in id order"
    # adjacent ids in the shuffled order should look independent: the
    # mean absolute gap of a random permutation is ~n/3; id order gives 1
    gaps = [abs(ids[i + 1] - ids[i]) for i in range(n - 1)]
    assert sum(gaps) / len(gaps) > n / 6, sum(gaps) / len(gaps)
