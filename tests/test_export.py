"""Shuffled export: lossless, shard membership and order deterministic
across runs and input partitionings, decorrelated from input order,
balanced shards."""

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
    dirs = [d for d in os.listdir(out) if d.startswith("_shard=")]
    assert len(dirs) == N_SHARDS
    # md5 prefixes are uniform: no shard more than 2x the mean row count
    counts = [
        r["n"]
        for r in back.groupBy("_shard").agg(F.count("*").alias("n")).collect()
    ]
    assert max(counts) < 2 * (sum(counts) / len(counts)), counts


def test_shard_membership_is_partitioning_invariant(spark, sf_dir):
    """The review-hardened contract: a row's shard is a pure function
    of its id (md5-prefix mod n), so shard CONTENTS — not just the
    global order — are identical however the input was partitioned
    (range-sampled cut points would not be)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def shards(df):
        out = {}
        for r in (
            shuffled_shards(df, "doc_id", N_SHARDS)
            .select("_shard", "_shuffle_key", "doc_id")
            .collect()
        ):
            out.setdefault(r["_shard"], []).append((r["_shuffle_key"], r["doc_id"]))
        return {s: rows for s, rows in out.items()}

    a = shards(docs)
    b = shards(docs.repartition(13))
    assert a == b, "shard membership and within-shard order must be invariant"
    assert set(a) == set(range(N_SHARDS))


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


def test_shards_map_one_to_one_onto_tasks(spark):
    """Review regression: hash-repartitioning the num_shards distinct
    shard ids left ~1/e of tasks empty and piled several shards onto
    the worst task (the export straggler). Range partitioning gives
    each task at most a couple of contiguous shard ids and leaves
    almost no task idle."""
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.export import shuffled_shards

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    n = 32
    parts = (
        shuffled_shards(df, "doc_id", n)
        .withColumn("_pid", F.spark_partition_id())
        .select("_pid", "_shard")
        .distinct()
        .collect()
    )
    per_task: dict = {}
    for r in parts:
        per_task.setdefault(r["_pid"], set()).add(r["_shard"])
    # no task carries a pile of shards, and almost every task has work
    assert max(len(s) for s in per_task.values()) <= 2
    assert len(per_task) >= int(n * 0.9)


def test_manifest_roundtrip_and_tamper_detection(spark, tmp_path):
    """write_manifest -> verify_export roundtrips; corrupting one shard
    (dropping a row) is detected and NAMED; the checksum replays in
    DuckDB (same 13-hex-XOR convention)."""
    import duckdb
    import pytest as _pytest

    from ds_caselaw_ingester_spark.operators.export import (
        export_shuffled,
        shard_manifest,
        verify_export,
        write_manifest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    out = str(tmp_path / "shards")
    export_shuffled(docs, "doc_id", out, num_shards=4)
    manifest = write_manifest(spark, out)
    assert manifest["num_shards"] == 4 and manifest["total_rows"] == 200
    assert verify_export(spark, out) == manifest

    # DuckDB replay of the per-shard checksum
    want = {
        s["shard"]: s["checksum"] for s in manifest["shards"]
    }
    got = dict(
        duckdb.sql(
            f"""SELECT _shard, bit_xor(('0x' || substr(_shuffle_key, 1, 13))::BIGINT)
                FROM read_parquet('{out}/_shard=*/*.parquet', hive_partitioning=1)
                GROUP BY 1"""
        ).fetchall()
    )
    assert {int(k): int(v) for k, v in got.items()} == want

    # tamper: rewrite shard 0 with one row dropped
    import glob

    shard0 = spark.read.parquet(f"{out}/_shard=0")
    keep = shard0.count() - 1
    trimmed = shard0.orderBy("_shuffle_key").limit(keep).collect()
    for f in glob.glob(f"{out}/_shard=0/*.parquet"):
        import os

        os.remove(f)
    spark.createDataFrame(trimmed, shard0.schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{out}/_shard=0")
    with _pytest.raises(ValueError, match=r"shard\(s\) \[0\]"):
        verify_export(spark, out)

    # payload-only tamper: keys, counts, min/max all preserved — only
    # content_checksum can catch it (review-found gap)
    out2 = str(tmp_path / "shards2")
    export_shuffled(docs, "doc_id", out2, num_shards=2)
    write_manifest(spark, out2)
    shard1 = spark.read.parquet(f"{out2}/_shard=1")
    from pyspark.sql import functions as F

    tampered = shard1.withColumn(
        "text",
        F.when(
            F.col("_shuffle_key")
            == shard1.orderBy("_shuffle_key").limit(1).collect()[0]["_shuffle_key"],
            F.lit("silently different payload"),
        ).otherwise(F.col("text")),
    ).collect()
    for f in glob.glob(f"{out2}/_shard=1/*.parquet"):
        os.remove(f)
    spark.createDataFrame(tampered, shard1.schema).coalesce(1).write.mode(
        "append"
    ).parquet(f"{out2}/_shard=1")
    with _pytest.raises(ValueError, match=r"shard\(s\) \[1\]"):
        verify_export(spark, out2)
