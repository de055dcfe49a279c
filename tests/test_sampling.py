"""Deterministic sampling: DuckDB-oracle replay of the hash decision,
statistical sanity of the rates, rerun/partitioning invariance, and the
per-group top-k contract."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.sampling import (
    group_topk,
    hash_sample,
    stratified_hash_sample,
)
from ds_caselaw_ingester_spark.sources.catalog import table

SF = "/root/testdata/sf0.001"


def test_hash_sample_matches_duckdb_oracle(spark):
    docs = table(spark, SF, "documents").select("doc_id")
    got = {r.doc_id for r in hash_sample(docs, "doc_id", 0.25).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = {
        row[0]
        for row in con.execute(
            "SELECT doc_id FROM documents "
            "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT"
            " / 16.0^13 < 0.25"
        ).fetchall()
    }
    assert got == want
    n_total = docs.count()
    # md5 is uniform: the realized rate lands near p
    assert 0.15 * n_total < len(got) < 0.35 * n_total


def test_hash_sample_is_partitioning_invariant(spark):
    docs = table(spark, SF, "documents").select("doc_id")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17, "doc_id"), "doc_id", 0.5).collect()
    }
    assert a == b  # df.sample() cannot promise this; the hash gate must


def test_stratified_rates_and_allowlist(spark):
    ev = table(spark, SF, "events").select("event_id", "event_type")
    rates = {"click": 0.1, "purchase": 1.0}
    out = stratified_hash_sample(ev, "event_id", "event_type", rates)
    got = {r["event_type"]: r["n"] for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) <= {"click", "purchase"}  # allowlist: other strata dropped
    assert got["purchase"] == totals["purchase"]  # rate 1.0 keeps everything
    assert 0.03 * totals["click"] < got.get("click", 0) < 0.2 * totals["click"]


def test_group_topk_exact_per_group(spark):
    rows = [
        ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 30.0),
        ("b", 5, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    got = {(r.g, r.id) for r in group_topk(df, "g", "score", "id", k=2).collect()}
    # score ties (30.0 at ids 2 and 4) break by ascending id -> 2 wins rank 1
    assert got == {("a", 2), ("a", 4), ("b", 5)}
