"""Operator-level SemDeDup checks (the replay-parity + planted-recall
gate lives in tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.semdedup import semantic_dedup
from ds_caselaw_ingester_spark.session import ensure_oracle_safe
from ds_caselaw_ingester_spark.sources.catalog import table


def _corpus(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _centroids(corpus):
    return [
        {"centroid_id": i, "cvec": [float(x) for x in r["v"]]}
        for i, r in enumerate(
            corpus.where(F.col("vec_id") % 7 == 3).orderBy("vec_id").limit(8).collect()
        )
    ]


def test_impossible_threshold_yields_all_singletons(spark, sf_dir):
    """threshold > 1 can never pair: every vector is its own component,
    its own keep_id, and not a duplicate (the unpaired-majority path a
    real corpus exercises for ~99% of rows)."""
    ensure_oracle_safe(spark)
    corpus = _corpus(spark, sf_dir)
    out = semantic_dedup(
        corpus, "v", "vec_id", _centroids(corpus), threshold=1.01
    ).collect()
    assert out
    for r in out:
        assert r["component"] == r["vec_id"]
        assert r["keep_id"] == r["vec_id"]
        assert not r["is_duplicate"]


def test_exact_copies_collapse_to_one_keeper(spark, sf_dir):
    """Exact copies (cosine 1.0) always share a cell and a component;
    exactly one member of each copy-group is kept, and the keeper is the
    lowest id (identical centroid_cos -> id tie-break)."""
    ensure_oracle_safe(spark)
    base = _corpus(spark, sf_dir).where(F.col("vec_id") < 20)
    copies = base.select((F.col("vec_id") + 1000).alias("vec_id"), "v")
    corpus = base.unionAll(copies)
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(
            corpus, "v", "vec_id", _centroids(base), threshold=0.999
        ).collect()
    }
    for v in range(20):
        a, b = rows[v], rows[v + 1000]
        assert a["component"] == b["component"]
        group = [r for r in rows.values() if r["component"] == a["component"]]
        keepers = [r for r in group if not r["is_duplicate"]]
        assert len(keepers) == 1
        # ids only break ties among IDENTICAL centroid_cos members — the
        # exact copy pair always ranks the lower id first
        if a["centroid_cos"] == b["centroid_cos"]:
            assert not a["is_duplicate"] or any(
                m["centroid_cos"] < a["centroid_cos"] for m in group
            )
