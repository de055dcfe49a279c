"""The local correctness gate: every registered query must hash-match its
DuckDB oracle at sf0.001 (fast; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from ds_caselaw_ingester_spark.plans.oracle_check import check_query
from ds_caselaw_ingester_spark.plans.registry import all_specs


def _specs():
    return sorted(all_specs().values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_query_matches_oracle(spark, sf_dir, spec):
    res = check_query(spark, sf_dir, spec.name, spec.fn, spec.oracle)
    assert res.ok, f"{spec.name}: {res.detail}"
    assert res.spark_rows > 0, f"{spec.name}: empty result (weak test)"


def test_unregistered_ivf_matches_oracle(spark, sf_dir):
    """ann_ivf_topk gave up its registry slot (its computation is a strict
    subset of ann_ivf_trained_topk's) but keeps the same oracle gate here
    so the fixed-centroid path cannot silently rot."""
    from ds_caselaw_ingester_spark.plans.queries_similarity import (
        ANN_IVF_ORACLE,
        q_ann_ivf_topk,
    )

    res = check_query(spark, sf_dir, "ann_ivf_topk", q_ann_ivf_topk, ANN_IVF_ORACLE)
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_unregistered_distinct_agg_matches_oracle(spark, sf_dir):
    """distinct_supplier_stats gave up its registry slot (the
    mixed-distinct aggregation shape stays registry-covered by
    events_distinct_users_salted and three further ext:agg rows) but
    keeps the same oracle gate here."""
    from ds_caselaw_ingester_spark.plans.queries_relational import (
        DISTINCT_AGG_ORACLE,
        q_distinct_supplier_stats,
    )

    res = check_query(
        spark, sf_dir, "distinct_supplier_stats", q_distinct_supplier_stats,
        DISTINCT_AGG_ORACLE,
    )
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_unregistered_tar_listing_matches_oracle(spark, sf_dir):
    """tar_member_listing gave up its registry slot (S7/S8 are a strict
    subset of tar_pipeline's coverage) but keeps the same oracle gate
    here so the binaryFile -> tarfile round-trip cannot silently rot."""
    from ds_caselaw_ingester_spark.plans.queries_tar import (
        TAR_MEMBER_LISTING_ORACLE,
        q_tar_member_listing,
    )

    res = check_query(
        spark, sf_dir, "tar_member_listing", q_tar_member_listing,
        TAR_MEMBER_LISTING_ORACLE,
    )
    assert res.ok, res.detail
    assert res.spark_rows > 0


def test_unregistered_bm25_matches_oracle(spark, sf_dir):
    """bm25_search is pytest-gated (registry at its 50-row cap): lexical
    top-k retrieval must hash-match the DuckDB oracle, micro-rounded
    per-term scores summed as BIGINT for order-stable float parity."""
    from ds_caselaw_ingester_spark.plans.queries_text import (
        bm25_search_oracle,
        q_bm25_search,
    )

    res = check_query(
        spark, sf_dir, "bm25_search", q_bm25_search, bm25_search_oracle()
    )
    assert res.ok, res.detail
    assert res.spark_rows > 0
