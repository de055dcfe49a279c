"""The max_doc_freq cap on exact n-gram Jaccard: one shingle shared by df
documents generates O(df²) in-bucket candidate pairs. The registered query
carries the cap (plans/queries_dedup.py) so a hot gram can never explode
pair generation; these tests pin the mechanics on a planted hot shingle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.dedup import doc_shingles, exact_jaccard_pairs

N_HOT = 40  # documents sharing the planted hot shingle


def _corpus(spark):
    """N_HOT otherwise-unrelated docs that all contain one common 3-gram
    ("the court finds"), plus one true near-dup pair (docs 1000/1001)."""
    rows = [
        (i, f"unique{i}a unique{i}b the court finds unique{i}c unique{i}d")
        for i in range(N_HOT)
    ]
    rows.append((1000, "alpha beta gamma delta epsilon zeta"))
    rows.append((1001, "alpha beta gamma delta epsilon eta"))
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_cap_kills_hot_shingle_pair_explosion(spark):
    shingles = doc_shingles(_corpus(spark), "doc_id", "text", n=3)
    # Low threshold so hot-gram-only pairs would survive into the output:
    # uncapped, the hot bucket alone yields C(40,2) = 780 candidate pairs.
    uncapped = exact_jaccard_pairs(shingles, "doc_id", threshold=0.01)
    capped = exact_jaccard_pairs(shingles, "doc_id", threshold=0.01, max_doc_freq=10)
    n_uncapped = uncapped.count()
    n_capped = capped.count()
    assert n_uncapped >= (N_HOT * (N_HOT - 1)) // 2, n_uncapped
    # capped: the hot bucket is dropped from pair generation entirely —
    # only the true near-dup pair remains
    assert n_capped == 1, n_capped
    pair = capped.collect()[0]
    assert (pair.doc_a, pair.doc_b) == (1000, 1001)


def test_cap_inactive_when_no_gram_exceeds_it(spark):
    """A cap above every gram's df must be a pure no-op — same rows, same
    values — so the registered query's sf0.01 oracle row (max df 9, cap
    50) covers the capped plan without changing results."""
    shingles = doc_shingles(_corpus(spark), "doc_id", "text", n=3)
    base = {tuple(r) for r in exact_jaccard_pairs(shingles, "doc_id", 0.5).collect()}
    capped = {
        tuple(r)
        for r in exact_jaccard_pairs(shingles, "doc_id", 0.5, max_doc_freq=10_000).collect()
    }
    assert base == capped


def test_registered_query_carries_the_cap(spark):
    """The production-shaped registered plan must filter pair generation
    on bucket size — visible as a size(...) predicate on the inverted
    index in the optimized plan."""
    from ds_caselaw_ingester_spark.plans.registry import all_specs

    df = all_specs()["ngram_jaccard_pairs"].fn(spark, "/root/testdata/sf0.001")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "size(docs" in optimized, optimized
