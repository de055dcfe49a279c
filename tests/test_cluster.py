"""Connected components / canonical dedup assignment: randomized
equivalence against a pure-Python union-find, plus the end-to-end
pairs->clusters path on the planted near-dup corpus."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.cluster import (
    canonical_assignment,
    connected_components,
)


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # relabel every node to the min of its component
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min([r] + members) for r, members in comp.items() for n in members}


@pytest.mark.parametrize("seed", [7, 40, 1234])
def test_components_match_union_find(spark, seed):
    rng = random.Random(seed)
    n_nodes, n_edges = 200, 260  # several multi-node components + chains
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find_components(edges)

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == expected


def test_long_chain_converges_and_labels_min(spark):
    """A 40-node path graph is the worst diameter case for label
    propagation; min-label doubling must still converge well inside
    max_iter and label every node with the chain head."""
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(41)}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "doc_a long, doc_b long")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
    # the raise path must restore the loop-scoped conf too (finally)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_canonical_assignment_end_to_end(spark, sf_dir):
    """documents + planted near-dup pairs -> every planted copy marked
    duplicate of its source; untouched docs are singleton canonicals."""
    from ds_caselaw_ingester_spark.plans.registry import all_specs

    # keep real near-dups only: LSH banding admits false-positive
    # candidates whose signature agreement is low — exactly what a
    # production dedup would threshold away before clustering
    pairs = (
        all_specs()["minhash_lsh_pairs"]
        .fn(spark, sf_dir)
        .where(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    docs = spark.createDataFrame(
        [(i,) for i in range(0, 100)] + [(i + 1000000000,) for i in range(0, 100, 10)],
        "doc_id long",
    )
    out = {r.doc_id: r for r in canonical_assignment(docs, pairs).collect()}

    # expected assignment from an independent union-find over the SAME
    # pairs (the corpus contains organic exact duplicates beyond the
    # planted ones — e.g. identical short texts — so components are
    # computed, not assumed)
    edge_list = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    expected = _union_find_components(edge_list)
    for r in out.values():
        want = expected.get(r.doc_id, r.doc_id)  # unpaired -> singleton
        assert r.component == want, (r, want)
        assert r.is_duplicate == (want != r.doc_id)

    # and the planted copies specifically must share their source's
    # component and be marked duplicates
    for i in range(0, 100, 10):
        assert out[i + 1000000000].component == out[i].component
        assert out[i + 1000000000].is_duplicate
