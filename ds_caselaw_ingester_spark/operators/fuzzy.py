"""Edit-distance (fuzzy) join — SymSpell deletion-neighborhood blocking.

The naive fuzzy join is a cross product with a levenshtein post-filter:
O(|L| x |R|) dynamic programs, unusable at scale (231 s of a 319 s sf1
suite before this operator existed). The scalable exact composition:

1. collapse both sides to DISTINCT strings (duplicate strings multiply
   pair work quadratically if matched per-row, linearly if expanded
   after matching);
2. explode each distinct string's <=k-deletion variant set. SymSpell
   property: ed(a,b) <= k  =>  some string reachable by <=k deletions
   from a EQUALS one reachable by <=k deletions from b (every edit is
   covered by deleting the affected position on the appropriate side);
3. equi-join the variant sets (hash join, never a nested loop), guard
   with |len(a) - len(b)| <= k (implied by ed <= k);
4. run the EXACT levenshtein only on the candidate pairs.

Blocking only generates candidates — the DP decides, so the result is
exactly the cross product's. Fan-out is ~len^2/2 variants per distinct
string, the right trade for the short strings edit distance is used on
(for long strings prefer q-gram count filtering, whose lower bound
max(len)-q+1-qk starts pruning once len >> q(k+1)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _del1(s: Column) -> Column:
    """All strings obtained by deleting exactly one char of s."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1), F.substring(s, i + 1, F.length(s))
        ),
    )


def deletion_variants(s: Column, k: int = 2) -> Column:
    """Distinct set of strings reachable from s by 0..k deletions."""
    if k not in (1, 2):
        raise ValueError("deletion_variants supports k in {1, 2}")
    d1 = _del1(s)
    parts = [F.array(s), d1]
    if k == 2:
        parts.append(F.flatten(F.transform(d1, _del1)))
    return F.array_distinct(F.concat(*parts))


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Exact fuzzy join on DISTINCT string values: returns
    (left_col, right_col, dist) for every distinct string pair with
    levenshtein <= max_dist. Callers expand back to row level by joining
    on the string columns (see queries_relational.q_fuzzy_part_match).

    The smaller side's variants are broadcast; flip the arguments so
    `left` is the probe/dirty side when it is the small one.
    """
    dl = left.select(left_col).distinct()
    dr = right.select(right_col).distinct()
    lv = dl.select(
        left_col,
        F.length(left_col).alias("_llen"),
        F.explode(deletion_variants(F.col(left_col), max_dist)).alias("_variant"),
    )
    rv = dr.select(
        right_col,
        F.length(right_col).alias("_rlen"),
        F.explode(deletion_variants(F.col(right_col), max_dist)).alias("_variant"),
    )
    cand = (
        rv.join(
            F.broadcast(lv),
            (rv["_variant"] == lv["_variant"])
            & (F.abs(F.col("_llen") - F.col("_rlen")) <= max_dist),
        )
        .select(left_col, right_col)
        .distinct()
    )
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return cand.where(dist <= max_dist).select(
        left_col, right_col, dist.alias("dist")
    )
