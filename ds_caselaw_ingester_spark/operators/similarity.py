"""Similarity search over embedding columns (array<float>).

Two paths, as a production ANN stack would ship:
- **Brute-force cosine top-k** (the exact baseline): candidates × queries
  with the small query set broadcast; per-row dot products via
  zip_with + aggregate (a sequential fold — deterministic summation
  order, which the oracle check relies on); top-k by row_number window.
  At 100 TB the candidate side streams through executors once — no
  shuffle of the big side at all until the final per-query top-k
  (k rows per partition -> tiny).
- **LSH bucketing** (the scale path): deterministic random hyperplanes
  derived from md5(plane, dim) signs; vectors hash to a bucket string;
  queries only compare within their bucket -> candidate set shrinks
  ~2^planes-fold. Recall/latency tradeoff is the number of planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in array order (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine. queries: (q_id, qv); candidates: (c_id, cv).

    Ranking happens on the ROUNDED cosine with c_id as tie-break, so the
    selected set is deterministic and engine-portable.
    """
    from pyspark.sql import Window

    scored = (
        candidates.join(F.broadcast(queries))
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hyperplane_sign(plane: Column, dim: Column) -> Column:
    """Deterministic ±1 from md5(plane || '_' || dim) — the engine-portable
    substitute for a seeded RNG hyperplane matrix."""
    first_hex = F.substring(F.md5(F.concat(plane.cast("string"), F.lit("_"), dim.cast("string"))), 1, 1)
    return F.when(first_hex.isin(*HEX_HIGH), F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column, num_planes: int = 8) -> Column:
    """Concatenated sign bits of <vec, plane_p> for p in 0..num_planes-1.
    Each projection is a sequential fold over dimensions."""
    def _merge_for(p: int):
        def _merge(acc: Column, i: Column) -> Column:
            return acc + F.element_at(vec, i).cast("double") * hyperplane_sign(F.lit(p), i)

        return _merge

    bits = []
    for p in range(num_planes):
        proj = F.aggregate(F.sequence(F.lit(1), F.size(vec)), F.lit(0.0), _merge_for(p))
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. The bucket equi-join replaces the cross join — at scale this
    is the difference between O(n·q) and O(n·q / 2^planes)."""
    from pyspark.sql import Window

    # bucket computation is a wide codegen expression (planes × dims fold);
    # persist the bucketed candidates so the join probe doesn't recompute it
    qb = queries.withColumn("bucket", lsh_bucket(F.col("qv"), num_planes))
    cb = candidates.withColumn("bucket", lsh_bucket(F.col("cv"), num_planes)).persist()
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
