"""Int8 scalar quantization for embedding columns — the storage/IO
scale path for vector search.

A float64 embedding column is 8 bytes/dim; at 100 TB the embedding
table's scan and shuffle volume, not the dot-product flops, is the ANN
bottleneck. Symmetric per-vector int8 quantization stores 1 byte/dim
plus one float scale (8.1x smaller), and cosine over the codes is
algebraically the float cosine of the RECONSTRUCTED vectors — the
per-vector scale cancels in the cosine, so scoring runs directly on the
codes with no dequantize pass:

    cos(q, scale*codes) = dot(q, codes) / (|q| * |codes|)

Expressions only (transform / zip_with / aggregate): quantization and
scoring are map-side projections; the broadcast top-k shape matches
cosine_topk so the quantized path is a drop-in swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.similarity import dot_product, l2_norm


def quantize_int8(vec: Column) -> Column:
    """struct(codes array<tinyint>, scale double): symmetric per-vector
    quantization, codes = round(v / scale) with scale = max|v| / 127.
    The all-zero vector gets scale 0 and all-zero codes (reconstructs
    exactly)."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    safe = F.greatest(scale, F.lit(1e-300))
    codes = F.transform(
        vec, lambda x: F.round(x / safe).cast("tinyint")
    )
    return F.struct(codes.alias("codes"), scale.alias("scale"))


def dequantize(q: Column) -> Column:
    """array<double> reconstruction: codes * scale."""
    return F.transform(q["codes"], lambda c: c.cast("double") * q["scale"])


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, codes, scale) — the stored form of an embedding table."""
    qz = quantize_int8(F.col(vec_col))
    return df.select(
        F.col(id_col), qz["codes"].alias("codes"), qz["scale"].alias("scale")
    )


def cosine_topk_int8(
    queries: DataFrame,
    quantized: DataFrame,
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k by cosine against int8-quantized candidates. queries:
    (q_id, qv float vectors); quantized: (c_id, codes, scale) from
    quantize_embeddings. The scale cancels in the cosine, so scoring is
    dot/norm over the int codes cast to double — no reconstruction
    materialized. Same deterministic rounded-cosine ranking contract as
    cosine_topk."""
    from pyspark.sql import Window

    # guard BOTH norms: a zero-norm query divides by zero just like a
    # zero-norm candidate, and under ANSI mode that aborts the job
    # (verified) instead of skipping the degenerate row
    qn = queries.withColumn("qv_norm", l2_norm(F.col("qv"))).where(
        F.col("qv_norm") > 0
    )
    cn = quantized.select(
        "c_id",
        F.transform("codes", lambda c: c.cast("double")).alias("cv"),
    ).withColumn("cv_norm", l2_norm(F.col("cv")))
    scored = (
        cn.where(F.col("cv_norm") > 0)
        .join(F.broadcast(qn))
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                dot_product(F.col("qv"), F.col("cv"))
                / (F.col("qv_norm") * F.col("cv_norm")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
