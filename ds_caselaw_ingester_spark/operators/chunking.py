"""Document chunking: split long documents into overlapping token
windows — the step between a cleaned corpus and a trainer's fixed-length
sequence stream.

Spark-first shape: the window starts are a `sequence` over the token
array and each chunk is a `slice` + join — one generator expression per
document, exploded map-side. No shuffle, no UDF, output size governed by
(chunk_tokens, overlap), and the whole thing composes with the scrub /
dedup / quality passes as one projection pipeline over the same scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_index, chunk_text, n_chunk_tokens) with fixed-size
    token windows advancing by `chunk_tokens - overlap`. The final
    window may be shorter; windows that would start past the end are
    not emitted; empty documents yield no chunks. Chunks reuse the
    pipeline's whitespace tokenization so chunk token counts agree with
    the profile/quality operators."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap

    # let-bind the token array (the word_ngrams interpreter lesson):
    # `slice(tok, ...)` appears twice inside the per-chunk lambda, and
    # higher-order lambdas re-evaluate a non-attribute argument tree per
    # element — the tokenizer would run 2×(chunks per doc) times
    def _chunks(t: Column) -> Column:
        n = F.size(t)
        starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_index"),
                F.array_join(F.slice(t, s, chunk_tokens), " ").alias("chunk_text"),
                F.size(F.slice(t, s, chunk_tokens)).alias("n_chunk_tokens"),
            ),
        )

    chunks = F.element_at(
        F.transform(F.array(tokens(F.col(text_col))), _chunks), 1
    )
    return docs.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_index").alias("chunk_index"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )
