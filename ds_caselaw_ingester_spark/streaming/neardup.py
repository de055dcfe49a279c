"""Streaming near-duplicate detection: MinHash-LSH bucket state over a
document stream.

The batch detector (operators/dedup.py) buckets the WHOLE corpus at
once; a streaming corpus needs pairs as documents ARRIVE, including
against documents from earlier triggers. Composition:

- The signature is computed MAP-SIDE per document (array fold over the
  gram array, same affine permutations/modulus as the batch operator) —
  deliberately NOT the batch groupBy-min plan, because a streaming query
  allows only one stateful operator and the bucket state below is the
  one that matters. The array fold is slower per row than the batch
  aggregation (interpreted higher-order functions), which is the right
  trade only here: micro-batches are small and it keeps the plan
  single-stateful. Identical VALUES — the batch-equivalence test pins
  it.
- One `applyInPandasWithState` keyed by (band, band_key): state is the
  bucket's member ids, capped (a hot bucket is exactly what the batch
  df-cap drops — unbounded state is the streaming analog of the O(df²)
  hot-shingle blowup), and expired after an idle timeout so state size
  tracks LIVE buckets, not corpus history.
- Output: append-mode candidate pairs (doc_a < doc_b, with the band
  that matched). A pair colliding in several bands is emitted per band
  — downstream dedups ids exactly like the batch pipeline dedups before
  scoring (one distinct on bounded pair rows, never on vectors).

Sizing note (why this sink has no "auto" bootstrap like the SemDeDup
sink's quantizer): its knobs are RECALL parameters, not occupancy
parameters. num_seeds/rows_per_band set the LSH S-curve
(plan_lsh_bands picks them from a similarity threshold) and are
corpus-size-independent; the state/occupancy control is `max_bucket`,
which caps EVERY bucket regardless of corpus growth — a stream that
grows 10x degrades gracefully (hot buckets stop admitting members, the
exact behavior the batch df-cap has) instead of cliffing. The default
64 is LSH_TARGET_OCCUPANCY, the same constant the batch auto-sizing
targets.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ds_caselaw_ingester_spark.operators.dedup import MINHASH_MODULUS
from ds_caselaw_ingester_spark.operators.textstats import tokens, word_ngrams

PAIR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType(), False),
        T.StructField("doc_b", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
    ]
)

BUCKET_STATE_SCHEMA = T.StructType(
    [T.StructField("members", T.ArrayType(T.LongType()))]
)


def gram_hash_pairs(text: Column, n: int = 3) -> Column:
    """array<struct<a,b>> — one md5 per gram, split into the two affine
    coefficients. Meant to be MATERIALISED as a real column before the
    per-seed folds read it: higher-order-function expressions evaluate
    interpreted with no cross-expression subexpression elimination, so
    16 folds over this expression inline would recompute the digest 16×
    per gram; 16 folds over the materialised column pay the digest
    once."""
    m = MINHASH_MODULUS
    tok = tokens(text)
    grams = F.when(F.size(tok) >= n, word_ngrams(tok, n)).otherwise(
        F.array().cast("array<string>")
    )
    digests = F.transform(grams, lambda g: F.md5(g))
    return F.transform(
        digests,
        lambda d: F.struct(
            (F.conv(F.substring(d, 1, 13), 16, 10).cast("long") % m).alias("a"),
            (F.conv(F.substring(d, 14, 13), 16, 10).cast("long") % m).alias("b"),
        ),
    )


def band_keys_from_pairs(
    ab: Column, num_seeds: int = 16, rows_per_band: int = 4
) -> Column:
    """Array of (band, band_key) structs from a MATERIALISED hash-pair
    column — value-identical to the batch minhash_signatures + lsh_bands
    composition (same single-digest affine permutations, same band md5).
    Empty pair array (doc too short to shingle) -> no bands."""
    m = MINHASH_MODULUS

    def mh(i: int) -> Column:
        return F.array_min(F.transform(ab, lambda x: (x["a"] + i * x["b"]) % m))

    n_bands = num_seeds // rows_per_band
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        mh(i).cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return F.when(F.size(ab) > 0, F.array(*bands)).otherwise(
        F.array().cast(
            "array<struct<band:int,band_key:string>>"
        )
    )


def _make_bucket_fn(max_bucket: int, timeout_ms: int):
    def _bucket_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in PAIR_OUTPUT_SCHEMA.fields])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        (members,) = state.get if state.exists else ([],)
        members = list(members)
        new_ids = sorted(set(int(x) for x in rows["doc_id"]) - set(members))
        out = []
        for i, did in enumerate(new_ids):
            for other in members + new_ids[:i]:
                a, b = (other, did) if other < did else (did, other)
                out.append((a, b, band))
        # cap state, keep-first (the earliest members are the canonical
        # collision partners; a bucket past the cap is a hot bucket)
        members = (members + new_ids)[:max_bucket]
        state.update((members,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(out, columns=[f.name for f in PAIR_OUTPUT_SCHEMA.fields])

    return _bucket_fn


def neardup_pairs_stream(
    docs: DataFrame,
    n: int = 3,
    num_seeds: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 64,
    timeout_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """docs: streaming DataFrame with (doc_id long, text string).
    Returns append-mode candidate near-dup pairs (doc_a < doc_b, band),
    including pairs whose members arrived in DIFFERENT triggers."""
    keyed = (
        docs.select(
            "doc_id", gram_hash_pairs(F.col("text"), n).alias("_ab")
        )
        .select(
            "doc_id",
            F.explode(
                band_keys_from_pairs(F.col("_ab"), num_seeds, rows_per_band)
            ).alias("bk"),
        )
        .select(
            "doc_id",
            F.col("bk.band").alias("band"),
            F.col("bk.band_key").alias("band_key"),
        )
    )
    return keyed.groupBy("band", "band_key").applyInPandasWithState(
        _make_bucket_fn(max_bucket, timeout_ms),
        outputStructType=PAIR_OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
