"""Streaming semantic dedup: maintain a persisted SemDeDup cell index
from an embedding stream and emit near-duplicate pairs per micro-batch.

The batch operator (operators/semdedup.py semantic_dedup) re-clusters
the whole corpus; a streaming corpus needs duplicate decisions as
embeddings ARRIVE, probed against everything already indexed.
Composition, all from parts this engine already tests:

- the per-batch work is `semantic_dedup_incremental` — assignment of
  only the increment (map-side argmax, centroids as plan literals),
  new-vs-index probe via the cell equi-join, replace semantics for
  re-ingested ids;
- the index is a parquet directory swapped with the same
  write-tmp / rename / recover protocol as the upsert and SCD2 sinks
  (`recover_swap`, exclusive=True: this checkpointed sink is the sole
  writer), so a crash at any point leaves either the old or the new
  index intact, never neither;
- pairs append to a separate directory per epoch — an append-only
  decision log downstream consumers (connected components, keep-one)
  fold at their own cadence, exactly the batch pipeline's
  pairs-then-components split.

The quantizer is FIXED for the life of the stream: cells are only
comparable under one centroid set. Retraining it is an offline event —
rebuild the index with semdedup_build_index and restart the stream
(k-means-sized work, amortized over the corpus it indexes).

Redelivery: checkpointed offsets make batch replay the only
double-apply risk; replaying a batch converges because replace
semantics re-supersede the same ids and the pair epoch directory is
overwritten per epoch_id, not appended blindly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ds_caselaw_ingester_spark.operators.compaction import (
    commit_swap,
    read_parquet_or_none,
    recover_swap,
)
from ds_caselaw_ingester_spark.operators.semdedup import (
    semantic_dedup_incremental,
    semdedup_build_index,
)


def apply_semdedup_batch(
    batch: DataFrame,
    index_path: str,
    pairs_path: str,
    vec_col: str,
    id_col: str,
    centroids: "list",
    threshold: float = 0.95,
    epoch_id: int = 0,
) -> None:
    """One micro-batch: probe `batch` against the index at `index_path`,
    write this epoch's pairs, swap in the updated index. Empty batches
    are a no-op. First batch bootstraps the index."""
    spark = batch.sparkSession
    local = (
        index_path[len("file:") :] if index_path.startswith("file:") else index_path
    )
    recover_swap(local, local + ".tmp", local + ".old", exclusive=True)
    if batch.isEmpty():
        return
    index = read_parquet_or_none(spark, index_path)
    if index is None:
        updated = semdedup_build_index(batch, vec_col, id_col, centroids)
        # in-batch pairs still matter on bootstrap: probe against an
        # empty index of the same schema
        empty = updated.limit(0)
        pairs, updated = semantic_dedup_incremental(
            empty, batch, vec_col, id_col, centroids, threshold=threshold
        )
    else:
        pairs, updated = semantic_dedup_incremental(
            index, batch, vec_col, id_col, centroids, threshold=threshold
        )
    # epoch-keyed pair output: replaying the same epoch overwrites its
    # own directory (idempotent) instead of double-appending
    pairs.write.mode("overwrite").parquet(
        os.path.join(pairs_path, f"epoch={epoch_id}")
    )
    updated.write.mode("overwrite").parquet(local + ".tmp")
    commit_swap(local)


def run_semdedup_stream(
    embeddings: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    vec_col: str,
    id_col: str,
    centroids: "list",
    threshold: float = 0.95,
):
    """Materialize the embedding stream as a maintained cell index plus
    an append-only near-dup pair log."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        apply_semdedup_batch(
            batch_df,
            index_path,
            pairs_path,
            vec_col,
            id_col,
            centroids,
            threshold=threshold,
            epoch_id=epoch_id,
        )

    return (
        embeddings.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
