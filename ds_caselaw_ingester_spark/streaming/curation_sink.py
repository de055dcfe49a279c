"""Streaming corpus curation: run the incremental curation pipeline
(operators/curation.py curate_increment) per micro-batch, maintaining
the LSH band index as an EPOCH-PARTITIONED append-only log.

The batch composite (curate_corpus) recomputes the whole corpus; the
incremental API (curate_increment) curates a daily increment against a
maintained index but leaves persistence to the caller. This sink closes
the loop for a document STREAM: each micro-batch is gated, near-dup-
deduplicated against everything already indexed, chunked, and its band
rows appended — so a training corpus grows continuously with duplicate
decisions made at arrival time, never via a corpus-sized recompute.

Layout — both outputs are keyed by the micro-batch epoch:

    <index_path>/epoch=<n>/   band rows (id, band, band_key) of ALL
                              gated docs in epoch n (kept AND dropped —
                              curate_increment's delta contract: a
                              later doc may near-dup one that keep-one
                              dropped, and a recompute would still
                              connect them transitively)
    <chunks_path>/epoch=<n>/  curated chunks of epoch n's KEEPERS

Why epoch partitioning does all the crash/replay work here (no rename
swap, unlike the SemDeDup/SCD sinks): those sinks maintain MUTABLE
state (replace semantics, history rewrites) so a batch must atomically
supersede rows in place. This index is APPEND-ONLY by construction —
curate_increment's monotone-id precondition guarantees an id is
indexed at most once — so the only replay hazard is double-append, and
epoch keying removes it: a replayed batch overwrites ITS OWN epoch
directory with identical (deterministic) content, and its probe reads
only `epoch < epoch_id` partitions, which is exactly the pre-batch
index whether or not the crashed attempt got as far as writing
epoch=<n>. Every crash point therefore converges without a recovery
scan. The epoch filter is partition-pruned (directory names, no data
read), and the probe itself is the band-key equi-join whose increment
side is micro-batch-sized — AQE broadcasts it, so the index is never
shuffled per epoch.

Write amplification per epoch: O(increment) — the two epoch
directories. The index READ is O(index) bytes in the worst case but
column-pruned to three narrow columns, and at rest the log compacts
offline (compact_index_epochs below) to bound file counts; compaction
folds epochs < N into one directory whose epoch value stays < N, so
in-flight probes and future epochs see the identical row set.

Reference analogy: the reference ingests documents one SQS message at
a time against an always-up-to-date store (ingester.py:459-483,
perform_ingest); this sink is that arrival-time semantics for the
curation composite, with the band index playing the store's role.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.compaction import (
    recover_buckets,
    swap_partition_dirs,
)
from ds_caselaw_ingester_spark.operators.curation import (
    curate_increment,
    curation_band_index,
)

EPOCH_COL = "epoch"


def _local(path: str) -> str:
    return path[len("file:") :] if path.startswith("file:") else path


def _prior_index(
    batch: DataFrame,
    index_path: str,
    epoch_id: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """The band index as of BEFORE this epoch: union of epoch=<k> for
    k < epoch_id. Partition-pruned — the filter binds to the directory
    name, never reading later (or this epoch's own half-written crashed)
    partitions. Returns an empty, correctly-typed frame when nothing is
    indexed yet (first epoch), derived from the banding pipeline over
    the batch's OWN (emptied) frame so the id type cannot drift from
    what curate_increment probes."""
    local = _local(index_path)
    # heal a crashed compaction swap before partition discovery: an
    # `epoch=<t>.old` leftover would otherwise surface as a bogus
    # partition VALUE ('<t>.old') and break the int epoch filter
    recover_buckets(local, prefix=f"{EPOCH_COL}=")
    has_any = os.path.isdir(local) and any(
        e.startswith(f"{EPOCH_COL}=") for e in os.listdir(local)
    )
    if not has_any:
        return curation_band_index(
            batch.select(id_col, text_col).limit(0), id_col, text_col
        )
    return (
        batch.sparkSession.read.option("basePath", index_path)
        .parquet(index_path)
        .where(F.col(EPOCH_COL) < F.lit(epoch_id))
        .drop(EPOCH_COL)
    )


def apply_curation_batch(
    batch: DataFrame,
    index_path: str,
    chunks_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
    min_alpha_ratio: float = 0.5,
    chunk_tokens: int = 128,
    overlap: int = 16,
    epoch_id: int = 0,
) -> None:
    """One micro-batch: curate `batch` against every earlier epoch's
    band rows, overwrite this epoch's chunks and index-delta
    directories. Empty batches are a no-op (no empty epoch dirs — a
    rate-limited stream would otherwise litter the index with
    thousands of zero-row partitions).

    Gate parameters MUST stay constant for the life of the stream —
    the index holds band rows of docs gated under them, and
    curate_increment's recompute-equivalence contract compares keep
    decisions made under ONE gate (same rule as the SemDeDup sink's
    fixed quantizer). Ids must be monotone across epochs (checked by
    curate_increment; violations raise rather than silently diverging
    from recompute semantics)."""
    if batch.isEmpty():
        return
    index = _prior_index(batch, index_path, epoch_id, id_col, text_col)
    chunks, delta = curate_increment(
        batch,
        index,
        id_col=id_col,
        text_col=text_col,
        min_tokens=min_tokens,
        min_alpha_ratio=min_alpha_ratio,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
    )
    # chunks first, delta last: the delta directory's presence is what
    # the NEXT epoch's probe consumes, so it lands only after the
    # epoch's user-facing output is complete. Either crash order
    # converges on replay (both writes are epoch-keyed overwrites of
    # deterministic content); this ordering just keeps a half-finished
    # epoch invisible to the index readers.
    chunks.write.mode("overwrite").parquet(
        os.path.join(chunks_path, f"{EPOCH_COL}={epoch_id}")
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(index_path, f"{EPOCH_COL}={epoch_id}")
    )


def compact_index_epochs(spark, index_path: str, upto_epoch: int) -> int:
    """Offline maintenance: fold every epoch < upto_epoch into ONE
    directory, `epoch=<upto_epoch - 1>`. Row-set-preserving by
    construction, and because the folded rows keep an epoch value
    strictly below every future epoch id, any probe filtering
    `epoch < current` sees the identical index before and after.
    Returns the number of source epoch directories folded (0 = nothing
    to do; a single already-compacted directory is left alone).

    Crash-safe via the shared touched-partition protocol
    (operators/compaction.py): the folded rows materialize into a tmp
    layout, swap_partition_dirs renames the target directory with an
    `.old` fallback (recover_buckets at the next batch's _prior_index
    heals any crash point inside the swap), and only then are the
    now-redundant source directories removed — a crash between
    removals leaves duplicate band ROWS (an id × band appearing in two
    epoch dirs), which the probe join tolerates (pair candidates are
    distinct-ed downstream) and the next compaction run heals. Run it
    from the maintenance cadence, not the hot path (it reads O(index)
    like any compaction)."""
    local = _local(index_path)
    if not os.path.isdir(local):
        return 0
    recover_buckets(local, prefix=f"{EPOCH_COL}=")
    src = sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(local)
        if e.startswith(f"{EPOCH_COL}=")
        and e.split("=", 1)[1].lstrip("-").isdigit()
        and int(e.split("=", 1)[1]) < upto_epoch
    )
    if len(src) <= 1:
        return 0
    target = upto_epoch - 1
    paths = [os.path.join(index_path, f"{EPOCH_COL}={e}") for e in src]
    # distinct: band rows are unique per (id, band) in a clean log, but
    # a crash after a previous swap-and-before-source-removal leaves
    # the folded rows in two dirs — without the distinct, re-compacting
    # would bake those duplicates into the new target forever
    folded = spark.read.parquet(*paths).distinct()
    tmp = local + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.write.mode("overwrite").parquet(
        os.path.join("file:" + tmp, f"{EPOCH_COL}={target}")
    )
    swap_partition_dirs(local, tmp, [target], EPOCH_COL)
    for e in src:
        if e != target:
            shutil.rmtree(
                os.path.join(local, f"{EPOCH_COL}={e}"), ignore_errors=True
            )
    return len(src)


def run_curation_stream(
    docs: DataFrame,
    index_path: str,
    chunks_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
    min_alpha_ratio: float = 0.5,
    chunk_tokens: int = 128,
    overlap: int = 16,
):
    """Materialize a document stream as a continuously-curated chunk
    log plus the maintained band index."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        apply_curation_batch(
            batch_df,
            index_path,
            chunks_path,
            id_col=id_col,
            text_col=text_col,
            min_tokens=min_tokens,
            min_alpha_ratio=min_alpha_ratio,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            epoch_id=epoch_id,
        )

    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
