"""Sequence packing: greedy-fill chunks into fixed token budgets — the
step between chunking and a trainer's fixed-length batches (unpacked
short sequences waste the padded tail of every training row).

Scale design: OPTIMAL bin packing is global and sequential — at corpus
scale nobody runs it. The standard distributed answer is per-partition
greedy NEXT-FIT over a deterministic order (only the currently-open
pack is considered; overflow closes it — first-fit's open-pack search
buys little on sorted same-document runs and costs a heap per
partition): each partition packs its
own chunks independently (embarrassingly parallel, one Arrow pass), and
pack ids are (partition, local) pairs so reruns on the same
partitioning are stable. Partition-local packing costs a bounded
fill-factor loss vs global (the tail pack per partition may be
underfull — at most one budget's worth of waste per partition), which
is the accepted trade in published packing pipelines.

The input should be partitioned/sorted deterministically before packing
when rerun-stability matters across partitionings — pack_sequences
repartitions by a key column and sorts within partitions itself so the
contract is self-contained.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def pack_sequences(
    chunks: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Assign every chunk row to a pack of total size <= budget.

    Returns (pack_id, <key_col>, <index_col>, <tokens_col>, pack_slot,
    pack_fill) — the three input columns keep their NAMES and TYPES
    (string keys like `uri` work; nothing is coerced to long).
    pack_fill is the pack's final token total (repeated per member row
    for self-contained downstream grouping). Chunks longer than the
    budget get a singleton pack (they must be re-chunked upstream;
    packing never drops data silently).

    Greedy next-fit over (key, index) order within each hash partition
    of the key column. The SORT runs in Spark
    (sortWithinPartitions — spillable, off-heap), and the Arrow pass
    STREAMS batches carrying only the currently-open pack across batch
    boundaries — per-task memory is one Arrow batch + one open pack,
    never the whole partition (the previous implementation
    pandas-concatenated and pandas-sorted the entire partition in
    memory, an executor OOM at the corpus scale this module targets).
    Deterministic for a given key set and partitioning."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    in_fields = {f.name: f for f in chunks.schema.fields}
    schema = T.StructType(
        [
            T.StructField("pack_id", T.StringType(), False),
            in_fields[key_col],
            in_fields[index_col],
            in_fields[tokens_col],
            T.StructField("pack_slot", T.IntegerType(), False),
            T.StructField("pack_fill", T.IntegerType(), False),
        ]
    )
    out_cols = [f.name for f in schema.fields]

    def _pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pack_n, fill, members = 0, 0, []

        def flush(out: list) -> None:
            nonlocal pack_n, fill, members
            for slot, (d, ci, nt) in enumerate(members):
                out.append((f"p{pid}-{pack_n}", d, ci, nt, slot, fill))
            pack_n += 1
            fill, members = 0, []

        for pdf in it:
            out: list = []
            for d, ci, nt in zip(pdf[key_col], pdf[index_col], pdf[tokens_col]):
                nt = int(nt)
                if members and fill + nt > budget:
                    flush(out)
                members.append((d, ci, nt))
                fill += nt
                if fill >= budget:
                    flush(out)
            if out:
                yield pd.DataFrame(out, columns=out_cols)
        if members:
            out = []
            flush(out)
            yield pd.DataFrame(out, columns=out_cols)

    keyed = (
        chunks.select(key_col, index_col, tokens_col)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, index_col)
    )
    return keyed.mapInPandas(_pack, schema)
