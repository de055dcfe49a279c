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

PACK_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("n_chunk_tokens", T.IntegerType(), False),
        T.StructField("pack_slot", T.IntegerType(), False),
        T.StructField("pack_fill", T.IntegerType(), False),
    ]
)


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Assign every chunk row to a pack of total size <= budget.

    Returns (pack_id, doc_id, chunk_index, n_chunk_tokens, pack_slot,
    pack_fill): pack_fill is the pack's final token total (repeated per
    member row for self-contained downstream grouping). Chunks longer
    than the budget get a singleton pack (they must be re-chunked
    upstream; packing never drops data silently).

    Greedy next-fit over (key, index) order within each hash partition
    of the key column: one Arrow pass, no shuffle beyond the one
    repartition, deterministic for a given key set."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def _pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        batches = list(it)  # an iterator is always truthy — materialise,
        if not batches:  # then guard: empty partitions DO occur (AQE off,
            return  # or fewer keys than shuffle partitions)
        rows = pd.concat(batches, ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([key_col, index_col], ignore_index=True)
        out = []
        pack_n, fill, members = 0, 0, []

        def flush():
            nonlocal pack_n, fill, members
            for slot, (d, ci, nt) in enumerate(members):
                out.append((f"p{pid}-{pack_n}", d, ci, nt, slot, fill))
            pack_n += 1
            fill, members = 0, []

        for d, ci, nt in zip(
            rows[key_col], rows[index_col], rows[tokens_col]
        ):
            nt = int(nt)
            if members and fill + nt > budget:
                flush()
            members.append((int(d), int(ci), nt))
            fill += nt
            if fill >= budget:
                flush()
        if members:
            flush()
        yield pd.DataFrame(
            out, columns=[f.name for f in PACK_SCHEMA.fields]
        )

    keyed = chunks.select(key_col, index_col, tokens_col).repartition(
        F.col(key_col)
    )
    return keyed.mapInPandas(_pack, PACK_SCHEMA)
