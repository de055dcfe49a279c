"""Stream-stream interval joins — correlating two unbounded feeds in
event time under bounded state.

The batch engine joins messages to their parse/publish acknowledgments
with a plain equi-join; streaming cannot (either side's match may not
have arrived yet). Spark's stream-stream join holds both sides in the
state store and emits when the match lands; TWO constraints make that
runnable forever:

- a WATERMARK on each input bounds how late a row may be, and
- a TIME-RANGE predicate on the join condition bounds how long an
  unmatched row can possibly still match.

Together they let the engine compute, per key, the exact horizon after
which buffered rows can never match again — state is evicted instead of
accumulating the whole stream. Without the range predicate an inner
join would buffer forever; Spark refuses outer joins entirely unless
both constraints are present.

State size ≈ (input rate × max_delay) per side — a function of the
SLA, not of history. At 100 TB/day that is the difference between a
join that runs and one that OOMs in hour two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ack_join_streams(
    messages: DataFrame,
    acks: DataFrame,
    key: str = "ref",
    msg_ts: str = "msg_time",
    ack_ts: str = "ack_time",
    max_delay: str = "1 hour",
    late: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join a message stream to its acknowledgment stream: an ack matches
    iff it carries the same key and lands within [msg_time, msg_time +
    max_delay] in EVENT time.

    how='inner': rows emit as soon as both sides have arrived.
    how='leftOuter': additionally, a message whose ack window expired
    (watermark passed msg_time + max_delay) emits ONCE with null ack
    columns — the streaming analog of the batch existence-guard
    anti-join, and the shape an ingest monitor needs to alarm on
    "submitted but never parsed". Outer rows are emitted only at
    watermark passage, so they lag the wall clock by `late`.

    The ack key column is returned as `ack_ref` (both inputs keep their
    own key column so the outer rows can distinguish "no ack" nulls
    from a null key).
    """
    m = messages.withWatermark(msg_ts, late)
    a = acks.select(
        F.col(key).alias("ack_ref"),
        *[c for c in acks.columns if c != key],
    ).withWatermark(ack_ts, late)
    cond = (
        (F.col(key) == F.col("ack_ref"))
        & (F.col(ack_ts) >= F.col(msg_ts))
        & (F.col(ack_ts) <= F.col(msg_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return m.join(a, cond, how)


def run_ack_join_stream(
    messages: DataFrame,
    acks: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    how: str = "inner",
):
    """Materialize the correlated feed append-only: each matched (or,
    for leftOuter, expired-unmatched) row is emitted exactly once."""
    joined = ack_join_streams(messages, acks, how=how)
    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/ack_join")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
