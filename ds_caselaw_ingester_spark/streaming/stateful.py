"""Custom stateful streaming operators via applyInPandasWithState.

The reference is stateless per record (lambda_function.py:100-137) — but
its at-least-once delivery means REPLAYS: the same consignment can arrive
twice (SQS visibility-timeout expiry, partial-batch retry). The batch
engine absorbs replays with idempotent MERGE sinks; the streaming engine
can additionally drop them before any work happens with keyed state:
first-wins dedup on consignment_ref.

Spark-first shape: groupBy(key).applyInPandasWithState — state is
per-key, partitioned by the shuffle, checkpointed with the query, and
expired with a processing-time timeout so it never grows unboundedly
(state size = live keys × bytes(seen marker); the timeout bounds "live").

Operational note: pending processing-time timers keep a
Trigger.AvailableNow query alive after all input is consumed — batch-mode
drains of the stream should stop() once the sink is caught up (the
long-running production query is unaffected).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("consignment_ref", T.StringType(), False),
        T.StructField("message_id", T.StringType(), True),
        T.StructField("n_duplicates_dropped", T.LongType(), False),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType()),
        T.StructField("first_message_id", T.StringType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """First-wins: the first message for a consignment_ref passes through;
    every later one is dropped. n_duplicates_dropped counts SAME-TRIGGER
    duplicates only — append mode emits each key once, so duplicates
    arriving in LATER triggers are dropped silently (the key's row has
    already shipped and cannot be amended; a cross-trigger duplicate
    count would need the update-mode variant or a separate counting
    sink). On state timeout the key is forgotten (a very-late replay
    after the timeout would re-ingest — the idempotent MERGE sink behind
    this operator makes that harmless, matching the reference where a
    redelivery re-runs the whole ingest against the same uri)."""
    (ref,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=[f.name for f in DEDUP_OUTPUT_SCHEMA.fields])
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    seen, first_id = state.get if state.exists else (False, None)
    out_rows = []
    if not seen and len(rows):
        first_id = rows["message_id"].iloc[0]
        out_rows.append((ref, first_id, int(len(rows) - 1)))
    state.update((True, first_id))
    state.setTimeoutDuration(24 * 3600 * 1000)  # forget keys after a day
    yield pd.DataFrame(out_rows, columns=[f.name for f in DEDUP_OUTPUT_SCHEMA.fields])


def dedup_consignments(messages: DataFrame) -> DataFrame:
    """messages: streaming DataFrame with (consignment_ref, message_id).
    Returns one first-wins row per consignment_ref across all triggers."""
    return (
        messages.groupBy("consignment_ref")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def dedup_messages_within_watermark(
    messages: DataFrame,
    key_cols: "list[str]",
    ts_col: str = "event_time",
    late: str = "1 hour",
) -> DataFrame:
    """The BUILT-IN alternative for the common case: when the output is
    the surviving rows themselves (no duplicate counting, no custom
    payload), Spark's dropDuplicatesWithinWatermark does keyed
    first-wins dedup with watermark-bounded state — no Python workers,
    no Arrow hop, state eviction handled by the engine.

    Contract difference vs dedup_consignments, pinned in
    tests/test_streaming.py: eviction here is EVENT-time (a key older
    than the watermark is forgotten; a replay arriving later than
    `late` re-emits and the idempotent MERGE sink absorbs it), and the
    emitted row is the full first-seen record. Prefer this operator;
    reach for applyInPandasWithState only when the output is computed
    state (counts, aggregates, session payloads) like the variant
    above."""
    return messages.withWatermark(ts_col, late).dropDuplicatesWithinWatermark(key_cols)
