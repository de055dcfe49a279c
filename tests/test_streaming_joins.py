"""Stream-stream interval join: matches inside the event-time bound,
rejects acks outside it, and (leftOuter) emits expired-unmatched
messages exactly once after watermark passage."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import types as T

from conftest import few_shuffle_partitions as _few_shuffle_partitions
from ds_caselaw_ingester_spark.streaming.joins import run_ack_join_stream

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _ts(minutes):
    return (BASE + dt.timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S.000Z")


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _sources(spark, tmp_path):
    msg_schema = T.StructType(
        [
            T.StructField("ref", T.StringType()),
            T.StructField("msg_time", T.TimestampType()),
        ]
    )
    ack_schema = T.StructType(
        [
            T.StructField("ref", T.StringType()),
            T.StructField("ack_time", T.TimestampType()),
            T.StructField("parser", T.StringType()),
        ]
    )
    msrc, asrc = tmp_path / "msgs", tmp_path / "acks"
    msrc.mkdir(), asrc.mkdir()

    # f0: three messages; acks for A (35 min later, inside the 1h bound)
    # and B (90 min later, OUTSIDE the bound); C never acked.
    _write(msrc / "f0.json", [
        {"ref": "A", "msg_time": _ts(0)},
        {"ref": "B", "msg_time": _ts(0)},
        {"ref": "C", "msg_time": _ts(5)},
    ])
    _write(asrc / "f0.json", [
        {"ref": "A", "ack_time": _ts(35), "parser": "tre"},
        {"ref": "B", "ack_time": _ts(90), "parser": "tre"},
    ])
    # f1: advance event time far past C's expiry (10:05 + 1h) + the 2h
    # watermark delay on BOTH inputs, so the watermark actually moves.
    _write(msrc / "f1.json", [{"ref": "ZM", "msg_time": _ts(600)}])
    _write(asrc / "f1.json", [{"ref": "ZM", "ack_time": _ts(601), "parser": "tre"}])
    # f2: one more batch per side so the state cleanup runs WITH the
    # advanced watermark (watermark updates take effect next trigger).
    _write(msrc / "f2.json", [{"ref": "ZZ", "msg_time": _ts(610)}])
    _write(asrc / "f2.json", [{"ref": "ZZ", "ack_time": _ts(611), "parser": "tre"}])
    for i, name in enumerate(["f0.json", "f1.json", "f2.json"]):
        os.utime(msrc / name, (1700000000 + i * 10,) * 2)
        os.utime(asrc / name, (1700000000 + i * 10,) * 2)

    msgs = (
        spark.readStream.schema(msg_schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(msrc))
    )
    acks = (
        spark.readStream.schema(ack_schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(asrc))
    )
    return msgs, acks


def test_inner_interval_join_matches_only_inside_bound(spark, tmp_path):
    msgs, acks = _sources(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with _few_shuffle_partitions(spark):
        q = run_ack_join_stream(msgs, acks, out, ckpt, how="inner")
        q.awaitTermination(180)
    rows = spark.read.parquet(f"{out}/ack_join").collect()
    got = {(r.ref, r.parser) for r in rows}
    assert ("A", "tre") in got            # 35 min <= 1h: matched
    assert not any(r.ref == "B" for r in rows)   # 90 min > 1h: rejected
    assert not any(r.ref == "C" for r in rows)   # never acked
    assert ("ZM", "tre") in got and ("ZZ", "tre") in got
    # exactly-once: no duplicate emissions across triggers
    assert len(rows) == len(got)


def test_left_outer_emits_expired_unmatched_once(spark, tmp_path):
    msgs, acks = _sources(spark, tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with _few_shuffle_partitions(spark):
        q = run_ack_join_stream(msgs, acks, out, ckpt, how="leftOuter")
        q.awaitTermination(180)
    rows = spark.read.parquet(f"{out}/ack_join").collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.ref, []).append(r)
    # matched message emits with its ack columns
    assert len(by_ref["A"]) == 1 and by_ref["A"][0].parser == "tre"
    # B (ack outside bound) and C (no ack): exactly one null-ack row
    # each, emitted when the watermark passed msg_time + max_delay
    for ref in ("B", "C"):
        assert len(by_ref[ref]) == 1, by_ref.get(ref)
        r = by_ref[ref][0]
        assert r.parser is None and r.ack_time is None and r.ack_ref is None
