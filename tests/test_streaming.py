"""Streaming ingest: file-arrival stream -> foreachBatch analyze ->
processed/quarantine split, with checkpointed exactly-once batch effects
(SURVEY.md §2.7)."""

from __future__ import annotations

import json

from ds_caselaw_ingester_spark.streaming.pipeline import (
    read_message_stream,
    run_ingest_stream,
)


def _write_batch(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_stream_splits_processed_and_quarantine(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    v2 = {
        "messageId": "m1",
        "eventSource": "aws:sqs",
        "body": json.dumps(
            {
                "Message": json.dumps(
                    {"parameters": {"reference": "TDR-2022-DNWR", "originator": "TDR"}}
                )
            }
        ),
    }
    bad = {"messageId": "m2", "eventSource": "aws:sqs", "body": "{not json"}
    _write_batch(src / "batch0.json", [v2, bad])

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_message_stream(spark, str(src), max_files=10)
    q = run_ingest_stream(stream, out, ckpt)
    q.awaitTermination(120)

    processed = spark.read.parquet(f"{out}/processed").collect()
    quarantined = spark.read.parquet(f"{out}/quarantine").collect()
    assert [r.consignment_ref for r in processed] == ["TDR-2022-DNWR"]
    assert [r.message_id for r in quarantined] == ["m2"]

    # restart with same checkpoint: no new data -> no duplicate effects
    q2 = run_ingest_stream(read_message_stream(spark, str(src), max_files=10), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/processed").count() == 1
