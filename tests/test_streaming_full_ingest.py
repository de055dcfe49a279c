"""Full composite pipeline under streaming delivery + at-least-once
redelivery: every effect table (documents MERGE, epoch-partitioned
appends) must converge when the whole stream is redelivered from scratch
(checkpoint wiped) — the Spark analog of SQS redelivering every message
(reference delivery model, template.yml:62-69)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.schemas import METADATA_SCHEMA
from ds_caselaw_ingester_spark.streaming.pipeline import (
    read_message_stream,
    run_full_ingest_stream,
)

JUDGMENT_XML = '<judgment xmlns="http://docs.oasis-open.org/legaldocml/ns/akn/3.0">x</judgment>'
PRESS_XML = '<doc name="pressSummary">y</doc>'

EFFECT_TABLES = (
    "versions",
    "identifiers",
    "properties",
    "notifications",
    "assets",
    "asset_copies",
)


def _record(mid: str, ref: str, originator: str) -> dict:
    payload = {
        "parameters": {
            "reference": ref,
            "originator": originator,
            "s3Bucket": "b",
            "s3Key": f"{ref}.tar.gz",
        }
    }
    return {
        "messageId": mid,
        "eventSource": "aws:sqs",
        "body": json.dumps({"Message": json.dumps(payload)}),
    }


def _metadata(ref: str, filename, cite, auto_publish: bool = False) -> str:
    return json.dumps(
        {
            "parameters": {
                "TRE": {
                    "reference": ref,
                    "payload": {
                        "filename": filename,
                        "xml": f"{ref}.xml",
                        "images": [],
                    },
                },
                "PARSER": {
                    "uri": (
                        "https://caselaw.nationalarchives.gov.uk/id/ewca/civ/2022/111"
                        if ref == "TDR-1"
                        else None
                    ),
                    "cite": cite,
                    "parser_run_id": f"run-{ref}",
                },
                "INGESTER_OPTIONS": {"auto_publish": auto_publish},
            }
        }
    )


@pytest.fixture(scope="module")
def context_tables(spark):
    metadata = spark.createDataFrame(
        [
            ("TDR-1", _metadata("TDR-1", "doc.docx", "[2022] EWCA Civ 111")),
            ("TDR-2", _metadata("TDR-2", None, None)),
            ("TDR-4", _metadata("TDR-4", "bulk.docx", None, auto_publish=True)),
        ],
        "consignment_ref string, raw string",
    ).select("consignment_ref", F.from_json("raw", METADATA_SCHEMA).alias("metadata"))
    best_xmls = spark.createDataFrame(
        [
            ("TDR-1", JUDGMENT_XML, True),
            ("TDR-2", PRESS_XML, True),
            ("TDR-4", JUDGMENT_XML, True),
        ],
        "consignment_ref string, best_xml string, xml_was_valid boolean",
    )
    identifiers = spark.createDataFrame(
        [("ewca/civ/2022/111", "[2022] EWCA Civ 111", "ukncn", "doc/ewca-111")],
        "slug string, value string, namespace string, uri string",
    )
    return metadata, best_xmls, identifiers


def _run_stream(spark, src, sink_root, ckpt, context_tables):
    metadata, best_xmls, identifiers = context_tables
    stream = read_message_stream(spark, str(src), max_files=1)
    q = run_full_ingest_stream(
        stream, metadata, best_xmls, identifiers, sink_root, ckpt
    )
    q.awaitTermination(180)


def _snapshot(spark, sink_root):
    out = {}
    docs = spark.read.parquet(f"{sink_root}/documents")
    out["documents"] = sorted(
        (r.uri, r.xml, r.doc_type, r.is_published) for r in docs.collect()
    )
    for t in EFFECT_TABLES:
        df = spark.read.parquet(f"{sink_root}/{t}").drop("batch_id")
        out[t] = sorted(tuple(r) for r in df.collect())
    return out


def test_full_stream_redelivery_converges(spark, tmp_path, context_tables):
    src = tmp_path / "incoming"
    src.mkdir()
    with open(src / "f0.json", "w") as f:
        f.write(json.dumps(_record("m1", "TDR-1", "TDR")) + "\n")
    with open(src / "f1.json", "w") as f:
        f.write(json.dumps(_record("m2", "TDR-2", "TDR")) + "\n")
        f.write(json.dumps(_record("m4", "TDR-4", "FCL S3")) + "\n")
    # deterministic micro-batch order (file source orders by mtime)
    for i, name in enumerate(["f0.json", "f1.json"]):
        os.utime(src / name, (1700000000 + i * 10, 1700000000 + i * 10))

    sink_root = str(tmp_path / "sinks")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, src, sink_root, ckpt, context_tables)
    first = _snapshot(spark, sink_root)

    # sanity: both epochs produced effects
    assert len(first["documents"]) == 3
    assert any(is_pub for (_, _, _, is_pub) in first["documents"])  # TDR-4
    assert len(first["versions"]) == 3
    assert len(first["asset_copies"]) > 0  # K11 fired for the published doc

    # full redelivery: wipe the checkpoint, re-run the identical stream
    shutil.rmtree(ckpt)
    _run_stream(spark, src, sink_root, ckpt, context_tables)
    second = _snapshot(spark, sink_root)

    assert second == first, {
        k: (len(first[k]), len(second[k])) for k in first if first[k] != second[k]
    }


def test_corrupt_documents_state_fails_the_batch(spark, tmp_path, context_tables):
    """A documents-state read failure that is NOT path-not-found must fail
    the batch — silently running with empty state would flip exists_in_db
    and was_published for every message (wrong versions, wrong publish
    decisions). Only the genuine first-batch case may fall through."""
    src = tmp_path / "incoming"
    src.mkdir()
    with open(src / "f0.json", "w") as f:
        f.write(json.dumps(_record("m1", "TDR-1", "TDR")) + "\n")

    sink_root = tmp_path / "sinks"
    # plant a corrupt documents table: a parquet DIRECTORY exists but its
    # data file is garbage (e.g. a truncated footer after a partial write)
    docs_dir = sink_root / "documents"
    docs_dir.mkdir(parents=True)
    with open(docs_dir / "part-00000.parquet", "wb") as f:
        f.write(b"this is not a parquet file")

    with pytest.raises(Exception) as ei:  # StreamingQueryException via awaitTermination
        _run_stream(
            spark, src, str(sink_root), str(tmp_path / "ckpt"), context_tables
        )
    # the stream surfaced the corrupt read, not a silent empty-state run
    msg = str(ei.value)
    assert "PATH_NOT_FOUND" not in msg
    # and no effect tables were written for the failed batch
    assert not (sink_root / "versions").exists()


def test_invalid_messages_land_in_quarantine_not_void(spark, tmp_path, context_tables):
    """Review regression: the full pipeline must DLQ parse-invalid
    messages (empty reference, empty Records array) with their
    message_id — analyze() filters kind='invalid', so without the
    quarantine write they would vanish with no redrive record."""
    src = tmp_path / "incoming"
    src.mkdir()
    empty_records_body = json.dumps({"Message": json.dumps({"Records": []})})
    with open(src / "f0.json", "w") as f:
        f.write(json.dumps(_record("m1", "TDR-1", "TDR")) + "\n")
        f.write(json.dumps(_record("m-bad", "", "TDR")) + "\n")  # empty ref
        f.write(
            json.dumps(
                {
                    "messageId": "m-poison",
                    "eventSource": "aws:sqs",
                    "body": empty_records_body,
                }
            )
            + "\n"
        )

    sink_root = str(tmp_path / "sinks")
    _run_stream(spark, src, sink_root, str(tmp_path / "ckpt"), context_tables)
    q = spark.read.parquet(f"{sink_root}/quarantine")
    quarantined = {r.message_id for r in q.collect()}
    assert quarantined == {"m-bad", "m-poison"}
    # the valid message still ingested normally
    docs = spark.read.parquet(f"{sink_root}/documents")
    assert docs.count() == 1


def test_bucket_backup_is_recovered_before_state_read(spark, tmp_path, context_tables):
    """Review regression: a kb=N.old backup left by a bucketed-MERGE
    crash must be reconciled BEFORE the documents-state read — without
    recovery, partition discovery reads 'N.old' as a partition value
    and every uri in that bucket appears twice in the analysis join."""
    src = tmp_path / "incoming"
    src.mkdir()
    with open(src / "f0.json", "w") as f:
        f.write(json.dumps(_record("m1", "TDR-1", "TDR")) + "\n")
    sink_root = str(tmp_path / "sinks")
    _run_stream(spark, src, sink_root, str(tmp_path / "ckpt"), context_tables)
    docs_dir = os.path.join(sink_root, "documents")
    bucket = next(e for e in os.listdir(docs_dir) if e.startswith("kb="))
    # simulate the crash: bucket moved aside, swap never completed
    os.rename(
        os.path.join(docs_dir, bucket), os.path.join(docs_dir, bucket + ".old")
    )
    # redeliver the same message in a fresh stream run
    with open(src / "f1.json", "w") as f:
        f.write(json.dumps(_record("m2", "TDR-1", "TDR")) + "\n")
    os.utime(src / "f1.json", (1700000100, 1700000100))
    _run_stream(spark, src, sink_root, str(tmp_path / "ckpt2"), context_tables)
    docs = spark.read.parquet(f"{sink_root}/documents")
    rows = docs.where(F.col("uri").isNotNull()).collect()
    # one row per uri (no .old double-read), backup reconciled
    assert len(rows) == len({r.uri for r in rows}) == 1
    assert not any(e.endswith(".old") for e in os.listdir(docs_dir))
