"""End-to-end ingest: message -> metadata -> classification -> cascade ->
routing -> sinks, against reference-shaped fixtures (FIXTURES.md §1-4).
Mirrors the reference's full-pipeline handler tests (tests/test_handler.py)
with the sink tables as the observable effects."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.ingest import analyze, perform_ingest
from ds_caselaw_ingester_spark.schemas import METADATA_SCHEMA
from ds_caselaw_ingester_spark.sources.messages import parse_messages

JUDGMENT_XML = '<judgment xmlns="http://docs.oasis-open.org/legaldocml/ns/akn/3.0">x</judgment>'
PRESS_XML = '<doc name="pressSummary">y</doc>'
ERROR_XML = "<error>parser.log not found</error>"


def _v2_record(mid: str, ref: str, originator: str) -> tuple:
    payload = {
        "parameters": {
            "reference": ref,
            "originator": originator,
            "s3Bucket": "b",
            "s3Key": f"{ref}.tar.gz",
        }
    }
    body = json.dumps({"Message": json.dumps(payload)})
    return (mid, "aws:sqs", body)


METADATA_TDR = {
    "parameters": {
        "TRE": {"reference": "TDR-1", "payload": {"filename": "doc.docx", "xml": "TDR-1.xml"}},
        "PARSER": {
            "uri": "https://caselaw.nationalarchives.gov.uk/id/ewca/civ/2022/111",
            "cite": "[2022] EWCA Civ 111",
            "parser_run_id": "run-42",
        },
        "TDR": {
            "Source-Organization": "HMCTS",
            "Contact-Name": "A Clerk",
            "Contact-Email": "clerk@example.com",
            "Internal-Sender-Identifier": "TDR-2024-ABC",
            "Consignment-Completed-Datetime": "2024-01-15T10:30:00Z",
        },
    }
}

METADATA_NEW = {
    "parameters": {
        "TRE": {"reference": "TDR-2", "payload": {"filename": None, "xml": "TDR-2.xml"}},
        "PARSER": {"uri": None, "cite": None},
    }
}


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    sink_root = str(tmp_path_factory.mktemp("sinks"))
    records = spark.createDataFrame(
        [
            _v2_record("m1", "TDR-1", "TDR"),  # resolves by slug -> update path
            _v2_record("m2", "TDR-2", "TDR"),  # no uri/ncn -> new doc
            _v2_record("m3", "TDR-3", "WEIRD"),  # unknown originator -> error route
        ],
        schema="message_id string, event_source string, body string",
    )
    messages = parse_messages(records)

    meta_rows = [
        ("TDR-1", json.dumps(METADATA_TDR)),
        ("TDR-2", json.dumps(METADATA_NEW)),
        ("TDR-3", json.dumps(METADATA_NEW)),
    ]
    metadata = spark.createDataFrame(
        meta_rows, schema="consignment_ref string, raw string"
    ).select(
        "consignment_ref", F.from_json("raw", METADATA_SCHEMA).alias("metadata")
    )

    best_xmls = spark.createDataFrame(
        [
            ("TDR-1", JUDGMENT_XML, True),
            ("TDR-2", PRESS_XML, True),
            ("TDR-3", ERROR_XML, False),
        ],
        schema="consignment_ref string, best_xml string, xml_was_valid boolean",
    )

    identifiers = spark.createDataFrame(
        [
            ("ewca/civ/2022/111", "[2022] EWCA Civ 111", "ukncn", "doc/ewca-111"),
        ],
        schema="slug string, value string, namespace string, uri string",
    )
    documents_state = spark.createDataFrame(
        [("doc/ewca-111", True)], schema="uri string, is_published boolean"
    )

    a = analyze(messages, metadata, best_xmls, identifiers, documents_state)
    counts = perform_ingest(a, sink_root)
    return spark, a.collect(), counts, sink_root


def test_analyze_slug_resolution_and_routing(pipeline_out):
    _, rows, _, _ = pipeline_out
    by_ref = {r.consignment_ref: r for r in rows}
    r = by_ref["TDR-1"]
    assert r.status == "resolved_slug"
    assert r.uri == "doc/ewca-111"
    assert r.exists_in_db is True
    assert r.upload_state == "updated"
    assert r.will_publish is False  # TDR never auto-publishes (C1)
    assert r.email_action == "email_updated"
    assert r.doc_kind == "judgment"


def test_analyze_new_document_fallback(pipeline_out):
    _, rows, _, _ = pipeline_out
    r = {x.consignment_ref: x for x in rows}["TDR-2"]
    assert r.status == "new"
    assert r.uri.startswith("d-")
    assert r.exists_in_db is False
    assert r.doc_kind == "pressSummary"
    assert r.email_action == "email_new"


def test_unknown_originator_routes_to_error(pipeline_out):
    _, rows, _, _ = pipeline_out
    r = {x.consignment_ref: x for x in rows}["TDR-3"]
    assert r.will_publish is None  # reference raises RuntimeError (C1)
    assert r.email_action == "error"


def test_sink_effects(pipeline_out):
    spark, _, counts, sink_root = pipeline_out
    assert counts["documents"] == 3
    docs = {r.uri: r for r in spark.read.parquet(f"{sink_root}/documents").collect()}
    assert docs["doc/ewca-111"].doc_type == "judgment"
    # properties: 5 TDR keys (reference ingester.py:333-347 store_tdr_metadata)
    # + parser-run-id for TDR-1 only
    props = spark.read.parquet(f"{sink_root}/properties").collect()
    assert {(p.name, p.value) for p in props if p.uri == "doc/ewca-111"} == {
        ("source-organisation", "HMCTS"),
        ("source-name", "A Clerk"),
        ("source-email", "clerk@example.com"),
        ("transfer-consignment-reference", "TDR-2024-ABC"),
        ("transfer-received-at", "2024-01-15T10:30:00Z"),
        ("parser-run-id", "run-42"),
    }
    # identifiers: judgment with NCN -> ukncn row; TDR-2 has no cite -> none
    idents = spark.read.parquet(f"{sink_root}/identifiers").collect()
    assert [(i.namespace, i.value) for i in idents] == [("ukncn", "[2022] EWCA Civ 111")]
