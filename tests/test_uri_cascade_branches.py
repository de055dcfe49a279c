"""Exhaustive branch enumeration of the URI-resolution cascade — the
DataFrame mirror of the reference's decision-table tests
(tests/test_main.py:184-271, names encode the branch path through
docs/uri_logic.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.uri_cascade import resolve_uris


@pytest.fixture(scope="module")
def cascade(spark):
    """One message per branch; identifier index built to hit each path."""
    messages = spark.createDataFrame(
        [
            # msg_id, doc_kind, slug_candidate, ncn_candidate, expected_ns
            ("slug_hit", "judgment", "ewca/civ/2022/111", "[2022] EWCA Civ 111", "ukncn"),
            ("slug_dup", "judgment", "dup/slug", None, "ukncn"),
            ("ncn_hit", "judgment", "no/such/slug", "[2023] UKSC 1", "ukncn"),
            ("ncn_dup", "judgment", None, "[2024] DUP 9", "ukncn"),
            ("ncn_wrong_ns", "pressSummary", None, "[2023] UKSC 1", "pressSummaryNcn"),
            ("parser_log_skips_ncn", "parserLog", None, "[2023] UKSC 1", None),
            ("all_null", "judgment", None, None, "ukncn"),
        ],
        schema="msg_id string, doc_kind string, slug_candidate string, "
        "ncn_candidate string, expected_ns string",
    )
    identifiers = spark.createDataFrame(
        [
            # slug, value, namespace, uri
            ("ewca/civ/2022/111", "[2022] EWCA Civ 111", "ukncn", "doc/a"),
            ("dup/slug", None, "ukncn", "doc/b1"),
            ("dup/slug", None, "ukncn", "doc/b2"),
            (None, "[2023] UKSC 1", "ukncn", "doc/c"),
            (None, "[2024] DUP 9", "ukncn", "doc/d1"),
            (None, "[2024] DUP 9", "ukncn", "doc/d2"),
        ],
        schema="slug string, value string, namespace string, uri string",
    )
    rows = resolve_uris(messages, identifiers).collect()
    return {r.msg_id: r for r in rows}


def test_y_slug_resolves_without_ncn_lookup(cascade):
    r = cascade["slug_hit"]
    assert (r.status, r.uri, r.exists_in_db, r.upload_state) == (
        "resolved_slug",
        "doc/a",
        True,
        "updated",
    )


def test_slug_duplicate_is_error(cascade):
    # ingester.py:524-526 MultipleResolutionsFoundError
    r = cascade["slug_dup"]
    assert r.status == "error_multiple_slug"
    assert r.uri is None
    assert r.exists_in_db is None
    assert r.upload_state == "error"


def test_n_slug_y_ncn_resolves(cascade):
    r = cascade["ncn_hit"]
    assert (r.status, r.uri, r.exists_in_db) == ("resolved_ncn", "doc/c", True)


def test_ncn_duplicate_is_error(cascade):
    # ingester.py:504-505
    assert cascade["ncn_dup"].status == "error_multiple_ncn"


def test_wrong_namespace_is_a_miss(cascade):
    # tests/test_main.py:166-170 — NCN exists only under ukncn, the press
    # summary expects pressSummaryNcn -> falls through to new
    r = cascade["ncn_wrong_ns"]
    assert r.status == "new"
    assert r.uri.startswith("d-")


def test_parser_log_never_looks_up_ncn(cascade):
    # IDENTIFIER_CLASS_LOOKUP maps ParserLog -> None (ingester.py:51-55)
    r = cascade["parser_log_skips_ncn"]
    assert r.status == "new"
    assert r.exists_in_db is False


def test_nn_falls_back_to_fresh_document(cascade):
    r = cascade["all_null"]
    assert (r.status, r.exists_in_db, r.upload_state) == ("new", False, "inserted")
    assert r.uri.startswith("d-") and len(r.uri) == 34  # d- + full 32-hex md5
