"""MERGE/upsert semantics + idempotency (replay safety) — the sink-layer
contract that makes at-least-once streaming redelivery a no-op
(SURVEY.md §2.6 K1-K2, §2.7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.upsert import merge_documents, upsert_parquet_table


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [
            ("ewca/civ/2022/111", "<judgment>old</judgment>", 3),
            ("uksc/2030/999", "<judgment>keep</judgment>", 1),
        ],
        schema="uri string, xml string, version_n int",
    )


@pytest.fixture()
def updates(spark):
    return spark.createDataFrame(
        [
            ("ewca/civ/2022/111", "<judgment>new</judgment>"),
            ("d-abc123", "<doc name=\"pressSummary\">fresh</doc>"),
        ],
        schema="uri string, xml string",
    )


def test_merge_matched_updated_and_version_bumped(base, updates):
    out = {r.uri: r for r in merge_documents(base, updates).collect()}
    assert out["ewca/civ/2022/111"].op == "updated"
    assert out["ewca/civ/2022/111"].xml == "<judgment>new</judgment>"
    assert out["ewca/civ/2022/111"].version_n == 4  # annotation version bump


def test_merge_not_matched_inserted_at_v1(base, updates):
    out = {r.uri: r for r in merge_documents(base, updates).collect()}
    assert out["d-abc123"].op == "inserted"
    assert out["d-abc123"].version_n == 1


def test_merge_target_only_unchanged(base, updates):
    out = {r.uri: r for r in merge_documents(base, updates).collect()}
    assert out["uksc/2030/999"].op == "unchanged"
    assert out["uksc/2030/999"].xml == "<judgment>keep</judgment>"
    assert out["uksc/2030/999"].version_n == 1


def test_parquet_upsert_idempotent_on_replay(spark, updates, tmp_path):
    """Applying the same batch twice must converge (replay safety)."""
    path = str(tmp_path / "documents")
    upsert_parquet_table(updates, path, key="uri")
    first = sorted((r.uri, r.xml) for r in spark.read.parquet(path).collect())
    upsert_parquet_table(updates, path, key="uri")  # redelivery
    second = sorted((r.uri, r.xml) for r in spark.read.parquet(path).collect())
    assert first == second
    assert len(second) == 2
