"""Notification decision table incl. the non-prod suppression gate —
mirrors reference tests/test_notifications.py (send on prod, do-not-send
on staging, FCL no-email, S3 email-iff-not-publish, bulk stub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.routing import email_action

CASES = [
    # originator, auto_publish, exists_in_db, environment -> expected
    ("TDR", False, True, "prod", "email_updated"),
    ("TDR", False, False, "prod", "email_new"),
    ("TDR", False, True, "staging", "suppressed:email_updated"),
    ("TDR", False, False, "staging", "suppressed:email_new"),
    ("TDR", False, False, "dev", "suppressed:email_new"),
    ("FCL", False, True, "prod", "none"),
    ("FCL", False, True, "staging", "none"),
    ("FCL S3", True, False, "prod", "none"),
    ("FCL S3", False, False, "prod", "bulk_stub"),
    ("FCL S3", False, False, "staging", "bulk_stub"),  # stub in every env
    ("WEIRD", False, False, "prod", "error"),
    ("WEIRD", False, False, "staging", "error"),
]


@pytest.fixture(scope="module")
def decision_rows(spark):
    df = spark.createDataFrame(
        [(i, o, a, e, env) for i, (o, a, e, env, _) in enumerate(CASES)],
        "i int, originator string, auto_publish boolean, exists_in_db boolean, env string",
    )
    out = df.select(
        "i",
        email_action(
            F.col("originator"),
            F.col("auto_publish"),
            F.col("exists_in_db"),
            environment=F.col("env"),
        ).alias("action"),
    ).collect()
    return {r.i: r.action for r in out}


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_notification_decision(decision_rows, idx):
    assert decision_rows[idx] == CASES[idx][4], CASES[idx]


def test_no_environment_column_means_prod(spark):
    df = spark.createDataFrame([("TDR", False, True)], "o string, a boolean, e boolean")
    got = df.select(
        email_action(F.col("o"), F.col("a"), F.col("e")).alias("action")
    ).collect()[0].action
    assert got == "email_updated"
