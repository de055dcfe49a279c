"""Backward as-of join edge semantics (operators/asof.py): inclusive
match at equal timestamps, no-match nulls, highest-tie wins among
equal-timestamp right rows, keys isolated."""

from __future__ import annotations

import datetime as dt

from ds_caselaw_ingester_spark.operators.asof import asof_join_backward


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(5)),   # matches r@5 (inclusive)
            (2, "u1", _ts(9)),   # matches r@7
            (3, "u1", _ts(1)),   # before all right rows -> NULL
            (4, "u2", _ts(30)),  # other key: only u2's right rows visible
            (5, "u3", _ts(30)),  # key with no right rows at all -> NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(3), 103, 1.0),
            ("u1", _ts(5), 105, 2.0),
            ("u1", _ts(5), 106, 3.0),  # same ts as 105: higher tie wins
            ("u1", _ts(7), 107, 4.0),
            ("u2", _ts(10), 210, 5.0),
        ],
        "user_id string, ts timestamp, r_id long, r_val double",
    )
    out = {
        r.event_id: (r.r_id, r.r_val)
        for r in asof_join_backward(
            left, right, key="user_id", left_ts="ts", right_ts="ts", right_tie="r_id"
        ).collect()
    }
    assert out[1] == (106, 3.0)  # inclusive <=, tie -> highest r_id
    assert out[2] == (107, 4.0)
    assert out[3] == (None, None)
    assert out[4] == (210, 5.0)
    assert out[5] == (None, None)
    assert len(out) == 5  # left rows preserved exactly once
