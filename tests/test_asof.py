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


def test_asof_matches_pandas_merge_asof(spark):
    """Property check against an independent model: pandas merge_asof
    (backward, inclusive, by-key). Right rows sorted by (ts, tie) so
    merge_asof's last-among-equals == our highest-tie-wins rule."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ts_s = st.integers(min_value=0, max_value=50)
    key_s = st.sampled_from(["a", "b", "c"])

    @given(
        st.lists(st.tuples(key_s, ts_s), min_size=1, max_size=25),
        st.lists(st.tuples(key_s, ts_s), min_size=0, max_size=25),
    )
    @settings(max_examples=8, deadline=None)
    def run(left_rows, right_rows):
        left_pd = pd.DataFrame(
            [(i, k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(left_rows)],
            columns=["event_id", "user_id", "ts"],
        )
        right_pd = pd.DataFrame(
            [(k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t), 100 + i) for i, (k, t) in enumerate(right_rows)],
            columns=["user_id", "ts", "r_id"],
        )
        left = spark.createDataFrame(left_pd)
        right = (
            spark.createDataFrame(right_pd)
            if len(right_pd)
            else spark.createDataFrame([], "user_id string, ts timestamp, r_id long")
        )
        got = {
            r.event_id: r.r_id
            for r in asof_join_backward(
                left, right, key="user_id", left_ts="ts", right_ts="ts", right_tie="r_id"
            ).collect()
        }
        if len(right_pd) == 0:
            expected = {int(i): None for i in left_pd["event_id"]}
        else:
            expected_df = pd.merge_asof(
                left_pd.sort_values(["ts", "event_id"], kind="stable"),
                right_pd.sort_values(["ts", "r_id"], kind="stable"),
                on="ts",
                by="user_id",
                direction="backward",
                allow_exact_matches=True,
            )
            expected = {
                int(r.event_id): (None if pd.isna(r.r_id) else int(r.r_id))
                for r in expected_df.itertuples()
            }
        assert got == expected, (left_rows, right_rows)

    run()


def test_null_values_in_latest_right_row_survive(spark):
    """Review regression (verified): last(ignorenulls) per COLUMN mixed
    columns from different right rows when the latest carried NULLs —
    (tag='new', val=100) for rows that never existed. The whole-row
    struct fill must return (tag='new', val=NULL), matching DuckDB
    ASOF JOIN."""
    left = spark.createDataFrame(
        [(1, 10)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 1, "old", 100), (1, 5, "new", None)],
        "k long, rts long, tag string, val int",
    )
    out = asof_join_backward(left, right, "k", "ts", "rts").collect()[0]
    assert out["tag"] == "new" and out["val"] is None


def test_shared_column_names_are_rejected(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 7)], "k long, ts long, v int")
    right = spark.createDataFrame([(1, 5, 9)], "k long, rts long, v int")
    with pytest.raises(ValueError, match="both"):
        asof_join_backward(left, right, "k", "ts", "rts")
