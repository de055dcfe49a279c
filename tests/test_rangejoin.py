"""Range-join boundary semantics: inclusive start, exclusive end,
intervals crossing bucket boundaries, left_outer keeps empty intervals."""

from __future__ import annotations

import datetime as dt

from ds_caselaw_ingester_spark.operators.rangejoin import point_in_interval_join


def test_point_in_interval_boundaries(spark):
    T = dt.datetime
    points = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9, 59, 59)),   # just before iv A
            (2, T(2024, 1, 1, 10, 0, 0)),    # == A.start (inclusive)
            (3, T(2024, 1, 1, 10, 44, 59)),  # inside A, bucket 2
            (4, T(2024, 1, 1, 10, 45, 0)),   # == A.end (exclusive)
            (5, T(2024, 1, 1, 23, 30, 0)),   # in no interval
        ],
        "pid long, ts timestamp",
    )
    # A crosses the 10:00->11:00 hour-bucket boundary when bucketed at 30min
    intervals = spark.createDataFrame(
        [
            ("A", T(2024, 1, 1, 10, 0, 0), T(2024, 1, 1, 10, 45, 0)),
            ("B", T(2024, 1, 2, 5, 0, 0), T(2024, 1, 2, 6, 0, 0)),  # empty
        ],
        "iv string, w_start timestamp, w_end timestamp",
    )
    inner = point_in_interval_join(
        points, intervals, "ts", "w_start", "w_end", bucket_seconds=1800
    )
    got = sorted((r.iv, r.pid) for r in inner.collect())
    assert got == [("A", 2), ("A", 3)]

    outer = point_in_interval_join(
        points, intervals, "ts", "w_start", "w_end", bucket_seconds=1800, how="left_outer"
    )
    by_iv: dict = {}
    for r in outer.collect():
        by_iv.setdefault(r.iv, []).append(r.pid)
    assert sorted(by_iv["A"]) == [2, 3]
    assert by_iv["B"] == [None]  # empty interval survives with NULL point


def test_left_outer_null_and_duplicate_intervals(spark):
    """The anti-join must key on row identity, not interval columns:
    NULL payload columns and duplicate interval rows would otherwise be
    dropped or collapsed by the null-unsafe column-keyed anti-join."""
    T = dt.datetime
    points = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 15, 0))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            # two IDENTICAL empty interval rows — both must survive
            (None, T(2024, 1, 2, 5, 0, 0), T(2024, 1, 2, 6, 0, 0)),
            (None, T(2024, 1, 2, 5, 0, 0), T(2024, 1, 2, 6, 0, 0)),
            # matching interval with a NULL label column
            (None, T(2024, 1, 1, 10, 0, 0), T(2024, 1, 1, 11, 0, 0)),
        ],
        "iv string, w_start timestamp, w_end timestamp",
    )
    outer = point_in_interval_join(
        points, intervals, "ts", "w_start", "w_end", bucket_seconds=1800, how="left_outer"
    )
    rows = outer.collect()
    assert len(rows) == 3  # 1 match + 2 preserved empty duplicates
    assert sorted((r.pid is not None) for r in rows) == [False, False, True]
