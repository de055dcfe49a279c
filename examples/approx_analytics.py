"""Approximate-analytics demo: the bounded-state answers to the three
questions every 100 TB dashboard asks — how many distinct, what are
the quantiles, which keys are hot — plus the streaming rollup.

    python examples/approx_analytics.py [sf_dir]

Stages (each prints a one-line result):
1. exact vs KMV vs HLL distinct users per event type
   (kmv_distinct k=256 / hll_distinct p=8 vs countDistinct truth)
2. daily KMV sketches merged to a whole-corpus sketch, pinned equal
   to sketching everything at once            (kmv_union)
3. sampled value quantiles per event type     (sampled_quantiles)
4. hot-value census with exact verified counts (heavy_hitters —
   the input an operators/skew.py-style salting decision wants)
5. streaming HLL rollup: three micro-batches max-merged into a
   register table whose estimate equals the batch answer
   (streaming/sketch_sink.py — exactly-once by max idempotence)
6. set overlap from sketches alone: users shared by the 'click' and
   'purchase' event streams, estimated from two kilobyte-sized
   sketch frames vs the exact inner-join answer
   (kmv_intersection_estimate)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ds_caselaw_ingester_spark.operators.sketches import (  # noqa: E402
    heavy_hitters,
    hll_distinct,
    kmv_distinct,
    kmv_intersection_estimate,
    kmv_sketch,
    kmv_union,
    sampled_quantiles,
)
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402
from ds_caselaw_ingester_spark.streaming.sketch_sink import (  # noqa: E402
    apply_sketch_batch,
    sink_estimate,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("approx-analytics-demo")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    # 1. distinct users per type: truth vs the two sketch families
    truth = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    kmv = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(ev, ["event_type"], "user_id", k=256).collect()
    }
    hll = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(ev, ["event_type"], "user_id", p=8).collect()
    }
    for t in sorted(truth):
        print(
            f"1. {t:10s} exact={truth[t]:5d}  kmv={kmv[t]:5d}  hll={hll[t]:5d}"
        )

    # 2. "daily" sketches (split on event day) merged == sketch of all
    daily = kmv_sketch(
        ev.withColumn("day", F.to_date("ts")), ["day"], "user_id", k=256
    ).withColumn("grp", F.lit("all")).drop("day")
    merged = kmv_union(daily, ["grp"], k=256).collect()[0]["kmv"]
    direct = (
        kmv_sketch(ev.withColumn("grp", F.lit("all")), ["grp"], "user_id", k=256)
        .collect()[0]["kmv"]
    )
    print(f"2. daily-merged sketch == whole-corpus sketch: {merged == direct}")

    # 3. sampled quantiles of event value
    for r in (
        sampled_quantiles(
            ev, ["event_type"], "value", "event_id", [0.5, 0.99], rate=0.25
        )
        .orderBy("event_type", "q")
        .collect()[:6]
    ):
        print(
            f"3. {r['event_type']:10s} q{int(r['q'] * 100):02d} = "
            f"{r['value']:10.3f}  (sample_n={r['sample_n']})"
        )

    # 4. hot keys with exact verified counts (no full-cardinality agg)
    for r in heavy_hitters(ev, "event_type", "event_id", min_count=100, rate=0.2).collect():
        print(f"4. hot key {r['event_type']:10s} exact count {r['count']}")

    # 5. streaming rollup: three micro-batches -> stored registers
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "regs")
        for i in range(3):
            apply_sketch_batch(
                ev.where(f"event_id % 3 = {i}"), path, ["event_type"], "user_id"
            )
        streamed = {
            r["event_type"]: r["est_distinct"]
            for r in sink_estimate(spark, path, ["event_type"]).collect()
        }
        print(f"5. streamed rollup == batch hll: {streamed == hll}")

    # 6. overlap between two streams, from sketches alone
    clicks = ev.where("event_type = 'click'").withColumn("grp", F.lit("all"))
    buys = ev.where("event_type = 'purchase'").withColumn("grp", F.lit("all"))
    est = kmv_intersection_estimate(
        kmv_sketch(clicks, ["grp"], "user_id", k=256),
        kmv_sketch(buys, ["grp"], "user_id", k=256),
        ["grp"],
        k=256,
    ).collect()[0]
    exact_overlap = (
        clicks.select("user_id")
        .distinct()
        .join(buys.select("user_id").distinct(), "user_id")
        .count()
    )
    print(
        f"6. click∩purchase users: est {est['est_intersection']} "
        f"(exact {exact_overlap}; union est {est['est_union']})"
    )

    spark.stop()


if __name__ == "__main__":
    main()
