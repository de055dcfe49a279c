"""Sketch-vs-exact distinct aggregation at scale (round 14 late).

The claim operators/sketches.py makes — "the sketch's shuffle is
sketch-sized, not data-sized" — measured: over a generated frame
(spark.range, no scan cost, so the walls isolate AGGREGATION) with a
large distinct cardinality per group, time

  exact : groupBy(g).agg(countDistinct(v))       (shuffles every
          distinct (g, v) pair — the cost floor of exactness)
  hll   : hll_distinct(p=8)                      (partial-max map fold,
          shuffle is <= groups x 256 register rows)
  kmv   : kmv_distinct(k=256)                    (WindowGroupLimit
          partial prune, shuffle is <= groups x k x tasks rows)

Each variant runs twice in one session (pass 2 = JIT/codegen warm;
same-session pairs are the only comparison docs/SCALE.md trusts).
Accuracy at scale falls out for free: the exact pass is the truth the
estimates are scored against. One JSON line per (variant, pass), then
a summary line with max relative error per sketch family.

Usage: python tools/measure_sketch_scale.py [ROWS] [DISTINCT] [GROUPS]
       (defaults 200_000_000 rows, 20_000_000 distinct, 7 groups —
        GROUPS must be coprime with DISTINCT or the two modulos
        correlate and each group sees only DISTINCT/gcd values)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ds_caselaw_ingester_spark.operators.sketches import (  # noqa: E402
    hll_distinct,
    kmv_distinct,
)
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402


def main() -> None:
    import math

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    if math.gcd(groups, distinct) != 1:
        raise SystemExit(
            f"GROUPS={groups} shares a factor with DISTINCT={distinct}: "
            "id%groups and id%distinct correlate, so each group would see "
            "only DISTINCT/gcd values. Pick coprime values."
        )

    spark = get_spark("sketch-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def frame():
        # v cycles 0..distinct-1; with gcd(groups, distinct) == 1
        # (guarded above) every group sees every value once rows >>
        # groups*distinct/…, so true per-group distinct == `distinct`
        # and the exact path must shuffle ~groups x distinct pairs.
        return spark.range(0, rows, 1, 64).select(
            (F.col("id") % groups).alias("g"),
            (F.col("id") % distinct).alias("v"),
        )

    def run(name, build):
        out = {}
        for p in (1, 2):
            t0 = time.monotonic()
            res = {r["g"]: r["est"] for r in build(frame()).collect()}
            wall = time.monotonic() - t0
            out = res
            print(
                json.dumps(
                    {"variant": name, "pass": p, "wall_s": round(wall, 1),
                     "rows": rows, "distinct": distinct, "groups": groups}
                ),
                flush=True,
            )
        return out

    exact = run(
        "exact_countDistinct",
        lambda df: df.groupBy("g").agg(F.countDistinct("v").alias("est")),
    )
    hll = run(
        "hll_p8",
        lambda df: hll_distinct(df, ["g"], "v", p=8).select(
            "g", F.col("est_distinct").alias("est")
        ),
    )
    kmv = run(
        "kmv_k256",
        lambda df: kmv_distinct(df, ["g"], "v", k=256).select(
            "g", F.col("est_distinct").alias("est")
        ),
    )

    def maxerr(est):
        return max(abs(est[g] - exact[g]) / exact[g] for g in exact)

    print(
        json.dumps(
            {
                "summary": True,
                "hll_max_rel_err": round(maxerr(hll), 4),
                "kmv_max_rel_err": round(maxerr(kmv), 4),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
