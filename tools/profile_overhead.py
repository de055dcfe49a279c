"""Per-query fixed-overhead profile: split each registered query's wall
into CONSTRUCTION (builder call: Py4J round-trips, analysis, any eager
checkpoint/count/collect jobs) vs ACTION (the noop sink), and count the
scheduled jobs in each phase via statusTracker — the round-14 technique,
applied suite-wide. The targets are construction-time jobs with one
consumer, avoidable counts, and fixture materializations (guide
§1.2/§2.4); the numbers say which queries carry any.

Usage: python tools/profile_overhead.py [name ...] [--sf DIR] [--samples N]
       (no names = all registered queries)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_caselaw_ingester_spark.plans.registry import all_specs  # noqa: E402
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    samples = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--samples":
            samples = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark("profile-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    specs = all_specs()
    if not names:
        names = sorted(specs)

    # same Python-worker warm-up as bench.py
    def _ident(it):
        yield from it

    spark.range(0, 64, 1, 32).mapInPandas(_ident, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    out = {}
    for name in names:
        spec = specs[name]
        best = None
        for s in range(samples + 1):  # sample 0 = warm-up, discarded
            group = f"prof-{name}-{s}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            t1 = time.time()
            jobs_c = len(sc.statusTracker().getJobIdsForGroup(group))
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            jobs_t = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setLocalProperty("spark.jobGroup.id", None)
            spark.catalog.clearCache()
            if s == 0:
                continue
            rec = {
                "construct_s": round(t1 - t0, 3),
                "action_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "construct_jobs": jobs_c,
                "total_jobs": jobs_t,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        print(json.dumps({name: best}, separators=(",", ":")), flush=True)

    tot = {
        "sum_total_s": round(sum(r["total_s"] for r in out.values()), 2),
        "sum_construct_s": round(sum(r["construct_s"] for r in out.values()), 2),
        "sum_construct_jobs": sum(r["construct_jobs"] for r in out.values()),
        "sum_total_jobs": sum(r["total_jobs"] for r in out.values()),
        "n": len(out),
    }
    print(json.dumps({"SUMMARY": tot}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
