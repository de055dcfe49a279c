"""Time a subset of registered queries with bench.py's methodology
(noop sink, min of samples until the two fastest agree within 15%) —
the fast A/B loop for optimization work; the full bench stays the
artifact of record.

Usage: python tools/time_queries.py <name> [name...] [--sf <sf_dir>] [--samples N]
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
    max_samples = 9
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--samples":
            max_samples = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        print(__doc__)
        return 2
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # same Python-worker warm-up as bench.py
    def _ident(it):
        yield from it

    spark.range(0, 64, 1, 32).mapInPandas(_ident, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    out = {}
    for name in names:
        spec = specs[name]
        samples = []
        while True:
            t0 = time.time()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            s = sorted(samples)
            if len(samples) >= 2 and (s[1] - s[0]) / s[0] <= 0.15:
                break
            if len(samples) >= max_samples:
                break
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
