"""Dump `.explain("formatted")` for every registered query to
plans/<round>/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage: python tools/dump_formatted_plans.py <round_dir> <tag> [sf_dir] [names...]
e.g.   python tools/dump_formatted_plans.py plans/r14 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_caselaw_ingester_spark.plans.registry import all_specs  # noqa: E402
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    round_dir, tag = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(here, round_dir)
    os.makedirs(dest, exist_ok=True)
    spark = get_spark("dump-formatted-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    todo = names or sorted(specs)
    for name in todo:
        spec = specs[name]
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — dump what we can, report the rest
            plan = f"PLAN DUMP FAILED: {e}"
        path = os.path.join(dest, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({tag}, sf_dir={sf_dir})\n")
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
