"""Runtime profile of a registered query: execute it and print the
FINAL adaptive plan with each operator's runtime metrics (output rows,
shuffle bytes, spill, peak memory, scan stats) plus a one-line summary.

This is the measurement layer under docs/PLANS.md's static audit: the
static plan shows the chosen strategy, this shows what it actually
cost. Use it to answer "did that exchange move bytes or partitions?",
"which operator holds the peak memory?", "did anything spill?".

Usage: python tools/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_caselaw_ingester_spark.plans.registry import all_specs  # noqa: E402
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402


def _unwrap(node):
    n = node.nodeName()
    if n == "AdaptiveSparkPlan":
        return _unwrap(node.executedPlan())
    if "QueryStage" in n:
        return _unwrap(node.plan())
    return node


def _metrics(node) -> "dict[str, int]":
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        v = kv._2().value()
        if v > 0:
            out[kv._1()] = v
    return out


def profile_plan(df) -> "list[tuple[int, str, dict]]":
    """Execute-and-walk: returns (depth, nodeName, metrics) rows for the
    final adaptive plan. Caller must have run an action already."""
    rows: list[tuple[int, str, dict]] = []

    def walk(node, depth=0):
        node = _unwrap(node)
        rows.append((depth, node.nodeName(), _metrics(node)))
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next(), depth + 1)

    walk(df._jdf.queryExecution().executedPlan())
    return rows


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    specs = all_specs()
    if name not in specs:
        print(f"unknown query {name!r}; choose from: {', '.join(sorted(specs))}")
        return 2
    spark = get_spark("profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[name].fn(spark, sf_dir)
    t0 = time.time()
    # drain via toLocalIterator: it executes THIS DataFrame's own
    # QueryExecution (count()/write() build a separate execution and
    # leave df's metrics empty) while holding only one partition's rows
    # on the driver at a time. prefetchPartitions=True keeps the next
    # partition computing while the current one serializes — without it
    # the final stage runs one partition-job at a time and the printed
    # wall overstates the plan's parallel cost several-fold. Even so:
    # the drain serializes every row over Py4J, so compare WALLS from
    # bench.py's noop sink; this tool's number contextualizes the
    # per-operator metrics below, nothing more.
    n_drained = 0
    for _ in df.toLocalIterator(prefetchPartitions=True):
        n_drained += 1
    wall = time.time() - t0
    rows = profile_plan(df)
    n = n_drained
    shuffle = sum(m.get("dataSize", 0) for _, nm, m in rows if nm == "Exchange")
    spill_bytes = sum(m.get("spillSize", 0) for _, _, m in rows)
    spill_parts = sum(m.get("numSpilledPartitions", 0) for _, _, m in rows)
    peak = max((m.get("peakMemory", 0) for _, _, m in rows), default=0)
    scan = sum(m.get("filesSize", 0) for _, nm, m in rows if nm.startswith("Scan"))
    print(f"== {name} @ {sf_dir}: {wall:.2f}s, {n} rows ==")
    print(
        f"summary: scan {scan/1e6:.1f} MB, shuffle {shuffle/1e6:.2f} MB, "
        f"peak-op memory {peak/1e6:.1f} MB, "
        f"spill {spill_bytes/1e6:.1f} MB over {spill_parts} partitions"
    )
    for depth, nm, m in rows:
        parts = ", ".join(f"{k}={v}" for k, v in sorted(m.items())[:6])
        print(f"  {'  ' * depth}{nm}: {parts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
