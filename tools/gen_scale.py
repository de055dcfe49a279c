"""Deterministic scale-up of a driver testdata dir (default sf0.1 -> x10,
i.e. an sf1-equivalent) for local shuffle-behavior benchmarking — sf0.1
fits in page cache and hides exchange costs that dominate at scale.

FK-consistent: every key column is shifted by copy_index * (max_key + 1)
of its base table, so joins find exactly the same matches per copy and
fact/dim ratios are preserved. Text gets a per-copy suffix token and
embeddings a tiny per-copy offset so dedup/ANN workloads see realistic
near-duplicates instead of pathological identical-bucket blowups.

pyarrow end-to-end: every output column keeps the source file's physical
type (read -> transform -> cast back to the source schema), so events.ts
ships in whatever layout the driver generated (currently TIMESTAMP(MICROS);
the catalog reader is type-adaptive either way, sources/catalog.py).

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1]
       [--dst /tmp/sf1.0] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# key columns shifted by (copy * span(base table of that key))
KEY_BASE = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events",  # span: own-table max, keeps ids disjoint per copy
    "doc_id": "documents",
    "vec_id": "embeddings",
}
COPIED_UNCHANGED = {"region", "nation"}


_SPAN_CACHE: dict[tuple[str, str, str], int] = {}


def _span(src: str, base_table: str, col_hint: str) -> int:
    """Max(key)+1 of the base table, reading ONLY the key column (the
    previous whole-table read materialized wide text columns per key
    column — customer/orders twice each) and memoized per (src, table,
    column)."""
    ck = (src, base_table, col_hint)
    if ck not in _SPAN_CACHE:
        path = os.path.join(src, f"{base_table}.parquet")
        names = pq.read_schema(path).names
        col = col_hint if col_hint in names else names[0]
        t = pq.read_table(path, columns=[col])
        _SPAN_CACHE[ck] = int(pc.max(t.column(col)).as_py()) + 1
    return _SPAN_CACHE[ck]


def scale(
    src: str,
    dst: str,
    factor: int,
    dup_rate: "float | None" = None,
    tables: "tuple[str, ...]" = TABLES,
) -> None:
    """dup_rate=None reproduces the legacy shape: every copy of a
    document differs from its base by ONE suffix token, so the corpus
    is `factor`-member near-duplicate families and the lexical dedup
    join dominates any composite BY CONSTRUCTION (docs/SCALE.md's
    honesty note on the r12 sf10 datapoint). dup_rate=0.02 plants
    near-dup families on only ~2% of base documents (doc_id % 50 == 0);
    every other copy gets a per-copy salt token inserted after every 2
    words, which breaks every interior shared word-3-gram shingle with
    its base and with other copies (only a sub-3-word unsalted tail can
    share one edge shingle) — the battery-dominated regime a real
    100 TB crawl looks like."""
    os.makedirs(dst, exist_ok=True)
    spans: dict[str, int] = {}
    for col, base in KEY_BASE.items():
        key = f"{base}:{col}"
        spans[key] = _span(src, base, col)

    for name in tables:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out_path = os.path.join(dst, f"{name}.parquet")
        if name in COPIED_UNCHANGED:
            pq.write_table(t, out_path)
            print(f"{name}: copied ({t.num_rows} rows)")
            continue
        copies = []
        for i in range(factor):
            cols = []
            for cname in t.column_names:
                col = t.column(cname)
                if cname in KEY_BASE:
                    span = spans[f"{KEY_BASE[cname]}:{cname}"]
                    col = pc.add(col, pa.scalar(i * span, type=col.type))
                elif name == "documents" and cname == "text" and i > 0:
                    base_txt = pc.cast(col, pa.string())
                    dup_txt = pc.binary_join_element_wise(
                        base_txt, f" dup{i}", ""
                    )
                    if dup_rate is None:
                        col = dup_txt
                    else:
                        # low-duplication shape: salt a copy-specific
                        # token after every 2 words (RE2 keeps \1). Two
                        # is load-bearing: with a salt every THREE words
                        # the aligned (w0,w1,w2),(w3,w4,w5),... 3-gram
                        # windows all survive intact — measured ~1/3 of
                        # shingles still shared with the base, enough
                        # for ~32k accidental lexical collapses at sf10
                        # (review finding, round 13). Every 2 words, no
                        # 3 consecutive original words stay adjacent, so
                        # only the unsalted tail (< 2 words + the last
                        # word carries no trailing space) can share a
                        # single edge 3-gram.
                        salted = pc.replace_substring_regex(
                            base_txt, r"((?:\S+ ){2})", f"\\1cp{i}salt "
                        )
                        ids = t.column("doc_id").to_numpy(
                            zero_copy_only=False
                        )
                        period = max(1, round(1.0 / dup_rate))
                        mask = pa.array((ids % period) == 0)
                        col = pc.if_else(mask, dup_txt, salted)
                elif name == "embeddings" and cname == "embedding" and i > 0:
                    flat = col.combine_chunks()
                    if flat.null_count:
                        # from_arrays(offsets, values) would DROP the
                        # validity bitmap — null lists silently becoming
                        # empty/garbage lists; refuse rather than corrupt
                        raise NotImplementedError(
                            "gen_scale: embeddings with NULL rows are not "
                            "supported by the per-copy offset rebuild"
                        )
                    values = pc.add(flat.values, pa.scalar(i * 1e-3, type=pa.float32()))
                    col = pa.ListArray.from_arrays(flat.offsets, values)
                cols.append(col)
            copies.append(pa.table(cols, names=t.column_names))
        big = pa.concat_tables(copies)
        # cast back to the source schema (suffix/offset ops may widen types)
        big = big.cast(t.schema)
        pq.write_table(big, out_path)
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--dup-rate", type=float, default=None,
        help="planted near-dup family rate (e.g. 0.02); default keeps "
        "the legacy every-copy-is-a-near-dup shape",
    )
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset of tables (default: all)",
    )
    a = ap.parse_args()
    tabs = tuple(a.tables.split(",")) if a.tables else TABLES
    scale(a.src, a.dst, a.factor, a.dup_rate, tabs)
