"""Diagnostic for hybrid_search_multi's bench-cost spread (round 13).

Runs the registered query N times under bench-identical conditions
(noop sink, clearCache between runs) and, separately, times its three
component stages so the variance can be attributed:
  a) bm25_topk_queries's corpus pass (incl. dl/tf localCheckpoints)
  b) the dense cosine shortlist
  c) the fusion tail
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_caselaw_ingester_spark.plans.registry import all_specs  # noqa: E402
from ds_caselaw_ingester_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("diag-hybrid")

    import pandas as _pd  # noqa: F401

    def _ident(it):
        yield from it

    spark.range(0, 64, 1, 32).mapInPandas(_ident, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    spec = all_specs()["hybrid_search_multi"]

    for i in range(n):
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        t_build = time.time() - t0
        df.write.mode("overwrite").format("noop").save()
        t_total = time.time() - t0
        spark.catalog.clearCache()
        print(json.dumps({
            "run": i,
            "build_s": round(t_build, 3),
            "total_s": round(t_total, 3),
            "exec_s": round(t_total - t_build, 3),
        }), flush=True)

    # component breakdown (3 runs each)
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.search import (
        bm25_topk_queries,
        rrf_fuse,
    )
    from ds_caselaw_ingester_spark.operators.similarity import cosine_topk
    from ds_caselaw_ingester_spark.plans.queries_text import (
        _MQ_K,
        _MQ_QUERIES,
        _MQ_SHORTLIST_K,
        _RRF_K,
    )
    from ds_caselaw_ingester_spark.plans.registry import table
    from ds_caselaw_ingester_spark.sources.catalog import spread

    for i in range(3):
        d = spread(
            table(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
        )
        qdf = spark.createDataFrame(
            _MQ_QUERIES, "q_id bigint, terms array<string>"
        )
        t0 = time.time()
        lex = bm25_topk_queries(
            d, "doc_id", "text", qdf, k=_MQ_SHORTLIST_K
        ).select("q_id", "doc_id", "rank")
        t_lex_build = time.time() - t0  # incl. the eager checkpoints
        lex.write.mode("overwrite").format("noop").save()
        t_lex = time.time() - t0

        t1 = time.time()
        emb = table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < len(_MQ_QUERIES)).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
        )
        c = spread(
            emb.select(
                F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
            ),
            "c_id",
        )
        dense = cosine_topk(q, c, k=_MQ_SHORTLIST_K, round_digits=4).select(
            "q_id", F.col("c_id").alias("doc_id"), "rank"
        )
        dense.write.mode("overwrite").format("noop").save()
        t_dense = time.time() - t1

        t2 = time.time()
        rrf_fuse(
            [lex, dense], id_col="doc_id", query_col="q_id",
            k=_MQ_K, rrf_k=_RRF_K,
        ).write.mode("overwrite").format("noop").save()
        t_fuse = time.time() - t2
        spark.catalog.clearCache()
        print(json.dumps({
            "breakdown_run": i,
            "lex_build_s": round(t_lex_build, 3),
            "lex_total_s": round(t_lex, 3),
            "dense_s": round(t_dense, 3),
            "fuse_s": round(t_fuse, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
