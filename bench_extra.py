#!/usr/bin/env python
"""Optimization-round instrumentation (guide §1): per-query noop-sink
timing, phase breakdowns for the composite paths (index_build), and
.explain("formatted") capture. Separate from the FROZEN bench.py.

Usage:
  python bench_extra.py [phase ...]    # default: all
Phases: queries, index, latency, plans
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from google_like_search_engine_spark.session import get_spark
from google_like_search_engine_spark import catalog as c
from google_like_search_engine_spark import catalog_text as t
from google_like_search_engine_spark.compression import (
    assign_doc_indexes,
    block_postings,
)
from google_like_search_engine_spark.indexer import build_postings

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.environ.get("SPARK_GRAFT_PLAN_DIR", "")

BENCH_QUERIES = {
    "tpch_q1": c.tpch_q1,
    "tpch_q3": c.tpch_q3,
    "tpch_q5": c.tpch_q5,
    "events_sessions": c.events_sessions,
    "wordcount": t.wordcount,
    "tfidf_search": t.tfidf_search,
    "bm25_search": t.bm25_search,
    "dedup_minhash": t.dedup_minhash,
    "cosine_scores": t.cosine_scores,
}


def timed(fn):
    start = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - start, 3), out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    phases = set(sys.argv[1:]) or {"queries", "index", "plans"}
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext
    out: dict = {}

    if "queries" in phases:
        q = {}
        for name, fn in BENCH_QUERIES.items():
            sc.setJobDescription(f"bench_extra:{name}")
            # 3 runs: cold, then two warm (page cache + JIT); noop sink
            runs = [timed(lambda: noop(fn(spark, SF_DIR)))[0] for _ in range(3)]
            q[name] = runs
            sc.setJobDescription(None)
        out["queries_noop_runs"] = q

    if "index" in phases:
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(
                F.col("doc_id").cast("string").alias("doc_id"),
                F.col("doc_id").cast("string").alias("url"),
                "text",
            )
        )
        docs.count()
        ph: dict = {}
        for rep in range(2):
            d = docs.repartition(CPUS * 2)
            sc.setJobDescription("index:tokenize(noop)")
            ph.setdefault("tokenize_noop", []).append(
                timed(lambda: noop(build_postings(d)))[0]
            )
            sc.setJobDescription("index:assign_doc_indexes")
            dt, idx = timed(lambda: assign_doc_indexes(d))
            ph.setdefault("assign_doc_indexes", []).append(dt)
            sc.setJobDescription("index:block+write")
            ph.setdefault("block_write", []).append(
                timed(
                    lambda: block_postings(
                        build_postings(d).join(F.broadcast(idx), "doc_id")
                    )
                    .write.mode("overwrite")
                    .parquet("/tmp/bench_extra_blocks")
                )[0]
            )
            sc.setJobDescription(None)
        out["index_phases"] = ph

    if "plans" in phases and PLAN_DIR:
        os.makedirs(PLAN_DIR, exist_ok=True)
        for name, fn in BENCH_QUERIES.items():
            with open(f"{PLAN_DIR}/{name}.txt", "w") as f:
                f.write(fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
