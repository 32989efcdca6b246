#!/usr/bin/env python
"""spark-submit entry point: deduplicate a document corpus end-to-end.

The full training-data dedup pipeline in one job — the step between a
crawl and an index/training build:

  1. exact dedup        md5 hash-groupBy (byte-identical re-crawls)
  2. near-dup pairs     MinHash+LSH candidates, exact shingle-Jaccard
                        verification (--jaccard threshold)
  3. cluster resolve    pairs -> connected components (min-label
                        propagation) -> one canonical survivor per
                        transitive cluster
  4. filtered corpus    kept docs written to --out; per-doc keep list
                        (doc, component, keep, reason) to --out/_keep_list

Usage (cluster):
  spark-submit --py-files engine.zip scripts/dedup_corpus.py \
      --docs s3://bucket/documents --out s3://bucket/deduped \
      [--id-col doc_id] [--text-col text] [--jaccard 0.8]

Usage (local): python scripts/dedup_corpus.py --docs ... --out ...

Exact dedup folds into the same component machinery: byte-identical
docs pair with their group's canonical, so one connected-components
pass resolves both exact and near clusters, and overlapping clusters
(doc A exact-dup of B, B near-dup of C) merge correctly instead of
double-dropping.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def dedup_corpus(spark, docs, id_col="doc_id", text_col="text",
                 jaccard=0.8):
    """(kept_docs, keep_list, stats dict). ``keep_list`` has one row
    per input doc: (id, component_id, keep, reason) where reason is
    'canonical' | 'exact_dup' | 'near_dup'."""
    from google_like_search_engine_spark.analytics.dedup import (
        dedup_keep_list,
        minhash_dedup,
    )

    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    # exact pairs: every doc pairs with its byte-identical group's min id
    hashed = d.select(
        "id", F.md5(F.encode("text", "utf-8")).alias("h")
    )
    canon = hashed.groupBy("h").agg(F.min("id").alias("id_canon"))
    exact_pairs = (
        hashed.join(canon, "h")
        .where(F.col("id") != F.col("id_canon"))
        .select(F.col("id_canon").alias("id_a"), F.col("id").alias("id_b"))
    )

    near_pairs = minhash_dedup(d, jaccard_threshold=jaccard).select(
        "id_a", "id_b"
    )
    pairs = exact_pairs.unionByName(near_pairs).distinct()

    keep = dedup_keep_list(d.select("id"), pairs, max_iters=50)

    exact_dropped = exact_pairs.select(F.col("id_b").alias("id")).distinct()
    keep_list = (
        keep.join(exact_dropped.withColumn("is_exact", F.lit(True)), "id", "left")
        .select(
            "id", "component_id", "keep",
            F.when(F.col("keep"), F.lit("canonical"))
            .when(F.col("is_exact"), F.lit("exact_dup"))
            .otherwise(F.lit("near_dup"))
            .alias("reason"),
        )
    )
    kept_docs = docs.join(
        keep.where("keep").select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    return kept_docs, keep_list


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input parquet of documents")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--jaccard", type=float, default=0.8)
    args = ap.parse_args()

    from google_like_search_engine_spark.session import get_spark

    spark = get_spark("dedup_corpus")
    docs = spark.read.parquet(args.docs)
    t0 = time.perf_counter()
    kept, keep_list = dedup_corpus(
        spark, docs, args.id_col, args.text_col, args.jaccard
    )
    keep_list = keep_list.persist()
    # corpus first: its overwrite clears the output dir, then the keep
    # list lands inside it (the _ prefix hides it from corpus readers)
    kept.write.mode("overwrite").parquet(args.out)
    keep_list.write.mode("overwrite").parquet(f"{args.out}/_keep_list")
    stats = {
        r["reason"]: r["n"]
        for r in keep_list.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    dt = time.perf_counter() - t0
    total = sum(stats.values())
    kept_n = stats.get("canonical", 0)
    print(
        f"deduped {total} docs -> {kept_n} kept "
        f"({stats.get('exact_dup', 0)} exact dups, "
        f"{stats.get('near_dup', 0)} near dups dropped) in {dt:.1f}s"
    )
    keep_list.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
