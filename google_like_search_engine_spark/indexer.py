"""Inverted-index build: partition-local posting construction + term-sharded merge.

Replaces the reference Indexer job (/root/reference
src/cis5550/jobs/Indexer.java:22-167) with a Spark-first design:

- The reference's scan -> lambda -> KVS-shuffle per operator becomes a
  single lazy DataFrame plan: parquet/Iceberg scan (column-pruned to the
  columns used) -> one Arrow-batched ``mapInPandas`` doing
  tokenize+stem+positions+L2 norm per document (partition-local posting
  construction; no shuffle) -> optional term-sharded exchange to build
  per-term posting lists.
- Semantics pinned by the reference (rank-identity invariants):
  the row filter (Indexer.java:31), tag strip (line 35), single-space
  split with 1-based blank-counting positions (lines 64-82), raw+stem
  dual entries (lines 70-79), combined-map L2 norm (lines 84-89).
- The reference's foldByKey set-union into one string per term
  (Indexer.java:115-126) becomes ``collect_list`` of typed structs with
  a deterministic sort by doc_id — allowed because the reference's own
  checker is order-insensitive (HW9Test.java:119).

Scale notes (100 TB / 10^12 docs):
- ``build_postings`` is embarrassingly parallel: cost is one scan, no
  shuffle; output is written partitioned so downstream joins prune.
- ``build_posting_lists`` shuffles by term; head terms (stopword-like)
  are handled with salted two-phase aggregation (``salt_buckets``) so a
  single reducer never materializes one giant list.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .kernels.hasher import kvs_hash
from .kernels.textclean import index_tokenize

POSTINGS_SCHEMA = (
    "term string, doc_id string, url string, tf int, "
    "positions array<int>, l2_norm double, dl int"
)

_TAG_RE = re.compile(r"<[^>]*>")

# tokenize-stage task granularity for small inputs: bytes of (compressed)
# source text per task when sizing the python stage's partition count.
# ~64 KiB of parquet ~ hundreds of docs ~ tens of ms of tokenization per
# task — enough to amortize the ~15-20 ms fixed cost of a python task
# without starving the cores. Measured (interleaved best/median of 6 on
# the bench index build): 64 KiB beat 256 KiB by ~20%. Only consulted
# when the input is smaller than cores*split (see build_postings).
TOKENIZE_SPLIT_BYTES = 64 * 1024

def _url_ok():
    # Indexer.java:31 — url filter: not null, no "..", length <= 2048.
    return (
        F.col("url").isNotNull()
        & F.col("text").isNotNull()
        & ~F.col("url").rlike(r"\.\.")
        & (F.length("url") <= 2048)
    )


def docs_from_pages(pages: DataFrame) -> DataFrame:
    """Project the pages table to (doc_id, url, text) index input.

    doc_id = reference Hasher.hash(url) (the pt-crawl row key). The
    derivation runs in one Arrow batch UDF; everything else is
    column-pruned scan + filter, pushed to the source by Catalyst.
    """

    @F.pandas_udf("string")
    def _doc_id(urls: pd.Series) -> pd.Series:
        return urls.map(kvs_hash)

    return (
        pages.where(_url_ok())
        .select(_doc_id(F.col("url")).alias("doc_id"), "url", "text")
    )


def build_postings(docs: DataFrame) -> DataFrame:
    """Partition-local posting construction: one row per (term, doc).

    Input: (doc_id, url, text). Output: POSTINGS_SCHEMA. No shuffle —
    the Arrow batches stream through a single python worker per
    partition; positions/tf/l2_norm are computed per document exactly as
    Indexer.java:56-99 (incl. the tag strip at line 35 that removes the
    appended link anchors before tokenization).

    Scale-adaptive parallelism (guide §2, "derive from input size"): a
    small corpus in one parquet file/row-group would tokenize AND be
    cached serially, while blindly fanning out to defaultParallelism
    makes every downstream cached-postings query schedule a task per
    core for droplets of data (measured: p50 483 ms at 32 cached
    partitions vs 241 ms at 4 for a 139k-row postings cache). So when
    the input has fewer partitions than cores, size the fan-out from
    the plan's estimated input bytes at TOKENIZE_SPLIT_BYTES per task,
    capped at defaultParallelism; at real scale the scan already
    yields >= defaultParallelism splits and the guard is a no-op.
    Streaming inputs pass through untouched (repartitioning is the
    caller's choice there).
    """
    if not docs.isStreaming:
        sc = docs.sparkSession.sparkContext
        par = sc.defaultParallelism
        cur = docs.rdd.getNumPartitions()
        # cur == par needs no adjustment either way — skip the stats
        # probe (each plan analysis costs tens of ms on deep pipelines
        # like the WARC read->extract chain, real money on a timed path)
        if cur != par:
            est = int(
                docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            want = max(1, min(par, -(-est // TOKENIZE_SPLIT_BYTES)))
            if cur < want:
                # under-split (one file / one cached partition): fan out
                docs = docs.repartition(want)
            elif cur > par and want < par:
                # over-split SMALL input (want < par proves the whole
                # input is under par*TOKENIZE_SPLIT_BYTES): each python
                # task has a ~15-20 ms fixed cost, so 2x-cores task
                # counts on droplet inputs double the stage (measured
                # 1.23 s at 64 tasks vs 0.61 s at 8 for the same 5k
                # docs). repartition, NOT coalesce — coalesce would
                # also collapse any python stages upstream of the
                # exchange. Cannot fire at real scale: there want == par.
                docs = docs.repartition(want)

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_term, out_doc, out_url, out_tf, out_pos, out_l2 = [], [], [], [], [], []
            out_dl = []
            for doc_id, url, text in zip(pdf["doc_id"], pdf["url"], pdf["text"]):
                if text is None:
                    continue
                page = _TAG_RE.sub(" ", text)
                positions, l2 = index_tokenize(page)
                # per-doc length (sum of tfs, raw+stem) denormalized into
                # every posting row: BM25 scoring then needs NO doc_stats
                # join — the self-contained-postings serving layout
                dl = sum(len(p) for p in positions.values())
                for term, plist in positions.items():
                    out_term.append(term)
                    out_doc.append(doc_id)
                    out_url.append(url)
                    out_tf.append(len(plist))
                    out_pos.append(plist)
                    out_l2.append(l2)
                    out_dl.append(dl)
            # positions must stay an object column even when the batch
            # yields zero rows (a batch of token-less docs): an empty
            # list infers float64, which Arrow can't cast to list<int>
            yield pd.DataFrame(
                {
                    "term": out_term,
                    "doc_id": out_doc,
                    "url": out_url,
                    "tf": out_tf,
                    "positions": pd.Series(out_pos, dtype="object"),
                    "l2_norm": out_l2,
                    "dl": out_dl,
                }
            )

    return docs.mapInPandas(tokenize, schema=POSTINGS_SCHEMA)


def build_posting_lists(
    postings: DataFrame, salt_buckets: int = 0
) -> DataFrame:
    """Term-sharded merge: (term, df, postings sorted by doc_id).

    Replaces the reference's foldByKey string concat (Indexer.java:
    115-126) with typed struct lists sorted by doc_id (deterministic —
    the reference's checker is order-insensitive, HW9Test.java:119).

    ``salt_buckets > 0`` enables the two-phase salted aggregation for
    head-term skew: partial collect per (term, salt) — Spark shuffles
    (term, salt), so a stopword-like term spreads over ``salt_buckets``
    reducers — then a final merge per term. At 10^12 docs the head term
    still dominates one final reducer; production layout blocks the
    final list (see compression.block_postings) instead of holding it
    whole, so the merge is flatten + sort of pre-sorted blocks.
    """
    entry = F.struct(
        F.col("doc_id"), F.col("url"), F.col("tf"), F.col("positions"), F.col("l2_norm")
    )
    if salt_buckets > 0:
        partial = (
            postings.withColumn(
                "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
            )
            .groupBy("term", "_salt")
            .agg(
                F.collect_list(entry).alias("_part"),
                F.count(F.lit(1)).alias("_cnt"),
            )
        )
        merged = partial.groupBy("term").agg(
            F.flatten(F.collect_list("_part")).alias("_all"),
            F.sum("_cnt").alias("df"),
        )
    else:
        merged = postings.groupBy("term").agg(
            F.collect_list(entry).alias("_all"),
            F.count(F.lit(1)).alias("df"),
        )
    return merged.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.array_sort("_all").alias("postings"),  # struct sort: doc_id first field
    )


def build_index(
    pages: DataFrame, salt_buckets: int = 0
) -> tuple[DataFrame, DataFrame]:
    """pages -> (postings flat table, doc_stats) — the full index build.

    doc_stats carries per-document token counts for BM25 (dl, and avgdl
    by aggregation). Both outputs should be persisted (parquet/Iceberg,
    postings partitioned/bucketed by term) by the caller.
    """
    docs = docs_from_pages(pages)
    postings = build_postings(docs)
    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum(F.col("tf")).alias("n_term_entries"),
        F.first("l2_norm").alias("l2_norm"),
        F.count(F.lit(1)).alias("n_distinct_terms"),
    )
    return postings, doc_stats
