"""SearchEngine facade: the end-to-end API a reference user would call.

Replaces the reference's job-submission + HTTP flow (FlameSubmit ->
Indexer/PageRank jobs; RankerStarter's /search route —
/root/reference src/cis5550/) with one object:

    eng = SearchEngine(spark)
    eng.build(pages_df)          # index + pagerank (or .build_from_parquet)
    eng.search("apples figs")    # reference-identical TF-IDF x PageRank
    eng.search_bm25("apples", k=10, pruned=True)   # BM25, MaxScore path

State lives in persisted/cached DataFrames, not a KVS; ``save``/``load``
round-trip the built index through parquet (Iceberg on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .compression import assign_doc_indexes, block_postings
from .indexer import build_postings, docs_from_pages
from .pagerank import extract_edges, pagerank, vertices_from_pages
from .ranker import expand_query, score_bm25, score_tfidf
from .wand import blocked_maxscore_topk, maxscore_topk

TERM_BUCKETS = 64


class SearchEngine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.postings: DataFrame | None = None
        self.doc_stats: DataFrame | None = None
        self.term_df: DataFrame | None = None
        self.pageranks: DataFrame | None = None
        self.total_documents: int = 0
        self._avgdl: float | None = None

    # -- build ------------------------------------------------------------

    def build(self, pages: DataFrame, run_pagerank: bool = True,
              pagerank_threshold: float = 0.001) -> "SearchEngine":
        """pages(url, text[, html, lang]) -> cached index + pageranks."""
        docs = docs_from_pages(pages)
        self.postings = build_postings(docs).persist()
        self.doc_stats = (
            self.postings.groupBy("doc_id", "url")
            .agg(F.sum("tf").alias("n_term_entries"))
            .persist()
        )
        self.total_documents = self.doc_stats.count()
        self._avgdl = float(
            self.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0] or 1.0
        )
        # dictionary table: per-term df precomputed once at build time
        # so BM25 queries skip the per-query df aggregation
        self.term_df = (
            self.postings.groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
            .persist()
        )
        self.term_df.count()
        if run_pagerank:
            self.pageranks = pagerank(
                vertices_from_pages(pages),
                extract_edges(pages),
                threshold=pagerank_threshold,
            ).persist()
        return self

    def save(self, path: str) -> None:
        assert self.postings is not None, "build first"
        self.postings.write.mode("overwrite").parquet(f"{path}/postings")
        self.doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
        if self.term_df is not None:
            self.term_df.write.mode("overwrite").parquet(f"{path}/term_df")
        if self.pageranks is not None:
            self.pageranks.write.mode("overwrite").parquet(f"{path}/pageranks")

    # -- blocked (compressed, term-bucket-partitioned) layout ---------------

    def save_blocked(self, path: str) -> None:
        """Persist the compressed blocked index, hive-partitioned by a
        hash bucket of the term: a query's term filter becomes
        *partition pruning* at the scan — only TERM_BUCKETS'
        worth of the index relevant to the query terms is read, the
        100 TB serving layout."""
        assert self.postings is not None, "build first"
        idx = assign_doc_indexes(self.postings.select("doc_id", "url").distinct())
        blocks = block_postings(self.postings.join(F.broadcast(idx), "doc_id"))
        (
            blocks.withColumn(
                "term_bucket", F.pmod(F.xxhash64("term"), F.lit(TERM_BUCKETS))
            )
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{path}/blocks")
        )
        (
            self.doc_stats.join(F.broadcast(idx.drop("url")), "doc_id")
            .select("doc_index", "url", "n_term_entries")
            .write.mode("overwrite")
            .parquet(f"{path}/doc_stats_idx")
        )

    def search_bm25_blocked(self, index_path: str, query: str, k: int = 10) -> DataFrame:
        """BM25 top-k straight off the on-disk blocked index: the term
        filter prunes term_bucket partitions before any decode."""
        blocks = self.spark.read.parquet(f"{index_path}/blocks")
        words = sorted({w.lower() for w in expand_query(query)})
        if words:
            # partition pruning: restrict the scan to the query terms'
            # hash buckets (xxhash64 must match save_blocked's)
            buckets = (
                self.spark.createDataFrame([(w,) for w in words], "term string")
                .select(F.pmod(F.xxhash64("term"), F.lit(TERM_BUCKETS)).alias("b"))
                .collect()
            )
            blocks = blocks.where(
                F.col("term_bucket").isin([r["b"] for r in buckets])
            )
        doc_stats_idx = self.spark.read.parquet(f"{index_path}/doc_stats_idx")
        total = doc_stats_idx.count()
        return blocked_maxscore_topk(
            self.spark, query, blocks.drop("term_bucket"), doc_stats_idx, total, k=k
        )

    def load(self, path: str, with_pageranks: bool = True) -> "SearchEngine":
        self.postings = self.spark.read.parquet(f"{path}/postings").persist()
        self.doc_stats = self.spark.read.parquet(f"{path}/doc_stats").persist()
        self.total_documents = self.doc_stats.count()
        self._avgdl = float(
            self.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0] or 1.0
        )
        try:
            self.term_df = self.spark.read.parquet(f"{path}/term_df").persist()
        except Exception:
            self.term_df = None
        if with_pageranks:
            try:
                self.pageranks = self.spark.read.parquet(f"{path}/pageranks").persist()
            except Exception:
                self.pageranks = None
        return self

    # -- query ------------------------------------------------------------

    def search(self, query: str, k: int | None = None) -> DataFrame:
        """Reference-identical TF-IDF x PageRank ranking (full list, or
        top-k when ``k`` is given — the reference returns the full list,
        RankerStarter.java:87-94)."""
        assert self.postings is not None, "build or load first"
        res = score_tfidf(
            self.spark, query, self.postings, self.pageranks, self.total_documents
        )
        return res.limit(k) if k else res

    def search_bm25(self, query: str, k: int = 10, pruned: bool = False) -> DataFrame:
        """BM25 top-k; ``pruned=True`` routes through the MaxScore plan
        (identical scores, skips non-essential posting scans)."""
        assert self.postings is not None, "build or load first"
        if pruned:
            return maxscore_topk(
                self.spark, query, self.postings, self.doc_stats,
                self.total_documents, k=k,
            )
        return score_bm25(
            self.spark, query, self.postings, self.doc_stats,
            self.total_documents, avgdl=self._avgdl, term_df=self.term_df,
        ).limit(k)

    def unpersist(self) -> None:
        for df in (self.postings, self.doc_stats, self.term_df, self.pageranks):
            if df is not None:
                df.unpersist()
