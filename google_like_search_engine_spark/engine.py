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

    # -- low-latency serving path ------------------------------------------

    DICT_CAP = 2_000_000  # max dictionary entries held driver-side

    def enable_serving(self) -> bool:
        """Pin the serving state the reference ranker keeps in RAM
        (RankerStarter.java:29-60 loads all index keys + pageranks into
        memory): a driver-side {term: df} dictionary plus a pre-joined
        cached (term, url, tf, dl) relation. A BM25 query then compiles
        to ONE Spark job — an IN-list term filter (no join), literal
        idf map, one groupBy + partial top-k. Returns False (and stays
        on the join path) when the vocabulary exceeds DICT_CAP — at
        web scale the dictionary is sharded on the cluster instead."""
        assert self.postings is not None and self.term_df is not None
        if self.term_df.count() > self.DICT_CAP:
            return False
        self._dict = {r["term"]: int(r["df"]) for r in self.term_df.collect()}
        self._served = (
            self.postings.join(
                self.doc_stats.select("doc_id", "n_term_entries"), "doc_id"
            )
            .select("term", "url", "tf", "n_term_entries")
            .persist()
        )
        self._served.count()
        return True

    def search_bm25_served(
        self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75
    ) -> DataFrame:
        """Single-job BM25 top-k off the pinned serving state (score
        identical to search_bm25; property-tested)."""
        import math

        from .ranker import expand_query

        assert getattr(self, "_served", None) is not None, "enable_serving first"
        words = sorted({w.lower() for w in expand_query(query)})
        hit = [w for w in words if w in self._dict]
        if not hit:
            return self.spark.createDataFrame([], "url string, score double")
        n = float(self.total_documents)
        idf = {
            w: math.log((n - self._dict[w] + 0.5) / (self._dict[w] + 0.5) + 1.0)
            for w in hit
        }
        idf_map = F.create_map(
            *[x for w in hit for x in (F.lit(w), F.lit(idf[w]))]
        )
        partial = (
            idf_map[F.col("term")]
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("n_term_entries") / F.lit(self._avgdl))
            )
        )
        return (
            self._served.where(F.col("term").isin(hit))
            .select("url", partial.alias("partial"))
            .groupBy("url")
            .agg(F.sum("partial").alias("score"))
            .orderBy(F.desc("score"), F.asc("url"))
            .limit(k)
        )

    def unpersist(self) -> None:
        for df in (
            self.postings,
            self.doc_stats,
            self.term_df,
            self.pageranks,
            getattr(self, "_served", None),
        ):
            if df is not None:
                df.unpersist()
