"""Frontier-BFS crawl job with checkpoint/resume.

The Spark analog of the reference's iterative crawl loop
(Crawler.java:97-461): a frontier table expands breadth-first, each
round fetching the frontier, extracting + normalizing outlinks with the
same URL kernels the reference uses (kernels/urls.py), and appending to
a visited table. State checkpoints to ``pt-url``-style parquet after
every round (Crawler.java:439-460 persists the URL table continuously;
resume re-reads it, Crawler.java:52-70), so a killed crawl re-does at
most the one unfinished round.

This sandbox has no network, so the "web" is any pages table
(url, text) acting as the fetch oracle — fetching a frontier is a join
against it. On a real deployment ``_fetch`` is the only piece to
replace (an Arrow-batched HTTP fetcher with per-host politeness); the
frontier/visited/checkpoint machinery is fetch-agnostic.

Scale notes: every round is one join + one distinct + one anti-join,
all keyed on url — at web scale pre-bucket ``pages`` by url so the
per-round fetch join is shuffle-free; the per-host cap (politeness
analog) bounds frontier skew from link farms on a single host.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

VISITED_SCHEMA = "url string, depth int, status string, content_hash string"
FRONTIER_SCHEMA = "url string, depth int"


def _extract_outlinks(fetched: DataFrame) -> DataFrame:
    """(url, depth, text) -> distinct (url=outlink, depth+1), via the
    reference's anchor-extraction + normalization kernels."""
    from .kernels.urls import extract_links

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, depths = [], []
            for url, depth, text in zip(pdf["url"], pdf["depth"], pdf["text"]):
                if text is None:
                    continue
                for link in extract_links(text, url):
                    urls.append(link)
                    depths.append(depth + 1)
            yield pd.DataFrame({"url": urls, "depth": depths})

    return (
        fetched.select("url", "depth", "text")
        .mapInPandas(run, schema=FRONTIER_SCHEMA)
        .groupBy("url")
        .agg(F.min("depth").alias("depth"))
    )


def _round_dir(state_dir: str, r: int) -> str:
    return f"{state_dir}/round={r:05d}"


def _last_complete_round(spark: SparkSession, state_dir: str) -> int | None:
    """Highest round whose checkpoint finished (both tables committed).

    Uses the Hadoop FS API so it works on any supported filesystem."""
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return None
    best = None
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not name.startswith("round="):
            continue
        r = int(name.split("=")[1])
        marker = jvm.org.apache.hadoop.fs.Path(
            _round_dir(state_dir, r) + "/_COMPLETE"
        )
        if fs.exists(marker) and (best is None or r > best):
            best = r
    return best


def _write_marker(spark: SparkSession, state_dir: str, r: int) -> None:
    sc = spark.sparkContext
    jvm = sc._jvm
    path = jvm.org.apache.hadoop.fs.Path(_round_dir(state_dir, r) + "/_COMPLETE")
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    fs.create(path, True).close()


def crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list,
    state_dir: str,
    max_rounds: int = 50,
    max_per_host: int | None = None,
    host_page_cap: int | None = None,
    blacklist: list | None = None,
    dedup_content: bool = False,
    max_frontier: int | None = None,
) -> DataFrame:
    """BFS crawl of ``pages`` from ``seeds``; returns the visited table
    (url, depth, status, content_hash) and leaves a resumable checkpoint
    per round under ``state_dir``.

    Re-invoking with the same ``state_dir`` resumes after the last
    complete round (finished rounds are never re-fetched); a crawl that
    already converged returns the final visited table immediately.

    Crawl-control knobs (the reference's gates, batch-shaped):
    - ``max_per_host``: per-ROUND cap of frontier urls per host — the
      batch analog of the per-host politeness delay (Crawler.java:
      522-534); excess urls defer to later rounds (lossless).
    - ``host_page_cap``: CUMULATIVE cap of fetched pages per host
      (Crawler.java:85-93 caps standard hosts at 200/25,000); once a
      host reaches it, its remaining frontier lands in visited as
      ``host_capped`` and is never fetched. Enforced at round
      granularity (a burst within one round may overshoot — the
      reference's per-fetch check is serial; a batch engine checks per
      superstep).
    - ``blacklist``: regex list; matching outlinks are discarded before
      they enter the frontier (Crawler.java:683-754).
    - ``dedup_content``: content-seen gate (Crawler.java:497-510) — a
      fetched page whose text hash was already fetched is recorded as
      ``dup_content`` and contributes no outlinks.
    - ``max_frontier``: frontier size cap with deterministic pruning
      (keep the (depth, url)-first ``max_frontier`` rows; the reference
      prunes its frontier at 1000 by keeping a random 10%,
      Crawler.java:78, 412-437 — deterministic-keep is a strengthening).

    Statuses: ok | missing | host_capped | dup_content.
    """
    last = _last_complete_round(spark, state_dir)
    if last is None:
        visited = spark.createDataFrame([], VISITED_SCHEMA)
        frontier = spark.createDataFrame(
            [(u, 0) for u in sorted(set(seeds))], FRONTIER_SCHEMA
        )
        start = 0
    else:
        visited = spark.read.parquet(_round_dir(state_dir, last) + "/visited")
        frontier = spark.read.parquet(_round_dir(state_dir, last) + "/frontier")
        start = last + 1

    web = pages.select("url", "text")
    host = F.parse_url("url", F.lit("HOST"))
    for r in range(start, start + max_rounds):
        if frontier.isEmpty():
            break
        if max_per_host is not None:
            from pyspark.sql import Window as W

            w = W.partitionBy(host).orderBy("depth", "url")
            capped = frontier.withColumn("rn", F.row_number().over(w))
            deferred = capped.where(F.col("rn") > max_per_host).drop("rn")
            frontier_now = capped.where(F.col("rn") <= max_per_host).drop("rn")
        else:
            deferred = None
            frontier_now = frontier

        host_capped = None
        if host_page_cap is not None:
            full_hosts = (
                visited.where(F.col("status") == "ok")
                .groupBy(host.alias("h"))
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") >= host_page_cap)
                .select("h")
            )
            host_capped = frontier_now.join(
                full_hosts, host == F.col("h"), "left_semi"
            )
            frontier_now = frontier_now.join(
                full_hosts, host == F.col("h"), "left_anti"
            )

        fetched = frontier_now.join(web, "url")  # the "HTTP GET" of the round
        missing = frontier_now.join(web, "url", "left_anti")

        dup = None
        if dedup_content:
            from pyspark.sql import Window as W

            hashed = fetched.withColumn(
                "content_hash", F.md5(F.encode("text", "utf-8"))
            )
            # cumulative content-seen set = hashes of already-fetched
            # pages; within the round, the url-first page per hash wins
            seen = (
                visited.where(F.col("content_hash").isNotNull())
                .select("content_hash")
                .distinct()
            )
            w = W.partitionBy("content_hash").orderBy("url")
            hashed = hashed.withColumn("rn", F.row_number().over(w))
            fetched = (
                hashed.where(F.col("rn") == 1)
                .join(seen, "content_hash", "left_anti")
                .drop("rn")
            )
            dup = hashed.where(F.col("rn") > 1).drop("rn").unionByName(
                hashed.where(F.col("rn") == 1)
                .join(seen, "content_hash", "left_semi")
                .drop("rn")
            )
        else:
            fetched = fetched.withColumn("content_hash", F.lit(None).cast("string"))

        outlinks = _extract_outlinks(fetched)
        if blacklist:
            for pat in blacklist:
                outlinks = outlinks.where(~F.col("url").rlike(pat))

        new_visited = visited.unionByName(
            fetched.select("url", "depth", F.lit("ok").alias("status"), "content_hash")
        ).unionByName(
            missing.select(
                "url", "depth", F.lit("missing").alias("status"),
                F.lit(None).cast("string").alias("content_hash"),
            )
        )
        if dup is not None:
            new_visited = new_visited.unionByName(
                dup.select(
                    "url", "depth", F.lit("dup_content").alias("status"),
                    "content_hash",
                )
            )
        if host_capped is not None:
            new_visited = new_visited.unionByName(
                host_capped.select(
                    "url", "depth", F.lit("host_capped").alias("status"),
                    F.lit(None).cast("string").alias("content_hash"),
                )
            )

        new_frontier = (
            outlinks.join(new_visited.select("url"), "url", "left_anti")
        )
        if deferred is not None:
            new_frontier = (
                new_frontier.unionByName(deferred)
                .groupBy("url")
                .agg(F.min("depth").alias("depth"))
                .join(new_visited.select("url"), "url", "left_anti")
            )
        if max_frontier is not None:
            new_frontier = new_frontier.orderBy("depth", "url").limit(max_frontier)

        # pt-url-style checkpoint: both tables land, then the round is
        # marked complete; re-reading from parquet also cuts the
        # iterative lineage (the reference's KVS played the same role)
        rd = _round_dir(state_dir, r)
        new_visited.write.mode("overwrite").parquet(rd + "/visited")
        new_frontier.write.mode("overwrite").parquet(rd + "/frontier")
        _write_marker(spark, state_dir, r)
        visited = spark.read.parquet(rd + "/visited")
        frontier = spark.read.parquet(rd + "/frontier")

    return visited
