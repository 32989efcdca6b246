"""Frontier-BFS crawl job with delta checkpoints, robots + redirect gates.

The Spark analog of the reference's iterative crawl loop
(Crawler.java:97-461): a frontier table expands breadth-first, each
round fetching the frontier, extracting + normalizing outlinks with the
same URL kernels the reference uses (kernels/urls.py), and appending to
a visited table.

Checkpointing (``pt-url``-style, Crawler.java:439-460 persists the URL
table continuously; resume re-reads it, Crawler.java:52-70) is
per-round DELTAS: round r persists only the rows discovered in round r
(plus the next frontier), so checkpoint I/O is O(corpus) over the whole
crawl instead of the O(rounds x corpus) a full-table rewrite per round
costs. Every ``compact_every`` rounds the deltas fold into one
``visited_full`` snapshot and older round dirs are deleted, bounding
both resume-read fan-in and state-dir growth. Resume reconstructs
visited = latest snapshot + subsequent deltas and re-does at most the
one unfinished round.

Crawl-control gates (all of the reference's, batch-shaped):
- robots exclusion + crawl-delay (RobotExclusionProtocol.java:11-65,
  Crawler.java:223, 512-534) via a (host, robots_txt) table,
- redirect chains with the reference's hop cap (Crawler.java:265-304),
- per-host politeness / cumulative host caps / blacklist /
  content-seen dedup / frontier cap (see ``crawl``).

This sandbox has no network, so the "web" is any pages table
(url, text) acting as the fetch oracle — fetching a frontier is a join
against it; ``robots`` and ``redirects`` tables play the same oracle
role for /robots.txt bodies and 3xx responses. On a real deployment
``_fetch`` is the only piece to replace (an Arrow-batched HTTP fetcher
with per-host politeness); the frontier/visited/checkpoint machinery is
fetch-agnostic.

Scale notes: every round is one join + one distinct + one anti-join,
all keyed on url — at web scale pre-bucket ``pages`` by url so the
per-round fetch join is shuffle-free; the per-host cap (politeness
analog) bounds frontier skew from link farms on a single host; the
visited relation is only ever read (scan of snapshot + deltas), never
rewritten.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

VISITED_SCHEMA = "url string, depth int, status string, content_hash string"
FRONTIER_SCHEMA = "url string, depth int, hops int"

MAX_REDIRECT_HOPS = 3  # Crawler.java:279 (previousRedirects > 3 -> stop)


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
        .mapInPandas(run, schema="url string, depth int")
        .groupBy("url")
        .agg(F.min("depth").alias("depth"))
    )


def _round_dir(state_dir: str, r: int) -> str:
    return f"{state_dir}/round={r:05d}"


def _jpath(spark: SparkSession, p: str):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(p)


def _fs(spark: SparkSession, p: str):
    return _jpath(spark, p).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )


def _exists(spark: SparkSession, p: str) -> bool:
    return _fs(spark, p).exists(_jpath(spark, p))


def _list_rounds(spark: SparkSession, state_dir: str) -> list:
    """Sorted round numbers with a round dir present."""
    fs = _fs(spark, state_dir)
    root = _jpath(spark, state_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("round="):
            out.append(int(name.split("=")[1]))
    return sorted(out)


def _last_complete_round(spark: SparkSession, state_dir: str) -> int | None:
    """Highest round whose checkpoint finished (marker committed)."""
    best = None
    for r in _list_rounds(spark, state_dir):
        if _exists(spark, _round_dir(state_dir, r) + "/_COMPLETE"):
            best = r
    return best


def _write_marker(spark: SparkSession, state_dir: str, r: int) -> None:
    fs = _fs(spark, state_dir)
    fs.create(_jpath(spark, _round_dir(state_dir, r) + "/_COMPLETE"), True).close()


def _delete_rounds_before(spark: SparkSession, state_dir: str, r: int) -> None:
    fs = _fs(spark, state_dir)
    for old in _list_rounds(spark, state_dir):
        if old < r:
            fs.delete(_jpath(spark, _round_dir(state_dir, old)), True)


def _visited_paths(spark: SparkSession, state_dir: str, last: int) -> list:
    """Parquet paths reconstructing visited as of complete round ``last``:
    the newest snapshot at or before it, plus every later delta."""
    snap = None
    for r in _list_rounds(spark, state_dir):
        if r <= last and _exists(spark, _round_dir(state_dir, r) + "/visited_full"):
            snap = r
    paths = []
    if snap is not None:
        paths.append(_round_dir(state_dir, snap) + "/visited_full")
    start = 0 if snap is None else snap + 1
    for r in _list_rounds(spark, state_dir):
        if start <= r <= last and _exists(
            spark, _round_dir(state_dir, r) + "/visited_delta"
        ):
            paths.append(_round_dir(state_dir, r) + "/visited_delta")
    return paths


def _host_count_paths(spark: SparkSession, state_dir: str, last: int) -> list:
    """Parquet paths reconstructing cumulative per-host ok-counts as of
    complete round ``last``: newest host_full snapshot + later deltas
    (exactly the visited reconstruction, over the tiny counts tables)."""
    snap = None
    for r in _list_rounds(spark, state_dir):
        if r <= last and _exists(spark, _round_dir(state_dir, r) + "/host_full"):
            snap = r
    paths = []
    if snap is not None:
        paths.append(_round_dir(state_dir, snap) + "/host_full")
    start = 0 if snap is None else snap + 1
    for r in _list_rounds(spark, state_dir):
        if start <= r <= last and _exists(
            spark, _round_dir(state_dir, r) + "/host_delta"
        ):
            paths.append(_round_dir(state_dir, r) + "/host_delta")
    return paths


def _prep_robots(robots: DataFrame, user_agent: str) -> DataFrame:
    """(host, robots_txt) -> + crawl_delay_ms (Crawler.java:512-520)."""
    from .kernels.robots import parse_crawl_delay

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "robots_txt": pdf["robots_txt"],
                    "crawl_delay_ms": pdf["robots_txt"].map(parse_crawl_delay),
                }
            )

    return robots.select("host", "robots_txt").mapInPandas(
        run, schema="host string, robots_txt string, crawl_delay_ms double"
    )


def _robots_split(frontier: DataFrame, robots_prepped: DataFrame, user_agent: str):
    """-> (allowed frontier, robots_blocked frontier). Hosts absent from
    the robots table allow everything (the reference's NaN sentinel)."""
    from .kernels.robots import is_url_allowed
    from .kernels.urls import parse_url

    host = F.parse_url("url", F.lit("HOST"))
    joined = frontier.join(
        robots_prepped.select("host", "robots_txt"), host == F.col("host"), "left"
    ).drop("host")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = [
                is_url_allowed(txt, parse_url(u)[3] or "/", user_agent)
                if txt is not None
                else True
                for u, txt in zip(pdf["url"], pdf["robots_txt"])
            ]
            out = pdf[["url", "depth", "hops"]].copy()
            out["allowed"] = ok
            yield out

    flagged = joined.mapInPandas(
        run, schema="url string, depth int, hops int, allowed boolean"
    )
    return (
        flagged.where("allowed").drop("allowed"),
        flagged.where(~F.col("allowed")).drop("allowed"),
    )


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
    robots: DataFrame | None = None,
    redirects: DataFrame | None = None,
    user_agent: str | None = None,
    compact_every: int = 16,
) -> DataFrame:
    """BFS crawl of ``pages`` from ``seeds``; returns the visited table
    (url, depth, status, content_hash) and leaves a resumable DELTA
    checkpoint per round under ``state_dir``.

    Re-invoking with the same ``state_dir`` resumes after the last
    complete round (finished rounds are never re-fetched); a crawl that
    already converged returns the final visited table immediately.

    Crawl-control knobs (the reference's gates, batch-shaped):
    - ``max_per_host``: per-ROUND cap of frontier urls per host — the
      batch analog of the per-host politeness delay (Crawler.java:
      522-534); excess urls defer to later rounds (lossless). Hosts
      whose robots.txt declares a crawl-delay above the reference's
      1000 ms default are additionally capped at ONE fetch per round
      (a round models one delay quantum).
    - ``host_page_cap``: CUMULATIVE cap of fetched pages per host
      (Crawler.java:85-93); once a host reaches it, its remaining
      frontier lands in visited as ``host_capped``. Enforced at round
      granularity.
    - ``blacklist``: regex list; matching outlinks are discarded before
      they enter the frontier (Crawler.java:683-754).
    - ``dedup_content``: content-seen gate (Crawler.java:497-510).
    - ``max_frontier``: deterministic frontier pruning (the reference
      prunes at 1000 keeping a random 10%, Crawler.java:78, 412-437).
    - ``robots``: (host, robots_txt) table — the /robots.txt fetch
      oracle. Frontier urls disallowed for ``user_agent`` (reference
      rule priority: agent-specific section, else ``*``, else allow;
      first matching rule wins — RobotExclusionProtocol.java:11-65)
      are recorded as ``robots_blocked`` and never fetched.
    - ``redirects``: (src_url, dst_url) table — the 3xx oracle. A
      frontier url present here is recorded as ``redirect`` and its
      target enters the next frontier with hops+1; a url reached after
      more than MAX_REDIRECT_HOPS redirects stops the chain
      (``redirect_capped``, Crawler.java:265-304).

    Statuses: ok | missing | host_capped | dup_content | robots_blocked
    | redirect | redirect_capped.
    """
    if user_agent is None:
        from .kernels.robots import USER_AGENT

        user_agent = USER_AGENT
    robots_prepped = None
    if robots is not None:
        robots_prepped = _prep_robots(robots, user_agent).persist()
        slow_hosts = robots_prepped.where(
            F.col("crawl_delay_ms") > 1000.0
        ).select(F.col("host").alias("slow_host"))
    last = _last_complete_round(spark, state_dir)
    if last is None:
        visited_paths: list = []
        visited = spark.createDataFrame([], VISITED_SCHEMA)
        frontier = spark.createDataFrame(
            [(u, 0, 0) for u in sorted(set(seeds))], FRONTIER_SCHEMA
        )
        start = 0
    else:
        visited_paths = _visited_paths(spark, state_dir, last)
        if not visited_paths:
            # pre-delta checkpoint layout (round dirs holding visited/
            # instead of visited_delta/): resume from its full table
            # rather than crashing on an empty parquet path list
            legacy = _round_dir(state_dir, last) + "/visited"
            if _exists(spark, legacy):
                visited_paths = [legacy]
            else:
                raise ValueError(
                    f"incompatible checkpoint layout under {state_dir}: "
                    f"round {last} is marked complete but holds no visited "
                    "snapshot or deltas"
                )
        visited = spark.read.parquet(*visited_paths)
        frontier = spark.read.parquet(_round_dir(state_dir, last) + "/frontier")
        start = last + 1

    web = pages.select("url", "text")
    host = F.parse_url("url", F.lit("HOST"))

    # cumulative per-host ok-counts ride their own tiny delta tables
    # (host_delta per round, folded into host_full at compaction), so
    # the host_page_cap gate reads O(hosts) counts per round instead of
    # re-aggregating the whole visited relation every round
    host_paths: list = []
    host_base: DataFrame | None = None
    if host_page_cap is not None and last is not None:
        host_paths = _host_count_paths(spark, state_dir, last)
        if not host_paths:
            # checkpoint predates host-count deltas: seed the cumulative
            # counts from the resumed visited table once
            host_base = (
                visited.where(F.col("status") == "ok")
                .groupBy(host.alias("h"))
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
            )

    def _host_counts() -> DataFrame | None:
        parts = []
        if host_base is not None:
            parts.append(host_base)
        if host_paths:
            parts.append(spark.read.parquet(*host_paths).select("h", "n"))
        if not parts:
            return None
        allc = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        return allc.groupBy("h").agg(F.sum("n").alias("n"))

    for r in range(start, start + max_rounds):
        if frontier.isEmpty():
            break
        frontier_now = frontier
        deferred = None
        if max_per_host is not None or robots_prepped is not None:
            from pyspark.sql import Window as W

            w = W.partitionBy(host).orderBy("depth", "url")
            capped = frontier_now.withColumn("rn", F.row_number().over(w))
            if robots_prepped is not None:
                # crawl-delay politeness: one fetch per round for hosts
                # declaring a delay above the 1000 ms default; others
                # keep the global per-round cap (unbounded if unset)
                capped = capped.join(
                    F.broadcast(slow_hosts), host == F.col("slow_host"), "left"
                ).withColumn(
                    "cap",
                    F.when(F.col("slow_host").isNotNull(), F.lit(1)).otherwise(
                        F.lit(max_per_host if max_per_host is not None else 2**31 - 1)
                    ),
                ).drop("slow_host")
            else:
                capped = capped.withColumn("cap", F.lit(max_per_host))
            deferred = capped.where(F.col("rn") > F.col("cap")).drop("rn", "cap")
            frontier_now = capped.where(F.col("rn") <= F.col("cap")).drop("rn", "cap")

        robots_blocked = None
        if robots_prepped is not None:
            frontier_now, robots_blocked = _robots_split(
                frontier_now, robots_prepped, user_agent
            )

        host_capped = None
        if host_page_cap is not None:
            counts = _host_counts()
            if counts is not None:
                full_hosts = (
                    counts.where(F.col("n") >= host_page_cap).select("h")
                )
                host_capped = frontier_now.join(
                    full_hosts, host == F.col("h"), "left_semi"
                )
                frontier_now = frontier_now.join(
                    full_hosts, host == F.col("h"), "left_anti"
                )

        redirected = None
        redirect_dsts = None
        if redirects is not None:
            rd = redirects.select(
                F.col("src_url").alias("url"), "dst_url"
            )
            hit = frontier_now.join(rd, "url")
            frontier_now = frontier_now.join(rd.select("url"), "url", "left_anti")
            # chain cap: a REDIRECTING url reached after more than
            # MAX_REDIRECT_HOPS redirects stops the chain
            # (Crawler.java:279-283, previousRedirects > 3 -> return;
            # a 200 target is fetched regardless of hops, as there)
            followed = hit.where(F.col("hops") <= MAX_REDIRECT_HOPS)
            capped_hit = hit.where(F.col("hops") > MAX_REDIRECT_HOPS)
            redirected = (
                followed.select("url", "depth", F.lit("redirect").alias("status")),
                capped_hit.select(
                    "url", "depth", F.lit("redirect_capped").alias("status")
                ),
            )
            redirect_dsts = followed.select(
                F.col("dst_url").alias("url"),
                (F.col("depth") + 1).alias("depth"),
                (F.col("hops") + 1).alias("hops"),
            )

        fetched = frontier_now.join(web, "url")  # the "HTTP GET" of the round
        missing = frontier_now.join(web, "url", "left_anti")

        dup = None
        if dedup_content:
            from pyspark.sql import Window as W

            hashed = fetched.withColumn(
                "content_hash", F.md5(F.encode("text", "utf-8"))
            )
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
        if redirect_dsts is not None:
            outlinks = (
                outlinks.withColumn("hops", F.lit(0))
                .unionByName(redirect_dsts)
                .groupBy("url")
                .agg(F.min("depth").alias("depth"), F.min("hops").alias("hops"))
            )
        else:
            outlinks = outlinks.withColumn("hops", F.lit(0))
        if blacklist:
            for pat in blacklist:
                outlinks = outlinks.where(~F.col("url").rlike(pat))

        # this round's DELTA of visited rows
        nullhash = F.lit(None).cast("string").alias("content_hash")
        delta = fetched.select(
            "url", "depth", F.lit("ok").alias("status"), "content_hash"
        ).unionByName(
            missing.select("url", "depth", F.lit("missing").alias("status"), nullhash)
        )
        if dup is not None:
            delta = delta.unionByName(
                dup.select(
                    "url", "depth", F.lit("dup_content").alias("status"),
                    "content_hash",
                )
            )
        if host_capped is not None:
            delta = delta.unionByName(
                host_capped.select(
                    "url", "depth", F.lit("host_capped").alias("status"), nullhash
                )
            )
        if robots_blocked is not None:
            delta = delta.unionByName(
                robots_blocked.select(
                    "url", "depth", F.lit("robots_blocked").alias("status"), nullhash
                )
            )
        if redirected is not None:
            for part in redirected:
                delta = delta.unionByName(part.select("url", "depth", "status", nullhash))

        seen_urls = visited.select("url").unionByName(delta.select("url"))
        new_frontier = outlinks.join(seen_urls, "url", "left_anti")
        if deferred is not None:
            new_frontier = (
                new_frontier.unionByName(deferred)
                .groupBy("url")
                .agg(F.min("depth").alias("depth"), F.min("hops").alias("hops"))
                .join(seen_urls, "url", "left_anti")
            )
        if max_frontier is not None:
            new_frontier = new_frontier.orderBy("depth", "url").limit(max_frontier)

        # pt-url-style checkpoint, delta form: only this round's rows
        # land; re-reading from parquet also cuts the iterative lineage
        # (the reference's KVS played the same role)
        rd_dir = _round_dir(state_dir, r)
        delta.write.mode("overwrite").parquet(rd_dir + "/visited_delta")
        new_frontier.write.mode("overwrite").parquet(rd_dir + "/frontier")
        visited_paths = visited_paths + [rd_dir + "/visited_delta"]
        if host_page_cap is not None:
            # this round's per-host ok-counts, read back off the tiny
            # just-written delta (no recompute of the fetch join)
            (
                spark.read.parquet(rd_dir + "/visited_delta")
                .where(F.col("status") == "ok")
                .groupBy(host.alias("h"))
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .write.mode("overwrite")
                .parquet(rd_dir + "/host_delta")
            )
            host_paths = host_paths + [rd_dir + "/host_delta"]

        compact = (r + 1) % compact_every == 0
        if compact:
            # fold snapshot + deltas into one visited_full, then drop
            # older round dirs: state size and resume fan-in stay O(1)
            spark.read.parquet(*visited_paths).write.mode("overwrite").parquet(
                rd_dir + "/visited_full"
            )
            visited_paths = [rd_dir + "/visited_full"]
            if host_page_cap is not None:
                counts = _host_counts()
                if counts is not None:
                    counts.write.mode("overwrite").parquet(rd_dir + "/host_full")
                    host_paths = [rd_dir + "/host_full"]
                    host_base = None
        _write_marker(spark, state_dir, r)
        if compact:
            _delete_rounds_before(spark, state_dir, r)
        visited = spark.read.parquet(*visited_paths)
        frontier = spark.read.parquet(rd_dir + "/frontier")

    if robots_prepped is not None:
        robots_prepped.unpersist()
    return visited
