"""Iterative DataFrame PageRank over the extracted link graph.

Replaces the reference PageRank job (/root/reference
src/cis5550/jobs/PageRank.java:115-302) with DataFrame joins:

Semantics pinned by the reference (golden: HW9Test.java:213-241):
- ranks initialize to 1.0 ("sums to N" formulation), damping 0.85 with
  source term +0.15 per iteration (PageRank.java:154, 179, 220);
- vertex set = crawled pages only; contributions to non-crawled link
  targets are dropped (the reference's inner join at PageRank.java:205),
  i.e. rank leaks at dangling edges; sinks receive no redistribution;
- out-degree = count of *deduped* extracted outlinks per page,
  including targets outside the vertex set (PageRank.java:170-186);
- two convergence criteria evaluated in order each iteration
  (PageRank.java:249-277): percentage of vertices with
  |new - prev| <= threshold reaching ``conv_pct``, else max diff <
  threshold.

Scale notes: each iteration is one join + one aggregation, both keyed
by doc_id; ``ranks`` is re-checkpointed every iteration to truncate
lineage (localCheckpoint in local mode; a checkpoint dir / Iceberg
snapshot on a cluster), and AQE handles in-degree skew on the
aggregation side.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .kernels.hasher import kvs_hash
from .kernels.urls import extract_links

EDGES_SCHEMA = "src string, dst string"


def extract_edges(pages: DataFrame) -> DataFrame:
    """(src doc_id, dst doc_id) from anchor tags in the text column.

    Matches PageRank.java:127-155: per page, extract hrefs (anchor
    regex), normalize against the page url, filter protocols/extensions,
    dedupe — then hash both endpoints. The reference reads the crawler's
    cleaned ``page`` column whose anchors are bare absolute
    ``<a href="...">`` tags; we read the equivalent ``text``/``url``.
    """

    def edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src_out, dst_out = [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                if text is None:
                    continue
                src = kvs_hash(url)
                for link in extract_links(text, url):
                    src_out.append(src)
                    dst_out.append(kvs_hash(link))
            yield pd.DataFrame({"src": src_out, "dst": dst_out})

    return pages.select("url", "text").mapInPandas(edges, schema=EDGES_SCHEMA)


def vertices_from_pages(pages: DataFrame) -> DataFrame:
    @F.pandas_udf("string")
    def _h(urls: pd.Series) -> pd.Series:
        return urls.map(kvs_hash)

    return pages.select(_h(F.col("url")).alias("doc_id")).distinct()


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    threshold: float = 0.001,
    conv_pct: float = 100.0,
    damping: float = 0.85,
    source: float = 0.15,
    max_iterations: int = 100,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Run power iteration; returns (doc_id, rank).

    ``vertices``: (doc_id) — the crawled set. ``edges``: (src, dst),
    already deduped per (src, dst) by extract_edges.
    """
    spark = vertices.sparkSession

    # out-degree over ALL outlinks (incl. dangling targets) — the
    # divisor the reference uses (links.length, PageRank.java:179).
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_w = edges.join(outdeg, "src")
    edges_w = edges_w.persist()
    edges_w.count()  # materialize once; reused every iteration

    total = vertices.count()
    ranks = vertices.select(
        "doc_id", F.lit(1.0).alias("rank"), F.lit(1.0).alias("prev")
    ).localCheckpoint()

    for it in range(max_iterations):
        contribs = (
            edges_w.join(ranks.select("doc_id", "rank"), edges_w.src == ranks.doc_id)
            .select(
                F.col("dst").alias("doc_id"),
                (F.lit(damping) * F.col("rank") / F.col("outdeg")).alias("contrib"),
            )
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("incoming"))
        )
        new_ranks = (
            ranks.select("doc_id", F.col("rank").alias("prev"))
            .join(contribs, "doc_id", "left")
            .select(
                "doc_id",
                (F.coalesce(F.col("incoming"), F.lit(0.0)) + F.lit(source)).alias("rank"),
                "prev",
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint()

        stats = new_ranks.agg(
            F.sum(
                (F.abs(F.col("rank") - F.col("prev")) <= threshold).cast("long")
            ).alias("n_ok"),
            F.max(F.abs(F.col("rank") - F.col("prev"))).alias("max_diff"),
        ).collect()[0]
        ranks = new_ranks
        pct = (stats["n_ok"] / total) * 100.0 if total else 100.0
        if pct >= conv_pct:
            break
        if stats["max_diff"] is not None and stats["max_diff"] < threshold:
            break

    edges_w.unpersist()
    return ranks.select("doc_id", "rank")


def pagerank_from_pages(pages: DataFrame, **kw) -> DataFrame:
    return pagerank(vertices_from_pages(pages), extract_edges(pages), **kw)


def bfs_depths(seeds: DataFrame, edges: DataFrame, max_depth: int) -> DataFrame:
    """Frontier-expansion BFS — the crawler's traversal core in pure
    graph form (crawler.py runs the same loop with fetch/robots
    semantics attached; Crawler.java's frontier rounds). Returns
    (doc_id, depth): the shortest hop count from any seed, bounded by
    ``max_depth``; unreached vertices are absent.

    Each round is one equi-join (edges x frontier, keyed on src) plus
    one anti-join against the visited set — both shuffle on the
    frontier key only, so a round costs O(frontier out-edges), not
    O(graph). The frontier is localCheckpoint-ed per round to truncate
    lineage (a checkpoint dir on a real cluster), and the loop exits
    early when a round discovers nothing new.
    """
    visited = seeds.select(
        "doc_id", F.lit(0).alias("depth")
    ).localCheckpoint()
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("doc_id").alias("src")), "src"
            )
            .select(F.col("dst").alias("doc_id"))
            .distinct()
            .join(visited.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(d).alias("depth"))
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def hits_fixed_iters(
    vertices: DataFrame, edges: DataFrame, iters: int = 3
) -> DataFrame:
    """HITS (hubs & authorities, Kleinberg) for a fixed number of power
    iterations, in the EXACT integer formulation: starting from
    hub = auth = 1, each iteration sets auth(v) = sum of hub over
    in-edges then hub(u) = sum of the NEW auth over out-edges —
    without per-iteration normalization the scores are integer counts
    of weighted paths, so the computation is exact in any engine and
    the induced ranking is identical to normalized HITS (normalization
    divides every score by the same scalar). Scores grow by at most
    (max_indeg * max_outdeg)^iters, so fixed small iteration counts
    stay well inside int64 (callers needing many iterations should
    normalize and accept float semantics).

    vertices: (id); edges: (src, dst). Returns (id, auth, hub) for
    every vertex (0 for vertices with no in/out edges).

    Scale shape: per iteration, two shuffle joins of the edge relation
    against a vertex-sized score relation and two key aggregations —
    the standard distributed power-iteration step (same as
    pagerank()); lineage is cut per iteration with localCheckpoint so
    plan depth stays O(1). Complements pagerank(): HITS is the other
    classic link-analysis ranker (query-dependent root-set scoring in
    the original paper), reference analog jobs/PageRank.java:115-302.
    """
    ids = vertices.select("id")
    hub = ids.select("id", F.lit(1).cast("long").alias("hub"))
    auth = None
    for _ in range(iters):
        na = (
            edges.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("v"))
        )
        auth = (
            ids.join(na, "id", "left")
            .select("id", F.coalesce("v", F.lit(0)).cast("long").alias("auth"))
            .localCheckpoint(eager=False)
        )
        nh = (
            edges.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("v"))
        )
        hub = (
            ids.join(nh, "id", "left")
            .select("id", F.coalesce("v", F.lit(0)).cast("long").alias("hub"))
            .localCheckpoint(eager=False)
        )
    return auth.join(hub, "id")


def _undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple-graph view: (lo, hi) with lo < hi,
    self-loops dropped, deduplicated — shared by the triangle and
    clustering-coefficient operators so one query canonicalizes the
    edge relation exactly once."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .distinct()
    )


def triangle_counts(
    vertices: DataFrame, edges: DataFrame, und: DataFrame | None = None
) -> DataFrame:
    """Per-vertex triangle counting over the undirected view of a link
    graph — the classic MapReduce graph benchmark and the basis of
    clustering-coefficient / community features. Edges are
    canonicalized to (lo, hi) with lo < hi and deduplicated, triangles
    enumerated once each as a < b < c via two equi-joins plus a
    closing-edge join, then each triangle credits its three corners.
    All integers, exact in any engine.

    Scale shape: the standard node-iterator join — every join is a
    keyed equi-join on a vertex column (shuffle or broadcast, never
    cartesian); the canonical a<b<c orientation means each triangle is
    produced exactly once, and the heavy middle join fans out only on
    true wedges. Skewed hubs (high-degree vertices) are the known hot
    key; production mitigation is degree-ordered orientation (point
    edges from low to high degree), which this canonical form
    approximates by id order.
    """
    if und is None:
        und = _undirected_edges(edges)
    ab = und.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = und.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = und.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    per = corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        vertices.select("id")
        .join(per, "id", "left")
        .select(
            "id", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
        )
    )


def clustering_coefficients(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: cc = 2T / (d(d-1))
    over the undirected simple graph (T = triangles at the vertex,
    d = degree) — the standard cohesion feature for link-spam and
    community detection. Integer T and d; the single ratio is rounded,
    so engines agree. Returns (id, degree, n_triangles, cc)."""
    und = _undirected_edges(edges)
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionAll(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(vertices, edges, und=und)
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            "n_triangles",
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                F.round(
                    2.0 * F.col("n_triangles")
                    / (F.col("degree") * (F.col("degree") - 1)),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("cc"),
        )
    )


def label_propagation(
    vertices: DataFrame, edges: DataFrame, iters: int = 3
) -> DataFrame:
    """Synchronous label-propagation community detection over the
    undirected simple-graph view: every vertex starts with its own id
    as label; each iteration every vertex adopts the most frequent
    label among its neighbors (ties -> smallest label; isolated
    vertices keep their label). Fixed ``iters`` synchronous rounds and
    the integer tie-break make the result exact across engines — no
    convergence test, no randomness (the classic async LPA is
    order-dependent; the synchronous fixed-iteration form is the
    reproducible variant a data pipeline wants). Each round is one
    neighbor join + one (vertex, label) count + one top-1 window over
    per-vertex label counts — partitioned by vertex, never global.
    Cost: iters passes over the edge relation; at 10^12 edges this is
    the GraphFrames LPA shape (join + agg per superstep)."""
    from pyspark.sql import Window

    und = _undirected_edges(edges)
    adj = und.unionAll(
        und.select(F.col("hi").alias("lo"), F.col("lo").alias("hi"))
    )  # both directions: (lo -> hi) neighbor pairs
    labels = vertices.select(F.col("id"), F.col("id").alias("lbl"))
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("lbl"))
    for _ in range(iters):
        neigh = adj.join(
            labels.withColumnRenamed("id", "hi"), "hi"
        ).select(F.col("lo").alias("id"), "lbl")
        counts = neigh.groupBy("id", "lbl").agg(F.count(F.lit(1)).alias("cnt"))
        top = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", "lbl")
        )
        labels = (
            vertices.select("id")
            .join(top, "id", "left")
            .join(
                labels.withColumnRenamed("lbl", "prev"), "id"
            )
            .select("id", F.coalesce("lbl", "prev").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels.select("id", F.col("lbl").alias("community"))
