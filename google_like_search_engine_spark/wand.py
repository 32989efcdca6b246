"""Exact top-k pruning for BM25: relational MaxScore (WAND family).

The naive path scores every document containing any query term. At
10^12 docs a stopword-like query term makes that a full-corpus scan.
MaxScore/WAND prune exactly: a document that appears ONLY in
low-upper-bound ("non-essential") terms can never beat the running
threshold, so those terms' posting lists are only consulted for
candidate documents, never scanned in full.

This implementation is a DataFrame-level MaxScore, provably
score-identical to ranker.score_bm25 (property-tested in
tests/test_wand.py):

1. per-term upper bound: ub_t = idf_t * (k1+1)  (BM25 term
   contribution is monotone in tf and bounded by idf*(k1+1) as
   tf -> inf; a tighter bound with global max_tf per term and min dl is
   used when doc_stats are available).
2. threshold theta = exact k-th best score using only the
   highest-ub term's postings (a valid lower bound on the final k-th
   score; 0 when that list has < k entries).
3. essential terms = smallest suffix of terms (sorted by ub) whose
   ub-sum >= theta. Documents absent from all essential lists are
   provably below theta -> pruned.
4. full scoring runs only on candidates (left-semi join), reading
   non-essential lists through the candidate semi-join instead of a
   full scan; Catalyst turns the term filter into partition pruning
   when postings are stored partitioned/bucketed by term.

On blocked postings (compression.block_postings) step 4's semi-join
additionally skips whole blocks via (base, max_doc_index, max_tf)
metadata — the block-max part; the flat-posting form below keeps the
same plan shape.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from .ranker import expand_query


def _local_result_df(spark: SparkSession, rows: list,
                     value_col: str = "score",
                     value_type: str = "double") -> DataFrame:
    """(url, value) rows already resolved driver-side -> a DataFrame
    whose collect() is a LocalTableScan (zero Spark jobs). A plain
    createDataFrame would round-trip the rows through parallelize and
    cost one more scheduled job on the latency path."""
    if not rows:
        return spark.createDataFrame([], f"url string, {value_col} {value_type}")

    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "''")

    sqlt = value_type.upper()
    vals = ", ".join(
        f"('{esc(u)}', CAST({v!r} AS {sqlt}))" for u, v in rows
    )
    return spark.sql(
        f"SELECT url, {value_col} FROM (VALUES {vals}) AS t(url, {value_col})"
    )


def _bm25_partial(k1: float, b: float, n: float, avgdl: float):
    return (
        F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("n_term_entries") / F.lit(avgdl)))
    )


def blocked_maxscore_topk(
    spark: SparkSession,
    query: str,
    blocks: DataFrame,
    doc_stats_idx: DataFrame,
    total_documents: int,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    use_stems: bool = True,
    doc_stats_agg: tuple | None = None,
    term_stats: dict | None = None,
    small_query_entries: int = 100_000,
    url_lookup: dict | None = None,
    required: list | None = None,
    excluded: list | None = None,
) -> DataFrame:
    """Exact BM25 top-k over the compressed blocked index
    (compression.block_postings output) with block-level skipping.

    ``required``/``excluded``: boolean doc filters (`+term -term`
    syntax) — results must contain every required term and no excluded
    term (raw lowercased terms, matching the served path's semantics).
    Filters apply as semi/anti joins on decoded doc sets and force the
    all-matched-blocks scoring path: MaxScore's unfiltered upper bounds
    cannot order a FILTERED top-k, and a required term absent from the
    index yields an empty doc set, hence an empty result, with no
    dictionary lookup needed.

    ``doc_stats_idx``: (doc_index, url, n_term_entries). Score-identical
    to the flat maxscore_topk / naive scorer (property-tested).

    The block-max mechanics the doc-range-aligned layout enables:
    1. term stats come from block METADATA only (sum n_docs = df,
       max max_tf) — no decoding;
    2. theta is seeded by decoding only the highest-ub term's blocks;
    3. candidate doc_indexes come from decoding essential terms'
       blocks; non-essential terms then decode ONLY blocks whose
       doc-range intersects a candidate block (semi-join on block_id —
       whole blocks skip without touching their bytes).

    ``doc_stats_agg``: optional precomputed (avgdl, min_dl) and
    ``term_stats``: optional driver-side {term: (df, max_tf)}
    dictionary — both written by the build as sidecars — together they
    remove every per-query metadata job. When the matched posting
    volume (sum of term dfs, known from the dictionary or one metadata
    scan) is below ``small_query_entries``, the theta-seeding and
    essential-term machinery is skipped and all matched blocks score in
    ONE job — pruning can't save more than the extra driver round-trips
    cost on a small candidate set, and the result is identical either
    way (MaxScore is exact).

    ``url_lookup``: optional driver-side {doc_index: url} forward-index
    dictionary (engine sidecar, capped — the sandbox stand-in for the
    reference's KVS doc-store lookup after ranking). With it, the
    small-query fast path runs as ONE Spark job: the scoring
    aggregation collects the k (doc_index, score) winners and urls
    resolve driver-side, instead of a broadcast-exchange job + a
    lookup-join job against the doc-stats dimension. Result-identical
    (doc_index is assigned in url order, so the tiebreak matches).
    """
    from .compression import scoring_entries

    words = sorted({w.lower() for w in (expand_query(query) if use_stems else query.split())})
    if not words:
        return spark.createDataFrame([], "url string, score double")
    req = sorted({w.lower() for w in (required or [])})
    exc = sorted({w.lower() for w in (excluded or [])})
    n = float(total_documents)

    if doc_stats_agg is not None:
        avgdl, min_dl = float(doc_stats_agg[0]), float(doc_stats_agg[1])
    else:
        stats = doc_stats_idx.agg(
            F.avg("n_term_entries").alias("avgdl"), F.min("n_term_entries").alias("min_dl")
        ).collect()[0]
        avgdl = float(stats["avgdl"] or 1.0)
        min_dl = float(stats["min_dl"] or 1.0)

    # isin (not a broadcast-join with a literal DF): reaches the parquet
    # scan as PushedFilters In(term, ...) and costs no driver round-trip
    qblocks = blocks.where(F.col("term").isin(words))

    # (1) term stats: from the build-time dictionary when available
    # (zero jobs), else one metadata-only aggregation over the pruned
    # block scan
    if term_stats is not None:
        tstats = [
            {"term": w, "df": term_stats[w][0], "max_tf": term_stats[w][1]}
            for w in words
            if w in term_stats
        ]
    else:
        qblocks = qblocks.persist()
        tstats = (
            qblocks.groupBy("term")
            .agg(F.sum("n_docs").alias("df"), F.max("max_tf").alias("max_tf"))
            .collect()
        )
    if not tstats:
        if qblocks.is_cached:
            qblocks.unpersist()
        return spark.createDataFrame([], "url string, score double")

    def idf(df_):
        return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)

    ub = {
        r["term"]: idf(r["df"])
        * (float(r["max_tf"]) * (k1 + 1))
        / (float(r["max_tf"]) + k1 * (1 - b + b * min_dl / avgdl))
        for r in tstats
    }
    dfs = {r["term"]: int(r["df"]) for r in tstats}

    def _score_col():
        return (
            F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("n_term_entries") / F.lit(avgdl)))
        )

    # small-query fast path: total matched entries below the threshold
    # -> pruning saves less than its driver round-trips cost; score all
    # matched blocks in ONE job. idf enters as a literal map (no df-join,
    # no per-query createDataFrame — the single-job shape of the served
    # path, engine.search_bm25_served).
    if req or exc or sum(dfs.values()) <= small_query_entries:
        idf_map = F.create_map(
            *[x for t in dfs for x in (F.lit(t), F.lit(idf(dfs[t])))]
        )
        entries = scoring_entries(qblocks.where(F.col("term").isin(list(dfs))))
        # boolean filters: per-doc semi/anti joins against the decoded
        # doc sets of the filter terms (every entry of a doc survives
        # or drops together, so filtering entries == filtering docs)
        for w in req:
            entries = entries.join(
                scoring_entries(blocks.where(F.col("term") == w))
                .select("doc_index").distinct(),
                "doc_index", "left_semi",
            )
        if exc:
            entries = entries.join(
                scoring_entries(blocks.where(F.col("term").isin(exc)))
                .select("doc_index").distinct(),
                "doc_index", "left_anti",
            )

        def _partial(dl_col):
            return (
                idf_map[F.col("term")]
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * dl_col / F.lit(avgdl)))
            )

        if "dl" in entries.columns:
            # join-free scoring off the denormalized block dls; doc_index
            # is assigned in url order, so the doc_index tiebreak IS the
            # url tiebreak — urls are looked up for the k winners only
            topk = (
                entries.select("doc_index", _partial(F.col("dl")).alias("partial"))
                .groupBy("doc_index")
                .agg(F.sum("partial").alias("score"))
                .orderBy(F.desc("score"), F.asc("doc_index"))
                .limit(k)
            )
            if url_lookup is not None:
                rows = topk.collect()  # ONE job: TakeOrdered over the agg
                return _local_result_df(
                    spark,
                    [(url_lookup[r["doc_index"]], float(r["score"])) for r in rows],
                )
            # k rows: coalesce(1)+sortWithinPartitions gives the same
            # global order on collect WITHOUT a range-partitioning
            # exchange (whose sampling pass is a whole extra job)
            out = (
                topk.join(doc_stats_idx.select("doc_index", "url"), "doc_index")
                .select("url", "score")
                .coalesce(1)
                .sortWithinPartitions(F.desc("score"), F.asc("url"))
            )
        else:
            full = (
                entries.join(
                    doc_stats_idx.select("doc_index", "url", "n_term_entries"),
                    "doc_index",
                )
                .select("url", _partial(F.col("n_term_entries")).alias("partial"))
            )
            out = (
                full.groupBy("url")
                .agg(F.sum("partial").alias("score"))
                .orderBy(F.desc("score"), F.asc("url"))
                .limit(k)
            )
        if qblocks.is_cached:
            out = out.localCheckpoint(eager=True)
            qblocks.unpersist()
        return out

    dfc_all = spark.createDataFrame(
        [(t, dfs[t]) for t in dfs], "term string, df long"
    )

    # big query: the MaxScore path reads qblocks several times — cache it
    if not qblocks.is_cached:
        qblocks = qblocks.persist()

    # (2) theta from the best term only
    best_term = max(ub, key=ub.get)
    best_decoded = scoring_entries(qblocks.where(F.col("term") == best_term))
    scored_best = (
        best_decoded.join(F.broadcast(dfc_all), "term")
        .join(doc_stats_idx.select("doc_index", "n_term_entries"), "doc_index")
        .select(_score_col().alias("s"))
        .orderBy(F.desc("s"))
        .limit(k)
        .collect()
    )
    theta = float(scored_best[-1]["s"]) if len(scored_best) >= k else 0.0

    by_ub = sorted(ub.items(), key=lambda kv: kv[1])
    cum = 0.0
    essential = set(ub)
    for t, u in by_ub:
        if cum + u < theta:
            cum += u
            essential.discard(t)
        else:
            break

    # (2.5) TRUE block-max: per-block upper bound from metadata only.
    # A doc in block-range B scores at most the sum over query terms
    # with a block at B of idf_t * ub(block max_tf) — strictly below
    # theta means no doc in B can reach the top-k (theta lower-bounds
    # the final k-th score, and the k theta-seeding docs all lie in
    # live blocks, so >= k candidates always survive). This skips
    # ESSENTIAL-term blocks too — the part plain MaxScore can't do —
    # and touches only (term, block) metadata rows, never the bytes.
    if theta > 0.0:
        idf_by_term = {t2: idf(dfs[t2]) for t2 in dfs}
        live_blocks = _live_block_ids(
            qblocks, idf_by_term, theta, k1, b, min_dl, avgdl
        )
        qblocks_live = qblocks.join(live_blocks, "block_id", "left_semi")
    else:
        qblocks_live = qblocks

    ess_terms = spark.createDataFrame([(t,) for t in sorted(essential)], "term string")
    ess_decoded = scoring_entries(
        qblocks_live.join(F.broadcast(ess_terms), "term")
    ).persist()
    candidates = ess_decoded.select("doc_index").distinct()
    cand_blocks = candidates.select(
        (F.col("doc_index") / F.lit(float(_block_span(blocks)))).cast("long").alias("block_id")
    ).distinct()

    non_ess = sorted(set(ub) - essential)
    if non_ess:
        ne_terms = spark.createDataFrame([(t,) for t in non_ess], "term string")
        # (3) block skipping: only decode non-essential blocks whose
        # doc range holds a candidate
        ne_blocks = qblocks.join(F.broadcast(ne_terms), "term").join(
            F.broadcast(cand_blocks), "block_id", "left_semi"
        )
        decoded = ess_decoded.unionByName(scoring_entries(ne_blocks))
    else:
        decoded = ess_decoded

    full = (
        decoded.join(candidates, "doc_index", "left_semi")
        .join(F.broadcast(dfc_all), "term")
        .join(doc_stats_idx.select("doc_index", "url", "n_term_entries"), "doc_index")
        .select("url", _score_col().alias("partial"))
    )
    out = (
        full.groupBy("url")
        .agg(F.sum("partial").alias("score"))
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(k)
    )
    # materialize executor-side (k rows) so the persisted inputs can be
    # released without the caller's later action recomputing them; no
    # driver round-trip (the old collect + createDataFrame).
    out = out.localCheckpoint(eager=True)
    qblocks.unpersist()
    ess_decoded.unpersist()
    return out


def _live_block_ids(
    qblocks: DataFrame,
    idf_by_term: dict,
    theta: float,
    k1: float,
    b: float,
    min_dl: float,
    avgdl: float,
) -> DataFrame:
    """block_ids whose metadata-level BM25 upper bound can reach
    ``theta``: sum over the query terms present in the block of
    idf_t * block-max-tf contribution (with the global min_dl bound).
    Pure aggregation over (term, block_id, max_tf) metadata — no block
    bytes are touched. Blocks below theta are provably top-k-free.

    The comparison carries a relative epsilon slack: theta is computed
    JVM-side (F.log in the seeding job) while the block bounds use
    driver-side math.log idf literals, and at an exact boundary (k-th
    doc has tf == block max_tf and dl == min_dl) a 1-ulp log
    discrepancy between the two runtimes could otherwise prune the
    block holding a true top-k doc."""
    idf_lit = F.create_map(
        *[x for t in idf_by_term for x in (F.lit(t), F.lit(idf_by_term[t]))]
    )
    block_ub = (
        idf_lit[F.col("term")]
        * (F.col("max_tf") * (k1 + 1))
        / (F.col("max_tf") + k1 * (1 - b + b * min_dl / avgdl))
    )
    return (
        qblocks.groupBy("block_id")
        .agg(F.sum(block_ub).alias("_ub"))
        .where(F.col("_ub") >= theta * (1.0 - 1e-12) - 1e-300)
        .select("block_id")
    )


def blocked_maxscore_threshold(
    spark: SparkSession,
    query: str,
    blocks: DataFrame,
    doc_stats_idx: DataFrame,
    total_documents: int,
    threshold: float,
    k1: float = 1.2,
    b: float = 0.75,
    use_stems: bool = True,
    doc_stats_agg: tuple | None = None,
    round_to: int = 4,
    df_override: dict | None = None,
) -> DataFrame:
    """ALL documents whose BM25 score rounds to >= ``threshold`` —
    the score-threshold form of the MaxScore/block-max pruned path
    (reference capability: Ranker.java:64-118's scoring, pruned).

    This exists so the pruning machinery itself is ORACLE-CHECKABLE:
    MaxScore is exact, and unlike a top-k LIMIT over float-ordered rows
    (banned — boundary ties pick different rows per engine) a literal
    threshold with a wide score gap around it selects the same set in
    any engine. The oracle is plain relational BM25 + HAVING.

    The same pruning as blocked_maxscore_topk's big-query path runs,
    with theta := threshold - 0.5*10^-round_to - 1e-9: the final filter
    compares round(score, round_to) >= threshold, so any doc with true
    score >= threshold - 0.5*10^-round_to can round up into the result
    set and must survive pruning; the extra 1e-9 absorbs the <=1-ulp
    driver-math vs JVM log discrepancy (every pruning step is exact):
    1. non-essential terms: ub-sorted prefix with cumsum < theta —
       docs appearing only there are provably below the threshold;
    2. TRUE block-max: blocks whose metadata ub < theta are dropped
       before any byte/array is touched (essential terms included);
    3. candidates decode from essential terms' live blocks only;
       non-essential terms decode only candidate-intersecting blocks.
    Returns (url, score) with score rounded to ``round_to``.

    ``df_override``: {term: df} replacing the block-metadata dfs —
    the sharded path injects GLOBAL document frequencies here while
    max_tf/min_dl stay shard-local (valid: they only bound this
    shard's scores).
    """
    words = sorted(
        {w.lower() for w in (expand_query(query) if use_stems else query.split())}
    )
    empty = spark.createDataFrame([], "url string, score double")
    if not words:
        return empty
    n = float(total_documents)
    theta = threshold - 0.5 * 10.0 ** (-round_to) - 1e-9

    if doc_stats_agg is not None:
        avgdl, min_dl = float(doc_stats_agg[0]), float(doc_stats_agg[1])
    else:
        stats = doc_stats_idx.agg(
            F.avg("n_term_entries").alias("avgdl"),
            F.min("n_term_entries").alias("min_dl"),
        ).collect()[0]
        avgdl = float(stats["avgdl"] or 1.0)
        min_dl = float(stats["min_dl"] or 1.0)

    qblocks = blocks.where(F.col("term").isin(words)).persist()
    tstats = (
        qblocks.groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.max("max_tf").alias("max_tf"))
        .collect()
    )
    if not tstats:
        qblocks.unpersist()
        return empty

    def idf(df_):
        return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)

    dfs = {r["term"]: int(r["df"]) for r in tstats}
    if df_override is not None:
        dfs = {t2: int(df_override.get(t2, d)) for t2, d in dfs.items()}
    ub = {
        r["term"]: idf(dfs[r["term"]])
        * (float(r["max_tf"]) * (k1 + 1))
        / (float(r["max_tf"]) + k1 * (1 - b + b * min_dl / avgdl))
        for r in tstats
    }

    # (1) essential suffix by ub; a doc only in the dropped prefix
    # scores < theta < threshold
    by_ub = sorted(ub.items(), key=lambda kv: kv[1])
    cum = 0.0
    essential = set(ub)
    for t, u in by_ub:
        if cum + u < theta:
            cum += u
            essential.discard(t)
        else:
            break
    if not essential:  # sum of ALL ubs < theta: provably empty
        qblocks.unpersist()
        return empty

    # (2) block-max pruning straight off (term, block_id, max_tf) rows
    idf_by_term = {t2: idf(dfs[t2]) for t2 in dfs}
    live = _live_block_ids(qblocks, idf_by_term, theta, k1, b, min_dl, avgdl)
    qblocks_live = qblocks.join(live, "block_id", "left_semi")

    # (3) candidates from essential live blocks; non-essential terms
    # decode only blocks holding a candidate's doc range
    from .compression import scoring_entries

    ess_decoded = scoring_entries(
        qblocks_live.where(F.col("term").isin(sorted(essential)))
    ).persist()
    candidates = ess_decoded.select("doc_index").distinct()
    non_ess = sorted(set(ub) - essential)
    if non_ess:
        cand_blocks = candidates.select(
            (F.col("doc_index") / F.lit(float(_block_span(blocks))))
            .cast("long")
            .alias("block_id")
        ).distinct()
        ne_blocks = qblocks.where(F.col("term").isin(non_ess)).join(
            F.broadcast(cand_blocks), "block_id", "left_semi"
        )
        decoded = ess_decoded.unionByName(scoring_entries(ne_blocks))
    else:
        decoded = ess_decoded

    idf_map = F.create_map(
        *[x for t in idf_by_term for x in (F.lit(t), F.lit(idf_by_term[t]))]
    )

    def _partial(dl_col):
        return (
            idf_map[F.col("term")]
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * dl_col / F.lit(avgdl)))
        )

    if "dl" in decoded.columns:  # join-free off the denormalized block dls
        scored = decoded.join(candidates, "doc_index", "left_semi").select(
            "doc_index", _partial(F.col("dl")).alias("partial")
        )
    else:
        scored = (
            decoded.join(candidates, "doc_index", "left_semi")
            .join(
                doc_stats_idx.select("doc_index", "n_term_entries"), "doc_index"
            )
            .select("doc_index", _partial(F.col("n_term_entries")).alias("partial"))
        )
    survivors = (
        scored.groupBy("doc_index")
        .agg(F.round(F.sum("partial"), round_to).alias("score"))
        .where(F.col("score") >= F.lit(threshold))
    )
    out = (
        survivors.join(doc_stats_idx.select("doc_index", "url"), "doc_index")
        .select("url", "score")
        .localCheckpoint(eager=True)
    )
    qblocks.unpersist()
    ess_decoded.unpersist()
    return out


def _block_span(blocks: DataFrame) -> int:
    """Block span: read the persisted ``span`` metadata column
    (compression.block_postings writes it on every row). Falls back to
    inferring base/block_id for pre-span-column indexes, then to the
    build default — the old inference alone silently mis-sized spans
    on single-block indexes built with a non-default span."""
    if "span" in blocks.columns:
        r = blocks.select("span").limit(1).collect()
        if r:
            return int(r[0]["span"])
    r = (
        blocks.where(F.col("block_id") > 0)
        .select((F.col("base") / F.col("block_id")).cast("long").alias("span"))
        .limit(1)
        .collect()
    )
    if r:
        return int(r[0]["span"])
    from .compression import BLOCK_SPAN

    return BLOCK_SPAN


def maxscore_topk(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    doc_stats: DataFrame,
    total_documents: int,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    use_stems: bool = True,
) -> DataFrame:
    """Exact BM25 top-k with MaxScore pruning. Returns (url, score) desc,
    identical to ranker.score_bm25(...).limit(k)."""
    words = sorted({w.lower() for w in (expand_query(query) if use_stems else query.split())})
    if not words:
        return spark.createDataFrame([], "url string, score double")
    n = float(total_documents)

    stats = doc_stats.agg(
        F.avg("n_term_entries").alias("avgdl"), F.min("n_term_entries").alias("min_dl")
    ).collect()[0]
    avgdl = float(stats["avgdl"] or 1.0)
    min_dl = float(stats["min_dl"] or 1.0)

    terms = spark.createDataFrame([(w,) for w in words], "term string")
    matched = postings.join(F.broadcast(terms), "term").select(
        "term", "doc_id", "url", "tf"
    )

    # term stats: df and max_tf -> tight upper bound per term
    tstats = (
        matched.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.max("tf").alias("max_tf"))
        .collect()
    )
    if not tstats:
        return spark.createDataFrame([], "url string, score double")

    def idf(df_):
        return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)

    ub = {}
    for r in tstats:
        mt = float(r["max_tf"])
        ub[r["term"]] = idf(r["df"]) * (mt * (k1 + 1)) / (
            mt + k1 * (1 - b + b * min_dl / avgdl)
        )

    # theta: exact k-th score scoring only the highest-ub term
    dfs = {r["term"]: r["df"] for r in tstats}
    best_term = max(ub, key=ub.get)
    dfc_all = spark.createDataFrame(
        [(t, int(dfs[t])) for t in dfs], "term string, df long"
    )
    scored_best = (
        matched.where(F.col("term") == best_term)
        .join(F.broadcast(dfc_all), "term")
        .join(doc_stats.select("doc_id", "n_term_entries"), "doc_id")
        .select("doc_id", _bm25_partial(k1, b, n, avgdl).alias("s"))
        .orderBy(F.desc("s"))
        .limit(k)
        .collect()
    )
    theta = float(scored_best[-1]["s"]) if len(scored_best) >= k else 0.0

    # essential terms: smallest suffix by ub whose cumsum >= theta
    by_ub = sorted(ub.items(), key=lambda kv: kv[1])
    cum = 0.0
    essential = set(t for t, _ in by_ub)
    for t, u in by_ub:
        if cum + u < theta:
            cum += u
            essential.discard(t)
        else:
            break

    ess_terms = spark.createDataFrame([(t,) for t in sorted(essential)], "term string")
    candidates = (
        matched.join(F.broadcast(ess_terms), "term").select("doc_id").distinct()
    )
    full = (
        matched.join(candidates, "doc_id", "left_semi")
        .join(F.broadcast(dfc_all), "term")
        .join(doc_stats.select("doc_id", "n_term_entries"), "doc_id")
        .select("url", _bm25_partial(k1, b, n, avgdl).alias("partial"))
    )
    return (
        full.groupBy("url")
        .agg(F.sum("partial").alias("score"))
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(k)
    )


def blocked_phrase_topk(
    spark: SparkSession,
    phrase: str,
    blocks: DataFrame,
    doc_stats_idx: DataFrame,
    k: int = 10,
    url_lookup: dict | None = None,
) -> DataFrame:
    """Positional phrase query straight off the compressed blocked index
    — the query the positions varint store exists for (the reference's
    index keeps per-doc position lists, Indexer.java:64-82; its ranker
    never used them for phrases, so this is the capability completed).

    Block skipping before any byte is decoded: a doc containing the
    whole phrase must hold EVERY term, so only blocks whose doc-range
    contains all phrase terms (metadata intersection on block_id) are
    decoded. Adjacency is JVM-side: positions of term i+1 intersect
    (positions of term i) + 1, folded across the phrase.

    Positions are the index's own 1-based blank-counting token
    positions, so results agree with the index, by construction.
    Returns (url, n_occurrences) by descending count.
    """
    from .compression import unblock_postings

    words = [w.lower() for w in phrase.split() if w]
    if not words:
        return spark.createDataFrame([], "url string, n_occurrences long")
    uniq = sorted(set(words))
    qblocks = blocks.where(F.col("term").isin(uniq)).persist()

    # metadata-only block intersection: keep block_ids holding all terms
    full_blocks = (
        qblocks.groupBy("block_id")
        .agg(F.countDistinct("term").alias("nt"))
        .where(F.col("nt") == len(uniq))
        .select("block_id")
    )
    qblocks_hit = qblocks.join(full_blocks, "block_id", "left_semi")

    def term_positions(w):
        dec = unblock_postings(qblocks_hit.where(F.col("term") == w))
        return dec.select("doc_index", F.col("positions").alias("p"))

    cur = term_positions(words[0])
    for w in words[1:]:
        nxt = term_positions(w).withColumnRenamed("p", "p_next")
        cur = (
            cur.join(nxt, "doc_index")
            .select(
                "doc_index",
                F.array_intersect(
                    F.transform("p", lambda x: x + 1), F.col("p_next")
                ).alias("p"),
            )
            .where(F.size("p") > 0)
        )
    counts = cur.select(
        "doc_index", F.size("p").cast("long").alias("n_occurrences")
    )
    if url_lookup is not None:
        # engine layouts assign doc_index in url order, so the
        # doc_index tiebreak IS the url tiebreak; ONE job + driver-side
        # url resolution (see blocked_maxscore_topk)
        rows = (
            counts.orderBy(F.desc("n_occurrences"), F.asc("doc_index"))
            .limit(k)
            .collect()
        )
        qblocks.unpersist()
        return _local_result_df(
            spark,
            [(url_lookup[r["doc_index"]], int(r["n_occurrences"])) for r in rows],
            value_col="n_occurrences", value_type="bigint",
        )
    out = (
        counts.join(doc_stats_idx.select("doc_index", "url"), "doc_index")
        .select("url", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), F.asc("url"))
        .limit(k)
        .localCheckpoint(eager=True)
    )
    qblocks.unpersist()
    return out


def blocked_proximity_topk(
    spark: SparkSession,
    terms: list,
    window: int,
    blocks: DataFrame,
    doc_stats_idx: DataFrame,
    k: int = 10,
    url_lookup: dict | None = None,
) -> DataFrame:
    """Proximity query over the compressed blocked index: rank docs by
    the number of anchor positions of ``terms[0]`` that have EVERY
    other term within ``window`` tokens (either side).

    Same block-skipping as the phrase path — a qualifying doc holds all
    terms, so only blocks whose doc-range contains every term (metadata
    intersection) are decoded. The window check is JVM-side array
    algebra: fold ``filter(p, x -> exists(p_other, y -> |y-x| <= W))``
    over the non-anchor terms. Positions are the index's 1-based
    blank-counting token positions. Returns (url, n_matches) desc.
    """
    from .compression import unblock_postings

    words = [w.lower() for w in terms if w]
    if not words:
        return spark.createDataFrame([], "url string, n_matches long")
    uniq = sorted(set(words))
    qblocks = blocks.where(F.col("term").isin(uniq)).persist()

    full_blocks = (
        qblocks.groupBy("block_id")
        .agg(F.countDistinct("term").alias("nt"))
        .where(F.col("nt") == len(uniq))
        .select("block_id")
    )
    qblocks_hit = qblocks.join(full_blocks, "block_id", "left_semi")

    def term_positions(w, col):
        dec = unblock_postings(qblocks_hit.where(F.col("term") == w))
        return dec.select("doc_index", F.col("positions").alias(col))

    cur = term_positions(words[0], "p")
    for w in dict.fromkeys(words[1:]):  # each partner term once
        nxt = term_positions(w, "p_next")
        cur = (
            cur.join(nxt, "doc_index")
            .select(
                "doc_index",
                F.expr(
                    f"filter(p, x -> exists(p_next, y -> abs(y - x) <= {int(window)}))"
                ).alias("p"),
            )
            .where(F.size("p") > 0)
        )
    counts = cur.select("doc_index", F.size("p").cast("long").alias("n_matches"))
    if url_lookup is not None:
        rows = (
            counts.orderBy(F.desc("n_matches"), F.asc("doc_index"))
            .limit(k)
            .collect()
        )
        qblocks.unpersist()
        return _local_result_df(
            spark,
            [(url_lookup[r["doc_index"]], int(r["n_matches"])) for r in rows],
            value_col="n_matches", value_type="bigint",
        )
    out = (
        counts.join(doc_stats_idx.select("doc_index", "url"), "doc_index")
        .select("url", "n_matches")
        .orderBy(F.desc("n_matches"), F.asc("url"))
        .limit(k)
        .localCheckpoint(eager=True)
    )
    qblocks.unpersist()
    return out
