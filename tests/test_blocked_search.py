"""Blocked-index MaxScore == flat naive BM25 (exactness through the
compressed path: encode -> block-skip -> decode -> score)."""

import pytest
from pyspark.sql import functions as F

from google_like_search_engine_spark.compression import (
    assign_doc_indexes,
    block_postings,
)
from google_like_search_engine_spark.indexer import build_postings
from google_like_search_engine_spark.ranker import score_bm25
from google_like_search_engine_spark.wand import blocked_maxscore_topk

from tests.test_wand_and_lineage import _random_docs


@pytest.mark.parametrize("query,k", [
    ("spark shuffle", 5),
    ("spark", 10),
    ("index merge join table", 7),
    ("missingword", 5),
])
@pytest.mark.parametrize("small_query_entries", [100_000, 0])
def test_blocked_maxscore_equals_naive(spark, query, k, small_query_entries):
    """Exactness through BOTH plans: the single-job fast path (default
    threshold) and the full MaxScore + block-max pruned path (threshold
    0 forces it even on the small fixture)."""
    docs = _random_docs(spark, n=150, seed=23)
    postings = build_postings(docs).persist()
    idx = assign_doc_indexes(docs).persist()
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=32).persist()

    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    doc_stats_idx = doc_stats.join(idx, "doc_id").select(
        "doc_index", "url", "n_term_entries"
    ).persist()
    n = docs.count()

    naive = score_bm25(spark, query, postings, doc_stats, n).limit(k).collect()
    fast = blocked_maxscore_topk(
        spark, query, blocks, doc_stats_idx, n, k=k,
        small_query_entries=small_query_entries,
    ).collect()
    assert [r["url"] for r in fast] == [r["url"] for r in naive], query
    for a, b in zip(fast, naive):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)
    for df in (postings, idx, blocks, doc_stats_idx):
        df.unpersist()


def test_block_max_refinement_skips_blocks(spark):
    """On a tf-skewed corpus the per-block upper bound prunes whole
    blocks below theta — including ESSENTIAL-term blocks (the part
    plain MaxScore's candidate logic can't skip) — while the pruned
    result stays exactly the naive top-k."""
    import math

    from google_like_search_engine_spark.wand import _live_block_ids

    # 8 "hot" docs repeat the query terms many times; 152 "cold" docs
    # mention them once among filler — hot and cold docs land in
    # different doc-index ranges, so cold blocks' max_tf stays 1
    rows = []
    for i in range(8):
        rows.append((f"d{i:03d}", f"http://x.com/{i:03d}.html",
                     " ".join(["spark shuffle"] * 30)))
    for i in range(8, 160):
        rows.append((f"d{i:03d}", f"http://x.com/{i:03d}.html",
                     "filler words here spark shuffle other stuff"))
    docs = spark.createDataFrame(rows, "doc_id string, url string, text string")
    postings = build_postings(docs).persist()
    idx = assign_doc_indexes(docs)
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=16).persist()
    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    doc_stats_idx = doc_stats.join(idx, "doc_id").select(
        "doc_index", "url", "n_term_entries"
    ).persist()
    n = docs.count()

    # pruned path, k small enough that theta lands above cold blocks
    k = 5
    fast = blocked_maxscore_topk(
        spark, "spark shuffle", blocks, doc_stats_idx, n, k=k,
        small_query_entries=0,
    ).collect()
    naive = score_bm25(spark, "spark shuffle", postings, doc_stats, n).limit(k).collect()
    assert [(r["url"], round(r["score"], 9)) for r in fast] == [
        (r["url"], round(r["score"], 9)) for r in naive
    ]

    # direct evidence: the metadata bound keeps only the hot block(s)
    from google_like_search_engine_spark.ranker import expand_query

    words = sorted({w.lower() for w in expand_query("spark shuffle")})
    qblocks = blocks.where(F.col("term").isin(words))
    total_blocks = qblocks.select("block_id").distinct().count()
    stats = doc_stats_idx.agg(
        F.avg("n_term_entries").alias("a"), F.min("n_term_entries").alias("m")
    ).collect()[0]
    dfs = {
        r["term"]: r["df"]
        for r in qblocks.groupBy("term").agg(F.sum("n_docs").alias("df")).collect()
    }
    idf = {t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items()}
    # theta = k-th best real score (>= the seeded theta -> fewer live
    # blocks with the real one would still be exact; use the seeded
    # bound's weakest form: the k-th naive score)
    theta = naive[-1]["score"]
    live = _live_block_ids(
        qblocks, idf, theta, 1.2, 0.75, float(stats["m"]), float(stats["a"])
    ).count()
    assert live < total_blocks, (live, total_blocks)
    assert live >= 1
    for df in (postings, blocks, doc_stats_idx):
        df.unpersist()


def test_blocked_phrase_topk_counts(spark):
    """Positional phrase counts off the varint positions store equal a
    direct adjacency computation on the flat postings."""
    from google_like_search_engine_spark.wand import blocked_phrase_topk

    docs = spark.createDataFrame(
        [
            ("d0", "u0", "table scan table scan table"),
            ("d1", "u1", "scan table scan"),
            ("d2", "u2", "table table scan"),
            ("d3", "u3", "nothing relevant here"),
            ("d4", "u4", "table scan"),
        ],
        "doc_id string, url string, text string",
    )
    postings = build_postings(docs)
    idx = assign_doc_indexes(docs)
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=4).persist()
    dsi = (
        postings.groupBy("doc_id", "url")
        .agg(F.sum("tf").alias("n_term_entries"))
        .join(idx, "doc_id")
        .select("doc_index", "url", "n_term_entries")
    )
    got = {
        r["url"]: r["n_occurrences"]
        for r in blocked_phrase_topk(spark, "table scan", blocks, dsi, k=10).collect()
    }
    # adjacency over the raw token stream (same 1-based positions)
    assert got == {"u0": 2, "u1": 1, "u2": 1, "u4": 1}
    # repeated-word phrase: "table table" only in u2
    got2 = {
        r["url"]: r["n_occurrences"]
        for r in blocked_phrase_topk(spark, "table table", blocks, dsi, k=10).collect()
    }
    assert got2 == {"u2": 1}
    blocks.unpersist()


def test_blocked_proximity_topk_counts(spark):
    """Window-proximity anchor counts off the positions store match a
    hand computation; window=0 degenerates to exact co-position (never
    matches distinct terms); order of partner terms doesn't matter."""
    from google_like_search_engine_spark.wand import blocked_proximity_topk

    docs = spark.createDataFrame(
        [
            # positions:  a=1, x=2..4, b=5  -> |b-a| = 4
            ("d0", "u0", "alpha x x x beta"),
            # a=1, b=2 adjacent; plus a=4 with b at 2 (|2-4|=2)
            ("d1", "u1", "alpha beta x alpha"),
            ("d2", "u2", "alpha x x x x x beta"),   # gap 6 > 5
            ("d3", "u3", "beta x alpha"),           # |1-3| = 2
            ("d4", "u4", "alpha only here"),
        ],
        "doc_id string, url string, text string",
    )
    postings = build_postings(docs)
    idx = assign_doc_indexes(docs)
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=4).persist()
    dsi = (
        postings.groupBy("doc_id", "url")
        .agg(F.sum("tf").alias("n_term_entries"))
        .join(idx, "doc_id")
        .select("doc_index", "url", "n_term_entries")
    )

    def run(terms, w):
        return {
            r["url"]: r["n_matches"]
            for r in blocked_proximity_topk(spark, terms, w, blocks, dsi, k=10).collect()
        }

    assert run(["alpha", "beta"], 5) == {"u0": 1, "u1": 2, "u3": 1}
    assert run(["alpha", "beta"], 1) == {"u1": 1}
    assert run(["alpha", "beta"], 0) == {}
    # anchor on beta instead: counts anchor occurrences of beta
    assert run(["beta", "alpha"], 5) == {"u0": 1, "u1": 1, "u3": 1}
    blocks.unpersist()


@pytest.mark.parametrize("threshold", [0.5, 1.5, 3.0, 99.0])
def test_blocked_maxscore_threshold_equals_naive(spark, threshold):
    """The score-threshold form of the pruned path (the oracle-checked
    driver entry's machinery) returns exactly the naive scorer's docs
    with round(score,4) >= threshold — including the provably-empty
    short-circuit when the threshold exceeds the total ub sum."""
    from google_like_search_engine_spark.wand import blocked_maxscore_threshold

    docs = _random_docs(spark, n=150, seed=29)
    postings = build_postings(docs).persist()
    idx = assign_doc_indexes(docs)
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=32).persist()
    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    doc_stats_idx = doc_stats.join(idx, "doc_id").select(
        "doc_index", "url", "n_term_entries"
    ).persist()
    n = docs.count()

    query = "spark shuffle index"
    naive = score_bm25(spark, query, postings, doc_stats, n).collect()
    expected = {
        r["url"]: round(r["score"], 4)
        for r in naive
        if round(r["score"], 4) >= threshold
    }
    got = {
        r["url"]: r["score"]
        for r in blocked_maxscore_threshold(
            spark, query, blocks, doc_stats_idx, n, threshold=threshold
        ).collect()
    }
    assert set(got) == set(expected), (threshold, len(got), len(expected))
    for url, s in got.items():
        assert s == pytest.approx(expected[url], abs=1e-9)
    for df in (postings, blocks, doc_stats_idx):
        df.unpersist()


def test_blocked_maxscore_threshold_prunes_blocks(spark):
    """On the tf-skewed corpus a high threshold drops cold blocks via
    the metadata bound while the surviving set stays exact."""
    import math

    from google_like_search_engine_spark.wand import (
        _live_block_ids,
        blocked_maxscore_threshold,
    )

    rows = []
    for i in range(8):
        rows.append((f"d{i:03d}", f"http://x.com/{i:03d}.html",
                     " ".join(["spark shuffle"] * 30)))
    for i in range(8, 160):
        rows.append((f"d{i:03d}", f"http://x.com/{i:03d}.html",
                     "filler words here spark shuffle other stuff"))
    docs = spark.createDataFrame(rows, "doc_id string, url string, text string")
    postings = build_postings(docs).persist()
    idx = assign_doc_indexes(docs)
    blocks = block_postings(postings.join(idx, "doc_id"), block_span=16).persist()
    doc_stats = postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    doc_stats_idx = doc_stats.join(idx, "doc_id").select(
        "doc_index", "url", "n_term_entries"
    ).persist()
    n = docs.count()
    naive = score_bm25(spark, "spark shuffle", postings, doc_stats, n).collect()
    scores = sorted((round(r["score"], 4) for r in naive), reverse=True)
    threshold = round((scores[7] + scores[8]) / 2, 4)  # between hot and cold

    got = {
        r["url"]: r["score"]
        for r in blocked_maxscore_threshold(
            spark, "spark shuffle", blocks, doc_stats_idx, n, threshold=threshold
        ).collect()
    }
    expected = {
        r["url"]: round(r["score"], 4)
        for r in naive
        if round(r["score"], 4) >= threshold
    }
    assert got == pytest.approx(expected)
    assert len(got) == 8

    # direct evidence the metadata bound drops cold blocks at this theta
    from google_like_search_engine_spark.ranker import expand_query

    words = sorted({w.lower() for w in expand_query("spark shuffle")})
    qblocks = blocks.where(F.col("term").isin(words))
    dfs = {
        r["term"]: r["df"]
        for r in qblocks.groupBy("term").agg(F.sum("n_docs").alias("df")).collect()
    }
    idf = {t: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for t, d in dfs.items()}
    stats = doc_stats_idx.agg(
        F.avg("n_term_entries").alias("a"), F.min("n_term_entries").alias("m")
    ).collect()[0]
    total_blocks = qblocks.select("block_id").distinct().count()
    live = _live_block_ids(
        qblocks, idf, threshold - 1e-6, 1.2, 0.75,
        float(stats["m"]), float(stats["a"]),
    ).count()
    assert 1 <= live < total_blocks, (live, total_blocks)
    for df in (postings, blocks, doc_stats_idx):
        df.unpersist()


def test_low_latency_conf_restores_on_exception(spark):
    from google_like_search_engine_spark.engine import low_latency

    before_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    before_sp = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with low_latency(spark, shuffle_partitions=3):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.adaptive.enabled") == before_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == before_sp


def test_url_dict_fast_path_escapes_hostile_urls(spark, tmp_path):
    """The driver-side forward-index path interpolates urls into a SQL
    VALUES literal; quotes and backslashes in crawled urls must survive
    byte-identically and match the distributed join path."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    urls = [
        "http://a/it's",
        'http://b/q="x"',
        "http://c/back\\slash",
        "http://d/plain",
    ]
    docs = spark.createDataFrame(
        [(str(i), u, f"common text plus unique{i} token") for i, u in enumerate(urls)],
        "doc_id string, url string, text string",
    )
    eng = SearchEngine(spark)
    eng.postings = build_postings(docs)
    eng.doc_stats = eng.postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    eng.term_df = eng.postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    eng.total_documents = 4
    eng._avgdl = float(
        eng.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0]
    )
    path = str(tmp_path / "blocked")
    eng.save_blocked(path)

    fast = [(r["url"], round(r["score"], 6))
            for r in eng.search_bm25_blocked(path, "common text", k=4).collect()]
    assert sorted(u for u, _ in fast) == sorted(urls)

    slow_eng = SearchEngine(spark)
    slow_eng.URL_DICT_CAP = -1  # force the distributed join path
    slow = [(r["url"], round(r["score"], 6))
            for r in slow_eng.search_bm25_blocked(path, "common text", k=4).collect()]
    assert fast == slow


def test_url_dict_invalidated_on_rebuild(spark, tmp_path):
    """Rebuilding a blocked index at the same path must refresh the
    cached driver-side forward index — a stale dict would resolve the
    new doc_indexes to the OLD corpus's urls."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    path = str(tmp_path / "blocked")

    def build(urls):
        eng = SearchEngine(spark)
        docs = spark.createDataFrame(
            [(str(i), u, f"shared token corpus{i}") for i, u in enumerate(urls)],
            "doc_id string, url string, text string",
        )
        eng.postings = build_postings(docs)
        eng.doc_stats = eng.postings.groupBy("doc_id", "url").agg(
            F.sum("tf").alias("n_term_entries")
        )
        eng.term_df = eng.postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        eng.total_documents = len(urls)
        eng._avgdl = float(
            eng.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0]
        )
        eng.save_blocked(path)
        return eng

    eng = build(["http://old/0", "http://old/1"])
    got1 = {r["url"] for r in eng.search_bm25_blocked(path, "shared", k=5).collect()}
    assert got1 == {"http://old/0", "http://old/1"}

    # SAME engine instance, same path, new corpus
    eng2_urls = ["http://new/0", "http://new/1"]
    docs2 = spark.createDataFrame(
        [(str(i), u, f"shared token corpus{i}") for i, u in enumerate(eng2_urls)],
        "doc_id string, url string, text string",
    )
    eng.postings = build_postings(docs2)
    eng.doc_stats = eng.postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    eng.save_blocked(path)
    got2 = {r["url"] for r in eng.search_bm25_blocked(path, "shared", k=5).collect()}
    assert got2 == {"http://new/0", "http://new/1"}


def test_blocked_required_excluded_filters(spark, tmp_path):
    """Blocked +/- filters: subset of the unfiltered result with
    identical scores; absent required term -> empty; absent excluded
    term -> no-op (served-path semantics)."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    rows = [
        ("0", "u0", "spark shuffle join alpha"),
        ("1", "u1", "spark shuffle beta"),
        ("2", "u2", "spark join gamma"),
        ("3", "u3", "spark shuffle join delta excluded"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, url string, text string")
    eng = SearchEngine(spark)
    eng.postings = build_postings(docs)
    eng.doc_stats = eng.postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    eng.term_df = eng.postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    eng.total_documents = 4
    eng._avgdl = float(eng.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0])
    path = str(tmp_path / "blocked")
    eng.save_blocked(path)

    full = {r["url"]: round(r["score"], 6)
            for r in eng.search_bm25_blocked(path, "spark shuffle", k=10).collect()}
    filt = {r["url"]: round(r["score"], 6)
            for r in eng.search_bm25_blocked(
                path, "spark shuffle", k=10,
                required=["join"], excluded=["excluded"]).collect()}
    # docs containing 'join' and not 'excluded': u0 and u2 (u2 scores
    # via its 'spark' hit); scores identical to the unfiltered run
    assert set(filt) == {"u0", "u2"}
    assert all(filt[u] == full[u] for u in filt)

    filt2 = {r["url"] for r in eng.search_bm25_blocked(
        path, "spark", k=10, required=["join"], excluded=["excluded"]).collect()}
    assert filt2 == {"u0", "u2"}

    assert eng.search_bm25_blocked(
        path, "spark", k=10, required=["zzznope"]).collect() == []
    noop = {r["url"] for r in eng.search_bm25_blocked(
        path, "spark", k=10, excluded=["zzznope"]).collect()}
    assert noop == {"u0", "u1", "u2", "u3"}


def test_sharded_search_equals_single_index(spark, tmp_path):
    """Scatter-gather over two independently built shards with global
    stats recombined from sidecars == one index over the union corpus
    (urls and scores to 1e-6, including terms living in one shard
    only and k exceeding the match count)."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    rows = [
        (str(i), f"u{i:02d}",
         " ".join(
             ["spark"] * (1 + i % 3)
             + ["shuffle"] * (i % 2)
             + ["join"] * (i % 4)
             + ([f"rare{i}"] if i % 5 == 0 else [])
             + (["onlyeven"] if i % 2 == 0 else [])
             + ["filler", f"tok{i % 7}"]
         ))
        for i in range(24)
    ]

    def build(subset, path):
        docs = spark.createDataFrame(
            subset, "doc_id string, url string, text string"
        )
        e = SearchEngine(spark)
        e.postings = build_postings(docs)
        e.doc_stats = e.postings.groupBy("doc_id", "url").agg(
            F.sum("tf").alias("n_term_entries")
        )
        e.term_df = e.postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        e.total_documents = len(subset)
        e._avgdl = float(
            e.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0]
        )
        e.save_blocked(path)
        return e

    full_path = str(tmp_path / "full")
    s0_path = str(tmp_path / "s0")
    s1_path = str(tmp_path / "s1")
    eng = build(rows, full_path)
    build([r for r in rows if int(r[0]) % 2 == 0], s0_path)
    build([r for r in rows if int(r[0]) % 2 == 1], s1_path)

    for query, k in [
        ("spark shuffle", 5),
        ("join filler", 8),
        ("onlyeven spark", 6),      # one query term lives only in shard 0
        ("rare0 rare5", 50),        # k far beyond the match count
    ]:
        single = [
            (r["url"], round(r["score"], 6))
            for r in eng.search_bm25_blocked(full_path, query, k=k).collect()
        ]
        sharded = [
            (r["url"], round(r["score"], 6))
            for r in eng.search_bm25_sharded(
                [s0_path, s1_path], query, k=k
            ).collect()
        ]
        assert sharded == single, (query, k)

    # +/- filters: per-shard application == single-index filtered run
    fs = [(r["url"], round(r["score"], 6))
          for r in eng.search_bm25_blocked(
              full_path, "spark shuffle", k=10,
              required=["join"], excluded=["onlyeven"]).collect()]
    fsh = [(r["url"], round(r["score"], 6))
           for r in eng.search_bm25_sharded(
               [s0_path, s1_path], "spark shuffle", k=10,
               required=["join"], excluded=["onlyeven"]).collect()]
    assert fsh == fs and fs  # nonempty

    # absent term everywhere -> empty
    assert eng.search_bm25_sharded([s0_path, s1_path], "zzznope").collect() == []

    # OVERLAPPING shards: a delta shard rewriting u00 masks the base
    # version even for queries only the stale text matches
    delta_path = str(tmp_path / "delta")
    build([("0", "u00", "freshterm content")], delta_path)
    spark_hits = {r["url"] for r in eng.search_bm25_sharded(
        [s0_path, s1_path, delta_path], "spark", k=50).collect()}
    assert "u00" not in spark_hits and spark_hits  # stale masked
    fresh_hits = {r["url"] for r in eng.search_bm25_sharded(
        [s0_path, s1_path, delta_path], "freshterm", k=10).collect()}
    assert fresh_hits == {"u00"}


def test_merge_blocked_shards_equals_single_and_respects_precedence(
    spark, tmp_path
):
    """Segment merge: (a) merging two disjoint shards reproduces the
    single-index answer url-and-score-exactly (incl. phrase search —
    positions survive the decode/re-encode round trip); (b) a later
    delta shard overrides an earlier shard's version of the same url."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    rows = [
        (str(i), f"u{i:02d}",
         " ".join(
             ["spark"] * (1 + i % 3) + ["shuffle"] * (i % 2)
             + ["join", "table", "scan"][: 1 + i % 3] + [f"tok{i % 5}"]
         ))
        for i in range(16)
    ]

    def build(subset, path):
        docs = spark.createDataFrame(
            subset, "doc_id string, url string, text string"
        )
        e = SearchEngine(spark)
        e.postings = build_postings(docs)
        e.doc_stats = e.postings.groupBy("doc_id", "url").agg(
            F.sum("tf").alias("n_term_entries")
        )
        e.term_df = e.postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        e.total_documents = len(subset)
        e._avgdl = float(
            e.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0]
        )
        e.save_blocked(path)
        return e

    full_p, s0_p, s1_p = (str(tmp_path / n) for n in ("full", "s0", "s1"))
    eng = build(rows, full_p)
    build([r for r in rows if int(r[0]) % 2 == 0], s0_p)
    build([r for r in rows if int(r[0]) % 2 == 1], s1_p)

    merged_p = str(tmp_path / "merged")
    eng.merge_blocked_shards([s0_p, s1_p], merged_p)

    for query in ("spark shuffle", "join scan"):
        single = [(r["url"], round(r["score"], 6)) for r in
                  eng.search_bm25_blocked(full_p, query, k=8).collect()]
        merged = [(r["url"], round(r["score"], 6)) for r in
                  eng.search_bm25_blocked(merged_p, query, k=8).collect()]
        assert merged == single, query
    ph_single = sorted(
        (r["url"], r["n_occurrences"]) for r in
        eng.search_phrase_blocked(full_p, "table scan", k=100).collect())
    ph_merged = sorted(
        (r["url"], r["n_occurrences"]) for r in
        eng.search_phrase_blocked(merged_p, "table scan", k=100).collect())
    assert ph_merged == ph_single and ph_single  # nonempty

    # precedence: delta shard rewrites u00 to contain 'fresh' only
    delta_p = str(tmp_path / "delta")
    build([("0", "u00", "fresh content only")], delta_p)
    upd_p = str(tmp_path / "updated")
    eng.merge_blocked_shards([s0_p, s1_p, delta_p], upd_p)
    fresh = {r["url"] for r in
             eng.search_bm25_blocked(upd_p, "fresh", k=10).collect()}
    stale = {r["url"] for r in
             eng.search_bm25_blocked(upd_p, "spark", k=100).collect()}
    assert fresh == {"u00"} and "u00" not in stale


def test_sharded_phrase_and_threshold_equal_single(spark, tmp_path):
    """Federated phrase counts (shard-local, no stats) and federated
    threshold search (global stats + df override) both reproduce the
    single-index answers exactly."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    rows = [
        (str(i), f"u{i:02d}",
         " ".join(
             (["table", "scan"] * (1 + i % 2))
             + (["spark"] * (1 + i % 3) if i % 2 else ["flink"])
             + [f"tok{i % 5}"]
         ))
        for i in range(18)
    ]

    def build(subset, path):
        docs = spark.createDataFrame(
            subset, "doc_id string, url string, text string"
        )
        e = SearchEngine(spark)
        e.postings = build_postings(docs)
        e.doc_stats = e.postings.groupBy("doc_id", "url").agg(
            F.sum("tf").alias("n_term_entries")
        )
        e.save_blocked(path)

    full_p, s0_p, s1_p = (str(tmp_path / n) for n in ("full", "s0", "s1"))
    build(rows, full_p)
    build([r for r in rows if int(r[0]) % 2 == 0], s0_p)
    build([r for r in rows if int(r[0]) % 2 == 1], s1_p)
    eng = SearchEngine(spark)

    ph_single = [(r["url"], r["n_occurrences"]) for r in
                 eng.search_phrase_blocked(full_p, "table scan", k=12).collect()]
    ph_shard = [(r["url"], r["n_occurrences"]) for r in
                eng.search_phrase_sharded([s0_p, s1_p], "table scan", k=12).collect()]
    assert ph_shard == ph_single and ph_single

    th_single = sorted(
        (r["url"], round(r["score"], 6)) for r in
        eng.search_bm25_threshold_blocked(full_p, "spark scan", 0.5).collect())
    th_shard = sorted(
        (r["url"], round(r["score"], 6)) for r in
        eng.search_bm25_threshold_sharded([s0_p, s1_p], "spark scan", 0.5).collect())
    assert th_shard == th_single and th_single


def test_boolean_blocked_equals_flat(spark, tmp_path):
    """Boolean queries served off the blocked layout == the flat-path
    answers: AND/OR/NOT, pure negation, wildcard prefixes, and ranked
    mode (BM25 over positive exact terms)."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    rows = [
        (str(i), f"u{i:02d}",
         " ".join(
             ["alpha"] * (1 + i % 2)
             + (["beta"] if i % 3 == 0 else ["gamma"])
             + (["sigma", "sigmoid"][i % 2:i % 2 + 1])
             + [f"tok{i % 4}"]
         ))
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, url string, text string")
    eng = SearchEngine(spark)
    eng.postings = build_postings(docs)
    eng.doc_stats = eng.postings.groupBy("doc_id", "url").agg(
        F.sum("tf").alias("n_term_entries")
    )
    eng.term_df = eng.postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    eng.total_documents = 20
    eng._avgdl = float(eng.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0])
    path = str(tmp_path / "blocked")
    eng.save_blocked(path)

    for q in [
        "alpha AND beta",
        "beta OR gamma AND NOT tok1",
        "NOT beta",
        "sig* AND alpha",
        "alpha AND NOT zzznope",
    ]:
        flat = [r["url"] for r in eng.search_boolean(q, k=50).collect()]
        blk = [r["url"] for r in
               eng.search_boolean_blocked(path, q, k=50).collect()]
        assert blk == flat, q

    for q in ["alpha AND beta", "beta OR gamma"]:
        flat = [(r["url"], round(r["score"], 6)) for r in
                eng.search_boolean(q, k=50, ranked=True).collect()]
        blk = [(r["url"], round(r["score"], 6)) for r in
               eng.search_boolean_blocked(path, q, k=50, ranked=True).collect()]
        assert blk == flat, q

    # federation: two url-hash shards reproduce the single-index
    # boolean answers (unranked match set and globally-ranked mode)
    s0_p, s1_p = str(tmp_path / "bs0"), str(tmp_path / "bs1")
    shard_of = F.pmod(F.xxhash64("url"), F.lit(2))
    for i, sp in enumerate((s0_p, s1_p)):
        se = SearchEngine(spark)
        se.postings = eng.postings.where(shard_of == i)
        se.doc_stats = eng.doc_stats.where(shard_of == i)
        se.save_blocked(sp)
    for q in ["beta OR gamma AND NOT tok1", "NOT beta", "sig* AND alpha"]:
        single = [r["url"] for r in
                  eng.search_boolean_blocked(path, q, k=50).collect()]
        fed = [r["url"] for r in
               eng.search_boolean_sharded([s0_p, s1_p], q, k=50).collect()]
        assert fed == single, q
    for q in ["alpha AND beta", "beta OR gamma"]:
        single = [(r["url"], round(r["score"], 6)) for r in
                  eng.search_boolean_blocked(path, q, k=50, ranked=True).collect()]
        fed = [(r["url"], round(r["score"], 6)) for r in
               eng.search_boolean_sharded(
                   [s0_p, s1_p], q, k=50, ranked=True).collect()]
        assert fed == single, q


def test_warm_blocked_query_is_one_spark_job(spark, tmp_path):
    """Pin the serving-latency claim structurally: a WARM blocked BM25
    query under the low-latency scope costs exactly ONE Spark job (the
    top-k collect; url resolution is the driver-side dict and the
    result is a VALUES LocalRelation). A regression that reintroduces
    the AQE per-shuffle job floor or a createDataFrame round-trip
    shows up here as job count, independent of host-epoch timing."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.corpus import generate_pages
    from google_like_search_engine_spark.engine import SearchEngine

    pages = generate_pages(spark, 150).where(F.col("lang") == "en")
    eng = SearchEngine(spark).build(pages, run_pagerank=False)
    out = str(tmp_path / "blocked")
    eng.save_blocked(out)
    try:
        with eng.low_latency():
            eng.search_bm25_blocked(out, "search engine", k=10).collect()
            sc = spark.sparkContext
            for q in ("index merge", "web page", "search engine index"):
                sc.setJobGroup(f"probe_{q}", "job count probe")
                rows = eng.search_bm25_blocked(out, q, k=10).collect()
                ids = sc.statusTracker().getJobIdsForGroup(f"probe_{q}")
                assert len(ids) == 1, (q, len(ids))
                assert rows  # nonempty on this corpus
            sc.setJobGroup("probe_done", "clear")
    finally:
        eng.unpersist()


def test_sharded_mask_overfetch_keeps_live_docs(spark, tmp_path):
    """Overlapping base+delta: when a base shard's top-k slots are
    occupied by urls a later shard supersedes, the shard must
    over-fetch so live docs ranked below them still reach the driver
    merge — pinned row-identical to the merged single index."""
    from pyspark.sql import functions as F

    from google_like_search_engine_spark.engine import SearchEngine
    from google_like_search_engine_spark.indexer import build_postings

    def build(subset, path):
        docs = spark.createDataFrame(
            subset, "doc_id string, url string, text string"
        )
        e = SearchEngine(spark)
        e.postings = build_postings(docs)
        e.doc_stats = e.postings.groupBy("doc_id", "url").agg(
            F.sum("tf").alias("n_term_entries")
        )
        e.term_df = e.postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        e.total_documents = len(subset)
        e._avgdl = float(
            e.doc_stats.agg(F.avg("n_term_entries")).collect()[0][0]
        )
        e.save_blocked(path)
        return e

    # base: d0/d1 score highest on "hot" (max tf, short docs); d2..d5
    # are the live lower-ranked matches the old truncate-then-mask
    # federation lost
    base_rows = [
        ("0", "u00", "hot hot hot hot"),
        ("1", "u01", "hot hot hot hot"),
    ] + [
        (str(i), f"u{i:02d}", "hot filler filler filler") for i in range(2, 6)
    ]
    # delta rewrites u00/u01 with text that does NOT match the query
    delta_rows = [("0", "u00", "fresh other"), ("1", "u01", "fresh other")]
    base_path = str(tmp_path / "base")
    delta_path = str(tmp_path / "delta")
    full_path = str(tmp_path / "full")
    build(base_rows, base_path)
    build(delta_rows, delta_path)
    # the merged live state: delta's versions of u00/u01 + base's rest
    eng = build(delta_rows + base_rows[2:], full_path)

    # url identity, not score identity: overlapping shards' global
    # stats count superseded copies until compaction (the documented
    # segment-store drift), so scores differ from the live single
    # index while the returned DOCUMENTS must not
    for k in (1, 2, 3):
        single = [
            r["url"]
            for r in eng.search_bm25_blocked(full_path, "hot", k=k).collect()
        ]
        sharded = [
            r["url"]
            for r in eng.search_bm25_sharded(
                [base_path, delta_path], "hot", k=k
            ).collect()
        ]
        assert sharded == single and len(single) == k, k
