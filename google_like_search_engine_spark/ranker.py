"""Query-time scoring: TF-IDF x PageRank (reference-identical) and BM25.

Replaces the reference ranker (/root/reference
src/cis5550/ranker/Ranker.java, RankerStarter.java) with one declarative
DataFrame plan per query: broadcast the (tiny) query-term side into the
postings join, aggregate per url, left-join pageranks, sort.

Reference semantics pinned (rank-identity invariants):
- query expansion (Ranker.java:140-159): whitespace tokenize; for each
  token, append the Porter stem *plus* the raw token unless the stem
  equals the token case-insensitively; distinct on the *raw* strings;
  lookups lowercase (Ranker.java:45). Case-distinct raw forms that
  lowercase to the same term each score separately (reproduced: we keep
  one term row per distinct raw form).
- per-term scoring (Ranker.java:78-112): tf = positions/l2Norm, dedupe
  distinct (url, tf) pairs, df = count of those, IDF = ln(N/df),
  tfidf = tf*IDF summed per url across terms; pagerank defaults to 0.15
  for unranked docs; final score = sum(tfidf) * pagerank.
- the reference returns the full ranked list (no k cutoff); ties are
  ordered arbitrarily there — we fix (score desc, url asc), which is
  rank-compatible.

BM25 is the scale-path scorer the rebuild adds (north-star): standard
Robertson/Sparck-Jones idf = ln((N-df+0.5)/(df+0.5)+1), k1=1.2, b=0.75,
dl = per-doc term-entry count from doc_stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .kernels.hasher import kvs_hash
from .kernels.porter import porter_stem


def expand_query(query: str) -> list:
    """Raw-distinct expanded terms (stem + raw), per Ranker.java:140-159."""
    out: dict = {}
    for token in query.split():
        stem = porter_stem(token)
        if stem.lower() != token.lower():
            out.setdefault(stem, True)
        out.setdefault(token, True)
    return list(out)


def score_tfidf(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    pageranks: DataFrame | None,
    total_documents: int,
) -> DataFrame:
    """Reference-identical TF-IDF x PageRank ranking for ``query``.

    ``postings``: flat POSTINGS_SCHEMA table. ``pageranks``:
    (doc_id, rank) or None. Returns (url, tfidf, pagerank, score)
    ordered by (score desc, url asc) — the full list, as the reference
    serializes every url (RankerStarter.java:87-94).
    """
    words = expand_query(query)
    if not words:
        return spark.createDataFrame(
            [], "url string, tfidf double, pagerank double, score double"
        )
    # one row per distinct RAW form; lookup key is the lowercase term.
    terms = spark.createDataFrame(
        [(i, w.lower()) for i, w in enumerate(words)], "term_idx int, term string"
    )

    matched = postings.join(F.broadcast(terms), "term").select(
        "term_idx",
        "doc_id",
        "url",
        (F.col("tf") / F.col("l2_norm")).alias("tf_norm"),
    )
    # distinct (url, tf) per term instance (Ranker.java:91 .distinct()).
    d = matched.distinct()
    dfc = d.groupBy("term_idx").agg(F.count(F.lit(1)).alias("df"))
    scored = d.join(F.broadcast(dfc), "term_idx").select(
        "doc_id",
        "url",
        (
            F.col("tf_norm")
            * F.log(F.lit(float(total_documents)) / F.col("df"))
        ).alias("tfidf"),
    )
    per_url = scored.groupBy("doc_id", "url").agg(F.sum("tfidf").alias("tfidf"))
    if pageranks is not None:
        per_url = per_url.join(pageranks, "doc_id", "left")
    else:
        per_url = per_url.withColumn("rank", F.lit(None).cast("double"))
    return (
        per_url.select(
            "url",
            "tfidf",
            F.coalesce(F.col("rank"), F.lit(0.15)).alias("pagerank"),
        )
        .withColumn("score", F.col("tfidf") * F.col("pagerank"))
        .orderBy(F.desc("score"), F.asc("url"))
    )


def score_bm25(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    doc_stats: DataFrame,
    total_documents: int,
    k1: float = 1.2,
    b: float = 0.75,
    use_stems: bool = True,
    avgdl: float | None = None,
    term_df: DataFrame | None = None,
    terms: list | None = None,
) -> DataFrame:
    """BM25 top-k scoring; returns (url, score) ordered desc.

    ``terms``: pre-analyzed query terms — the query-side half of the
    pluggable-analyzer seam (an index built with a custom postings_fn
    must analyze queries the same way, e.g. CJK bigrams); bypasses the
    default expand_query/split tokenization.

    dl = per-document term-entry count (sum tf over the doc's terms,
    raw+stem — consistent between index and query side); df counted on
    distinct docs per term. Query expansion mirrors expand_query but
    dedupes on the lowercase form (BM25 is our own scorer; no reference
    quirk to preserve).

    Serving path: pass precomputed ``avgdl`` and a ``term_df``
    dictionary table (term, df) from build time — each removes one
    aggregation job per query (a real engine's dictionary stores df).
    """
    if terms is not None:
        words = sorted({w.lower() for w in terms})
    else:
        words = sorted(
            {w.lower() for w in (expand_query(query) if use_stems else query.split())}
        )
    if not words:
        return spark.createDataFrame([], "url string, score double")

    if avgdl is None:
        avgdl_row = doc_stats.agg(F.avg("n_term_entries").alias("avgdl")).collect()[0]
        avgdl = float(avgdl_row["avgdl"] or 1.0)

    # isin, not a broadcast-join with a literal term DF: the filter
    # pushes to the scan / cache batch stats and costs no per-query
    # createDataFrame driver round-trip
    has_dl = "dl" in postings.columns
    n = float(total_documents)
    if term_df is not None:
        # dictionary path (serving): resolve the (tiny, <= |words|-row)
        # df lookup driver-side and inline the idf values as a literal
        # map, like search_bm25_served does — the per-query broadcast
        # exchange + hash join disappear from the plan, which both
        # shrinks per-query planning time and removes the broadcast
        # machinery from the latency path. Identical arithmetic: the
        # idf expression below mirrors the JVM expression's operation
        # order exactly (the served==flat score-identity tests pin
        # math.log against the JVM log on this data).
        import math

        dfmap = {
            r["term"]: int(r["df"])
            for r in term_df.where(F.col("term").isin(words)).collect()
        }
        hit = [w for w in words if w in dfmap]
        if not hit:
            return spark.createDataFrame([], "url string, score double")
        idf = {
            w: math.log((n - dfmap[w] + 0.5) / (dfmap[w] + 0.5) + 1.0)
            for w in hit
        }
        matched = postings.where(F.col("term").isin(hit)).select(
            "term", "url", "tf", *(["dl"] if has_dl else ["doc_id"])
        )
        idf_col = F.create_map(
            *[x for w in hit for x in (F.lit(w), F.lit(idf[w]))]
        )[F.col("term")]
    else:
        matched = postings.where(F.col("term").isin(words)).select(
            "term", "doc_id", "url", "tf", *(["dl"] if has_dl else [])
        )
        dfc = matched.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        matched = matched.join(F.broadcast(dfc), "term")
        idf_col = F.log(
            (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
    scored = matched
    if has_dl:
        # dl is denormalized into the postings (indexer.build_postings):
        # scoring is join-free up to the final per-url aggregation
        dl_col = F.col("dl")
    else:
        scored = scored.join(doc_stats.select("doc_id", "n_term_entries"), "doc_id")
        dl_col = F.col("n_term_entries")
    scored = scored.select(
        "url",
        (
            idf_col
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * dl_col / F.lit(avgdl)))
        ).alias("partial"),
    )
    return (
        scored.groupBy("url")
        .agg(F.sum("partial").alias("score"))
        .orderBy(F.desc("score"), F.asc("url"))
    )


def hash_url(url: str) -> str:
    """Query-side Hasher.hash (Ranker.java:100)."""
    return kvs_hash(url)
