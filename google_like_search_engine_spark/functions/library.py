"""Column-level scalar function library (SURVEY.md section 2.3 surface).

Every scalar the reference's job lambdas compute, exposed as Spark
Column functions. JVM built-ins wherever the semantics allow (the
cleaning regexes run on Spark's own Java regex engine — the *same*
engine as the reference, so byte identity is structural); the
kernels that SQL cannot express (Porter stem, the SHA-1 doc hash,
URL-normalizing anchor extraction) are Arrow-batched pandas UDFs over
the golden-tested pure-Python kernels.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, functions as F

from ..kernels.hasher import kvs_hash
from ..kernels.porter import porter_stem
from ..kernels.textclean import STOPWORDS
from ..kernels.urls import extract_links

# pandas_udf registration needs an active SparkSession, so the UDF
# objects are built lazily (once) on first column use, not at import.


@lru_cache(maxsize=None)
def _udfs():
    @F.pandas_udf("string")
    def doc_hash_udf(s: pd.Series) -> pd.Series:
        return s.map(kvs_hash)

    @F.pandas_udf("string")
    def stem_udf(s: pd.Series) -> pd.Series:
        return s.map(porter_stem)

    @F.pandas_udf("array<string>")
    def stem_tokens_udf(s: pd.Series) -> pd.Series:
        ps = porter_stem
        return s.map(lambda toks: [ps(t) for t in toks] if toks is not None else None)

    @F.pandas_udf("array<string>")
    def anchor_links_udf(content: pd.Series, base: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_links(c, b) if c is not None else []
                for c, b in zip(content, base)
            ]
        )

    return {
        "doc_hash": doc_hash_udf,
        "stem": stem_udf,
        "stem_tokens": stem_tokens_udf,
        "anchor_links": anchor_links_udf,
    }


def doc_hash(col) -> Column:
    """Reference Hasher.hash (SHA-1 + 2-char alphabet) — the doc ID."""
    return _udfs()["doc_hash"](F.col(col) if isinstance(col, str) else col)


def stem(col) -> Column:
    """Porter stem of a single token column."""
    return _udfs()["stem"](F.col(col) if isinstance(col, str) else col)


def stem_tokens(col) -> Column:
    """Porter stem applied to each element of an array<string> column."""
    return _udfs()["stem_tokens"](F.col(col) if isinstance(col, str) else col)


def clean_text(col) -> Column:
    """The Crawler cleaning chain minus the dictionary filter, as pure
    Spark SQL expressions (Java regex engine == the reference's engine):
    script/style strip -> whitespace collapse -> tag strip -> punct
    strip -> lowercase (Crawler.java:337-357). Dictionary/stopword
    filtering composes via remove_stopwords / array_intersect."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<script[^>]*>[\s\S]*?</script>", "")
    c = F.regexp_replace(c, r"<style[^>]>[\s\S]?</style>", "")  # reference bug kept
    c = F.regexp_replace(c, r"\s{2,}", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    c = F.regexp_replace(c, r"\p{Punct}", " ")  # Java regex: supported verbatim
    return F.lower(c)


def digit_boundary_tokens(col) -> Column:
    """The digit-boundary tokenizer split (Crawler.java:358) — Spark's
    split() uses Java regex, so the pattern is verbatim; ONLY trailing
    empty strings are removed, matching Java String.split(limit=0) and
    kernels/textclean.java_split (leading/interior empties — e.g. from
    leading whitespace — are kept, unlike a drop-all-empties filter)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, r"\s+|(?<=\d)(?=\D)|(?<=\D)(?=\d)")
    # last non-empty index via an indexed fold; slice keeps everything
    # up to it (slice length 0 -> empty array when all tokens are empty)
    idxs = F.sequence(F.lit(1), F.size(toks))
    last = F.aggregate(
        F.zip_with(toks, idxs, lambda t, i: F.when(t != "", i).otherwise(F.lit(0))),
        F.lit(0),
        lambda acc, x: F.greatest(acc, x),
    )
    return F.slice(toks, F.lit(1), last)


def cjk_bigram_tokens(col) -> Column:
    """Language-aware token stream: runs of CJK ideographs segment
    into overlapping character BIGRAMS (Lucene CJKAnalyzer's strategy
    — dictionary-free and recall-safe for scripts written without
    spaces), everything else tokenizes as lowercased alphanumeric
    runs. Pure JVM (regexp_extract_all + transform/flatten), so the
    analyzer stays inside whole-stage codegen at any corpus size —
    no Python worker in the indexing hot path."""
    c = F.col(col) if isinstance(col, str) else col
    runs = F.regexp_extract_all(
        c, F.lit("[一-鿿]+|[A-Za-z0-9]+"), 0
    )

    def seg(r):
        is_cjk = r.rlike("^[一-鿿]")
        bigrams = F.transform(
            F.sequence(F.lit(1), F.length(r) - 1),
            lambda i: r.substr(i, F.lit(2)),
        )
        return (
            F.when(is_cjk & (F.length(r) > 1), bigrams)
            .when(is_cjk, F.array(r))
            .otherwise(F.array(F.lower(r)))
        )

    return F.flatten(F.transform(runs, seg))


_CJK_RUN_RE = None


def cjk_query_terms(query: str) -> list:
    """Driver-side twin of ``cjk_bigram_tokens`` for analyzing a query
    LITERAL (same runs, same bigrams, same lowercasing) — pass as
    ``SearchEngine.search_bm25(analyzer=...)`` so query analysis
    matches an index built with ``cjk_aware_postings``."""
    global _CJK_RUN_RE
    if _CJK_RUN_RE is None:
        import re

        _CJK_RUN_RE = re.compile("[一-鿿]+|[A-Za-z0-9]+")
    out = []
    for run in _CJK_RUN_RE.findall(query or ""):
        if "一" <= run[0] <= "鿿":
            out.extend(
                [run[i : i + 2] for i in range(len(run) - 1)] or [run]
            )
        else:
            out.append(run.lower())
    return out


def cjk_aware_postings(docs) -> "DataFrame":
    """Analyzer for ``SearchEngine.build(postings_fn=...)`` (the
    pluggable-analyzer seam): (doc_id, url, term, tf) postings under
    the CJK-bigram token stream, so mixed-script corpora index and
    search correctly — a query in hanzi becomes the same bigrams at
    query time via ``cjk_bigram_tokens`` on a literal."""
    toks = docs.select(
        "doc_id", "url", F.explode(cjk_bigram_tokens("text")).alias("term")
    ).where(F.col("term") != "")
    return toks.groupBy("doc_id", "url", "term").agg(
        F.count(F.lit(1)).cast("int").alias("tf")
    )


def remove_stopwords(col) -> Column:
    """Drop the reference's 127 stopwords from an array<string> column
    (order-preserving filter, not array_except which also dedupes)."""
    c = F.col(col) if isinstance(col, str) else col
    stops = F.array(*[F.lit(s) for s in sorted(STOPWORDS)])
    return F.filter(c, lambda t: ~F.array_contains(stops, t))


def anchor_links(content_col, base_url_col) -> Column:
    """Normalized, filtered, deduped outlinks of a page (the PageRank
    link-extraction kernel, PageRank.java:68-92)."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    b = F.col(base_url_col) if isinstance(base_url_col, str) else base_url_col
    return _udfs()["anchor_links"](c, b)


# -- boolean query language ------------------------------------------------

class BoolNode:
    """AST node for the boolean query language: ('term', t) |
    ('and'|'or', [children]) | ('not', child)."""

    __slots__ = ("op", "args")

    def __init__(self, op, args):
        self.op, self.args = op, args

    def terms(self) -> list:
        if self.op == "term":
            return [self.args]
        if self.op == "not":
            return self.args.terms()
        out = []
        for a in self.args:
            out.extend(a.terms())
        # de-dupe preserving first-seen order
        return list(dict.fromkeys(out))


def parse_boolean_query(q: str) -> BoolNode:
    """Recursive-descent parser for ``a AND (b OR c) AND NOT d``:
    AND/OR/NOT keywords (case-insensitive), parentheses, and implicit
    AND between adjacent atoms ("a b" == "a AND b"). Terms are
    lowercased. Raises ValueError on malformed input."""
    import re

    toks = re.findall(r"\(|\)|[^\s()]+", q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        node = parse_and()
        branches = [node]
        while peek() is not None and peek().upper() == "OR":
            take()
            branches.append(parse_and())
        return branches[0] if len(branches) == 1 else BoolNode("or", branches)

    def parse_and():
        branches = [parse_not()]
        while peek() is not None and peek() != ")" and peek().upper() != "OR":
            if peek().upper() == "AND":
                take()
            branches.append(parse_not())
        return branches[0] if len(branches) == 1 else BoolNode("and", branches)

    def parse_not():
        t = peek()
        if t is None:
            raise ValueError("query ended mid-expression")
        if t.upper() == "NOT":
            take()
            return BoolNode("not", parse_not())
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ValueError("unbalanced parenthesis")
            take()
            return node
        if t == ")" or t.upper() in ("AND", "OR"):
            raise ValueError(f"unexpected {t!r}")
        return BoolNode("term", take().lower())

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing input at {toks[pos]!r}")
    return node


def boolean_expr(node: BoolNode, flag_of) -> Column:
    """Compile the AST to ONE Column over per-document term-presence
    flags (``flag_of(term) -> BooleanColumn``). Evaluating a boolean
    query is then a single aggregation producing the flags plus this
    filter — no per-operator set joins, the shape that holds when the
    corpus is 10^12 docs and the query has 20 clauses."""
    if node.op == "term":
        return flag_of(node.args)
    if node.op == "not":
        return ~boolean_expr(node.args, flag_of)
    cols = [boolean_expr(a, flag_of) for a in node.args]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if node.op == "and" else (out | c)
    return out


def positive_terms(node: BoolNode, negated: bool = False) -> list:
    """Terms under an even number of NOTs — the ones that support
    relevance ranking of a boolean match (a ranked-boolean query
    orders by BM25 over these; purely negated terms only filter)."""
    if node.op == "term":
        return [] if negated else [node.args]
    if node.op == "not":
        return positive_terms(node.args, not negated)
    out = []
    for a in node.args:
        out.extend(positive_terms(a, negated))
    return list(dict.fromkeys(out))


def eval_boolean(node: BoolNode, tokens: set) -> bool:
    """Evaluate the AST against ONE document's token set, driver-side —
    the third compiler over the same tree (Column, SQL predicate, and
    now plain Python). This is the per-document ingest form of
    percolation: matching one arriving document against stored queries
    is a set-membership walk, no Spark job at all. Wildcard terms
    ("quer*") test any-token-startswith, matching the other two
    compilers' semantics exactly."""
    if node.op == "term":
        t = node.args
        if t.endswith("*"):
            pre = t[:-1]
            return any(w.startswith(pre) for w in tokens)
        return t in tokens
    if node.op == "not":
        return not eval_boolean(node.args, tokens)
    if node.op == "and":
        return all(eval_boolean(a, tokens) for a in node.args)
    return any(eval_boolean(a, tokens) for a in node.args)
