"""Column-level scalar function library vs the pure-Python kernels."""

from pyspark.sql import functions as F

from google_like_search_engine_spark import functions as fn
from google_like_search_engine_spark.kernels import kvs_hash, porter_stem
from google_like_search_engine_spark.kernels.textclean import STOPWORDS


def test_doc_hash_and_stem_columns(spark):
    df = spark.createDataFrame(
        [("http://foo.com/page1.html", "meetings"), ("über", "ponies")],
        "url string, word string",
    )
    rows = df.select(
        fn.doc_hash("url").alias("h"), fn.stem("word").alias("s")
    ).collect()
    assert rows[0]["h"] == kvs_hash("http://foo.com/page1.html")
    assert rows[0]["s"] == porter_stem("meetings") == "meet"
    assert rows[1]["s"] == "poni"


def test_clean_text_matches_kernel_chain(spark):
    html = ('<html lang="en"><script>var x=1;</script><b>Apples,</b> and '
            "BANANAS!!  123abc</html>")
    from google_like_search_engine_spark.kernels.textclean import (
        _PUNCT_RE, _SCRIPT_RE, _STYLE_RE, _TAG_RE, _WS_RUN_RE)

    expected = _PUNCT_RE.sub(
        " ", _TAG_RE.sub(" ", _WS_RUN_RE.sub(" ", _STYLE_RE.sub("", _SCRIPT_RE.sub("", html))))
    ).lower()
    got = (
        spark.createDataFrame([(html,)], "html string")
        .select(fn.clean_text("html").alias("t"))
        .collect()[0]["t"]
    )
    assert got == expected


def test_digit_boundary_tokens_and_stopwords(spark):
    df = spark.createDataFrame([("the abc123def and spark",)], "t string")
    toks = df.select(fn.digit_boundary_tokens("t").alias("toks"))
    got = toks.collect()[0]["toks"]
    assert got == ["the", "abc", "123", "def", "and", "spark"]
    filtered = toks.select(fn.remove_stopwords("toks").alias("f")).collect()[0]["f"]
    assert filtered == ["abc", "123", "def", "spark"]
    assert "the" in STOPWORDS and "and" in STOPWORDS


def test_stem_tokens_array(spark):
    df = spark.createDataFrame([(["meetings", "ponies", "cat"],)], "toks array<string>")
    got = df.select(fn.stem_tokens("toks").alias("s")).collect()[0]["s"]
    assert got == ["meet", "poni", "cat"]


def test_anchor_links_column(spark):
    df = spark.createDataFrame(
        [('<a href="b.html">x</a> <a href="c.jpg">y</a>', "http://foo.com:80/a.html")],
        "content string, url string",
    )
    got = df.select(fn.anchor_links("content", "url").alias("l")).collect()[0]["l"]
    assert got == ["http://foo.com:80/b.html"]


def test_cjk_bigram_tokens(spark):
    df = spark.createDataFrame(
        [
            ("我爱北京天安门 spark SQL 123abc",),
            ("茶 tea",),
            ("no cjk here",),
        ],
        "text string",
    )
    got = [r["t"] for r in df.select(fn.cjk_bigram_tokens("text").alias("t")).collect()]
    assert got[0] == ["我爱", "爱北", "北京", "京天", "天安", "安门", "spark", "sql", "123abc"]
    # single ideograph stays a unigram; latin lowercases
    assert got[1] == ["茶", "tea"]
    assert got[2] == ["no", "cjk", "here"]


def test_cjk_aware_postings_end_to_end(spark):
    """The pluggable-analyzer seam with the CJK analyzer: hanzi
    queries match bigram terms through the normal BM25 path."""
    from google_like_search_engine_spark.engine import SearchEngine

    pages = spark.createDataFrame(
        [
            ("http://a.example.com:80/1.html", "北京欢迎你 welcome to beijing"),
            ("http://a.example.com:80/2.html", "上海天气 weather report shanghai"),
            ("http://a.example.com:80/3.html", "plain english page about spark"),
        ],
        "url string, text string",
    )
    eng = SearchEngine(spark).build(
        pages, run_pagerank=False, postings_fn=fn.cjk_aware_postings
    )
    hits = eng.search_bm25("北京", k=3).collect()
    assert len(hits) == 1 and hits[0]["url"].endswith("/1.html")
    hits2 = eng.search_bm25("天气", k=3).collect()
    assert len(hits2) == 1 and hits2[0]["url"].endswith("/2.html")
    # latin terms still work under the same analyzer
    hits3 = eng.search_bm25("spark", k=3).collect()
    assert len(hits3) == 1 and hits3[0]["url"].endswith("/3.html")
    # query-side seam: a 3-ideograph query analyzes into the same
    # bigrams the index stores (raw token alone would match nothing)
    assert fn.cjk_query_terms("北京欢迎 spark") == ["北京", "京欢", "欢迎", "spark"]
    hits4 = eng.search_bm25("欢迎你", k=3, analyzer=fn.cjk_query_terms).collect()
    assert len(hits4) == 1 and hits4[0]["url"].endswith("/1.html")
    assert eng.search_bm25("欢迎你", k=3).collect() == []
    eng.unpersist()


def _bool_eval(node, truth):
    """Pure-Python evaluator for parser tests."""
    if node.op == "term":
        return node.args in truth
    if node.op == "not":
        return not _bool_eval(node.args, truth)
    vals = [_bool_eval(a, truth) for a in node.args]
    return all(vals) if node.op == "and" else any(vals)


def test_boolean_query_parser_semantics():
    """Precedence (NOT > AND > OR), implicit AND between adjacent
    atoms, parens, case-insensitive keywords, lowercased terms."""
    from google_like_search_engine_spark.functions.library import (
        parse_boolean_query,
    )

    ast = parse_boolean_query("a OR b AND c")
    # OR binds loosest: true with just {a}, false with just {b}
    assert _bool_eval(ast, {"a"}) and not _bool_eval(ast, {"b"})
    assert _bool_eval(ast, {"b", "c"})

    ast = parse_boolean_query("(a OR b) AND c")
    assert not _bool_eval(ast, {"a"}) and _bool_eval(ast, {"a", "c"})

    ast = parse_boolean_query("a b NOT c")  # implicit AND
    assert _bool_eval(ast, {"a", "b"}) and not _bool_eval(ast, {"a", "b", "c"})

    ast = parse_boolean_query("NOT NOT a")
    assert _bool_eval(ast, {"a"}) and not _bool_eval(ast, set())

    ast = parse_boolean_query("Spark and Join or Window")
    assert ast.terms() == ["spark", "join", "window"]
    assert _bool_eval(ast, {"window"})


def test_boolean_query_parser_rejects_malformed():
    import pytest as _pt

    from google_like_search_engine_spark.functions.library import (
        parse_boolean_query,
    )

    for bad in ["", "(a", "a)", "AND a", "a OR", "NOT", "a (b"]:
        with _pt.raises(ValueError):
            parse_boolean_query(bad)
