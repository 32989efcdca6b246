"""Kernel parity tests against frozen Java-reference golden vectors.

Vectors in tests/golden/*.json were produced by compiling and running
the reference's own Hasher.java / PorterStemmer.java and a Java harness
replicating the Crawler cleaning-regex chain (Crawler.java:337-363)
verbatim; the Python kernels must match byte-for-byte.
"""

import json
import pathlib

import pytest

from google_like_search_engine_spark.kernels import (
    STOPWORDS,
    clean_html,
    extract_links,
    index_tokenize,
    kvs_hash,
    normalize_urls,
    parse_url,
    porter_stem,
    should_include_url,
)
from google_like_search_engine_spark.kernels.textclean import (
    _PUNCT_RE,
    _SCRIPT_RE,
    _STYLE_RE,
    _TAG_RE,
    _TOKEN_SPLIT_RE,
    _WS_RUN_RE,
    java_split,
)

GOLDEN = pathlib.Path(__file__).parent / "golden"
VEC = json.loads((GOLDEN / "kernel_vectors.json").read_text())
CLEAN = json.loads((GOLDEN / "clean_vectors.json").read_text())


def test_hash_parity():
    for inp, expected in VEC["hash"].items():
        assert kvs_hash(inp) == expected, inp


def test_hash_known_properties():
    h = kvs_hash("http://foo.com:80/page1.html")
    assert len(h) == 40 and h.isalpha() and h.islower()
    assert kvs_hash("a") != kvs_hash("b")


def test_stem_parity():
    for word, expected in VEC["stem"].items():
        assert porter_stem(word) == expected, word


def test_stem_documented_examples():
    # Porter (1980) examples documented in the reference source.
    for w, s in [
        ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
        ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
        ("agreed", "agre"), ("matting", "mat"), ("mating", "mate"),
        ("meeting", "meet"), ("milling", "mill"), ("messing", "mess"),
        ("meetings", "meet"),
    ]:
        assert porter_stem(w) == s, w
    # length <= 2 unchanged (k > 1 guard)
    assert porter_stem("ab") == "ab"
    assert porter_stem("a") == "a"
    assert porter_stem("") == ""


def _java_clean(html, dictionary):
    c = _SCRIPT_RE.sub("", html)
    c = _STYLE_RE.sub("", c)
    c = _WS_RUN_RE.sub(" ", c)
    c = _TAG_RE.sub(" ", c)
    c = _PUNCT_RE.sub(" ", c)
    c = c.lower()
    toks = java_split(_TOKEN_SPLIT_RE, c)
    return " ".join(t for t in toks if t not in STOPWORDS and t in dictionary)


def test_clean_chain_parity():
    dictionary = set(CLEAN["dictionary"])
    for case in CLEAN["cases"]:
        assert _java_clean(case["html"], dictionary) == case["expected"]


def test_clean_html_end_to_end():
    dictionary = {"apples", "bananas", "link"}
    text, links = clean_html(
        '<html lang="en"><body>The apples and <a href="p2.html">link</a>'
        " bananas!</body></html>",
        dictionary,
        base_url="https://host.example.com:443/d/p1.html",
    )
    assert text == 'apples link bananas <a href="https://host.example.com:443/d/p2.html"></a>'
    assert links == ["https://host.example.com:443/d/p2.html"]


def test_clean_html_drops_non_english():
    text, links = clean_html('<html lang="de"><body>was</body></html>', {"was"})
    assert text is None and links == []
    # no lang attribute -> passes
    text, _ = clean_html("<html><body>apples</body></html>", {"apples"})
    assert text == "apples"


def test_parse_url():
    assert parse_url("http://foo.com:8080/a/b.html") == ["http", "foo.com", "8080", "/a/b.html"]
    assert parse_url("https://foo.com") == ["https", "foo.com", None, "/"]
    assert parse_url("page.html") == [None, None, None, "page.html"]
    assert parse_url("/abs/path.html") == [None, None, None, "/abs/path.html"]


def test_normalize_urls():
    base = "https://foo.com/a/b/c.html"
    assert normalize_urls(["d.html"], base) == ["https://foo.com:443/a/b/d.html"]
    assert normalize_urls(["/root.html"], base) == ["https://foo.com:443/root.html"]
    # Reference quirk (PageRank.java:52-56): basePath still contains the
    # filename when '../' resolution starts, so the first '../' only
    # strips the filename — one level "short" of RFC 3986. Reproduced.
    assert normalize_urls(["../up.html"], base) == ["https://foo.com:443/a/b/up.html"]
    assert normalize_urls(["../../top.html"], base) == ["https://foo.com:443/a/top.html"]
    assert normalize_urls(["d.html#frag"], base) == ["https://foo.com:443/a/b/d.html"]
    assert normalize_urls(["http://other.com/x.html"], base) == ["http://other.com:80/x.html"]
    # port 80 default for http base
    assert normalize_urls(["p2.html"], "http://foo.com:80/p1.html") == ["http://foo.com:80/p2.html"]


def test_should_include_url():
    assert should_include_url("https://a.com:443/x.html")
    assert not should_include_url("ftp://a.com/x")
    assert not should_include_url("https://a.com/img.PNG")
    assert not should_include_url("https://a.com/notes.txt")


def test_extract_links_dedup_and_order():
    html = ('<a href="b.html">one</a> <a href="c.jpg">img</a>'
            ' <a href="b.html">dup</a> <A HREF="d.html">caps</A>')
    links = extract_links(html, "http://foo.com:80/a.html")
    assert links == ["http://foo.com:80/b.html", "http://foo.com:80/d.html"]


def test_index_tokenize_positions_and_norm():
    # "apples  bananas" -> split(" ") = [apples, '', bananas]; positions
    # 1-based counting the blank: apples@1, bananas@3.
    pos, l2 = index_tokenize("apples  bananas")
    assert pos["apples"] == [1]
    assert pos["bananas"] == [3]
    # stems recorded at same positions when they differ
    assert pos["appl"] == [1]
    assert pos["banana"] == [3]
    assert l2 == pytest.approx(2.0)  # sqrt(4 terms x tf 1)


def test_index_tokenize_repeated_terms():
    pos, l2 = index_tokenize("cat cat dog")
    assert pos["cat"] == [1, 2]
    assert pos["dog"] == [3]
    assert l2 == pytest.approx((4 + 1) ** 0.5)


# -- robots exclusion kernel (RobotExclusionProtocol.java port) -------------

def test_robots_agent_priority_and_fallback():
    from google_like_search_engine_spark.kernels.robots import is_url_allowed

    txt = (
        "User-agent: cis5550-crawler\nAllow: /b\n"
        "User-agent: *\nDisallow: /b\n"
    )
    assert is_url_allowed(txt, "/b.html", "cis5550-crawler") is True
    assert is_url_allowed(txt, "/b.html", "otherbot") is False
    # no section at all -> allowed
    assert is_url_allowed("# nothing here", "/b.html") is True
    # the reference's fetch-failure sentinel allows everything
    assert is_url_allowed("NaN", "/b.html") is True


def test_robots_only_first_matching_section_counts():
    from google_like_search_engine_spark.kernels.robots import is_url_allowed

    # java:35 keeps collecting only while relevantLines.isEmpty(): the
    # second '*' section's Allow is never read
    txt = "User-agent: *\nDisallow: /a\nUser-agent: *\nAllow: /a\n"
    assert is_url_allowed(txt, "/a/x") is False


def test_robots_first_matching_rule_wins():
    from google_like_search_engine_spark.kernels.robots import is_url_allowed

    txt = "User-agent: *\nAllow: /ab\nDisallow: /a\n"
    assert is_url_allowed(txt, "/abc") is True
    assert is_url_allowed(txt, "/ax") is False
    # no rule matches -> allowed
    assert is_url_allowed(txt, "/zzz") is True


def test_robots_wildcard_quirk_reproduced():
    from google_like_search_engine_spark.kernels.robots import is_url_allowed

    # java:59-64 escapes dots AFTER expanding '*' to '.*', so the
    # wildcard matches only runs of literal dots — pinned, not "fixed"
    txt = "User-agent: *\nDisallow: /a*b\n"
    assert is_url_allowed(txt, "/azb") is True   # RFC would block this
    assert is_url_allowed(txt, "/a.b") is False
    assert is_url_allowed(txt, "/ab") is False


def test_robots_crawl_delay_parse():
    from google_like_search_engine_spark.kernels.robots import parse_crawl_delay

    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 2.5\n") == 2500.0
    assert parse_crawl_delay("crawl-DELAY: 3") == 3000.0
    assert parse_crawl_delay("User-agent: *\nDisallow: /x") == 1000.0
    assert parse_crawl_delay("") == 1000.0
