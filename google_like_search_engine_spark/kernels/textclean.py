"""HTML -> text cleaning chain and indexer tokenization.

Ports of the reference's text pipeline (/root/reference):
- ``clean_html``     <- jobs/Crawler.java:318-371 (page cap, script/style
                        strip incl. the literal buggy style regex, lang
                        filter, tag/punct strip, lowercase, digit-boundary
                        tokenize, stopword + dictionary filters, outlink
                        tags appended)
- ``index_tokenize`` <- jobs/Indexer.java:56-99 (single-space split,
                        1-based positions counting blanks, raw+stem dual
                        entries, combined-map L2 norm)
- ``STOPWORDS``      <- jobs/Crawler.java:756-770 / Indexer.java:229-243

The per-row invariant vs the reference is byte-identical cleaned text
per url, so every regex is the Java pattern transliterated (Python `re`
accepts these verbatim except ``\\p{Punct}``, expanded to the explicit
ASCII class Java uses).
"""

from __future__ import annotations

import re

from .hasher import kvs_hash
from .porter import porter_stem
from .urls import ANCHOR_RE, extract_links

MAX_PAGE_CHARS = 2_000_000

# jobs/Crawler.java:756-770 (identical set at Indexer.java:229-243)
STOPWORDS = frozenset(
    """i me my myself we our ours ourselves you your yours yourself yourselves
    he him his himself she her hers herself it its itself they them their
    theirs themselves what which who whom this that these those am is are was
    were be been being have has had having do does did doing a an the and but
    if or because as until while of at by for with about against between into
    through during before after above below to from up down in out on off
    over under again further then once here there when where why how all any
    both each few more most other some such no nor not only own same so than
    too very s t can will just don should now""".split()
)

_SCRIPT_RE = re.compile(r"<script[^>]*>[\s\S]*?</script>")
# Literal port of the reference's buggy style regex (missing quantifiers;
# Crawler.java:338) — reproduced as-is for byte identity.
_STYLE_RE = re.compile(r"<style[^>]>[\s\S]?</style>")
_WS_RUN_RE = re.compile(r"\s{2,}")
_TAG_RE = re.compile(r"<[^>]*>")
# Java \p{Punct} = the 32 ASCII punctuation chars.
_PUNCT_RE = re.compile(r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]")
# Whitespace runs + digit/non-digit boundaries (Crawler.java:358).
_TOKEN_SPLIT_RE = re.compile(r"\s+|(?<=\d)(?=\D)|(?<=\D)(?=\d)")
_LANG_RE = re.compile(r'<html\s+(?:[^>]*?\s+)?lang="([^"]+)"', re.IGNORECASE)


def java_split(pattern: re.Pattern, s: str) -> list:
    """Python re.split with Java String.split(regex) trailing-empty
    removal semantics (limit 0 drops trailing empty strings)."""
    parts = pattern.split(s)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def is_english_lang(html: str) -> bool:
    """Crawler.java:467-477: keep pages whose ``<html lang>`` is en/en-*;
    pages without a lang attribute pass."""
    m = _LANG_RE.search(html)
    if m:
        lang = m.group(1).lower()
        return lang == "en" or lang.startswith("en-")
    return True


def clean_html(html: str, dictionary, base_url: str = ""):
    """Full Crawler cleaning chain -> (text, outlinks) or (None, []).

    ``dictionary`` is the valid-words set (the reference's words.txt is
    a missing blob, so fixtures supply their own). Returns ``None`` text
    for non-English pages (the crawler drops them before storing).
    Outlinks are extracted post-script/style-strip, normalized against
    ``base_url`` and re-appended to the text as bare anchor tags
    (Crawler.java:364-369) so the downstream link graph lives inside
    the text column, exactly like the reference's ``page`` column.
    """
    content = html[:MAX_PAGE_CHARS]
    content = _SCRIPT_RE.sub("", content)
    content = _STYLE_RE.sub("", content)
    content = _WS_RUN_RE.sub(" ", content)

    if not is_english_lang(content):
        return None, []

    links = extract_links(content, base_url) if base_url else []

    content = _TAG_RE.sub(" ", content)
    content = _PUNCT_RE.sub(" ", content)
    content = content.lower()

    tokens = java_split(_TOKEN_SPLIT_RE, content)
    kept = [t for t in tokens if t not in STOPWORDS and t in dictionary]
    text = " ".join(kept)
    text += "".join(f' <a href="{u}"></a>' for u in links)
    return text, links


_MEMO_MISS = object()
_STEM_DIFF_MEMO: dict = {}


def index_tokenize(page: str):
    """Indexer tokenization -> (term -> [positions], l2_norm).

    Semantics pinned by Indexer.java:56-99: split on a single literal
    space; the position counter is 1-based and advances for *every*
    split element including blanks; blank tokens are skipped; each
    non-blank token is recorded raw and additionally under its Porter
    stem when the stem differs; the document L2 norm is
    sqrt(sum(tf^2)) over the combined raw+stem map.

    Hot path of the index build (called per document inside Arrow
    batches): locals are bound once, the whitespace-only check avoids
    allocating ``strip()`` copies, and stems come from the process-wide
    memo in porter_stem.
    """
    positions: dict = {}
    get = positions.get
    memo = _STEM_DIFF_MEMO
    pos = 0
    for token in page.split(" "):
        pos += 1
        # skip blank/whitespace-only tokens without allocating strip()
        # copies. (Java's trim() also drops tokens made only of control
        # chars < U+0020 that Python's isspace() misses — unreachable
        # after the cleaning chain, which never emits control chars.)
        if not token or token.isspace():
            continue
        plist = get(token)
        if plist is None:
            positions[token] = [pos]
        else:
            plist.append(pos)
        # plain-dict memo of stem-if-different (None when stem == token):
        # one dict probe per occurrence instead of an lru_cache call plus
        # an equality check — the tokenize hot loop's dominant cost
        stemmed = memo.get(token, _MEMO_MISS)
        if stemmed is _MEMO_MISS:
            s = porter_stem(token)
            stemmed = s if s != token else None
            if len(memo) > (1 << 19):  # bound worker memory on huge vocabs
                memo.clear()
            memo[token] = stemmed
        if stemmed is not None:
            plist = get(stemmed)
            if plist is None:
                positions[stemmed] = [pos]
            else:
                plist.append(pos)
    l2 = sum(len(v) * len(v) for v in positions.values()) ** 0.5
    return positions, l2


def doc_id_for_url(url: str) -> str:
    """Stable 40-char doc ID (= reference row key, Hasher.hash(url))."""
    return kvs_hash(url)


__all__ = [
    "STOPWORDS",
    "MAX_PAGE_CHARS",
    "ANCHOR_RE",
    "java_split",
    "is_english_lang",
    "clean_html",
    "index_tokenize",
    "doc_id_for_url",
]
