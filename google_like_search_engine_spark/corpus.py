"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the ``pages`` table mandated by the build brief:
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)`` — FIXTURES.md section 1. Generation is distributed
(mapInPandas over ``spark.range``) and deterministic per row index, so
any N can be produced on any cluster size with identical bytes.

The ``text`` column is the byte-exact output of the reference cleaning
chain (kernels.clean_html) applied to ``html``, so the engine's own
extraction can be asserted row-for-row against it.
"""

from __future__ import annotations

import datetime as _dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .kernels.textclean import STOPWORDS, clean_html

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

# Stemming-sensitive words (Porter families) + common English-ish words;
# padded with generated tokens to ~1,000 entries. This vocabulary IS the
# dictionary for the clean chain's valid-word filter (the reference's
# words.txt is a missing blob, so the fixture vocabulary replaces it).
_BASE_VOCAB = """
apples bananas coconuts dates elderberries figs guavas hazelnuts
caresses ponies ties cats feed agreed disabled matting mating meeting
milling messing meetings adjustable adjustment adoption agreement
allowance angularity bowdlerize callousness communism conflated
decisiveness defensible dependent effective electrical electricity
feudalism formality formalize formative generalization goodness
gyroscopic hopeful hopefulness hoping hopping inference irritant
operator oscillators predication probate rational rate replacement
revival sensibility sensitivity sized triplicate vietnamization
search engine index query page rank score document corpus crawl
data table column partition shuffle join merge sort filter scan
vector token term frequency weight norm link graph node edge walk
apple banana coconut date fig guava hazelnut berry fruit tree
""".split()


def fixture_vocabulary(size: int = 1000) -> list:
    vocab = list(dict.fromkeys(_BASE_VOCAB))
    k = 0
    while len(vocab) < size:
        vocab.append(f"word{k}")
        k += 1
    return vocab[:size]


def fixture_dictionary(size: int = 1000) -> frozenset:
    """Valid-word set for the clean chain: the vocabulary plus the digit
    strings the Zipfian body mixes in."""
    return frozenset(fixture_vocabulary(size)) | frozenset(str(i) for i in range(100))


def _links_for(i: int, n: int) -> list:
    """Deterministic outlink targets: connected graph with ~5% sinks."""
    if n <= 1 or i % 19 == 4:  # sinks
        return []
    count = 1 + (i % 5)
    raw = [(i + 1) % n, (2 * i + 7) % n, (5 * i + 3) % n, (3 * i + 11) % n, (7 * i + 1) % n]
    targets = []
    for t in raw[:count]:
        if t != i and t not in targets:
            targets.append(t)
    return targets


def url_for(i: int) -> str:
    return f"https://host{i % 17}.example.com:443/d{i % 7}/d{i % 13}/page{i}.html"


def make_page(i: int, n: int, vocab: list, dictionary: frozenset, seed: int = 42):
    """Build one (url, warc_ts, html, text, lang) row deterministically."""
    rng = random.Random((seed << 32) ^ i)
    url = url_for(i)
    lang = "en" if i % 20 != 13 else ("de" if i % 40 == 13 else "fr")
    n_words = rng.randint(50, 400)
    stop = sorted(STOPWORDS)
    body = []
    v = len(vocab)
    for _ in range(n_words):
        r = rng.random()
        if r < 0.15:
            body.append(stop[rng.randrange(len(stop))])
        elif r < 0.20:
            body.append(str(rng.randrange(100)))
        else:
            # Zipf-ish: rank ~ floor(v^u) biases toward low ranks
            rank = int(v ** rng.random()) - 1
            body.append(vocab[rank % v])
    links = _links_for(i, n)
    anchors = "".join(
        f' <a href="{url_for(t)}">anchor {t}</a>' for t in links
    )
    html = (
        f'<html lang="{lang}"><head><title>t{i}</title>'
        f"<script>var x={i};</script><style>.c{{}}</style></head><body>"
        + " ".join(body)
        + anchors
        + "</body></html>"
    )
    text, _ = clean_html(html, dictionary, base_url=url)
    ts = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(seconds=i)
    return url, ts, html.encode("utf-8"), text, lang


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    vocab_size: int = 1000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table of ``n`` rows."""
    vocab = fixture_vocabulary(vocab_size)
    dictionary = fixture_dictionary(vocab_size)
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches):
        for pdf in batches:
            rows = [make_page(int(i), n, vocab, dictionary, seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages(spark: SparkSession, n: int, path: str, **kw) -> None:
    generate_pages(spark, n, **kw).write.mode("overwrite").parquet(path)
