"""Bit-exact scalar kernels ported from the reference engine.

These pure-Python functions pin the rank-identity invariants (doc IDs,
stems, cleaned text, normalized URLs). They are used inside Arrow-batched
pandas UDFs; nothing here touches Spark.
"""

from .hasher import kvs_hash
from .porter import porter_stem
from .urls import parse_url, normalize_urls, should_include_url, extract_links
from .textclean import clean_html, STOPWORDS, index_tokenize

__all__ = [
    "kvs_hash",
    "porter_stem",
    "parse_url",
    "normalize_urls",
    "should_include_url",
    "extract_links",
    "clean_html",
    "STOPWORDS",
    "index_tokenize",
]
