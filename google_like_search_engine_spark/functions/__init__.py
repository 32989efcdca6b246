from .library import (
    anchor_links,
    cjk_aware_postings,
    cjk_bigram_tokens,
    cjk_query_terms,
    clean_text,
    doc_hash,
    digit_boundary_tokens,
    remove_stopwords,
    stem,
    stem_tokens,
)

__all__ = [
    "doc_hash",
    "stem",
    "stem_tokens",
    "clean_text",
    "anchor_links",
    "cjk_aware_postings",
    "cjk_bigram_tokens",
    "cjk_query_terms",
    "digit_boundary_tokens",
    "remove_stopwords",
]
