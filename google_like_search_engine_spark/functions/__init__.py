from .library import (
    anchor_links,
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
    "digit_boundary_tokens",
    "remove_stopwords",
]
