"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

JVM-side (built-in functions) where expressible; the BPE-ish tokenizer
and rolling-hash fingerprint run as Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels.textclean import STOPWORDS

# character-trigram profiles for a tiny deterministic lang-ID heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "ing", "ion", "th", " a ", " is "],
    "de": ["der", "die", "und", "sch", "ein", "ich"],
    "fr": ["les", "des", "une", "est", "que", "ée"],
    "es": ["los", "las", "que", "ción", "una", "ado"],
}

# BPE-ish token boundary: word pieces, digits, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")


def lang_scores(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """n-gram-marker language scores + argmax prediction per doc.
    Pure JVM: one pass of instr counts per marker."""
    cols = [F.col(id_col).alias("id")]
    for lang, markers in _LANG_MARKERS.items():
        score = None
        for m in markers:
            cnt = (
                F.length(text_col)
                - F.length(F.regexp_replace(F.col(text_col), re.escape(m), ""))
            ) / len(m)
            score = cnt if score is None else score + cnt
        cols.append((score / (F.length(text_col) + 1)).alias(f"score_{lang}"))
    scored = df.select(*cols)
    langs = list(_LANG_MARKERS)
    pred = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return scored.withColumn("pred_lang", pred)


def quality_features(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality facets, JVM-side."""
    toks = F.split(F.col(text_col), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in sorted(STOPWORDS)])
    n_tokens = F.size(F.filter(toks, lambda t: t != ""))
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (punct / (F.length(text_col) + 1)).alias("punct_ratio"),
        (n_stop / (n_tokens + 1)).alias("stopword_distinct_ratio"),
        (F.length(text_col) / (n_tokens + 1)).alias("mean_token_len"),
    )


def bpe_token_counts(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Token counts: whitespace tokens + BPE-ish regex pieces, one Arrow
    pass (the token-budget accounting a training pipeline needs)."""

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, bpe = [], []
            for text in pdf[text_col]:
                text = text or ""
                ws.append(len(text.split()))
                bpe.append(len(_BPE_RE.findall(text)))
            yield pd.DataFrame(
                {"id": pdf[id_col], "ws_tokens": ws, "bpe_tokens": bpe}
            )

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        count, schema="id long, ws_tokens long, bpe_tokens long"
    )


def rolling_fingerprints(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    window: int = 32,
    keep: int = 4,
) -> DataFrame:
    """Winnowing-style document fingerprints: Karp-Rabin rolling hash
    over character windows, keep the ``keep`` smallest hashes per doc
    (robust to local edits; used for partial-dup detection)."""
    B, M = 131, (1 << 61) - 1

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                hashes = []
                if len(text) >= window:
                    h = 0
                    top = pow(B, window - 1, M)
                    for ch in text[:window]:
                        h = (h * B + ord(ch)) % M
                    hashes.append(h)
                    for j in range(window, len(text)):
                        h = ((h - ord(text[j - window]) * top) * B + ord(text[j])) % M
                        hashes.append(h)
                else:
                    h = 0
                    for ch in text:
                        h = (h * B + ord(ch)) % M
                    hashes.append(h)
                ids.append(i)
                fps.append(sorted(hashes)[:keep])
            yield pd.DataFrame({"id": ids, "fingerprint": fps})

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        fp, schema="id long, fingerprint array<long>"
    )
