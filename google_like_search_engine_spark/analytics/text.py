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


END_OF_WORD = "</w>"


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    vocab_cap: int = 50_000,
) -> list:
    """Train a byte-pair-encoding merge table on the corpus: the classic
    Sennrich algorithm (count adjacent symbol pairs weighted by word
    frequency, merge the most frequent, repeat), made deterministic by
    lexicographic tie-breaks.

    The word-frequency histogram is computed distributed (explode +
    groupBy — one shuffle) and only the top ``vocab_cap`` (by frequency,
    then word) is collected for the driver-side merge loop — the
    standard practice at scale, where training reads a capped/sampled
    histogram and only ENCODING runs over the full corpus.

    Returns the ordered merge list [(left, right), ...].
    """
    rows = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(vocab_cap)
        .collect()
    )
    vocab = {
        tuple(r["w"]) + (END_OF_WORD,): int(r["freq"]) for r in rows
    }
    merges: list = []
    for _ in range(num_merges):
        pairs: dict = {}
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        # deterministic: highest count, then lexicographically SMALLEST
        best_count = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == best_count)
        if best_count < 2:
            break
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict = {}
        for word, freq in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best_pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def _bpe_encode_word(word: str, ranks: dict) -> list:
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame,
    merges: list,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Encode each doc with a trained merge table -> (id, tokens
    array<string>, n_tokens). Arrow-batched; the merge table broadcasts
    via closure capture and per-word encodings memoize within a worker."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from functools import lru_cache

        @lru_cache(maxsize=65536)
        def enc(word: str) -> tuple:
            return tuple(_bpe_encode_word(word, ranks))

        for pdf in batches:
            ids, toks, counts = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                out = []
                for w in (text or "").split():
                    out.extend(enc(w))
                ids.append(i)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "tokens": pd.Series(toks, dtype="object"),
                    "n_tokens": counts,
                }
            )

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        run, schema="id long, tokens array<string>, n_tokens long"
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


FP_DF_CAP = 128


def partial_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    window: int = 32,
    keep: int = 8,
    min_shared: int = 2,
) -> DataFrame:
    """Partial-duplicate detection: doc pairs sharing >= ``min_shared``
    winnowing fingerprints (rolling_fingerprints) — robust to local
    edits where exact/shingle dedup misses, the use the fingerprints
    exist for. Fingerprints present in more than FP_DF_CAP docs are
    excluded from the pair join (boilerplate windows would otherwise go
    quadratic — the same cap discipline as the shingle and LSH paths).
    Returns (id_a, id_b, n_shared)."""
    fps = rolling_fingerprints(df, id_col, text_col, window=window, keep=keep)
    ex = fps.select("id", F.explode("fingerprint").alias("fp")).distinct()
    rare = (
        ex.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= FP_DF_CAP)
        .select("fp")
    )
    ex = ex.join(rare, "fp", "left_semi")
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def best_snippet_window(
    df: DataFrame,
    terms: list,
    id_col: str = "id",
    text_col: str = "text",
    width: int = 10,
) -> DataFrame:
    """Search-result snippets: for each doc containing at least one of
    ``terms``, the ``width``-token window with the MOST query-term hits
    (earliest window on ties — deterministic), as (id, n_hits,
    snippet). Pure JVM array algebra (transform/slice/aggregate inside
    whole-stage codegen, O(n_tokens x width) per doc, no Python
    worker) — the result-page step the reference's frontend stops
    short of (RankerStarter returns bare urls)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    hit = F.transform(toks, lambda t: t.isin(terms).cast("int"))
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
    win_scores = F.transform(
        starts,
        lambda i: F.aggregate(
            F.slice(hit, i, width), F.lit(0), lambda acc, x: acc + x
        ),
    )
    best = F.array_max(win_scores)
    best_pos = F.array_position(win_scores, best)  # first max = earliest
    return (
        df.select(
            F.col(id_col).alias("id"),
            best.alias("n_hits"),
            F.array_join(
                F.slice(toks, best_pos.cast("int"), width), " "
            ).alias("snippet"),
        )
        .where(F.col("n_hits") > 0)
    )
