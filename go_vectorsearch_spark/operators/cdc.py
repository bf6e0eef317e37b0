"""Content-defined chunking (CDC) + sub-document dedup.

Fixed-width chunking shifts every boundary after an insertion, so two
documents sharing a long passage at different offsets produce disjoint
chunk sets. CDC places boundaries where a rolling hash of the LOCAL
bytes crosses a threshold — boundaries are a function of content, not
position — so a shared passage yields the SAME interior chunks in both
documents and one exact-hash groupBy finds it (the mechanism behind
SlimPajama/FastCDC-style sub-document dedup of training corpora; gear
hashing per Xia et al., FastCDC, USENIX ATC 2016).

The reference engine has no sub-document machinery (its Split chunker
is a fixed word-budget splitter, server/format.go:91-108); this is a
pipeline extension on the curation track.

Spark shape:
  * chunking is a NARROW map — an Arrow-batched ``mapInPandas`` that
    emits (doc_id, chunk_ix, chunk_len, chunk_hash[, chunk_text]) rows;
    no shuffle, text leaves the worker only if the caller asks for it;
  * dedup/statistics are one groupBy on the 16-byte chunk hash —
    the md5-shuffle cost profile of exact document dedup, at chunk
    granularity.

The gear table is derived deterministically from md5 so the chunker is
engine-reproducible bit-for-bit (tests replay it in pure Python).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 256-entry gear table: md5(seed byte) folded to uint64. Deterministic
# across processes/engines — no RNG state anywhere.
_GEAR = [
    int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
    for b in range(256)
]
_MASK64 = (1 << 64) - 1


def cdc_boundaries(
    data: bytes,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> list[int]:
    """End offsets of each chunk of ``data`` (last == len(data)).

    Gear rolling hash: h = (h << 1 + gear[byte]) mod 2^64; a boundary
    is declared when ``h & (avg_size - 1) == avg_size - 1`` (avg_size
    must be a power of two), skipping the first ``min_size`` bytes of a
    chunk (boundary-density cap) and forcing a cut at ``max_size``
    (pathological-content cap). The hash RESETS at each cut, so a
    chunk's boundary depends only on its own bytes — the self-
    synchronization property that re-aligns chunking after an edit."""
    if not avg_size or avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    mask = avg_size - 1
    out = []
    h = 0
    start = 0
    for i, byte in enumerate(data):
        h = ((h << 1) + _GEAR[byte]) & _MASK64
        if i + 1 - start >= min_size and (h & mask) == mask:
            out.append(i + 1)
            start = i + 1
            h = 0
        elif i + 1 - start >= max_size:
            out.append(i + 1)
            start = i + 1
            h = 0
    if start < len(data) or not data:
        out.append(len(data))
    return out


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
    keep_text: bool = False,
) -> DataFrame:
    """(doc_id, chunk_ix, chunk_len, chunk_hash[, chunk_text]) — one
    output row per content-defined chunk, in document order.

    A narrow Arrow-batched map: each worker chunks its own partition's
    documents and ships 3 small columns (plus the md5) per chunk; the
    raw text stays put unless ``keep_text=True`` (hydration-style
    callers only). Boundaries are computed over UTF-8 bytes but always
    land ON character boundaries (cut points are snapped back to the
    nearest codepoint start) so chunk_text round-trips losslessly."""
    schema = f"{id_col} long, chunk_ix int, chunk_len int, chunk_hash string"
    if keep_text:
        schema += ", chunk_text string"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, ixs, lens, hashes, texts = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                prev = 0
                for ix, end in enumerate(
                    cdc_boundaries(raw, min_size, avg_size, max_size)
                ):
                    # snap a cut landing inside a multi-byte codepoint
                    # back to the codepoint's first byte
                    while end < len(raw) and (raw[end] & 0xC0) == 0x80:
                        end -= 1
                    if end <= prev and len(raw):
                        continue
                    piece = raw[prev:end]
                    ids.append(doc_id)
                    ixs.append(ix)
                    lens.append(len(piece))
                    hashes.append(hashlib.md5(piece).hexdigest())
                    if keep_text:
                        texts.append(piece.decode("utf-8"))
                    prev = end
            out = {
                id_col: pd.Series(ids, dtype="int64"),
                "chunk_ix": pd.Series(ixs, dtype="int32"),
                "chunk_len": pd.Series(lens, dtype="int32"),
                "chunk_hash": pd.Series(hashes, dtype="object"),
            }
            if keep_text:
                out["chunk_text"] = pd.Series(texts, dtype="object")
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def cdc_dup_stats(
    chunks: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document duplicated-passage statistics from a cdc_chunks
    frame: (doc_id, n_chunks, total_len, dup_chunks, dup_len,
    dup_frac) where a chunk is DUP iff another document (lower id wins
    ownership, ties by chunk position) holds an identical-hash chunk.

    Two shuffles of narrow rows: chunk_hash -> ownership window
    (whole-partition min/count — no ORDER BY, no join back), then
    doc_id -> stats. The raw text is never involved; at 100 TB this is
    the md5-groupBy cost profile of exact dedup, at chunk granularity.
    ``chunks`` is consumed ONCE (r13: the former owner-aggregate +
    tag-back join consumed it twice and shuffled both the aggregate
    output and the chunk rows; the hash-partitioned window moves every
    chunk row exactly once and computes ownership in place — one fewer
    exchange and single-consumption, so callers no longer need to
    persist the chunker output for this statistic).

    NULL-hash invariant (r13 advice): ``cdc_chunks`` hashes every
    emitted piece unconditionally (md5 of non-null bytes — a NULL/empty
    document emits no rows at all), so ``chunk_hash`` is never NULL
    here. That matters for the window rewrite's equivalence with the
    r12 join formulation: an inner join on chunk_hash silently DROPPED
    NULL keys, while Window.partitionBy groups all NULLs into one
    partition and would count them as mutual duplicates — the behaviors
    only coincide because the input can't produce a NULL hash."""
    from pyspark.sql import Window

    w = Window.partitionBy("chunk_hash")
    tagged = chunks.withColumn(
        "_is_dup",
        (
            (F.count("*").over(w) > 1)
            & (F.col(id_col) != F.min(F.col(id_col)).over(w))
        ).cast("int"),
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_len").alias("total_len"),
            F.sum("_is_dup").alias("dup_chunks"),
            F.sum(F.col("_is_dup") * F.col("chunk_len")).alias("dup_len"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("dup_len")
                / F.when(F.col("total_len") > 0, F.col("total_len")).otherwise(1),
                6,
            ),
        )
    )
