"""Streaming exact deduplication over a documents stream.

A continuously-ingesting corpus wants dedup at ingest time, not as a
nightly batch: the first copy of a document passes through, later copies
are dropped. Spark expresses this as ``dropDuplicates`` on a content
hash over a streaming DataFrame — state is one row per distinct hash in
the state store (RocksDB on a real cluster).

Survivor semantics — stated precisely: the FIRST-ARRIVING copy wins
(the right contract for ingest: the earliest ingested copy is already
stored/served downstream and cannot be retroactively swapped), whereas
the batch ``exact_dedup`` keeps the MIN-ID copy. The surviving
distinct-TEXT set is always identical; the surviving IDs coincide when
duplicates arrive in id order (the ordered-fixture equality
tests/test_streaming.py asserts) and may differ otherwise — consumers
that need id-deterministic survivors run the batch operator over the
settled corpus.

Scale notes (100 TB design point):
  * State is keyed by the 32-hex md5 only (no text) — ~50 bytes/row, so
    a billion distinct documents is ~50 GB of state, spread across the
    state store's shuffle partitions. The document text never enters
    state.
  * For unbounded streams where exact forever-dedup state is too large,
    ``within_watermark`` bounds state by event-time horizon via
    ``dropDuplicatesWithinWatermark`` — the standard trade: duplicates
    separated by more than the horizon pass through, state stays
    bounded. The reference engine has no streaming surface at all
    (SURVEY.md §2.10); both variants are engine extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source documents stream, one micro-batch per file (the
    shared ingest._read_table_stream reader — one definition of the
    basePath+glob trick)."""
    from go_vectorsearch_spark.streaming.ingest import _read_table_stream

    return _read_table_stream(
        spark, sf_dir, "documents", max_files_per_trigger=1
    )


def exact_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    within_watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Keep the first-arriving document per distinct ``text_col`` content.

    ``within_watermark=(ts_col, delay)`` switches to
    ``dropDuplicatesWithinWatermark`` for bounded state on unbounded
    streams; the default keeps exact forever-state (correct whenever the
    distinct-hash count fits the state store, i.e. most corpus builds).
    """
    hashed = docs.withColumn("_text_md5", F.md5(F.col(text_col)))
    if within_watermark is not None:
        ts_col, delay = within_watermark
        return hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["_text_md5"]
        )
    return hashed.dropDuplicates(["_text_md5"])
