"""Streaming near-dup filter with band-store memory
(streaming/dedup.neardup_filter_stream — the streaming twin of
Engine.upload(neardup='skip')).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.streaming.dedup import neardup_filter_stream

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm window sill and the birds sing in the garden "
    "meanwhile the river runs past the old stone bridge under grey skies"
)
NEAR = "intro " + BASE  # jaccard ~0.97, verified to band-collide with BASE
OTHER = (
    "completely different content about spark shuffle partitions and "
    "joins across executor boundaries with adaptive query execution"
)
THIRD = (
    "a third unrelated passage describing parquet row groups column "
    "chunks page headers and dictionary encoded binary statistics"
)
UNIQUE = (
    "nothing in this sentence resembles any stored document because "
    "every shingle here is novel vocabulary entirely absent elsewhere"
)


def _write_batches(spark, src):
    """Three source files = three micro-batches (maxFilesPerTrigger=1)."""
    batches = [
        [(1, BASE), (2, OTHER)],
        # 3 near-dups batch-1's BASE (cross-batch, via the band store);
        # 4 is fresh
        [(3, NEAR), (4, THIRD)],
        # 5 exactly duplicates admitted THIRD (cross-batch); 6 is fresh;
        # 7 exactly duplicates 6 WITHIN the batch
        [(5, THIRD), (6, UNIQUE), (7, UNIQUE)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/b{i}.parquet")


def _stream(spark, src):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*.parquet")
    )


@pytest.fixture(scope="module")
def filtered(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("nd_stream")
    src, out, bands, ckpt = (
        str(root / "src"), str(root / "out"),
        str(root / "bands"), str(root / "ckpt"),
    )
    _write_batches(spark, src)
    q = neardup_filter_stream(
        _stream(spark, src), bands, out, ckpt, threshold=0.5
    )
    q.awaitTermination(120)
    return spark, src, out, bands, root


def test_stream_admits_only_novel_docs(filtered):
    spark, _src, out, _bands, _root = filtered
    got = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    # 3 (cross-batch near-dup), 5 (cross-batch exact dup) and 7
    # (in-batch exact dup) are dropped; first copies survive
    assert set(got) == {1, 2, 4, 6}
    assert got[1] == BASE and got[4] == THIRD and got[6] == UNIQUE


def test_band_store_holds_admitted_only(filtered):
    spark, _src, _out, bands, _root = filtered
    from go_vectorsearch_spark.api import _VersionedTable
    import os

    parent, name = os.path.split(os.path.abspath(bands))
    t = _VersionedTable(spark, parent, name, "doc_id long, band int, key string")
    ids = {r["doc_id"] for r in t.read().select("doc_id").distinct().collect()}
    assert ids == {1, 2, 4, 6}


def test_second_stream_over_same_source_admits_nothing(filtered):
    """The memory is the band store, not the checkpoint: a brand-new
    stream (fresh checkpoint) over the same source finds every document
    already admitted and adds nothing — the replay-idempotence property
    stated in the docstring, in its strongest form."""
    spark, src, out, bands, root = filtered
    before = spark.read.parquet(out).count()
    q = neardup_filter_stream(
        _stream(spark, src), bands, out, str(root / "ckpt2"), threshold=0.5
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == before


def test_shingleless_doc_is_admitted(spark, tmp_path):
    """A document too short to shingle (< 3 tokens) produces no band
    rows but is always novel — it must be emitted, not dropped by an
    empty-band early return (regression: the epoch would commit and
    lose it forever)."""
    src, out, bands, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"),
        str(tmp_path / "bands"), str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        [(1, BASE), (2, "hi")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/b0.parquet")
    q = neardup_filter_stream(_stream(spark, src), bands, out, ckpt)
    q.awaitTermination(120)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {1: BASE, 2: "hi"}


def test_remote_uris_are_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="band_store_dir"):
        neardup_filter_stream(
            _stream(spark, str(tmp_path)), "s3://b/bands",
            str(tmp_path / "o"), str(tmp_path / "c"),
        )
    with pytest.raises(ValueError, match="out_dir"):
        neardup_filter_stream(
            _stream(spark, str(tmp_path)), str(tmp_path / "b"),
            "hdfs://nn/out", str(tmp_path / "c"),
        )
