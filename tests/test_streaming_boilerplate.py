"""Streaming boilerplate-line strip
(streaming/boilerplate.strip_boilerplate_stream — the streaming twin of
operators/curation.strip_boilerplate_lines): the hot-line set is fit
OFFLINE on a corpus snapshot and applied per micro-batch as a static
frame join; stateless across batches by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.curation import (
    boilerplate_lines,
    strip_boilerplate_lines,
)
from go_vectorsearch_spark.streaming.boilerplate import (
    strip_boilerplate_stream,
)

FOOTER = "subscribe to our newsletter"
BATCHES = [
    [
        (1, f"real article one\n{FOOTER}\nmore body text"),
        (2, "untouched document\nwith two lines"),
    ],
    [
        (3, f"{FOOTER}\n  Subscribe To Our Newsletter  "),  # all-hot doc
        (4, f"second batch body\n{FOOTER}"),
    ],
]


def _snapshot(spark):
    """The offline corpus snapshot the hot set is fit on: the footer in
    enough distinct docs to cross min_df, everything else unique."""
    rows = [(100 + i, f"unique snapshot line {i}\n{FOOTER}") for i in range(12)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_stream(spark, tmp):
    src, out, ckpt = str(tmp / "src"), str(tmp / "out"), str(tmp / "ckpt")
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/b{i}.parquet")
    hot = boilerplate_lines(_snapshot(spark), min_df=10)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*.parquet")
    )
    q = strip_boilerplate_stream(stream, hot, out, ckpt)
    q.awaitTermination(120)
    return {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}


def test_stream_equals_batch_operator(spark, tmp_path):
    got = _run_stream(spark, tmp_path)
    all_rows = [r for b in BATCHES for r in b]
    batch_df = spark.createDataFrame(all_rows, "doc_id long, text string")
    hot = boilerplate_lines(_snapshot(spark), min_df=10)
    want = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(batch_df, hot=hot).collect()
    }
    assert got == want
    # semantics pinned directly, not just via the twin:
    assert got[1] == "real article one\nmore body text"  # footer cut
    assert got[2] == "untouched document\nwith two lines"  # byte-exact
    assert got[3] == ""  # every line hot (normalization case-folds)
    assert got[4] == "second batch body"


@pytest.mark.slow
def test_stream_is_stateless_across_batches(spark, tmp_path):
    """Doc 4's strip result must not depend on batch 1 having been seen
    (no cross-batch DF accumulation): a one-batch stream over batch 2
    alone emits identical rows for ids 3 and 4."""
    src, out, ckpt = (
        str(tmp_path / "s2"), str(tmp_path / "o2"), str(tmp_path / "c2"),
    )
    spark.createDataFrame(
        BATCHES[1], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/b0.parquet")
    hot = boilerplate_lines(_snapshot(spark), min_df=10)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(f"{src}/b*.parquet")
    )
    q = strip_boilerplate_stream(stream, hot, out, ckpt)
    q.awaitTermination(120)
    solo = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    both = _run_stream(spark, tmp_path)
    assert solo == {k: v for k, v in both.items() if k in (3, 4)}


def test_stream_rejects_remote_paths(spark, tmp_path):
    import pytest

    hot = boilerplate_lines(_snapshot(spark), min_df=10)
    src = tmp_path / "none"
    src.mkdir()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
    )
    with pytest.raises(ValueError, match="local"):
        strip_boilerplate_stream(
            stream, hot, "s3://bucket/out", str(tmp_path / "c3")
        )
