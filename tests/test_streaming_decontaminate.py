"""Streaming benchmark decontamination
(streaming/decontaminate.decontaminate_filter_stream — the streaming
twin of Engine.decontaminate_cut): per-micro-batch window-hash match
against a persisted static benchmark frame; cut keeps the document
minus the quoted passage, drop rejects it whole. Stateless across
batches by construction (the benchmark is the only memory)."""

from __future__ import annotations

import pytest

from go_vectorsearch_spark.streaming.decontaminate import (
    decontaminate_filter_stream,
)

QUOTE = "alpha beta gamma delta epsilon zeta eta theta"
CLEAN1 = "entirely original prose about spark shuffle partitions and joins"
CLEAN2 = "another clean passage describing parquet row groups and pages"
L = 4


def _write_batches(spark, src):
    batches = [
        [(1, f"{QUOTE} tail words here"), (2, CLEAN1)],
        [(3, f"lead in {QUOTE}"), (4, CLEAN2)],
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


def _bench(spark):
    return spark.createDataFrame([(100, QUOTE)], "doc_id long, text string")


def _run(spark, tmp, mode):
    src, out, ckpt = str(tmp / "src"), str(tmp / "out"), str(tmp / "ckpt")
    _write_batches(spark, src)
    q = decontaminate_filter_stream(
        _stream(spark, src), _bench(spark), out, ckpt, L=L, mode=mode
    )
    q.awaitTermination(120)
    return {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}


@pytest.mark.slow
def test_cut_mode_trims_quotes_keeps_documents(spark, tmp_path, monkeypatch):
    # spy isEmpty: the sink must execute the cut plan ONCE per
    # micro-batch — an isEmpty() pre-check on the cut output would run
    # it a second time (isEmpty evaluates the plan to first row, the
    # append then recomputes it). Only the batch_df guard may remain:
    # at most one isEmpty call per micro-batch.
    from pyspark.sql import DataFrame

    calls = []
    orig = DataFrame.isEmpty

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(DataFrame, "isEmpty", spy)
    got = _run(spark, tmp_path, "cut")
    # 2 micro-batches (maxFilesPerTrigger=1 over 2 files)
    assert len(calls) <= 2, f"{len(calls)} isEmpty calls for 2 batches"
    # every input document is emitted; the quoted passage is gone from
    # the contaminated ones, clean ones round-trip verbatim
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == CLEAN1 and got[4] == CLEAN2
    assert got[1] == "tail words here"
    assert got[3] == "lead in"
    for d in (1, 3):
        assert "alpha" not in got[d] and "theta" not in got[d]


def test_drop_mode_rejects_contaminated_documents(spark, tmp_path):
    got = _run(spark, tmp_path, "drop")
    assert set(got) == {2, 4}
    assert got[2] == CLEAN1 and got[4] == CLEAN2


def test_mode_and_path_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown mode"):
        decontaminate_filter_stream(
            _stream(spark, str(tmp_path / "s")), _bench(spark),
            str(tmp_path / "o"), str(tmp_path / "c"), mode="flag",
        )
    with pytest.raises(ValueError, match="local filesystem"):
        decontaminate_filter_stream(
            _stream(spark, str(tmp_path / "s")), _bench(spark),
            "s3://bucket/out", str(tmp_path / "c"),
        )


def test_cut_mode_matches_batch_operator(spark, tmp_path):
    """The streamed result equals decontaminate_cut run over the union
    of all micro-batches — streaming adds ingestion, not semantics."""
    from go_vectorsearch_spark.operators.substr import decontaminate_cut

    got = _run(spark, tmp_path, "cut")
    all_rows = [
        (1, f"{QUOTE} tail words here"), (2, CLEAN1),
        (3, f"lead in {QUOTE}"), (4, CLEAN2),
    ]
    batch = {
        r["doc_id"]: r["text"]
        for r in decontaminate_cut(
            spark.createDataFrame(all_rows, "doc_id long, text string"),
            _bench(spark),
            L=L,
        ).collect()
    }
    assert got == batch
