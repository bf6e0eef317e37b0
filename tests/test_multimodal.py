"""Multimodal plumbing tests: schema, Arrow batch shape, stub boundary,
and determinism of the fake decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators import multimodal as MM
from go_vectorsearch_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    return MM.synth_media(load_table(spark, sf_smoke, "documents"))


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.schema["meta"].dataType
    assert {f.name for f in meta.fields} == {
        "width", "height", "sample_rate", "duration_ms", "fmt",
    }
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == set(MM.MEDIA_KINDS)


def test_decode_features_fake_path(media):
    feats = MM.decode_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(r["n_bytes"] == MM._PAYLOAD_BLOCKS * 16 for r in rows)
    assert all(0 <= r["first_byte"] <= 255 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["byte_sum"] for r in MM.decode_features(media).collect()}
    assert all(again[r["media_id"]] == r["byte_sum"] for r in rows)


def test_decode_strict_raises(media):
    import py4j

    with pytest.raises((py4j.protocol.Py4JJavaError, Exception)) as exc:
        MM.decode_features(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "media decode" in str(exc.value)


def test_frame_sample_counts(media):
    frames = MM.frame_sample(media, fps=2.0)
    per = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    durs = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert {r["media_id"] for r in per} == set(durs)
    for r in per:
        assert r["n"] == durs[r["media_id"]] // 500 + 1  # inclusive endpoints


def test_audio_chunks_cover_duration(media):
    chunks = MM.audio_chunks(media, chunk_ms=250)
    agg = chunks.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("start_sample").alias("last_start")
    )
    durs = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "audio").collect()
    }
    for r in agg.collect():
        n_expected = -(-durs[r["media_id"]] // 250)  # ceil
        assert r["n"] == n_expected
        assert r["last_start"] == (n_expected - 1) * 4000
    # chunk sample counts tile the audio exactly: sum == total samples,
    # only the final chunk may be short, never overrunning the duration
    per_chunk = chunks.collect()
    by_media = {}
    for r in per_chunk:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        total = durs[mid] * 16  # 16000 Hz -> 16 samples per ms
        assert sum(r["n_samples"] for r in rows) == total
        rows.sort(key=lambda r: r["chunk_idx"])
        assert all(r["n_samples"] == 4000 for r in rows[:-1])
        assert 0 < rows[-1]["n_samples"] <= 4000
