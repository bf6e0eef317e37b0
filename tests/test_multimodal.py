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


class TestRealDecoders:
    def test_netpbm_roundtrip_and_wav_roundtrip(self):
        import numpy as np

        from go_vectorsearch_spark.operators.multimodal import (
            decode_audio_wav,
            decode_image_netpbm,
            encode_pgm,
            encode_ppm,
            encode_wav,
        )

        rng = np.random.default_rng(5)
        gray = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
        assert (decode_image_netpbm(encode_pgm(gray)) == gray).all()
        rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
        assert (decode_image_netpbm(encode_ppm(rgb)) == rgb).all()
        # header comments per spec
        with_comment = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
        assert decode_image_netpbm(with_comment).shape == (2, 3)

        sr, n = 16000, 480
        samples = (np.sin(np.arange(n) / 10.0) * 20000).astype(np.int16)
        got_sr, got = decode_audio_wav(encode_wav(sr, samples))
        assert got_sr == sr and (got == samples).all()

    def test_decode_real_features_end_to_end(self, spark):
        import numpy as np

        from go_vectorsearch_spark.operators.multimodal import (
            decode_real_features,
            encode_pgm,
            encode_wav,
        )

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(8, 12), dtype=np.uint8)
        wav_samples = (np.sin(np.arange(320) / 5.0) * 1000).astype(np.int16)
        rows = [
            (1, 1, "image", bytearray(encode_pgm(img)), None),
            (2, 2, "audio", bytearray(encode_wav(8000, wav_samples)), None),
            (3, 3, "video", bytearray(b"\x00\x01\x02\x03"), None),  # opaque
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )
        got = {r["media_id"]: r for r in decode_real_features(media).collect()}

        assert got[1]["fmt"] == "pgm"
        assert (got[1]["width"], got[1]["height"]) == (12, 8)
        assert got[1]["px_mean"] == pytest.approx(float(img.mean()))
        assert got[1]["px_std"] == pytest.approx(float(img.std()))

        assert got[2]["fmt"] == "wav"
        assert got[2]["sample_rate"] == 8000
        assert got[2]["n_samples"] == 320
        assert got[2]["rms"] == pytest.approx(
            float(np.sqrt(np.mean(wav_samples.astype(np.float64) ** 2)))
        )

        assert got[3]["fmt"] == "opaque" and got[3]["n_samples"] == 4

        # strict mode raises ONLY at the genuinely-external seam
        import pytest as _pytest

        real_only = media.filter("media_id < 3")
        assert decode_real_features(real_only, strict=True).count() == 2
        with _pytest.raises(Exception, match="NotImplementedError|external codec"):
            decode_real_features(media, strict=True).collect()
