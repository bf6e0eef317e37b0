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

    def test_bmp_roundtrip_and_variants(self):
        import numpy as np
        import pytest as _pytest

        from go_vectorsearch_spark.operators.multimodal import (
            decode_image_bmp,
            encode_bmp,
        )

        rng = np.random.default_rng(11)
        # widths 7 and 4: one needing row padding (21 bytes -> pad 3),
        # one naturally aligned — both must round-trip exactly
        for h, w in ((5, 7), (3, 4)):
            rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_bmp(rgb)
            assert payload[:2] == b"BM"
            assert (decode_image_bmp(payload) == rgb).all()
        # top-down variant (negative height) decodes to the same image
        rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
        import struct

        p = bytearray(encode_bmp(rgb[::-1]))  # encoder stores bottom-up
        struct.pack_into("<i", p, 22, -4)     # flip to top-down
        assert (decode_image_bmp(bytes(p)) == rgb[::-1][::-1]).all()
        # exotic variants raise (the adapter seam's territory; 8-bit
        # palette decodes real as of r11 — see test_bmp_palette_decode)
        with _pytest.raises(ValueError, match="24-bit"):
            q = bytearray(encode_bmp(rgb))
            struct.pack_into("<H", q, 28, 16)  # claim 16-bit bitfields
            decode_image_bmp(bytes(q))
        with _pytest.raises(ValueError, match="not a BMP"):
            decode_image_bmp(b"BMshort")

    def test_bmp_palette_decode(self):
        """8-bit palettized BMP (r11): index raster (4-byte-aligned
        rows, bottom-up) gathers through the BGR0 color table. Crafted
        spec-side, independent of encode_bmp."""
        import struct

        import numpy as np
        import pytest as _pytest

        pal = np.array(
            [[10, 20, 30], [200, 100, 0], [0, 0, 255], [77, 88, 99]],
            dtype=np.uint8,
        )
        idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)  # 3x2
        h, w = idx.shape
        stride = w + ((-w) % 4)
        raster = b"".join(
            idx[r].tobytes() + b"\x00" * (stride - w)
            for r in range(h - 1, -1, -1)  # bottom-up storage
        )
        table = b"".join(
            bytes([b, g, rr, 0]) for rr, g, b in pal.tolist()
        )
        data_off = 14 + 40 + len(table)
        header = (
            b"BM" + struct.pack("<IHHI", data_off + len(raster), 0, 0, data_off)
            + struct.pack("<Iii", 40, w, h)
            + struct.pack("<HHI", 1, 8, 0)
            + struct.pack("<IiiII", len(raster), 0, 0, len(pal), 0)
        )
        payload = header + table + raster
        from go_vectorsearch_spark.operators.multimodal import (
            decode_image_bmp,
        )

        got = decode_image_bmp(payload)
        assert got.shape == (2, 3, 3)
        assert (got == pal[idx]).all()
        # out-of-range index against a short color table raises
        short = bytearray(payload)
        struct.pack_into("<I", short, 46, 2)  # claim 2 colors, idx max 3
        with _pytest.raises(ValueError, match="color-table range"):
            decode_image_bmp(bytes(short))

    def test_png_roundtrip_and_filters(self):
        import struct
        import zlib

        import numpy as np
        import pytest as _pytest

        from go_vectorsearch_spark.operators.multimodal import (
            _PNG_MAGIC,
            decode_image_png,
            encode_png,
        )

        rng = np.random.default_rng(17)
        for shape in ((6, 9), (5, 7, 3), (4, 3, 4)):  # gray / RGB / RGBA
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            assert (decode_image_png(encode_png(img)) == img).all()

        # filters 1-4: craft the filtered stream with an INDEPENDENT
        # test-side filter implementation (spec direction: encoder
        # subtracts the predictor), decode must invert it exactly
        def crafted(img, filters):
            h, w, ch = img.shape
            stride = w * ch
            flat = img.reshape(h, stride).astype(np.int32)
            raw = b""
            for r, f in enumerate(filters):
                cur = flat[r]
                prev = flat[r - 1] if r else np.zeros(stride, np.int32)
                row = np.zeros(stride, np.int32)
                for x in range(stride):
                    a = int(cur[x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    c = int(prev[x - ch]) if (r and x >= ch) else 0
                    if f == 0:
                        pred = 0
                    elif f == 1:
                        pred = a
                    elif f == 2:
                        pred = b
                    elif f == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[x] = (cur[x] - pred) & 0xFF
                raw += bytes([f]) + row.astype(np.uint8).tobytes()

            def chunk(tag, body):
                return (
                    struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                _PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
            )

        img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
        for filters in ([1, 2, 3, 4, 0], [4, 4, 4, 4, 4], [3, 1, 4, 2, 3]):
            assert (decode_image_png(crafted(img, filters)) == img).all(), filters

        # unsupported variants raise (strict seam's territory)
        bad = bytearray(encode_png(img))
        # IHDR bit-depth byte: 8 magic + 4 len + 4 tag + 8 (w, h)
        bad[24] = 0x04  # claim 4-bit depth (sub-byte stays unsupported;
        #                 16-bit decodes real as of r11 — see
        #                 test_png_16bit_decode)
        with _pytest.raises(ValueError, match="8/16-bit"):
            decode_image_png(bytes(bad))
        with _pytest.raises(ValueError, match="not a PNG"):
            decode_image_png(b"\x89PNGnope")

    def test_wav_mulaw_and_float_roundtrip(self):
        import numpy as np

        from go_vectorsearch_spark.operators.multimodal import (
            _MULAW_TABLE,
            decode_audio_wav,
            encode_wav_float,
            encode_wav_mulaw,
            mulaw_decode,
            mulaw_encode,
        )

        # published G.711 table endpoints (Sun g711.c ulaw2linear)
        assert mulaw_decode(np.array([0xFF], np.uint8))[0] == 0
        assert mulaw_decode(np.array([0x80], np.uint8))[0] == 32124
        assert mulaw_decode(np.array([0x00], np.uint8))[0] == -32124
        # encode exactly inverts decode on the table's own values
        all_bytes = np.arange(256, dtype=np.uint8)
        assert (mulaw_decode(mulaw_encode(_MULAW_TABLE)) == _MULAW_TABLE).all()
        # nearest-entry property on arbitrary linear input: the decoded
        # error is bounded by the local quantization step
        rng = np.random.default_rng(3)
        lin = rng.integers(-30000, 30000, size=512).astype(np.int16)
        dec = mulaw_decode(mulaw_encode(lin))
        err = np.abs(dec.astype(np.int64) - lin.astype(np.int64))
        steps = np.abs(np.diff(np.sort(_MULAW_TABLE.astype(np.int64)))).max()
        assert err.max() <= steps  # max µ-law segment step
        del all_bytes

        # µ-law WAV round-trip: decode(encode) == table-quantized linear
        sr = 8000
        got_sr, got = decode_audio_wav(encode_wav_mulaw(sr, lin))
        assert got_sr == sr and (got == dec).all()

        # IEEE-float WAV round-trip, exact in float32
        f = (rng.standard_normal(256) * 0.4).astype(np.float32)
        got_sr, gotf = decode_audio_wav(encode_wav_float(44100, f))
        assert got_sr == 44100 and gotf.dtype == np.float32 and (gotf == f).all()

    def test_sniff_media_meta_headers_only(self, spark):
        """Header-level sniffing yields true dims / sample rates for
        EVERY format — including the codec-bound ones (JPEG via the SOF
        segment walk, MP3 via the frame header) — without any pixel or
        sample decode. Crafted headers are hand-built from the specs,
        so the parser is pinned against an independent byte layout."""
        import numpy as np

        from go_vectorsearch_spark.operators.multimodal import (
            encode_bmp,
            encode_pgm,
            encode_png,
            encode_wav,
            sniff_media_meta,
        )

        # minimal JPEG: SOI + APP0 + SOF0(h=480, w=640, 3 comps) + EOI
        sof = (
            b"\xff\xc0" + (17).to_bytes(2, "big")
            + b"\x08" + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
            + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        jpeg = (
            b"\xff\xd8"
            + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
            + sof + b"\xff\xd9"
        )
        # MP3: MPEG1 Layer III, 128 kbps, 44100 Hz, stereo; 404 bytes
        mp3 = b"\xff\xfb\x90\x00" + b"\x00" * 400
        rng = np.random.default_rng(23)
        png = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
        bmp = rng.integers(0, 256, size=(7, 3, 3), dtype=np.uint8)
        pgm = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
        wav = (np.sin(np.arange(8000) / 9.0) * 9000).astype(np.int16)  # 1 s
        rows = [
            (1, "image", bytearray(jpeg)),
            (2, "audio", bytearray(mp3)),
            (3, "image", bytearray(encode_png(png))),
            (4, "image", bytearray(encode_bmp(bmp))),
            (5, "image", bytearray(encode_pgm(pgm))),
            (6, "audio", bytearray(encode_wav(8000, wav))),
            (7, "video", bytearray(b"\x00\x01\x02")),
        ]
        media = spark.createDataFrame(
            [(i, i, k, p, None) for i, k, p in rows],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )
        got = {r["media_id"]: r for r in sniff_media_meta(media).collect()}

        assert got[1]["fmt"] == "jpeg"
        assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (640, 480, 3)
        assert got[2]["fmt"] == "mp3"
        assert (got[2]["sample_rate"], got[2]["n_channels"]) == (44100, 2)
        assert got[2]["est_duration_ms"] == int(404 * 8 / 128)  # size/bitrate
        assert (got[3]["fmt"], got[3]["width"], got[3]["height"], got[3]["n_channels"]) == ("png", 9, 5, 3)
        assert (got[4]["fmt"], got[4]["width"], got[4]["height"], got[4]["n_channels"]) == ("bmp", 3, 7, 3)
        assert (got[5]["fmt"], got[5]["width"], got[5]["height"], got[5]["n_channels"]) == ("pgm", 6, 4, 1)
        assert got[6]["fmt"] == "wav" and got[6]["sample_rate"] == 8000
        assert got[6]["n_channels"] == 1 and got[6]["est_duration_ms"] == 1000
        assert got[7]["fmt"] == "opaque" and got[7]["n_bytes"] == 3
        assert all(got[i]["n_bytes"] == len(rows[i - 1][2]) for i in got)

    def test_malformed_magics_never_crash_default_mode(self, spark):
        """The r10 review's bug class: a payload CLAIMING a decodable
        magic but carrying a corrupt/exotic body must fall to the
        opaque stub in default mode (never abort the job — zlib.error /
        struct.error escaped the old per-branch ValueError catches) and
        to NotImplementedError in strict mode."""
        import numpy as np
        import pytest as _pytest

        from go_vectorsearch_spark.operators.multimodal import (
            _PNG_MAGIC,
            decode_real_features,
            encode_wav,
        )
        import struct as _struct

        adpcm = (
            b"RIFF" + _struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + _struct.pack("<I", 16)
            + _struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)  # code 2 = ADPCM
            + b"data" + _struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        )
        zero_bmp = bytearray(
            b"BM" + b"\x00" * 52
        )
        _struct.pack_into("<I", zero_bmp, 14, 40)   # dib size
        _struct.pack_into("<i", zero_bmp, 18, 0)    # width 0
        _struct.pack_into("<HHI", zero_bmp, 26, 1, 24, 0)
        rows = [
            # PNG magic + truncated IHDR -> struct.error inside decode
            (1, "image", bytearray(_PNG_MAGIC + b"\x00\x00\x00\x0dIHDR\x01\x02")),
            # PNG header + corrupt deflate stream -> zlib.error
            (2, "image", bytearray(
                _PNG_MAGIC
                + _struct.pack(">I", 13) + b"IHDR"
                + _struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0) + b"\x00" * 4
                + _struct.pack(">I", 5) + b"IDAT" + b"junk!" + b"\x00" * 4
                + _struct.pack(">I", 0) + b"IEND" + b"\x00" * 4
            )),
            # WAV with an unsupported ADPCM format code -> ValueError
            (3, "audio", bytearray(adpcm)),
            # BMP claiming width 0 -> degenerate-dimension ValueError
            (4, "image", bytearray(bytes(zero_bmp))),
            # netpbm magic, garbage header -> int() ValueError
            (5, "image", bytearray(b"P5 x y\n")),
            # a healthy control row: the batch must still decode it
            (6, "audio", bytearray(encode_wav(8000, np.arange(16, dtype=np.int16)))),
        ]
        media = spark.createDataFrame(
            [(i, i, k, p, None) for i, k, p in rows],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )
        got = {r["media_id"]: r for r in decode_real_features(media).collect()}
        for mid in (1, 2, 3, 4, 5):
            assert got[mid]["fmt"] == "opaque", (mid, got[mid])
            assert got[mid]["n_samples"] == len(rows[mid - 1][2])
        assert got[6]["fmt"] == "wav" and got[6]["n_samples"] == 16
        with _pytest.raises(Exception, match="NotImplementedError|external codec"):
            decode_real_features(media, strict=True).collect()

    def test_sniff_mp3_rejects_lone_false_syncs(self):
        """A single frame-header bit pattern inside arbitrary binary is
        NOT an MP3: the sniffer requires the computed frame length to
        land on a second consistent header (or the payload to end before
        one could exist). Pinned with a payload carrying a valid-looking
        header whose next-frame position holds garbage."""
        import numpy as np

        from go_vectorsearch_spark.operators.multimodal import _sniff_mp3

        # valid MPEG1 L3 128kbps header at offset 0, frame length 417 —
        # but bytes continue past 421 with zeros (no second sync)
        fake = b"\xff\xfb\x90\x00" + b"\x00" * 2000
        assert _sniff_mp3(fake) is None
        # truncated tail: payload ends before a second header could
        # exist -> accepted on the first (the CBR-file head case)
        head = b"\xff\xfb\x90\x00" + b"\x00" * 300
        assert _sniff_mp3(head) == (44100, 2, int(304 * 8 / 128))
        # two consecutive consistent frames -> accepted
        frame = b"\xff\xfb\x90\x00" + b"\x00" * 413  # 417 bytes total
        two = frame + frame
        sr, ch, dur = _sniff_mp3(two)
        assert (sr, ch) == (44100, 2)
        # random bytes (seeded): no classification
        rng = np.random.default_rng(29)
        blob = rng.integers(0, 256, size=120_000, dtype=np.uint8).tobytes()
        assert _sniff_mp3(blob) is None
        # a real pair of frames after a junk prefix must still be found
        # (the vectorized candidate scan walks every sync offset in
        # order, exactly like the old per-byte loop)
        junk = bytes([0x7F, 0x00, 0x42] * 33)
        assert _sniff_mp3(junk + two)[:2] == (44100, 2)

    def test_sniff_validates_header_values(self, spark):
        """r10-advice hardening: sniffed metadata downstream filters act
        on must never carry nonsense — a BMP with a negative/zero width
        reports NULL dims (not a negative number), a palettized (<8-bit)
        BMP reports NULL n_channels (not 0), and a bare SOI with no SOF
        segment is 'opaque', so fmt='jpeg' guarantees parsed dims."""
        import struct as _struct

        from go_vectorsearch_spark.operators.multimodal import (
            sniff_media_meta,
        )

        neg_bmp = bytearray(b"BM" + b"\x00" * 52)
        _struct.pack_into("<I", neg_bmp, 14, 40)        # dib size
        _struct.pack_into("<ii", neg_bmp, 18, -5, 7)    # width -5
        _struct.pack_into("<HHI", neg_bmp, 26, 1, 24, 0)
        pal_bmp = bytearray(b"BM" + b"\x00" * 52)
        _struct.pack_into("<I", pal_bmp, 14, 40)
        _struct.pack_into("<ii", pal_bmp, 18, 6, 4)
        _struct.pack_into("<HHI", pal_bmp, 26, 1, 4, 0)  # 4-bit palette
        bare_soi = b"\xff\xd8" + b"\xff\xd9"             # SOI + EOI, no SOF
        rows = [
            (1, "image", bytearray(bytes(neg_bmp))),
            (2, "image", bytearray(bytes(pal_bmp))),
            (3, "image", bytearray(bare_soi)),
        ]
        media = spark.createDataFrame(
            [(i, i, k, p, None) for i, k, p in rows],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )
        got = {r["media_id"]: r for r in sniff_media_meta(media).collect()}
        assert got[1]["fmt"] == "bmp"
        assert got[1]["width"] is None and got[1]["height"] is None
        assert got[2]["fmt"] == "bmp"
        assert (got[2]["width"], got[2]["height"]) == (6, 4)
        assert got[2]["n_channels"] is None
        assert got[3]["fmt"] == "opaque"
        assert got[3]["width"] is None

    def test_sniff_gif_header(self, spark):
        """GIF87a/89a logical-screen dims (r11): header-only, LZW pixel
        decode stays at the adapter seam; zero-dim headers report NULL."""
        import struct as _struct

        from go_vectorsearch_spark.operators.multimodal import (
            sniff_media_meta,
        )

        gif = b"GIF89a" + _struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
        zero = b"GIF87a" + _struct.pack("<HH", 0, 200) + b"\x00\x00\x00"
        media = spark.createDataFrame(
            [(1, 1, "image", bytearray(gif), None),
             (2, 2, "image", bytearray(zero), None)],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )
        got = {r["media_id"]: r for r in sniff_media_meta(media).collect()}
        assert (got[1]["fmt"], got[1]["width"], got[1]["height"],
                got[1]["n_channels"]) == ("gif", 320, 200, 3)
        assert got[2]["fmt"] == "gif" and got[2]["width"] is None

    def test_sniff_container_formats(self, spark):
        """MP4/ISO-BMFF, Ogg (Vorbis + Opus) and FLAC header sniffs
        (r12): duration/dims/rate from pure header walks — the
        filter-before-decode story extended to the remaining
        real-corpus container magics; sample decode for all three
        stays at the adapter seam. Corruption-controlled: a box whose
        size overruns its scope stops the walk with NULLs, a FLAC
        STREAMINFO with the invalid sample-rate 0 reports opaque, an
        Ogg page carrying an unknown codec id reports opaque."""
        import struct as _struct

        from go_vectorsearch_spark.operators.multimodal import (
            sniff_media_meta,
        )

        def box(tag, body):
            return _struct.pack(">I", len(body) + 8) + tag + body

        ftyp = box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"iso2mp41")
        mvhd = box(
            b"mvhd",
            bytes(4)  # version 0 + flags
            + _struct.pack(">IIII", 0, 0, 1000, 5500)  # timescale, duration
            + bytes(80),
        )
        tkhd = box(
            b"tkhd",
            bytes(4)
            + _struct.pack(">IIIII", 0, 0, 1, 0, 5500)
            + bytes(8)  # reserved
            + bytes(8)  # layer/group/volume/reserved
            + bytes(36)  # matrix
            + _struct.pack(">II", 640 << 16, 360 << 16),
        )
        # an audio trak first (0x0 dims) — the sniff must skip to the
        # video trak
        atkhd = box(
            b"tkhd",
            bytes(4) + _struct.pack(">IIIII", 0, 0, 2, 0, 5500)
            + bytes(8) + bytes(8) + bytes(36) + _struct.pack(">II", 0, 0),
        )
        mp4 = ftyp + box(
            b"moov", mvhd + box(b"trak", atkhd) + box(b"trak", tkhd)
        )
        # corrupt: moov's inner box claims a size past its scope
        bad_mp4 = ftyp + box(b"moov", _struct.pack(">I", 1 << 30) + b"mvhd")

        def ogg_page(payload, granule=0, htype=2):
            seg = bytes([len(payload)])
            return (
                b"OggS\x00" + bytes([htype])
                + _struct.pack("<q", granule)
                + _struct.pack("<III", 1, 0, 0)
                + bytes([1]) + seg + payload
            )

        vorbis_id = (
            b"\x01vorbis" + _struct.pack("<I", 0) + bytes([2])
            + _struct.pack("<I", 44100) + bytes(13)
        )
        ogg_v = ogg_page(vorbis_id) + ogg_page(b"\x05vorbis", granule=441000, htype=4)
        opus_id = (
            b"OpusHead" + bytes([1, 1]) + _struct.pack("<H", 312)
            + _struct.pack("<I", 16000) + bytes(3)
        )
        ogg_o = ogg_page(opus_id) + ogg_page(b"x", granule=96000, htype=4)
        ogg_bad = ogg_page(b"\x01notacodec" + bytes(20))

        def flac_si(sr, ch, bps, total):
            b = bytearray(8)
            b[0] = (sr >> 12) & 0xFF
            b[1] = (sr >> 4) & 0xFF
            b[2] = ((sr & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)
            b[3] = (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
            b[4:8] = _struct.pack(">I", total & 0xFFFFFFFF)
            body = _struct.pack(">HH", 1024, 1024) + bytes(6) + bytes(b) + bytes(16)
            return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body

        flac = flac_si(22050, 2, 16, 66150)
        flac_bad = flac_si(0, 1, 16, 100)

        media = spark.createDataFrame(
            [
                (1, 1, "video", bytearray(mp4), None),
                (2, 2, "video", bytearray(bad_mp4), None),
                (3, 3, "audio", bytearray(ogg_v), None),
                (4, 4, "audio", bytearray(ogg_o), None),
                (5, 5, "audio", bytearray(ogg_bad), None),
                (6, 6, "audio", bytearray(flac), None),
                (7, 7, "audio", bytearray(flac_bad), None),
            ],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )
        got = {r["media_id"]: r for r in sniff_media_meta(media).collect()}
        assert (
            got[1]["fmt"], got[1]["width"], got[1]["height"],
            got[1]["est_duration_ms"],
        ) == ("mp4", 640, 360, 5500)
        assert got[2]["fmt"] == "mp4" and got[2]["width"] is None
        assert (
            got[3]["fmt"], got[3]["sample_rate"], got[3]["n_channels"],
            got[3]["est_duration_ms"],
        ) == ("ogg", 44100, 2, 10000)
        # Opus granules count at 48 kHz regardless of the input rate
        assert (
            got[4]["fmt"], got[4]["sample_rate"], got[4]["est_duration_ms"]
        ) == ("ogg", 16000, 2000)
        assert got[5]["fmt"] == "opaque"
        assert (
            got[6]["fmt"], got[6]["sample_rate"], got[6]["n_channels"],
            got[6]["est_duration_ms"],
        ) == ("flac", 22050, 2, 3000)
        assert got[7]["fmt"] == "opaque"

    def test_decode_real_features_new_formats(self, spark):
        import numpy as np

        from go_vectorsearch_spark.operators.multimodal import (
            decode_real_features,
            encode_bmp,
            encode_png,
            encode_wav_float,
            encode_wav_mulaw,
            mulaw_decode,
            mulaw_encode,
        )

        rng = np.random.default_rng(13)
        bmp = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        png = rng.integers(0, 256, size=(7, 4, 3), dtype=np.uint8)
        lin = (np.sin(np.arange(200) / 3.0) * 15000).astype(np.int16)
        f32 = (np.cos(np.arange(128) / 7.0) * 0.5).astype(np.float32)
        rows = [
            (1, 1, "image", bytearray(encode_bmp(bmp)), None),
            (2, 2, "audio", bytearray(encode_wav_mulaw(8000, lin)), None),
            (3, 3, "audio", bytearray(encode_wav_float(22050, f32)), None),
            (4, 4, "image", bytearray(encode_png(png)), None),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )
        # strict mode: all three are REAL decodes now — nothing raises
        got = {
            r["media_id"]: r
            for r in decode_real_features(media, strict=True).collect()
        }
        assert got[1]["fmt"] == "bmp"
        assert (got[1]["width"], got[1]["height"]) == (5, 6)
        assert got[1]["px_mean"] == pytest.approx(float(bmp.mean()))
        assert got[1]["px_std"] == pytest.approx(float(bmp.std()))

        dec = mulaw_decode(mulaw_encode(lin))
        assert got[2]["fmt"] == "wav_ulaw"
        assert got[2]["sample_rate"] == 8000 and got[2]["n_samples"] == 200
        assert got[2]["rms"] == pytest.approx(
            float(np.sqrt(np.mean(dec.astype(np.float64) ** 2)))
        )

        assert got[3]["fmt"] == "wav_f32"
        assert got[3]["sample_rate"] == 22050 and got[3]["n_samples"] == 128
        assert got[3]["rms"] == pytest.approx(
            float(np.sqrt(np.mean(f32.astype(np.float64) ** 2)))
        )

        assert got[4]["fmt"] == "png"
        assert (got[4]["width"], got[4]["height"]) == (4, 7)
        assert got[4]["px_mean"] == pytest.approx(float(png.mean()))
        assert got[4]["px_std"] == pytest.approx(float(png.std()))

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


class TestDecoderRegistry:
    """The pluggable external-codec seam (r10 verdict task 3):
    register_decoder lets a deployment decode JPEG/MP3/exotic variants
    with a real library (PIL/soundfile) without shipping a codec
    in-repo; the container has neither, so a stub adapter proves the
    hook path and the goldens stay unchanged without it."""

    def _media(self, spark, rows):
        return spark.createDataFrame(
            [(i, i, k, p, None) for i, k, p in rows],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )

    def test_stub_adapter_claims_unknown_magic(self, spark):
        import numpy as np
        import pytest as _pytest

        from go_vectorsearch_spark.operators import multimodal as MM

        fake = b"FAKE" + bytes(range(16))
        rows = [(1, "image", bytearray(fake))]
        media = self._media(spark, rows)

        # without the adapter: opaque in default mode, raises in strict
        got = {r["media_id"]: r for r in MM.decode_real_features(media).collect()}
        assert got[1]["fmt"] == "opaque"
        with _pytest.raises(Exception, match="NotImplementedError|adapter"):
            MM.decode_real_features(media, strict=True).collect()

        def claims(p: bytes) -> bool:
            return p[:4] == b"FAKE"

        def decode(p: bytes):
            body = np.frombuffer(p[4:], dtype=np.uint8).reshape(4, 4)
            return ("fake", body, None)

        MM.register_decoder("fake", claims, decode)
        try:
            got = {
                r["media_id"]: r
                for r in MM.decode_real_features(media, strict=True).collect()
            }
            assert got[1]["fmt"] == "fake"
            assert (got[1]["width"], got[1]["height"]) == (4, 4)
            assert got[1]["px_mean"] == float(np.arange(16).mean())
        finally:
            MM.unregister_decoder("fake")
        # unregistered: goldens restored
        got = {r["media_id"]: r for r in MM.decode_real_features(media).collect()}
        assert got[1]["fmt"] == "opaque"

    def test_builtin_decoders_precede_adapters(self, spark):
        import numpy as np

        from go_vectorsearch_spark.operators import multimodal as MM

        pgm = np.arange(24, dtype=np.uint8).reshape(4, 6)
        media = self._media(
            spark, [(1, "image", bytearray(MM.encode_pgm(pgm)))]
        )
        MM.register_decoder(
            "greedy", lambda p: True, lambda p: ("greedy", None, (1, np.zeros(1)))
        )
        try:
            got = MM.decode_real_features(media).collect()[0]
            assert got["fmt"] == "pgm"  # built-in won
            assert (got["width"], got["height"]) == (6, 4)
        finally:
            MM.unregister_decoder("greedy")

    def test_adapter_handles_builtin_claimed_but_exotic_body(self, spark):
        """A PNG the built-in claims (8-byte magic) but raises on — this
        fixture has a valid 16-bit IHDR and NO IDAT ("missing IDAT";
        16-bit rasters themselves decode real as of r11) — the adapter
        must get its chance, the PIL scenario for exotic variants."""
        import struct as _struct

        import numpy as np

        from go_vectorsearch_spark.operators import multimodal as MM

        ihdr = _struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0)  # 16-bit gray
        png16 = (
            MM._PNG_MAGIC
            + _struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
            + _struct.pack(">I", 0) + b"IEND" + b"\x00" * 4
        )
        media = self._media(spark, [(1, "image", bytearray(png16))])
        got = MM.decode_real_features(media).collect()[0]
        assert got["fmt"] == "opaque"  # built-in raised, no adapter

        MM.register_decoder(
            "png16",
            lambda p: p[:8] == MM._PNG_MAGIC,
            lambda p: ("png16", np.full((2, 3), 7, dtype=np.uint8), None),
        )
        try:
            got = MM.decode_real_features(media, strict=True).collect()[0]
            assert got["fmt"] == "png16"
            assert (got["width"], got["height"], got["px_mean"]) == (3, 2, 7.0)
        finally:
            MM.unregister_decoder("png16")

    def test_adapter_errors_never_abort_the_job(self, spark):
        from go_vectorsearch_spark.operators import multimodal as MM

        def boom(p: bytes):
            raise RuntimeError("third-party codec crash")

        media = self._media(spark, [(1, "image", bytearray(b"FAKEdata"))])
        MM.register_decoder("boom", lambda p: p[:4] == b"FAKE", boom)
        try:
            got = MM.decode_real_features(media).collect()[0]
            assert got["fmt"] == "opaque"  # fell through to the stub
        finally:
            MM.unregister_decoder("boom")

    def test_adapter_set_snapshotted_at_plan_construction(self, spark):
        """Cluster correctness: the closure captures the registry AT
        decode_real_features() call time (cloudpickle ships the
        callables); registering afterwards must not mutate an
        already-built plan."""
        import numpy as np

        from go_vectorsearch_spark.operators import multimodal as MM

        media = self._media(spark, [(1, "image", bytearray(b"FAKEdata"))])
        df = MM.decode_real_features(media)  # snapshot: no adapters
        MM.register_decoder(
            "late", lambda p: True, lambda p: ("late", np.zeros((1, 1), np.uint8), None)
        )
        try:
            assert df.collect()[0]["fmt"] == "opaque"
            assert MM.decode_real_features(media).collect()[0]["fmt"] == "late"
        finally:
            MM.unregister_decoder("late")

    def test_register_default_adapters_noop_without_libs(self):
        from go_vectorsearch_spark.operators import multimodal as MM

        added = MM.register_default_adapters()
        for name in added:  # container has neither lib; tolerate either
            MM.unregister_decoder(name)
        assert added == [] or set(added) <= {"pil", "soundfile"}


def test_png_palette_decode(spark):
    """8-bit palette PNG (color type 3, r11): the raster de-filters at
    one byte per pixel and expands through PLTE to RGB. The payload is
    crafted test-side from the spec (chunk layout, filter bytes,
    palette table), independent of encode_png."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from go_vectorsearch_spark.operators.multimodal import (
        _PNG_MAGIC,
        decode_image_png,
        decode_real_features,
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2], [3, 3, 0]], dtype=np.uint8)  # 3x2
    # rows: filter 0 then filter 1 (Sub) — de-filtering must apply to
    # the index bytes BEFORE the palette gather
    row0 = b"\x00" + idx[0].tobytes()
    subbed = np.diff(np.concatenate([[0], idx[1].astype(np.int32)])) & 0xFF
    row1 = b"\x01" + subbed.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    png = (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    got = decode_image_png(png)
    assert got.shape == (2, 3, 3)
    assert (got == pal[idx]).all()

    # e2e through the Arrow map: real features, fmt='png'
    media = spark.createDataFrame(
        [(1, 1, "image", bytearray(png), None)],
        "media_id long, doc_id long, kind string, payload binary, "
        "meta struct<width:int>",
    )
    r = decode_real_features(media, strict=True).collect()[0]
    assert (r["fmt"], r["width"], r["height"]) == ("png", 3, 2)
    assert r["px_mean"] == _pytest.approx(float(pal[idx].mean()))

    # degenerate variants stay at the seam: missing PLTE, short index
    no_plte = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row0 + row1)) + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        decode_image_png(no_plte)
    oob = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal[:2].tobytes())  # only 2 entries, idx max 3
        + chunk(b"IDAT", zlib.compress(row0 + row1)) + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE range"):
        decode_image_png(oob)


def test_png_16bit_decode(spark):
    """16-bit gray and RGB PNG (r11): the spec defines filters over
    raster BYTES, so the byte-wise de-filter runs at bpp = 2 x channels
    and big-endian sample pairs recombine to uint16. Payloads crafted
    test-side from the spec, values above 255 prove real 16-bit reads."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from go_vectorsearch_spark.operators.multimodal import (
        _PNG_MAGIC,
        decode_image_png,
        decode_real_features,
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def png16(img, color):
        h, w = img.shape[:2]
        raw = b"".join(
            b"\x00" + img[r].astype(">u2").tobytes() for r in range(h)
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0)
        return (
            _PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(31)
    gray = rng.integers(0, 65536, size=(4, 5), dtype=np.uint16)
    got = decode_image_png(png16(gray, 0))
    assert got.dtype == np.uint16 and (got == gray).all()

    rgb = rng.integers(0, 65536, size=(3, 2, 3), dtype=np.uint16)
    got = decode_image_png(png16(rgb, 2))
    assert got.shape == (3, 2, 3) and (got == rgb).all()

    # Up-filtered 16-bit row: byte-wise filtering must still invert
    h, w = 2, 3
    r0 = gray[:1, :3]
    r1 = gray[1:2, :3]
    raw = (
        b"\x00" + r0.astype(">u2").tobytes()
        + b"\x02" + (
            (r1.astype(">u2").view(np.uint8).astype(np.int32)
             - r0.astype(">u2").view(np.uint8).astype(np.int32)) & 0xFF
        ).astype(np.uint8).tobytes()
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    up = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = decode_image_png(up)
    assert (got == np.vstack([r0, r1])).all()

    # e2e: the Arrow map reports 16-bit stats (mean above any uint8)
    big = np.full((2, 2), 60000, dtype=np.uint16)
    media = spark.createDataFrame(
        [(1, 1, "image", bytearray(png16(big, 0)), None)],
        "media_id long, doc_id long, kind string, payload binary, "
        "meta struct<width:int>",
    )
    r = decode_real_features(media, strict=True).collect()[0]
    assert (r["fmt"], r["width"], r["height"]) == ("png", 2, 2)
    assert r["px_mean"] == _pytest.approx(60000.0)


def test_malformed_adapter_results_never_abort(spark):
    """r11 review: an adapter that CLAIMS a payload but returns a
    malformed result — (fmt, None, None), a non-tuple, a bad-rank
    image, junk audio — is 'could not decode' for that adapter (next
    adapter / stub / strict path), never a TypeError that aborts the
    whole job at the feature step."""
    import numpy as np

    from go_vectorsearch_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(1, 1, "image", bytearray(b"FAKEdata"), None)],
        "media_id long, doc_id long, kind string, payload binary, "
        "meta struct<width:int>",
    )
    claims = lambda p: p[:4] == b"FAKE"  # noqa: E731
    bad_results = [
        lambda p: ("x", None, None),              # no media at all
        lambda p: "not a tuple",                  # wrong shape entirely
        lambda p: ("x", np.zeros((2, 2, 2, 2)), None),  # bad image rank
        lambda p: ("x", np.array([]), None),      # empty image
        lambda p: ("x", None, ("notanint", "y")), # junk audio tuple
        lambda p: ("x", None, 44100),             # audio not a tuple
    ]
    for i, bad in enumerate(bad_results):
        MM.register_decoder("bad", claims, bad)
        try:
            got = MM.decode_real_features(media).collect()[0]
            assert got["fmt"] == "opaque", (i, got)
        finally:
            MM.unregister_decoder("bad")
    # a malformed adapter registered BEFORE a good one: the good one
    # still gets the payload
    MM.register_decoder("bad", claims, bad_results[0])
    MM.register_decoder(
        "good", claims, lambda p: ("good", np.full((1, 2), 5, np.uint8), None)
    )
    try:
        got = MM.decode_real_features(media, strict=True).collect()[0]
        assert (got["fmt"], got["px_mean"]) == ("good", 5.0)
    finally:
        MM.unregister_decoder("bad")
        MM.unregister_decoder("good")


def test_png_palette_trns_routes_to_adapter_seam(spark):
    """A palette PNG carrying tRNS transparency must NOT silently decode
    to opaque RGB (wrong pixel statistics over transparent regions) —
    it raises to the adapter/strict seam (r11 review)."""
    import struct
    import zlib

    import pytest as _pytest

    from go_vectorsearch_spark.operators.multimodal import (
        _PNG_MAGIC,
        decode_image_png,
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = b"\x00\x00\x01"
    png = (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", bytes([1, 2, 3, 4, 5, 6]))
        + chunk(b"tRNS", bytes([0]))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="tRNS"):
        decode_image_png(png)


def test_png_color_keyed_trns_routes_to_adapter_seam(spark):
    """tRNS on color types 0 (gray) and 2 (RGB) is COLOR-KEYED
    transparency (PNG spec §11.3.2) — decoding it silently opaque has
    the same wrong-pixel-statistics failure the palette guard closed,
    so those payloads also raise to the adapter/strict seam (r11
    advice)."""
    import struct
    import zlib

    import pytest as _pytest

    from go_vectorsearch_spark.operators.multimodal import (
        _PNG_MAGIC,
        decode_image_png,
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    for color, raw, trns in (
        (0, b"\x00\x07\x09", struct.pack(">H", 7)),          # gray key
        (2, b"\x00" + bytes(6), struct.pack(">HHH", 0, 0, 0)),  # RGB key
    ):
        ihdr = struct.pack(">IIBBBBB", 2 if color == 0 else 2, 1, 8, color, 0, 0, 0)
        png = (
            _PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"tRNS", trns)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError, match="tRNS"):
            decode_image_png(png)


def test_jpegref_codec_roundtrip():
    """The vendored T.81 baseline codec round-trips within DCT/rounding
    tolerance on all three supported layouts (gray, 4:4:4, 4:2:0), at
    non-multiple-of-8 dimensions (MCU edge padding + crop), and rejects
    the unsupported envelope with ValueError (the adapter contract's
    could-not-decode signal)."""
    import numpy as np
    import pytest as _pytest

    from tests.jpegref import decode_baseline_jpeg, encode_baseline_jpeg

    rng = np.random.default_rng(3)
    gray = (
        np.add.outer(np.linspace(0, 200, 13), np.linspace(0, 255, 21)) / 2
        + rng.integers(0, 8, (13, 21))
    ).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(gray, q=1))
    assert out.shape == gray.shape
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2

    rgb = np.stack(
        [
            np.tile(np.linspace(0, 255, 24), (18, 1)),
            np.tile(np.linspace(255, 0, 24), (18, 1)),
            np.full((18, 24), 99.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(rgb, q=1))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3
    out = decode_baseline_jpeg(encode_baseline_jpeg(rgb, q=1, subsampling="420"))
    # chroma is 2x2-averaged: exact on the constant-B channel, bounded
    # on the gradients of this fixture
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 12

    # a coarser step still decodes to the same raster geometry
    out = decode_baseline_jpeg(encode_baseline_jpeg(gray, q=8))
    assert out.shape == gray.shape

    # odd dims + 4:2:0: the chroma-pad/crop path (MCU = 16x16 over a
    # 13x21 raster)
    odd = np.stack(
        [
            np.tile(np.linspace(0, 255, 21), (13, 1)),
            np.tile(np.linspace(255, 0, 21), (13, 1)),
            np.full((13, 21), 42.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(odd, q=1, subsampling="420"))
    assert out.shape == odd.shape
    assert np.abs(out.astype(int) - odd.astype(int)).max() <= 12

    with _pytest.raises(ValueError):
        decode_baseline_jpeg(b"\x89PNG not a jpeg")
    # progressive (SOF2) is outside the envelope: splice the marker
    good = bytearray(encode_baseline_jpeg(gray, q=1))
    good[good.index(b"\xff\xc0")+1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        decode_baseline_jpeg(bytes(good))
    # nonzero restart interval: splice a DRI segment before SOS — the
    # envelope raises (could-not-decode at the seam), never misparses
    import struct as _struct

    g = bytes(encode_baseline_jpeg(gray, q=1))
    i = g.index(b"\xff\xda")
    dri = _struct.pack(">HH", 0xFFDD, 4) + _struct.pack(">H", 4)
    with _pytest.raises(ValueError, match="restart"):
        decode_baseline_jpeg(g[:i] + dri + g[i:])


def test_real_jpeg_decodes_through_adapter_registry(spark):
    """The adapter seam proved against a GENUINE codec (r11 verdict task
    5): tests/jpegref.py is a vendored pure-numpy baseline-JPEG decoder
    (ITU-T T.81, public spec), registered exactly like production would
    register PIL. End-to-end through the registry mapInPandas path:

    * the built-ins refuse JPEG (fmt='opaque' unregistered; strict mode
      raises NotImplementedError at the documented boundary);
    * with the adapter registered, real grayscale AND 4:2:0-subsampled
      color JPEGs decode to true dimensions and pixel statistics;
    * sniff_media_meta's header dims agree with the decoded raster;
    * a truncated JPEG body raises inside the adapter and degrades to
      could-not-decode, never a job abort."""
    import numpy as np
    import pytest as _pytest

    from go_vectorsearch_spark.operators import multimodal as MM
    from tests.jpegref import decode_baseline_jpeg, encode_baseline_jpeg

    rng = np.random.default_rng(12)
    gray = (
        np.add.outer(np.linspace(0, 200, 13), np.linspace(0, 255, 21)) / 2
        + rng.integers(0, 8, (13, 21))
    ).astype(np.uint8)
    rgb = np.stack(
        [
            np.tile(np.linspace(0, 255, 24), (18, 1)),
            np.tile(np.linspace(255, 0, 24), (18, 1)),
            np.full((18, 24), 99.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    jg = encode_baseline_jpeg(gray, q=1)
    jc = encode_baseline_jpeg(rgb, q=1, subsampling="420")

    def media(rows):
        return spark.createDataFrame(
            [(i, i, "image", bytearray(p), None) for i, p in rows],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )

    # header sniff agrees with the encoder's SOF before any decode
    sniffed = {
        r["media_id"]: r
        for r in MM.sniff_media_meta(media([(1, jg), (2, jc)])).collect()
    }
    assert (
        sniffed[1]["fmt"], sniffed[1]["width"], sniffed[1]["height"],
        sniffed[1]["n_channels"],
    ) == ("jpeg", 21, 13, 1)
    assert (
        sniffed[2]["width"], sniffed[2]["height"], sniffed[2]["n_channels"]
    ) == (24, 18, 3)

    # unregistered: the documented JPEG boundary
    got = MM.decode_real_features(media([(1, jg)])).collect()[0]
    assert got["fmt"] == "opaque"
    with _pytest.raises(Exception, match="NotImplementedError|adapter"):
        MM.decode_real_features(media([(1, jg)]), strict=True).collect()

    def _claims(p: bytes) -> bool:
        return p[:2] == b"\xff\xd8"

    def _decode(p: bytes):
        return ("jpeg", decode_baseline_jpeg(p), None)

    MM.register_decoder("jpegref", _claims, _decode)
    try:
        rows = {
            r["media_id"]: r
            for r in MM.decode_real_features(
                media([(1, jg), (2, jc)]), strict=True
            ).collect()
        }
        g, c = rows[1], rows[2]
        assert (g["fmt"], g["width"], g["height"]) == ("jpeg", 21, 13)
        assert abs(g["px_mean"] - gray.mean()) < 1.5
        assert (c["fmt"], c["width"], c["height"]) == ("jpeg", 24, 18)
        assert abs(c["px_mean"] - rgb.mean()) < 4.0  # 4:2:0 chroma loss
        # adapter exception on a corrupt body = could-not-decode
        bad = jg[: len(jg) // 2]
        got = MM.decode_real_features(media([(3, bad)])).collect()[0]
        assert got["fmt"] == "opaque"
    finally:
        MM.unregister_decoder("jpegref")


def test_sniff_bmp_palette_reports_decode_channels(spark):
    """Sniffed n_channels for an 8-bit palette BMP is 3 — what the
    decode yields after the color-table gather — matching the palette
    PNG convention, so a pre-decode n_channels filter treats both
    palette forms identically (r11 review)."""
    import struct as _struct

    from go_vectorsearch_spark.operators.multimodal import sniff_media_meta

    pal_bmp = bytearray(b"BM" + b"\x00" * 52)
    _struct.pack_into("<I", pal_bmp, 14, 40)
    _struct.pack_into("<ii", pal_bmp, 18, 6, 4)
    _struct.pack_into("<HHI", pal_bmp, 26, 1, 8, 0)  # 8-bit palette
    media = spark.createDataFrame(
        [(1, 1, "image", bytearray(bytes(pal_bmp)), None)],
        "media_id long, doc_id long, kind string, payload binary, "
        "meta struct<width:int>",
    )
    got = sniff_media_meta(media).collect()[0]
    assert (got["fmt"], got["n_channels"]) == ("bmp", 3)


def test_sniff_mp4_unknown_duration_sentinel():
    """ISO 14496-12 marks an UNKNOWN movie duration as all-ones
    (0xFFFFFFFF in a v0 mvhd, 2^64-1 in v1 — live/fragmented capture);
    the sniff must report NULL, not the multi-decade figure a
    max-duration ingest filter would silently drop (r12 advice)."""
    import struct as _struct

    from go_vectorsearch_spark.operators.multimodal import _sniff_mp4

    def box(tag, body):
        return _struct.pack(">I", len(body) + 8) + tag + body

    ftyp = box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"iso2mp41")
    tkhd = box(
        b"tkhd",
        bytes(4) + _struct.pack(">IIIII", 0, 0, 1, 0, 0)
        + bytes(8) + bytes(8) + bytes(36)
        + _struct.pack(">II", 640 << 16, 360 << 16),
    )
    for mvhd in (
        box(  # v0 sentinel
            b"mvhd",
            bytes(4) + _struct.pack(">IIII", 0, 0, 1000, 0xFFFFFFFF)
            + bytes(80),
        ),
        box(  # v1 sentinel
            b"mvhd",
            bytes([1]) + bytes(3)
            + _struct.pack(">QQIQ", 0, 0, 1000, (1 << 64) - 1)
            + bytes(80),
        ),
    ):
        got = _sniff_mp4(ftyp + box(b"moov", mvhd + box(b"trak", tkhd)))
        assert got == (640, 360, None), got


def test_sniff_ogg_short_opushead_degrades_not_raises():
    """A truncated 13-15 byte OpusHead first-page payload is too short
    for the 4-byte input-rate field — the sniff must return None (the
    bounded-parse degrade), never raise struct.error out of the walk
    (r12 advice: the old >= 13 guard under-covered the offset-12
    read)."""
    import struct as _struct

    from go_vectorsearch_spark.operators.multimodal import _sniff_ogg

    def ogg_page(payload, granule=0, htype=2):
        seg = bytes([len(payload)])
        return (
            b"OggS\x00" + bytes([htype]) + _struct.pack("<q", granule)
            + _struct.pack("<III", 1, 0, 0) + bytes([1]) + seg + payload
        )

    for n in (13, 14, 15):
        assert _sniff_ogg(ogg_page(b"OpusHead" + bytes(n - 8))) is None


def test_sniff_ogg_false_capture_pattern_in_tail():
    """'OggS' occurring inside compressed packet bytes is not a page
    header: the duration scan must validate the candidate (version byte
    0, full header in bounds) and fall back to the previous hit instead
    of reading a garbage granule (r12 advice)."""
    import struct as _struct

    from go_vectorsearch_spark.operators.multimodal import _sniff_ogg

    def ogg_page(payload, granule=0, htype=2):
        seg = bytes([len(payload)])
        return (
            b"OggS\x00" + bytes([htype]) + _struct.pack("<q", granule)
            + _struct.pack("<III", 1, 0, 0) + bytes([1]) + seg + payload
        )

    vorbis_id = (
        b"\x01vorbis" + _struct.pack("<I", 0) + bytes([2])
        + _struct.pack("<I", 44100) + bytes(13)
    )
    # the LAST page's payload embeds a false 'OggS' whose would-be
    # granule bytes are 0xFF.. (a huge bogus duration with the old code)
    last = ogg_page(b"xxOggS" + b"\xff" * 12, granule=441000, htype=4)
    got = _sniff_ogg(ogg_page(vorbis_id) + last)
    assert got == (44100, 2, 10000), got


def test_flacref_codec_roundtrip():
    """tests/flacref.py self-consistency: the encoder produces a
    spec-conformant fixed-blocksize FLAC stream (FIXED predictors +
    Rice residuals — real compression, not a verbatim wrapper) that the
    matching decoder reproduces bit-exactly, verifying CRC-8/CRC-16 and
    the STREAMINFO sample-count/MD5 along the way; corruption and
    truncation raise (the registry's could-not-decode contract)."""
    import numpy as np
    import pytest as _pytest

    from tests.flacref import decode_flac, encode_flac

    rng = np.random.default_rng(7)
    t = np.arange(5000)
    wave = (
        3000 * np.sin(t / 20) + 500 * np.sin(t / 3)
        + rng.integers(-50, 50, len(t))
    ).astype(np.int16)
    payload = encode_flac(wave, 22050, blocksize=512)
    assert len(payload) < wave.nbytes * 0.7  # genuinely compressed
    sr, got = decode_flac(payload)
    assert sr == 22050 and np.array_equal(got, wave)
    # constant blocks take the CONSTANT subframe path
    const = np.full(1000, -123, dtype=np.int16)
    sr, got = decode_flac(encode_flac(const, 8000, blocksize=256))
    assert sr == 8000 and np.array_equal(got, const)
    # multi-byte coded frame numbers (>=128 frames) and a short tail
    w2 = np.linspace(-30000, 30000, 40000).astype(np.int16)
    _, got = decode_flac(encode_flac(w2, 44100, blocksize=192))
    assert np.array_equal(got, w2)
    for cut in (5, 40, len(payload) // 2, len(payload) - 3):
        with _pytest.raises(ValueError):
            decode_flac(payload[:cut])
    bad = bytearray(payload)
    bad[60] ^= 0x40
    with _pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))


def test_real_flac_decodes_through_adapter_registry(spark):
    """The adapter seam proved against a genuine AUDIO codec (r12
    verdict task 5 — the jpegref.py pattern, audio side): tests/flacref
    manufactures REAL FLAC payloads, registered exactly like production
    registers soundfile. End-to-end through the registry mapInPandas
    path:

    * sniff_media_meta's STREAMINFO sniff agrees with the encoder's
      header (rate / channels / duration) before any decode;
    * the built-ins refuse FLAC (fmt='opaque' unregistered; strict mode
      raises at the documented boundary);
    * with the adapter registered, a real FLAC decodes to true sample
      rate, sample count and RMS through the registry path;
    * a truncated body raises inside the adapter (CRC/short-stream) and
      degrades to could-not-decode, never a job abort."""
    import numpy as np
    import pytest as _pytest

    from go_vectorsearch_spark.operators import multimodal as MM
    from tests.flacref import decode_flac, encode_flac

    rng = np.random.default_rng(21)
    t = np.arange(11025)
    wave = (
        9000 * np.sin(t / 17) + rng.integers(-800, 800, len(t))
    ).astype(np.int16)
    payload = encode_flac(wave, 11025, blocksize=1024)

    def media(rows):
        return spark.createDataFrame(
            [(i, i, "audio", bytearray(p), None) for i, p in rows],
            "media_id long, doc_id long, kind string, payload binary, "
            "meta struct<width:int>",
        )

    sniffed = MM.sniff_media_meta(media([(1, payload)])).collect()[0]
    assert (
        sniffed["fmt"], sniffed["sample_rate"], sniffed["n_channels"],
        sniffed["est_duration_ms"],
    ) == ("flac", 11025, 1, 1000)

    got = MM.decode_real_features(media([(1, payload)])).collect()[0]
    assert got["fmt"] == "opaque"
    with _pytest.raises(Exception, match="NotImplementedError|adapter"):
        MM.decode_real_features(media([(1, payload)]), strict=True).collect()

    def _claims(p: bytes) -> bool:
        return p[:4] == b"fLaC"

    def _decode(p: bytes):
        sr, samples = decode_flac(p)
        return ("flac", None, (sr, samples))

    MM.register_decoder("flacref", _claims, _decode)
    try:
        rows = {
            r["media_id"]: r
            for r in MM.decode_real_features(
                media([(1, payload), (2, payload[: len(payload) // 2])]),
                strict=False,
            ).collect()
        }
        ok = rows[1]
        assert (ok["fmt"], ok["sample_rate"], ok["n_samples"]) == (
            "flac", 11025, len(wave),
        )
        want_rms = float(np.sqrt(np.mean(wave.astype(np.float64) ** 2)))
        assert abs(ok["rms"] - want_rms) / want_rms < 1e-6
        # truncated: adapter raises (CRC / short stream) -> opaque
        assert rows[2]["fmt"] == "opaque"
    finally:
        MM.unregister_decoder("flacref")
