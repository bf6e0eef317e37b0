"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference is text-only; a 100 TB training-data pipeline carries media
as ``binary`` payload columns with a typed metadata struct, decoding and
feature-extracting inside Arrow-batched ``mapInPandas`` so bytes never
round-trip through the driver. The media codec libraries (PIL, torchaudio,
ffmpeg) are NOT in this container, so the decode step is STUBBED only for
formats that genuinely need them (JPEG/MP3/H.264, exotic PNG/BMP/WAV
variants): there we either raise ``NotImplementedError`` (strict mode) or
compute a clearly-named deterministic fake from the payload bytes
(default). netpbm / 8-bit PNG (incl. palette) / uncompressed BMP images
and PCM / IEEE-float / µ-law WAV audio decode REAL, numpy+stdlib only,
and external codecs plug in per-format via ``register_decoder`` — the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is identical either way and tested end to end.

Scale notes: payloads stay columnar in parquet (binary, zstd); decode
parallelism = scan partitions; per-batch numpy work is vectorized; the
only shuffle anywhere here is a user-requested groupBy downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ["image", "audio", "video"]

# payload is opaque bytes; meta is the typed, queryable part
MEDIA_SCHEMA = (
    "media_id long, doc_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, fmt:string>"
)

_PAYLOAD_BLOCKS = 2  # md5 blocks -> 32 payload bytes for the synthetic corpus


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table derived from ``documents``
    (payload bytes = md5 stream of the text; metadata = arithmetic on
    doc_id), used because the container has no real media files. Shape
    and types match what a real ingest would produce."""
    hex_stream = F.concat(
        *[
            F.md5(F.concat_ws(":", F.lit("media"), F.col("text"), F.lit(str(b))))
            for b in range(_PAYLOAD_BLOCKS)
        ]
    )
    kind = F.element_at(
        F.lit(list(MEDIA_KINDS)),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        "doc_id",
        kind.alias("kind"),
        F.unhex(hex_stream).alias("payload"),
        F.struct(
            (16 + F.col("doc_id") % 64).cast("int").alias("width"),
            (16 + F.col("doc_id") % 48).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (1000 + (F.col("doc_id") % 10) * 500).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("fmt"),
        ).alias("meta"),
    )


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Per-media decode + feature extraction via mapInPandas.

    THE STUBBED DECODE BOUNDARY: a real deployment would PIL/ffmpeg-decode
    ``payload`` here; those libraries are not in this container, so
    ``strict=True`` raises ``NotImplementedError`` at the exact seam, and
    the default computes DETERMINISTIC FAKE features from the raw payload
    bytes (byte sum / first / last) so the distributed plumbing — schema,
    Arrow batch shape, partition parallelism — stays testable and
    oracle-checkable end to end.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires PIL/torchaudio/ffmpeg (not in container)"
                )
            # NULL/empty payloads are real inputs (a failed fetch, a
            # zero-byte object): empty array, zero features — never an
            # IndexError inside the worker
            arrs = [
                np.frombuffer(p or b"", dtype=np.uint8) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(a) for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                    "first_byte": [int(a[0]) if len(a) else 0 for a in arrs],
                    "last_byte": [int(a[-1]) if len(a) else 0 for a in arrs],
                }
            )

    return media.mapInPandas(
        extract,
        schema="media_id long, kind string, n_bytes int, byte_sum long, "
        "first_byte int, last_byte int",
    )


def frame_sample(media: DataFrame, fps: float = 2.0) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame timestamp at ``fps``, computed as a pure column expression
    (sequence + explode — no Python). The downstream decode-at-timestamp
    is the stubbed boundary."""
    step_ms = int(1000 / fps)
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.col("meta.duration_ms").cast("long"),
        F.lit(step_ms).cast("long"),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )


def audio_chunks(media: DataFrame, chunk_ms: int = 250) -> DataFrame:
    """Audio chunking plan: (media_id, chunk_idx, start_sample,
    n_samples) per fixed-length chunk — pure expressions from metadata."""
    sr = F.col("meta.sample_rate").cast("long")
    dur = F.col("meta.duration_ms").cast("long")
    n_chunks = F.ceil(dur / F.lit(chunk_ms)).cast("long")
    # guard: sequence(0, -1) steps BACKWARDS in Spark, so zero-duration
    # audio would emit two bogus chunks (0 and -1); an empty array
    # explodes to no rows instead
    idxs = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    ).otherwise(F.array().cast("array<long>"))
    samples_per_chunk = (sr * chunk_ms / F.lit(1000)).cast("long")
    total_samples = (sr * dur / F.lit(1000)).cast("long")
    start = F.col("chunk_idx") * F.col("spc")
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.explode(idxs).alias("chunk_idx"),
            samples_per_chunk.alias("spc"),
            total_samples.alias("_total"),
        )
        .select(
            "media_id",
            "chunk_idx",
            start.alias("start_sample"),
            # the final chunk holds only the remaining samples
            F.least(F.col("spc"), F.col("_total") - start).alias("n_samples"),
        )
    )


# ---------------------------------------------------------------------------
# Real decoders for library-free formats (r5, widened r10). The stub
# boundary above remains for JPEG/MP3/H.264 — formats that genuinely
# need PIL/ffmpeg — but netpbm images (PGM P5 / PPM P6), 8-bit
# non-interlaced PNG (stdlib zlib), uncompressed 24-bit BMP, and WAV
# audio in PCM-16 / IEEE-float32 / G.711 µ-law all decode with numpy +
# the stdlib alone, so for THOSE the seam is real end to end.
# ---------------------------------------------------------------------------


def encode_pgm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 -> binary PGM (P5)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    return f"P5\n{w} {h}\n255\n".encode() + a.tobytes()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_image_netpbm(payload: bytes) -> np.ndarray:
    """Binary netpbm decode: P5 -> (h, w) uint8, P6 -> (h, w, 3) uint8.
    Handles whitespace runs and '#' comments in the header per the spec."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    if w <= 0 or h <= 0:
        raise ValueError("degenerate netpbm dimensions")
    depth = 3 if payload[:2] == b"P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * depth, offset=i)
    return raster.reshape((h, w, 3) if depth == 3 else (h, w))


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (BI_RGB,
    BITMAPINFOHEADER, bottom-up rows, BGR pixel order, rows padded to
    4 bytes — the canonical Windows bitmap layout)."""
    import struct

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB -> BGR, bottom row first, per-row zero padding
    bgr = a[::-1, :, ::-1]
    raster = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + dib + raster


def decode_image_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BMP -> (h, w, 3) uint8 RGB: 24-bit BI_RGB, or 8-bit
    palettized (r11 — index raster + BGR0 color-table gather, the
    classic screenshot/icon form). Supports bottom-up (positive height,
    the common case) and top-down rows; anything else (sub-byte
    palette, RLE, 16/32-bit bitfields) raises — the compressed/exotic
    variants the adapter/strict seam covers."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bits, compression = struct.unpack_from("<HHI", payload, 26)
    if dib_size < 40 or planes != 1 or bits not in (8, 24) or compression != 0:
        raise ValueError("only uncompressed 24-bit/8-bit-palette BI_RGB BMP supported")
    if w <= 0 or h == 0:  # h < 0 is the legal top-down form
        raise ValueError("degenerate BMP dimensions")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * (bits // 8)
    stride = row_bytes + ((-row_bytes) % 4)
    if data_off + stride * h > len(payload):
        raise ValueError("truncated BMP raster")
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, :row_bytes]
    if bits == 8:
        # color table: biClrUsed BGR0 quads right after the DIB header
        # (0 means the full 256); indexes gather through it like PNG's
        # PLTE, colors stored blue-first like the 24-bit raster
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or 256
        tbl_off = 14 + dib_size
        if tbl_off + 4 * n_colors > len(payload):
            raise ValueError("truncated BMP color table")
        table = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=tbl_off
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGR0 -> RGB
        if int(raster.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of color-table range")
        rows = table[raster]
    else:
        rows = raster.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        rows = rows[::-1]
    return rows


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 image -> PNG bytes: (h, w) gray, (h, w, 3) RGB or
    (h, w, 4) RGBA; filter-0 rows, one zlib IDAT (stdlib only)."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    depth = 1 if a.ndim == 2 else a.shape[2]
    color = {1: 0, 3: 2, 4: 6}[depth]
    raw = b"".join(
        b"\x00" + a[r].tobytes() for r in range(h)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> uint8 array: gray (h, w), RGB
    (h, w, 3), RGBA (h, w, 4), or 8-bit PALETTE (color type 3, r11:
    one-byte indexes de-filter like gray, then one numpy gather through
    the PLTE table -> (h, w, 3) RGB); 16-bit gray/RGB(A) decodes to the
    same shapes in uint16 (r11 — the spec defines filters over raster
    BYTES, so the identical de-filter runs at bpp = 2 x channels and the
    big-endian sample pairs recombine after). Pure stdlib zlib + numpy:
    chunk walk, one inflate, then per-row de-filtering (None/Sub/Up/
    Average/Paeth per the spec). Sub-byte-depth and interlaced variants
    raise — the adapter/strict seam's territory."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    i, idat, hdr, plte, trns = 8, [], None, None, None
    while i + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, i)
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + size]
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        i += 12 + size  # len + tag + body + crc
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color, _comp, _filt, interlace = hdr
    # palette rasters carry one index byte per pixel — de-filter at
    # 1 byte/px exactly like grayscale, expand through PLTE afterwards
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    # PNG filters are defined over raster BYTES with the left neighbor
    # bpp bytes back (spec §6.2), so 16-bit rasters de-filter with the
    # same code at bpp = 2 × channels and recombine to uint16 after
    # (r11; palette stays 8-bit — sub-byte depths are the adapter seam)
    if (
        bit_depth not in (8, 16)
        or channels is None
        or interlace != 0
        or (color == 3 and bit_depth != 8)
    ):
        raise ValueError(
            "only 8/16-bit non-interlaced gray/RGB(A)/8-bit-palette "
            "PNG supported"
        )
    if trns is not None and color in (0, 2, 3):
        # transparency would be silently DISCARDED (wrong pixel
        # statistics over transparent regions) — route to the
        # adapter/strict seam instead. Not just palette alpha: color
        # types 0 and 2 carry tRNS as COLOR-KEYED transparency (spec
        # §11.3.2) and decoded just as silently opaque (r11 advice).
        raise ValueError(
            "PNG with tRNS transparency needs an adapter"
        )
    if color == 3:
        if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError("palette PNG missing/degenerate PLTE")
    if w <= 0 or h <= 0:
        raise ValueError("degenerate PNG dimensions")
    raw = zlib.decompress(b"".join(idat))
    sample_bytes = bit_depth // 8
    stride = w * channels * sample_bytes
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels * sample_bytes  # filter offset, in bytes per pixel
    for r in range(h):
        f = int(filters[r])
        cur = data[r].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if f == 0:
            line = cur
        elif f == 2:  # Up
            line = cur + prev
        elif f == 1:  # Sub: per-channel-lane prefix sum (vectorized)
            lanes = cur.reshape(-1, bpp)
            line = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(stride)
        else:
            # Average/Paeth reconstruct left-to-right (each byte needs
            # the DECODED left neighbor) — sequential per row by
            # construction; fine for the library-free seam's inputs,
            # and a real high-volume PNG corpus belongs to the PIL
            # strict seam anyway
            line = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    c = int(out[r - 1, x - bpp]) if (r and x >= bpp) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown PNG filter {f}")
                # mod INSIDE the loop: the stored byte is the decoded
                # value later reads use as their left neighbor
                line[x] = (cur[x] + pred) & 0xFF
        out[r] = line & 0xFF
    if bit_depth == 16:
        # network byte order per the spec: (hi << 8) | lo
        pairs = out.reshape(h, w, channels, 2).astype(np.uint16)
        img16 = (pairs[..., 0] << 8) | pairs[..., 1]
        return img16[:, :, 0] if channels == 1 else img16
    img = out.reshape(h, w, channels)
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette PNG index out of PLTE range")
        return pal[idx]  # (h, w, 3) RGB via one numpy gather
    return img[:, :, 0] if channels == 1 else img


# --- WAV (RIFF) --------------------------------------------------------------
# Decoded with a minimal RIFF chunk walk + numpy instead of stdlib
# ``wave``: wave handles WAVE_FORMAT_PCM only, while the pipeline also
# meets IEEE-float (format 3) and G.711 µ-law (format 7) corpora — both
# decode library-free. (stdlib ``audioop`` was removed in Python 3.13,
# so µ-law is vectorized numpy here, Sun g711.c ulaw2linear semantics.)

_WAV_PCM, _WAV_IEEE_FLOAT, _WAV_MULAW = 1, 3, 7


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes -> int16 linear samples (Sun g711.c
    ulaw2linear: complement, (mantissa<<3)+0x84 biased magnitude shifted
    by the segment, sign from bit 7; byte 0xFF decodes to 0, byte 0x80
    to +32124, byte 0x00 to -32124 — the published table endpoints,
    golden-pinned in tests)."""
    u = ~np.asarray(u, dtype=np.uint8)
    t = ((u & 0x0F).astype(np.int32) << 3) + 0x84
    t <<= (u & 0x70).astype(np.int32) >> 4
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


_MULAW_TABLE = mulaw_decode(np.arange(256, dtype=np.uint8))


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> G.711 µ-law bytes: nearest decode-table entry
    (exactly inverts :func:`mulaw_decode` on its own output values)."""
    order = np.argsort(_MULAW_TABLE)
    tbl = _MULAW_TABLE[order].astype(np.int32)
    s = np.asarray(samples, dtype=np.int32)
    idx = np.clip(np.searchsorted(tbl, s), 1, 255)
    idx -= np.abs(tbl[idx - 1] - s) <= np.abs(tbl[idx] - s)
    return order[idx].astype(np.uint8)


def _wav_bytes(sample_rate: int, fmt_code: int, bits: int, data: bytes) -> bytes:
    import struct

    block = max(1, bits // 8)
    fmt = struct.pack(
        "<HHIIHH", fmt_code, 1, int(sample_rate),
        int(sample_rate) * block, block, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """int16 mono samples -> PCM WAV bytes."""
    return _wav_bytes(
        sample_rate, _WAV_PCM, 16, np.asarray(samples, dtype="<i2").tobytes()
    )


def encode_wav_float(sample_rate: int, samples: np.ndarray) -> bytes:
    """float32 mono samples (nominal [-1, 1]) -> IEEE-float WAV bytes."""
    return _wav_bytes(
        sample_rate, _WAV_IEEE_FLOAT, 32,
        np.asarray(samples, dtype="<f4").tobytes(),
    )


def encode_wav_mulaw(sample_rate: int, samples: np.ndarray) -> bytes:
    """int16 mono samples -> G.711 µ-law WAV bytes (8 bits/sample)."""
    return _wav_bytes(
        sample_rate, _WAV_MULAW, 8, mulaw_encode(samples).tobytes()
    )


def _riff_chunks(payload: bytes):
    """Yield (chunk_id, body) over a RIFF/WAVE payload — THE one chunk
    walk (decode, format naming and the metadata sniff all consume it;
    three hand-rolled copies drifted before r10's review). Raises
    ValueError on a non-RIFF payload; tolerates a truncated final chunk
    (yields the bytes present) like every mainstream reader."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        yield cid, payload[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned


def _parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV -> (format_code, sample_rate, samples of channel 0); see
    :func:`decode_audio_wav` for the supported formats."""
    import struct

    fmt = data = None
    for cid, body in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing/short fmt or data chunk")
    code, nch, sr = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if code == _WAV_PCM and bits == 16:
        a = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    elif code == _WAV_IEEE_FLOAT and bits == 32:
        a = np.frombuffer(data[: len(data) - (len(data) % 4)], dtype="<f4")
    elif code == _WAV_MULAW and bits == 8:
        a = mulaw_decode(np.frombuffer(data, dtype=np.uint8))
    else:
        raise ValueError(f"unsupported WAV format code={code} bits={bits}")
    if nch > 1:
        a = a[::nch]
    return code, sr, a


def decode_audio_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV -> (sample_rate, samples of channel 0). Formats decoded
    library-free: PCM 16-bit (-> int16), IEEE float32 (-> float32, the
    format's native [-1, 1] units), G.711 µ-law (-> int16 linear via
    :func:`mulaw_decode`). Anything else (ADPCM, extensible, 24-bit
    packing) raises — the strict-mode seam's territory."""
    _code, sr, a = _parse_wav(payload)
    return sr, a


# ---------------------------------------------------------------------------
# Header-level metadata sniffing (r10). Even the codec-BOUND formats
# (JPEG, MP3) expose dimensions / sample rate in their headers without
# any pixel or audio decode — and a 100 TB ingest pipeline filters by
# resolution/duration BEFORE paying for decode, so the sniff is its own
# first-class operator. Library-free for every format below; the pixel/
# sample DECODE seam (decode_real_features) is unchanged.
# ---------------------------------------------------------------------------

# MPEG audio frame-header tables (ISO/IEC 11172-3): bitrate kbps by
# (version-group, layer) and sample rate by version. Enough to identify
# the stream and estimate duration from size/bitrate — not a decoder.
_MP3_BITRATE = {
    # (mpeg1?, layer): index 1..14
    (True, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (True, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (True, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (False, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (False, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (False, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
_MP3_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _sniff_jpeg(p: bytes):
    """(width, height, n_components) from the first SOF marker — a pure
    segment walk (every JPEG segment between SOI and SOS is
    [FF marker][2-byte length][payload]); no entropy decode."""
    if p[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:
            return None
        marker = p[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: bare
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        size = int.from_bytes(p[i + 2 : i + 4], "big")
        if size < 2 or i + 2 + size > n:
            return None
        # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            body = p[i + 4 : i + 2 + size]
            if len(body) < 6:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            return (w, h, body[5])
        i += 2 + size
    return None


def _sniff_mp3(p: bytes):
    """(sample_rate, n_channels, est_duration_ms) from the first MPEG
    audio frame header (11-bit sync), skipping a leading ID3v2 tag.
    Duration estimated as size/bitrate — exact for CBR, nominal for VBR
    (a real pipeline treats it as a catalog hint, not a decode).

    Two guards against false syncs in arbitrary binary payloads (a lone
    header match is ~13 bits of constraint — a 50 KB random payload
    almost surely contains one): (a) the candidate's computed frame
    length must land on a SECOND header with the same version/layer/
    sample-rate (real sniffers' consecutive-frame test; a payload too
    short to hold a second header — a truncated tail — is accepted on
    the first), and (b) the scan is bounded to the first 64 KB after
    the ID3 tag, so an unrecognized payload costs O(64KB), not O(n)."""
    i = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        # syncsafe 28-bit tag size
        i = 10 + ((p[6] << 21) | (p[7] << 14) | (p[8] << 7) | p[9])
    n = len(p)
    limit = min(n - 4, i + 65536)

    def _header(j):
        """(version, layer, kbps, sr, channels, frame_len) or None."""
        if not (p[j] == 0xFF and (p[j + 1] & 0xE0) == 0xE0):
            return None
        version = (p[j + 1] >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer_code = (p[j + 1] >> 1) & 0x03  # 3=L1, 2=L2, 1=L3
        br_ix = (p[j + 2] >> 4) & 0x0F
        sr_ix = (p[j + 2] >> 2) & 0x03
        pad = (p[j + 2] >> 1) & 0x01
        if version == 1 or layer_code == 0 or not 0 < br_ix < 15 or sr_ix >= 3:
            return None
        layer = 4 - layer_code  # 1/2/3
        kbps = _MP3_BITRATE[(version == 3, layer)][br_ix]
        sr = _MP3_SR[version][sr_ix]
        channels = 1 if ((p[j + 3] >> 6) & 0x03) == 3 else 2
        if layer == 1:
            flen = (12000 * kbps // sr + pad) * 4
        else:  # L2 always 144; L3 halves for MPEG2/2.5
            per = 72000 if (layer == 3 and version != 3) else 144000
            flen = per * kbps // sr + pad
        return (version, layer, kbps, sr, channels, flen)

    if limit < i:
        return None
    # candidate offsets vectorized (r10 advice): this sniffer is the
    # fallback for EVERY unrecognized payload, and a per-byte Python
    # walk cost ~65k iterations × (_header call) per opaque row at
    # ingest scale. A numpy mask finds the only offsets where a sync
    # CAN start (0xFF then 0xE0-masked next byte — ~n/8k hits on random
    # bytes), and the Python _header validation runs on those alone.
    buf = np.frombuffer(p, dtype=np.uint8)
    sync = (buf[i : limit + 1] == 0xFF) & (
        (buf[i + 1 : limit + 2] & 0xE0) == 0xE0
    )
    for off in np.nonzero(sync)[0]:
        j0 = i + int(off)
        h = _header(j0)
        if h is None:
            continue
        version, layer, kbps, sr, channels, flen = h
        j = j0 + flen
        if j + 4 <= n:
            h2 = _header(j)
            if h2 is None or h2[0] != version or h2[1] != layer or h2[3] != sr:
                continue  # lone sync inside non-MP3 bytes
        dur_ms = int((n - j0) * 8 / kbps) if kbps else None
        return (sr, channels, dur_ms)
    return None


def _sniff_mp4(p: bytes):
    """(width, height, est_duration_ms) from an ISO-BMFF (MP4/MOV, ISO
    14496-12) box walk: mvhd gives duration/timescale, the first video
    trak's tkhd gives presentation dimensions (16.16 fixed point) — no
    sample decode, no codec. The walk recurses ONLY into moov/trak and
    is bounded by a box-count cap, so a corrupt size field costs O(cap),
    never O(n)."""
    import struct

    if len(p) < 12 or p[4:8] != b"ftyp":
        return None

    budget = [256]  # total boxes visited, shared across recursion

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi and budget[0] > 0:
            budget[0] -= 1
            (size,) = struct.unpack_from(">I", p, i)
            tag = p[i + 4 : i + 8]
            body = i + 8
            if size == 1:
                if i + 16 > hi:
                    return
                (size,) = struct.unpack_from(">Q", p, i + 8)
                body = i + 16
            elif size == 0:
                size = hi - i  # box runs to end of enclosing scope
            if size < 8 or i + size > hi:
                return  # corrupt size: stop the walk, keep what parsed
            yield tag, body, i + size
            i += size

    dur_ms = None
    width = height = None
    for tag, body, end in boxes(0, len(p)):
        if tag != b"moov":
            continue
        for t2, b2, e2 in boxes(body, end):
            if t2 == b"mvhd" and dur_ms is None and b2 + 4 <= e2:
                ver = p[b2]
                if ver == 0 and b2 + 20 <= e2:
                    ts, dur = struct.unpack_from(">II", p, b2 + 12)
                    unknown = dur == 0xFFFFFFFF
                elif ver == 1 and b2 + 32 <= e2:
                    (ts,) = struct.unpack_from(">I", p, b2 + 20)
                    (dur,) = struct.unpack_from(">Q", p, b2 + 24)
                    unknown = dur == 0xFFFFFFFFFFFFFFFF
                else:
                    continue
                # ISO 14496-12: an all-ones duration means "unknown"
                # (live/fragmented capture) — report NULL, not a
                # multi-decade figure a max-duration filter would act on
                if ts > 0 and not unknown:
                    dur_ms = int(dur * 1000 / ts)
            elif t2 == b"trak" and width is None:
                for t3, b3, e3 in boxes(b2, e2):
                    if t3 != b"tkhd":
                        continue
                    # width/height follow ver+flags(4) + times/id/
                    # duration (20 v0 / 32 v1) + reserved(8) + layer/
                    # group/volume/reserved(8) + matrix(36)
                    ver = p[b3]
                    off = b3 + (88 if ver == 1 else 76)
                    if off + 8 > e3:
                        continue
                    w, h = struct.unpack_from(">II", p, off)
                    if w > 0 and h > 0:  # audio traks carry 0x0
                        width, height = w >> 16, h >> 16
        break
    return (width, height, dur_ms)


def _sniff_ogg(p: bytes):
    """(sample_rate, n_channels, est_duration_ms) from an Ogg container
    (RFC 3533): the first page's payload carries the codec ID header —
    Vorbis ('\\x01vorbis') or Opus ('OpusHead') — and the LAST page's
    granule position counts total PCM samples (at 48 kHz for Opus), so
    duration needs only a bounded tail scan, no packet decode."""
    import struct

    if p[:4] != b"OggS" or len(p) < 28:
        return None
    nsegs = p[26]
    seg_table = p[27 : 27 + nsegs]
    if len(seg_table) < nsegs:
        return None
    payload = p[27 + nsegs : 27 + nsegs + sum(seg_table)]
    sr = ch = None
    granule_rate = None
    if payload[:7] == b"\x01vorbis" and len(payload) >= 16:
        ch = payload[11]
        (sr,) = struct.unpack_from("<I", payload, 12)
        granule_rate = sr  # granules are PCM samples at sr
    elif payload[:8] == b"OpusHead" and len(payload) >= 16:
        # >= 16 so the 4-byte input-rate read below is in-bounds (a
        # spec-valid OpusHead is >= 19 bytes; a 13-15 byte fragment
        # previously raised struct.error and degraded the row to opaque)
        ch = payload[9]
        (sr,) = struct.unpack_from("<I", payload, 12)  # input rate
        granule_rate = 48000  # Opus granules are always 48 kHz
    else:
        return None
    if not sr or not ch:
        return None
    dur_ms = None
    tail = p[max(0, len(p) - 65536) :]
    # 'OggS' can occur inside compressed packet bytes, so a bare rfind
    # hit may not be a page header — validate the capture-pattern hit
    # (version byte 0 per RFC 3533 §6, full 27-byte header in bounds)
    # and scan backwards past false positives before trusting the
    # granule. Bounded: each miss shrinks the search window.
    last = tail.rfind(b"OggS")
    while last >= 0:
        if last + 27 <= len(tail) and tail[last + 4] == 0:
            (granule,) = struct.unpack_from("<q", tail, last + 6)
            if granule > 0:
                dur_ms = int(granule * 1000 / granule_rate)
            break
        last = tail.rfind(b"OggS", 0, last)
    return (sr, ch, dur_ms)


def _sniff_flac(p: bytes):
    """(sample_rate, n_channels, est_duration_ms) from the FLAC
    STREAMINFO metadata block (format spec: 'fLaC', then typed blocks;
    STREAMINFO packs 20-bit sample rate, 3-bit channels-1 and a 36-bit
    total-sample count into its final 8-byte bitfield)."""
    if p[:4] != b"fLaC" or len(p) < 8:
        return None
    i, n = 4, len(p)
    while i + 4 <= n:
        last = p[i] & 0x80
        btype = p[i] & 0x7F
        size = int.from_bytes(p[i + 1 : i + 4], "big")
        body = p[i + 4 : i + 4 + size]
        if btype == 0:  # STREAMINFO
            if len(body) < 18:
                return None
            b = body[10:18]
            # bitfield: sr 20 | channels-1 3 | bps-1 5 | total-samples 36
            sr = (b[0] << 12) | (b[1] << 4) | (b[2] >> 4)
            ch = ((b[2] >> 1) & 0x07) + 1
            total = (
                ((b[3] & 0x0F) << 32)
                | (b[4] << 24) | (b[5] << 16) | (b[6] << 8) | b[7]
            )
            if sr == 0:
                return None  # spec: 0 is invalid
            dur_ms = int(total * 1000 / sr) if total else None
            return (sr, ch, dur_ms)
        i += 4 + size
        if last:
            break
    return None


def sniff_media_meta(media: DataFrame) -> DataFrame:
    """Header-level metadata for every payload — NO pixel/sample decode:
    (media_id, kind, fmt, width, height, n_channels, sample_rate,
    n_bytes, est_duration_ms), NULL where the format has no such field.
    Formats sniffed library-free: JPEG (SOF segment walk), PNG (IHDR),
    BMP (DIB), netpbm (text header), WAV (fmt+data chunks, exact
    duration), MP3 (first frame header + size/bitrate estimate), and
    the remaining real-corpus container magics (r12): MP4/ISO-BMFF
    (mvhd duration + first video tkhd dims), Ogg Vorbis/Opus (ID-header
    rate/channels + last-page granule duration), FLAC (STREAMINFO
    bitfield). Unknown magics report fmt='opaque' with byte length
    only. The ingest-side complement of :func:`decode_real_features`:
    resolution/duration filters run on THIS, and only survivors pay
    the decode (sample/pixel decode for these containers stays at the
    adapter seam — soundfile/ffmpeg territory)."""
    import struct

    def one(p: bytes) -> dict:
        r: dict = {
            "fmt": "opaque", "width": None, "height": None,
            "n_channels": None, "sample_rate": None,
            "n_bytes": len(p), "est_duration_ms": None,
        }
        try:
            if p[:2] == b"\xff\xd8":
                # fmt='jpeg' GUARANTEES parsed, positive dimensions: the
                # 2-byte SOI magic alone collides with arbitrary binary,
                # and SOI-without-SOF was indistinguishable from a parse
                # failure (r10 advice) — those stay 'opaque'
                j = _sniff_jpeg(p)
                if j and j[0] > 0 and j[1] > 0:
                    r["fmt"] = "jpeg"
                    r["width"], r["height"], r["n_channels"] = j
            elif p[:8] == _PNG_MAGIC and len(p) >= 24:
                w, h = struct.unpack_from(">II", p, 16)
                color = p[25] if len(p) > 25 else None
                r.update(fmt="png", width=w, height=h,
                         # palette (3) expands to RGB on decode
                         n_channels={0: 1, 2: 3, 3: 3, 4: 2, 6: 4}.get(color))
            elif p[:2] == b"BM" and len(p) >= 26:
                _dib, w, h = struct.unpack_from("<Iii", p, 14)
                # header values are corruption-controlled: non-positive
                # dims stay NULL (never a negative width downstream) and
                # palettized bits<8 keeps n_channels NULL instead of the
                # nonsensical 0 (r10 advice)
                r["fmt"] = "bmp"
                if w > 0 and h != 0:
                    r.update(width=w, height=abs(h))
                if len(p) >= 30:
                    bits = struct.unpack_from("<H", p, 28)[0]
                    if bits == 8:
                        # palettized: expands through the color table to
                        # RGB on decode — report what the decode yields,
                        # matching the palette-PNG convention (r11
                        # review: a bits//8=1 here made a n_channels==3
                        # pre-decode filter drop every palette BMP that
                        # decodes to 3 channels)
                        r["n_channels"] = 3
                    elif bits > 8:
                        r["n_channels"] = bits // 8
            elif p[:2] in (b"P5", b"P6"):
                img_fields = []
                i, n = 2, len(p)
                while len(img_fields) < 2 and i < n:
                    while i < n and p[i : i + 1].isspace():
                        i += 1
                    if p[i : i + 1] == b"#":
                        while i < n and p[i : i + 1] != b"\n":
                            i += 1
                        continue
                    j = i
                    while j < n and not p[j : j + 1].isspace():
                        j += 1
                    img_fields.append(int(p[i:j]))
                    i = j
                r.update(fmt="ppm" if p[:2] == b"P6" else "pgm",
                         width=img_fields[0], height=img_fields[1],
                         n_channels=3 if p[:2] == b"P6" else 1)
            elif p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
                # logical screen descriptor: little-endian u16 dims at
                # 6/8; palette-based like PNG type 3 → 3 channels after
                # expansion. LZW pixel decode stays at the adapter seam.
                w, h = struct.unpack_from("<HH", p, 6)
                r["fmt"] = "gif"
                if w > 0 and h > 0:
                    r.update(width=w, height=h, n_channels=3)
            elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                sr = nch = bits = None
                data_len = None
                for cid, body in _riff_chunks(p):
                    if cid == b"fmt " and len(body) >= 16:
                        _code, nch, sr = struct.unpack_from("<HHI", body, 0)
                        bits = struct.unpack_from("<H", body, 14)[0]
                    elif cid == b"data":
                        data_len = len(body)
                r.update(fmt="wav", sample_rate=sr, n_channels=nch)
                if sr and nch and bits and data_len is not None:
                    r["est_duration_ms"] = int(
                        data_len * 8000 / (sr * nch * bits)
                    )
            elif len(p) >= 12 and p[4:8] == b"ftyp":
                m = _sniff_mp4(p)
                if m:
                    r["fmt"] = "mp4"
                    r["width"], r["height"], r["est_duration_ms"] = m
            elif p[:4] == b"OggS":
                m = _sniff_ogg(p)
                if m:
                    r["fmt"] = "ogg"
                    r["sample_rate"], r["n_channels"], r["est_duration_ms"] = m
            elif p[:4] == b"fLaC":
                m = _sniff_flac(p)
                if m:
                    r["fmt"] = "flac"
                    r["sample_rate"], r["n_channels"], r["est_duration_ms"] = m
            else:
                m = _sniff_mp3(p)
                if m:
                    r["fmt"] = "mp3"
                    r["sample_rate"], r["n_channels"], r["est_duration_ms"] = m
        except (ValueError, IndexError, struct.error):
            pass  # malformed header: opaque with whatever parsed
        return r

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "media_id", "kind", "fmt", "width", "height",
                    "n_channels", "sample_rate", "n_bytes", "est_duration_ms",
                )
            }
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                r = one(bytes(payload) if payload is not None else b"")
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                for k in ("fmt", "width", "height", "n_channels",
                          "sample_rate", "n_bytes", "est_duration_ms"):
                    out[k].append(r[k])
            yield pd.DataFrame(out)

    return media.mapInPandas(
        sniff,
        schema="media_id long, kind string, fmt string, width int, "
        "height int, n_channels int, sample_rate int, n_bytes long, "
        "est_duration_ms long",
    )


# ---------------------------------------------------------------------------
# Pluggable external-codec adapters (r10 verdict task 3): the library-free
# decoders above cover netpbm/PNG-8/BMP-24/WAV; JPEG, MP3 and the exotic
# variants genuinely need an external codec (PIL, soundfile, ffmpeg — all
# public), which this container does not ship. Instead of hard-coding that
# boundary, deployments REGISTER an adapter per format: `claims(payload)`
# decides by magic/header whether the adapter owns the payload, `decode`
# returns the same (fmt, image-array-or-None, (sample_rate, samples)-or-
# None) tuple the built-ins produce. Resolution order inside
# decode_real_features: built-in library-free decoders first (tested,
# deterministic), then registered adapters in registration order — both
# on an unclaimed magic AND when a built-in raises on a claimed-but-
# exotic body (e.g. 16-bit PNG, which PIL can decode). Strict mode raises
# only when NEITHER a built-in NOR an adapter claims the payload.
# ---------------------------------------------------------------------------

_DECODER_REGISTRY: dict[str, tuple] = {}  # name -> (claims, decode)


def register_decoder(name: str, claims, decode) -> None:
    """Register (or replace, by name) an external-codec adapter.

    ``claims(payload: bytes) -> bool`` must be a cheap header/magic test;
    ``decode(payload: bytes) -> (fmt, img, audio)`` with ``img`` a numpy
    HxW[xC] uint8 array or None and ``audio`` a ``(sample_rate,
    samples-ndarray)`` tuple or None — the built-ins' contract. Any
    exception an adapter raises is treated as "could not decode" for
    that payload (third-party codecs throw freely on corrupt bodies; a
    corrupt row must never abort the job)."""
    _DECODER_REGISTRY[name] = (claims, decode)


def unregister_decoder(name: str) -> None:
    _DECODER_REGISTRY.pop(name, None)


def register_default_adapters() -> list[str]:
    """Best-effort registration of adapters over PUBLIC libraries when
    importable — PIL (JPEG + every PNG/BMP variant) and soundfile
    (MP3/OGG/FLAC). A no-op returning [] in environments without them
    (this container); the pytest suite exercises the hook path with a
    stub adapter instead, so the plumbing is tested either way."""
    added: list[str] = []
    try:  # pragma: no cover - PIL not in this container
        import io

        from PIL import Image  # noqa: PLC0415

        def _pil_claims(p: bytes) -> bool:
            return p[:2] == b"\xff\xd8" or p[:8] == _PNG_MAGIC or p[:2] == b"BM"

        def _pil_decode(p: bytes):
            img = Image.open(io.BytesIO(p))
            arr = np.asarray(img.convert("RGB" if img.mode not in ("L", "I;16") else "L"))
            return (img.format.lower() if img.format else "image", arr, None)

        register_decoder("pil", _pil_claims, _pil_decode)
        added.append("pil")
    except ImportError:
        pass
    try:  # pragma: no cover - soundfile not in this container
        import io

        import soundfile  # noqa: PLC0415

        def _sf_claims(p: bytes) -> bool:
            return (
                _sniff_mp3(p) is not None
                or p[:4] == b"OggS"
                or p[:4] == b"fLaC"
                or (p[:4] == b"RIFF" and p[8:12] == b"WAVE")
            )

        def _sf_decode(p: bytes):
            samples, sr = soundfile.read(io.BytesIO(p), dtype="float32")
            if samples.ndim > 1:  # downmix to mono like the WAV built-in
                samples = samples.mean(axis=1)
            return ("audio", None, (int(sr), samples))

        register_decoder("soundfile", _sf_claims, _sf_decode)
        added.append("soundfile")
    except ImportError:
        pass
    return added


def decode_real_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract with REAL decoders where the format
    allows: netpbm images (P5/P6 magic), 8/16-bit non-interlaced PNG —
    gray/RGB(A), 8-bit palette (stdlib zlib inflate + numpy
    de-filtering; palette indexes expand through PLTE in one gather,
    16-bit samples recombine big-endian, r11) — and
    uncompressed 24-bit or 8-bit-palette BMP ('BM', color-table gather,
    r11) yield true width/height and pixel mean/std; WAV ('RIFF..WAVE') in PCM-16, IEEE-float32 or G.711 µ-law
    yields true sample_rate, sample count and RMS (RMS in each format's
    native units: int16 linear for PCM/µ-law, [-1, 1] float for f32) —
    all pure numpy/stdlib, decoded inside the same Arrow-batched map as
    the stub path. Payloads in formats that genuinely need external
    codec libraries (JPEG/MP3, sub-byte/interlaced PNG, RLE/bitfield
    BMP, ADPCM) consult the REGISTERED external-codec adapters
    (:func:`register_decoder` / :func:`register_default_adapters`) next,
    then fall through to the documented stub boundary: ``strict=True``
    raises ``NotImplementedError`` there, else deterministic byte-level
    fake features with ``fmt='opaque'``. One output row per media row;
    columns not applicable to a modality are NULL.

    The adapter set is SNAPSHOTTED into the closure at plan-construction
    time: cloudpickle ships the adapter callables with the task, so the
    plan decodes identically on a multi-executor cluster where the
    module global would re-import empty on each worker."""

    import struct
    import zlib

    adapters = tuple(_DECODER_REGISTRY.items())

    # every error a malformed-but-magic-bearing payload can raise inside
    # the library-free decoders; anything here means "this payload needs
    # the external-codec seam", NEVER a worker crash (the r10 review
    # found the PNG branch catching only ValueError while zlib.error /
    # struct.error aborted the whole job, and the WAV branch catching
    # nothing at all)
    _DECODE_ERRORS = (ValueError, IndexError, struct.error, zlib.error)

    def _try_decode(p: bytes) -> tuple | None:
        """(fmt, img-or-None, audio-or-None) for a recognized magic that
        parsed, None when no library-free decoder claims the payload;
        raises one of _DECODE_ERRORS for a claimed-but-malformed one."""
        if p[:2] in (b"P5", b"P6"):
            img = decode_image_netpbm(p)
            return ("ppm" if img.ndim == 3 else "pgm", img, None)
        if p[:8] == _PNG_MAGIC:  # 8-byte magic: collision-proof
            return ("png", decode_image_png(p), None)
        if p[:2] == b"BM" and len(p) >= 54:
            # 2-byte magic alone collides with random payloads ~1/65k —
            # the 54-byte header minimum plus the decoder's own
            # dib/bits/compression validation gate the branch
            return ("bmp", decode_image_bmp(p), None)
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            code, sr, samples = _parse_wav(p)
            name = {_WAV_IEEE_FLOAT: "wav_f32", _WAV_MULAW: "wav_ulaw"}.get(
                code, "wav"
            )
            return (name, None, (sr, samples))
        return None

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "kind", "fmt", "width", "height",
                    "px_mean", "px_std", "sample_rate", "n_samples", "rms",
                )
            }
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                row = dict.fromkeys(out)
                row["media_id"], row["kind"] = media_id, kind
                p = bytes(payload) if payload is not None else b""
                try:
                    decoded = _try_decode(p)
                except _DECODE_ERRORS:
                    decoded = None  # claimed magic, exotic/corrupt body
                if decoded is None:
                    # registered external-codec adapters, registration
                    # order; ANY adapter exception = "could not decode
                    # this payload", never a job abort
                    for _name, (claims, decode) in adapters:
                        try:
                            if not claims(p):
                                continue
                            fmt_c, img_c, audio_c = decode(p)
                            # validate the contract HERE: a malformed
                            # adapter result (None/None media, bad array
                            # rank, non-numeric audio) is "could not
                            # decode this payload" for THIS adapter —
                            # never a TypeError that aborts the job at
                            # the feature step below (r11 review)
                            if img_c is not None:
                                img_c = np.asarray(img_c)
                                if img_c.ndim not in (2, 3) or img_c.size == 0:
                                    raise ValueError("bad adapter image")
                            if audio_c is not None:
                                sr_c, samples_c = audio_c
                                audio_c = (int(sr_c), np.asarray(samples_c))
                            if img_c is None and audio_c is None:
                                raise ValueError("adapter returned no media")
                            decoded = (str(fmt_c), img_c, audio_c)
                            break
                        except Exception:
                            continue
                if decoded is not None:
                    fmt, img, audio = decoded
                    row["fmt"] = fmt
                    if img is not None:
                        row["height"], row["width"] = img.shape[0], img.shape[1]
                        row["px_mean"] = float(img.mean())
                        row["px_std"] = float(img.std())
                    else:
                        sr, samples = audio
                        row["sample_rate"] = sr
                        row["n_samples"] = len(samples)
                        row["rms"] = float(
                            np.sqrt(np.mean(samples.astype(np.float64) ** 2))
                        ) if len(samples) else 0.0
                elif strict:
                    raise NotImplementedError(
                        "no built-in decoder or registered adapter "
                        "claims this payload: needs an external codec "
                        "(register_decoder / register_default_adapters) "
                        "or is corrupt"
                    )
                else:
                    a = np.frombuffer(p, dtype=np.uint8)
                    row["fmt"] = "opaque"
                    row["px_mean"] = float(a.mean()) if len(a) else 0.0
                    row["n_samples"] = len(a)
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        extract,
        schema="media_id long, kind string, fmt string, width int, "
        "height int, px_mean double, px_std double, sample_rate int, "
        "n_samples long, rms double",
    )
