"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference is text-only; a 100 TB training-data pipeline carries media
as ``binary`` payload columns with a typed metadata struct, decoding and
feature-extracting inside Arrow-batched ``mapInPandas`` so bytes never
round-trip through the driver. The media codec libraries (PIL, torchaudio,
ffmpeg) are NOT in this container, so the decode step is STUBBED: when the
real library is missing we either raise ``NotImplementedError`` (strict
mode) or compute a clearly-named deterministic fake from the payload bytes
(default) — the Spark-side plumbing (schema, partitioning, UDF signature,
Arrow batch shape) is real and tested either way.

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
# Real decoders for library-free formats (r5). The stub boundary above
# remains for JPEG/PNG/MP3/H.264 — formats that genuinely need PIL/ffmpeg
# — but netpbm images (PGM P5 / PPM P6) and PCM WAV audio decode with
# numpy + the stdlib alone, so for THOSE the seam is real end to end.
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
    depth = 3 if payload[:2] == b"P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * depth, offset=i)
    return raster.reshape((h, w, 3) if depth == 3 else (h, w))


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(int(sample_rate))
        f.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_audio_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV -> (sample_rate, int16 samples of channel 0)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        sr = f.getframerate()
        raw = f.readframes(f.getnframes())
        a = np.frombuffer(raw, dtype=np.int16)
        if f.getnchannels() > 1:
            a = a[:: f.getnchannels()]
    return sr, a


def decode_real_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract with REAL decoders where the format
    allows: netpbm images (P5/P6 magic) yield true width/height and
    pixel mean/std, PCM WAV ('RIFF..WAVE') yields true sample_rate,
    sample count and RMS — both pure numpy/stdlib, decoded inside the
    same Arrow-batched map as the stub path. Payloads in formats that
    need external codec libraries fall through to the documented stub
    boundary: ``strict=True`` raises ``NotImplementedError`` there,
    else deterministic byte-level fake features with ``fmt='opaque'``.
    One output row per media row; columns not applicable to a modality
    are NULL."""

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
                p = bytes(payload)
                if p[:2] in (b"P5", b"P6"):
                    img = decode_image_netpbm(p)
                    row["fmt"] = "ppm" if img.ndim == 3 else "pgm"
                    row["height"], row["width"] = img.shape[0], img.shape[1]
                    row["px_mean"] = float(img.mean())
                    row["px_std"] = float(img.std())
                elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                    sr, samples = decode_audio_wav(p)
                    row["fmt"] = "wav"
                    row["sample_rate"] = sr
                    row["n_samples"] = len(samples)
                    row["rms"] = float(
                        np.sqrt(np.mean(samples.astype(np.float64) ** 2))
                    ) if len(samples) else 0.0
                elif strict:
                    raise NotImplementedError(
                        "payload format needs an external codec "
                        "(PIL/ffmpeg, not in container)"
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
