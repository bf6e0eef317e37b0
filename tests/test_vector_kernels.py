"""Unit tests for the vector kernels against an independent numpy
reimplementation of the reference formulas (SURVEY.md §1.3, §2.7).

The numpy golden reproduces, in float32:
  * 0-anchored per-vector range (compute/quantization.go:182-192)
  * clamp + affine map + truncation quantize (compute/quantization.go:8-19)
  * dequantize (compute/quantization.go:47-53)
  * L2 normalize, zero-safe (compute/cosine.go:138-149)
  * cosine similarity (compute/cosine.go:13-57)
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.functions.vector import (
    cosine_similarity,
    dequantize,
    l2_normalize,
    quantize,
    vector_mean,
    vector_range,
)


def golden_range(v: np.ndarray) -> tuple[np.float32, np.float32]:
    lo = np.float32(min(v.min(), 0.0))
    hi = np.float32(max(v.max(), 0.0))
    return lo, hi


def golden_quantize(v: np.ndarray, lo: np.float32, hi: np.float32) -> np.ndarray:
    v = v.astype(np.float32)
    if hi - lo == 0:
        return np.zeros(len(v), dtype=np.int64)
    clamped = np.clip(v, lo, hi).astype(np.float32)
    scaled = ((clamped - lo) / np.float32(hi - lo) * np.float32(255)).astype(np.float32)
    return np.trunc(scaled).astype(np.int64)


def golden_dequantize(q: np.ndarray, lo: np.float32, hi: np.float32) -> np.ndarray:
    return (
        np.float32(lo)
        + (q.astype(np.float32) / np.float32(255)).astype(np.float32) * np.float32(hi - lo)
    ).astype(np.float32)


@pytest.fixture(scope="module")
def vec_rows(spark):
    rng = np.random.default_rng(42)
    vecs = [
        rng.standard_normal(16).astype(np.float32),          # mixed sign
        np.abs(rng.standard_normal(16)).astype(np.float32),  # all positive (0-anchor case)
        -np.abs(rng.standard_normal(16)).astype(np.float32), # all negative
        np.zeros(16, dtype=np.float32),                      # degenerate range
        rng.standard_normal(16).astype(np.float32) * 100,    # large magnitude
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<float>",
    )
    return vecs, df


def test_range_is_zero_anchored(vec_rows):
    vecs, df = vec_rows
    lo, hi = vector_range(F.col("embedding"))
    rows = df.select("vec_id", lo.alias("lo"), hi.alias("hi")).collect()
    for r in rows:
        glo, ghi = golden_range(vecs[r.vec_id])
        assert r.lo == pytest.approx(float(glo), abs=0)
        assert r.hi == pytest.approx(float(ghi), abs=0)
        assert r.lo <= 0.0 <= r.hi  # the observable 0-in-range invariant


def test_quantize_truncation_f32_parity(vec_rows):
    vecs, df = vec_rows
    lo, hi = vector_range(F.col("embedding"))
    rows = (
        df.withColumn("lo", lo)
        .withColumn("hi", hi)
        .select("vec_id", quantize(F.col("embedding"), F.col("lo"), F.col("hi")).alias("q"))
        .collect()
    )
    for r in rows:
        glo, ghi = golden_range(vecs[r.vec_id])
        gq = golden_quantize(vecs[r.vec_id], glo, ghi)
        assert list(r.q) == list(gq), f"vec {r.vec_id}"
        assert all(0 <= c <= 255 for c in r.q)


def test_dequantize_roundtrip_f32_parity(vec_rows):
    vecs, df = vec_rows
    lo, hi = vector_range(F.col("embedding"))
    withq = df.withColumn("lo", lo).withColumn("hi", hi).withColumn(
        "q", quantize(F.col("embedding"), F.col("lo"), F.col("hi"))
    )
    rows = withq.select(
        "vec_id", dequantize(F.col("q"), F.col("lo"), F.col("hi")).alias("dq")
    ).collect()
    for r in rows:
        glo, ghi = golden_range(vecs[r.vec_id])
        gdq = golden_dequantize(golden_quantize(vecs[r.vec_id], glo, ghi), glo, ghi)
        np.testing.assert_array_equal(np.array(r.dq, dtype=np.float32), gdq)
        # reconstruction error bounded by one code step
        step = (float(ghi) - float(glo)) / 255.0
        np.testing.assert_allclose(
            np.array(r.dq), vecs[r.vec_id].astype(np.float64), atol=step + 1e-6
        )


def test_l2_normalize_and_cosine(vec_rows):
    vecs, df = vec_rows
    rows = df.select(
        "vec_id",
        l2_normalize(F.col("embedding")).alias("n"),
        cosine_similarity(F.col("embedding"), F.col("embedding")).alias("self_sim"),
    ).collect()
    for r in rows:
        v = vecs[r.vec_id].astype(np.float64)
        norm = np.linalg.norm(v)
        if norm == 0:
            assert all(x == 0.0 for x in r.n)
            assert r.self_sim == 0.0  # zero-safe guard
        else:
            np.testing.assert_allclose(np.array(r.n), v / norm, rtol=1e-6)
            assert r.self_sim == pytest.approx(1.0, abs=1e-12)


def test_vector_mean_matches_numpy(spark):
    rng = np.random.default_rng(7)
    data = [(int(i % 3), [float(x) for x in rng.standard_normal(8)]) for i in range(30)]
    df = spark.createDataFrame(data, "label int, embedding array<float>")
    got = {r.label: np.array(r.mean_vec) for r in vector_mean(df, ["label"], "embedding").collect()}
    arr = {}
    for lbl, v in data:
        arr.setdefault(lbl, []).append(np.array(v, dtype=np.float32))
    for lbl, vs in arr.items():
        np.testing.assert_allclose(got[lbl], np.mean(vs, axis=0, dtype=np.float64), rtol=1e-6)


# ---------------------------------------------------------------------------
# Binary codec: bit-exact reference layout
# [min f32 LE][max f32 LE][D x uint8] (compute/quantization.go:71-80)
# ---------------------------------------------------------------------------


def test_pack_vector_reference_layout(spark):
    import struct

    from go_vectorsearch_spark.functions.vector import pack_vector_udf

    df = spark.createDataFrame([([0.5, -0.25, 1.0],)], "v array<float>")
    raw = df.select(pack_vector_udf()(F.col("v")).alias("b")).head()["b"]
    lo, hi = struct.unpack("<ff", raw[:8])
    assert (lo, hi) == (-0.25, 1.0)  # 0-anchored range includes 0 already
    assert len(raw) == 8 + 3  # dims = len(bytes) - 8 (ai/aicomms/embed.go:52-54)
    # codes: trunc(((clamp(v)-lo)/(hi-lo))*255) in f32
    # 0.5 -> (0.75/1.25)*255 = 153.0 -> 153; -0.25 -> 0; 1.0 -> 255
    assert list(raw[8:]) == [153, 0, 255]


def test_pack_unpack_roundtrip_matches_expression_path(spark):
    """The numpy f32 codec and the Catalyst f32 expression path must
    produce identical codes - cross-validates both implementations."""
    from go_vectorsearch_spark.functions.vector import (
        pack_vector_udf,
        quantize,
        unpack_vector_udf,
        vector_range,
    )
    from go_vectorsearch_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    lo, hi = vector_range(F.col("embedding"))
    expr_codes = emb.select(
        "vec_id", quantize(F.col("embedding"), lo, hi, "float32").alias("codes")
    )
    packed = emb.select(
        "vec_id", pack_vector_udf()(F.col("embedding")).alias("b")
    ).select("vec_id", unpack_vector_udf()(F.col("b")).alias("u"))
    udf_codes = packed.select("vec_id", F.col("u.codes").alias("codes"))
    a = {r["vec_id"]: r["codes"] for r in expr_codes.collect()}
    b = {r["vec_id"]: r["codes"] for r in udf_codes.collect()}
    assert a == b
    # dequantized floats stay within one quantization step of the input
    check = packed.select("vec_id", "u.lo", "u.hi", "u.vec").collect()
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in check:
        step = (r["hi"] - r["lo"]) / 255.0
        assert all(
            abs(x - y) <= step for x, y in zip(r["vec"], orig[r["vec_id"]])
        )


def test_zero_vector_packs_degenerate_range(spark):
    from go_vectorsearch_spark.functions.vector import pack_vector_udf, unpack_vector_udf

    df = spark.createDataFrame([([0.0, 0.0],)], "v array<float>")
    u = (
        df.select(pack_vector_udf()(F.col("v")).alias("b"))
        .select(unpack_vector_udf()(F.col("b")).alias("u"))
        .head()["u"]
    )
    assert u["lo"] == 0.0 and u["hi"] == 0.0
    assert u["codes"] == [0, 0] and u["vec"] == [0.0, 0.0]
