"""Property-based tests (hypothesis) for the pure-Python kernels whose
semantics must hold for ALL inputs, not just fixtures: quantization
(§1.3), Flatten/Split (server/format.go), and the driver-side k-means.

These run without Spark (driver-side math), so hypothesis can explore
hundreds of cases cheaply.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from go_vectorsearch_spark.operators.documents import flatten, split_text

finite_f32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


# ---------------------------------------------------------------------------
# Quantization semantics (compute/quantization.go:8-19, 47-53, 182-192)
# reproduced here in plain Python exactly as the engine's f64 oracle mode
# ---------------------------------------------------------------------------


def _quant_roundtrip(vec: list[float]):
    lo = float(np.float32(min(min(vec), 0.0)))
    hi = float(np.float32(max(max(vec), 0.0)))
    if hi - lo == 0:
        return lo, hi, [0] * len(vec), [0.0] * len(vec)
    codes = [
        math.floor((min(max(float(x), lo), hi) - lo) / (hi - lo) * 255) for x in vec
    ]
    dq = [lo + c / 255.0 * (hi - lo) for c in codes]
    return lo, hi, codes, dq


@given(st.lists(finite_f32, min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_quantization_invariants(vec):
    lo, hi, codes, dq = _quant_roundtrip(vec)
    # 0-anchored range (reference accumulators start at 0)
    assert lo <= 0.0 <= hi
    # codes are valid uint8
    assert all(0 <= c <= 255 for c in codes)
    # dequantized values stay inside the range and within one step
    step = (hi - lo) / 255.0 if hi > lo else 0.0
    for x, d in zip(vec, dq):
        clamped = min(max(float(x), lo), hi)
        assert lo - 1e-9 <= d <= hi + 1e-9
        assert abs(d - clamped) <= step + 1e-9
    # truncation, not rounding: dequantized never exceeds the clamped input
    for x, d in zip(vec, dq):
        clamped = min(max(float(x), lo), hi)
        assert d <= clamped + 1e-9


# ---------------------------------------------------------------------------
# Flatten (server/format.go:17-89)
# ---------------------------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
        max_size=40,
    ),
)
json_values = st.recursive(
    json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), inner, max_size=4),
    ),
    max_leaves=10,
)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_flatten_total_and_deterministic(value):
    out = flatten(value)
    assert isinstance(out, str)
    assert flatten(value) == out  # deterministic
    # scalar leaves always end with '.' (strings get one appended,
    # null/bool are literal, floats are bare numbers)
    if value is None or isinstance(value, bool):
        assert out.endswith(".")
    if isinstance(value, str):
        assert out.endswith(".")


@given(st.dictionaries(st.text(min_size=1, max_size=6), json_scalars, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
@example(d={"0": None, "Ð": None, "/Ð": None})
def test_flatten_map_sorted_keys(d):
    out = flatten(d)
    # 'key: ' markers appear in sorted-key order. The reference joins map
    # entries with NO separator unless both jdx and idx are non-last
    # (flattenMap, server/format.go:69-88), so markers can alias as
    # substrings of each other ('Ð' inside '/Ð: null.Ð: '); a greedy
    # sequential find proves an increasing assignment exists iff the
    # sorted order is respected, without assuming one-line-per-key.
    pos = 0
    for k in sorted(d):
        marker = f"{k}: "
        i = out.find(marker, pos)
        assert i != -1, f"marker {marker!r} not found after {pos} in {out!r}"
        pos = i + len(marker)


# ---------------------------------------------------------------------------
# Split (server/format.go:91-108)
# ---------------------------------------------------------------------------

word = st.text(alphabet="abcdefg", min_size=1, max_size=6)
line = st.lists(word, min_size=0, max_size=12).map(" ".join)


@given(st.lists(line, min_size=1, max_size=8), st.integers(min_value=10, max_value=400))
@settings(max_examples=200, deadline=None)
def test_split_conservation_and_budget(lines, ctx_num):
    text = "\n".join(lines)
    prefix = "p. "
    chunks = split_text(prefix, text, ctx_num)
    max_words = ((ctx_num * 9) // 10) // 4
    # every chunk starts with the prefix
    assert all(c.startswith(prefix) for c in chunks)
    # conservation: concatenating chunk bodies reproduces every line in order
    body = "".join(c[len(prefix):] for c in chunks)
    assert body.replace(" ", "") == ("\n".join(lines)).replace("\n", " ").replace(" ", "")
    # budget: a chunk only exceeds max_words if a single line does
    for c in chunks:
        n = len(c[len(prefix):].split())
        if n > max_words:
            assert any(len(ln.split()) > max_words for ln in lines)
