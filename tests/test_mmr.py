"""MMR result diversification (operators/search.mmr_select,
Engine.search_diverse, /api/search {"mmr": λ}).

Semantics pinned against a structurally independent naive reference;
engine-level tests pin the λ=1 degeneration (pure relevance ≡ search())
and the page-order contract.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.api import Engine
from go_vectorsearch_spark.operators.search import (
    brute_force_topk_with_vector,
    mmr_select,
)


# -- naive reference --------------------------------------------------------


def _naive_mmr(scores, vectors, k, lam):
    m = [np.asarray(v, dtype=float) for v in vectors]
    m = [v / (np.linalg.norm(v) or 1.0) for v in m]

    def sim(i, j):
        return float(m[i] @ m[j])

    selected = []
    while len(selected) < min(k, len(scores)):
        best, best_val = None, -math.inf
        for i in range(len(scores)):
            if i in selected:
                continue
            red = max((sim(i, j) for j in selected), default=0.0)
            val = lam * scores[i] - (0.0 if not selected else (1 - lam) * red)
            if val > best_val:  # strict: first max wins, like np.argmax
                best, best_val = i, val
        selected.append(best)
    return selected


def test_mmr_matches_naive_randomized():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(2, 30))
        d = 8
        vecs = rng.normal(size=(n, d))
        scores = np.sort(rng.uniform(0, 1, n))[::-1].tolist()  # ranked pool
        for lam in (0.0, 0.3, 0.7, 1.0):
            k = int(rng.integers(1, n + 1))
            got = mmr_select(scores, vecs.tolist(), k, lam)
            assert got == _naive_mmr(scores, vecs.tolist(), k, lam)


def test_mmr_lambda_one_is_relevance_order():
    vecs = np.eye(5).tolist()
    scores = [0.9, 0.8, 0.7, 0.6, 0.5]
    assert mmr_select(scores, vecs, 5, 1.0) == [0, 1, 2, 3, 4]


def test_mmr_demotes_redundant_candidate():
    # candidate 1 is nearly identical to candidate 0 but slightly less
    # relevant; candidate 2 points elsewhere with lower relevance. At
    # λ=0.5 the near-copy's redundancy (~1.0) outweighs its relevance
    # edge, so the diverse direction is picked second.
    vecs = [[1.0, 0.0], [0.999, 0.001], [0.0, 1.0]]
    scores = [1.0, 0.95, 0.6]
    assert mmr_select(scores, vecs, 3, 0.5) == [0, 2, 1]
    # ...while pure relevance keeps the copy second
    assert mmr_select(scores, vecs, 3, 1.0) == [0, 1, 2]


def test_mmr_empty_and_degenerate():
    assert mmr_select([], [], 5, 0.5) == []
    assert mmr_select([1.0], [[0.0, 0.0]], 3, 0.5) == [0]  # zero vector safe


def test_brute_force_topk_with_vector(spark):
    df = spark.createDataFrame(
        [
            (1, 10, [1.0, 0.0]),  # doc 10 chunk: perfect match
            (2, 10, [0.0, 1.0]),  # doc 10 chunk: orthogonal
            (3, 20, [0.7, 0.7]),  # doc 20: diagonal
        ],
        "vec_id long, doc long, embedding array<float>",
    )
    rows = brute_force_topk_with_vector(
        df, [1.0, 0.0], 2, id_col="vec_id", doc_col="doc"
    ).collect()
    by_doc = {r["doc"]: r for r in rows}
    # doc 10's representative vector is its BEST chunk, not the other one
    assert [round(x, 3) for x in by_doc[10]["embedding"]] == [1.0, 0.0]
    assert by_doc[10]["score"] == pytest.approx(1.0)
    assert by_doc[20]["score"] == pytest.approx(0.7 / math.sqrt(0.98))


TEXTS = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "kilo lima mike november oscar papa quebec romeo sierra tango",
    "uniform victor whiskey xray yankee zulu one two three four",
    "five six seven eight nine ten eleven twelve thirteen fourteen",
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(spark, str(tmp_path_factory.mktemp("mmr_root")))
    e.upload(
        "o",
        "c",
        [
            {"name": f"d{i}", "external_id": str(i), "document": json.dumps(t)}
            for i, t in enumerate(TEXTS)
        ],
    )
    return e


def test_search_diverse_lambda_one_equals_search(eng):
    plain = eng.search("o", "c", "alpha query", count=4, nprobe=-1).collect()
    div = eng.search_diverse(
        "o", "c", "alpha query", count=4, nprobe=-1, mmr_lambda=1.0
    ).collect()
    assert [tuple(r) for r in div] == [tuple(r) for r in plain]


def test_search_diverse_schema_and_scores(eng):
    rows = eng.search_diverse(
        "o", "c", "alpha query", count=3, nprobe=-1, mmr_lambda=0.4
    ).collect()
    assert rows and rows[0].__fields__ == [
        "document_id", "name", "external_id", "payload_json", "score",
    ]
    # reported scores are the ORIGINAL relevance, all in cosine range
    assert all(-1.0 <= r["score"] <= 1.0 for r in rows)
    # same document set as the relevance top-k at this count (MMR
    # reorders within the pool; with pool >> count membership may
    # differ, but scores must match per doc)
    plain = {
        r["document_id"]: r["score"]
        for r in eng.search("o", "c", "alpha query", count=20, nprobe=-1).collect()
    }
    for r in rows:
        assert r["score"] == pytest.approx(plain[r["document_id"]])


def test_search_diverse_validates_lambda(eng):
    with pytest.raises(ValueError, match="mmr_lambda"):
        eng.search_diverse("o", "c", "x", mmr_lambda=1.5)


def test_search_diverse_offset_slices_selection_order(eng):
    full = eng.search_diverse(
        "o", "c", "alpha query", count=4, nprobe=-1, mmr_lambda=0.3
    ).collect()
    tail = eng.search_diverse(
        "o", "c", "alpha query", count=2, offset=2, nprobe=-1, mmr_lambda=0.3
    ).collect()
    assert [r["document_id"] for r in tail] == [
        r["document_id"] for r in full[2:]
    ]
