"""Trainable quality classifier: feature determinism, separation on a
planted corpus, held-out generalization, and plan shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.quality_model import (
    QUALITY_FEATURES,
    quality_features,
    score_quality_model,
    train_quality_classifier,
)

_WORDS = (
    "the of and to in a is that for it spark data table shuffle plan "
    "catalyst document quality corpus model training sample window"
).split()


def _good(rng):
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(30, 80)))


def _bad(rng):
    kind = rng.random()
    if kind < 0.4:  # digit/symbol soup
        return " ".join(
            "".join(rng.choice("0123456789$#@!%^&*") for _ in range(rng.randint(3, 12)))
            for _ in range(rng.randint(10, 40))
        )
    if kind < 0.7:  # shouting boilerplate
        return " ".join("CLICK HERE NOW!!!" for _ in range(rng.randint(8, 25)))
    return "x" * rng.randint(5, 30)  # near-empty run


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(7)
    rows = []
    for i in range(240):
        good = i % 2 == 0
        rows.append((i, _good(rng) if good else _bad(rng), 1 if good else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_features_deterministic_and_bounded(spark, planted):
    a = {r["doc_id"]: tuple(r[f] for f in QUALITY_FEATURES)
         for r in quality_features(planted).collect()}
    b = {r["doc_id"]: tuple(r[f] for f in QUALITY_FEATURES)
         for r in quality_features(planted).collect()}
    assert a == b
    for feats in a.values():
        ar, sr, _ml, _nt, _nc, ur, dr = feats
        for ratio in (ar, sr, ur, dr):
            assert 0.0 <= ratio <= 1.0


def test_classifier_separates_heldout(spark, planted):
    train = planted.filter(F.col("doc_id") % 3 != 0)
    test = planted.filter(F.col("doc_id") % 3 == 0)
    model = train_quality_classifier(train)
    scored = score_quality_model(model, test).join(
        test.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    acc = sum(1 for r in rows if int(r["quality_pred"]) == r["label"]) / len(rows)
    assert acc >= 0.95, f"held-out accuracy {acc}"
    # probabilities order the classes, not just the hard predictions
    good_p = [r["quality_prob"] for r in rows if r["label"] == 1]
    bad_p = [r["quality_prob"] for r in rows if r["label"] == 0]
    assert min(good_p) > max(bad_p) - 0.2


def test_scoring_plan_is_shuffle_free_and_arrow_only(spark, planted):
    model = train_quality_classifier(planted.limit(60))
    plan = (
        score_quality_model(model, planted)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "inference must be a per-row map"
    assert "BatchEvalPython" not in plan


def test_scores_real_corpus(spark, sf_smoke):
    from go_vectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    rng = random.Random(3)
    synth = spark.createDataFrame(
        [(10_000 + i, _good(rng), 1) for i in range(60)]
        + [(20_000 + i, _bad(rng), 0) for i in range(60)],
        "doc_id long, text string, label int",
    )
    model = train_quality_classifier(synth)
    out = score_quality_model(model, docs)
    assert out.count() == docs.count()
    assert out.filter(
        (F.col("quality_prob") < 0) | (F.col("quality_prob") > 1)
    ).count() == 0


def test_degenerate_rows_neither_crash_nor_poison(spark):
    """Empty and NULL text rows produce finite features, train cleanly,
    and score with probabilities strictly inside [0, 1] (a NaN would
    compare false and slip past naive range checks)."""
    import math

    rng = random.Random(5)
    rows = (
        [(i, _good(rng), 1) for i in range(40)]
        + [(100 + i, _bad(rng), 0) for i in range(40)]
        + [(900, "", 0), (901, None, 0), (902, "   ", 0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    feats = quality_features(df).collect()
    for r in feats:
        for f in QUALITY_FEATURES:
            v = r[f]
            assert v is not None and math.isfinite(v), (r["doc_id"], f, v)
    model = train_quality_classifier(df)
    scored = score_quality_model(model, df).collect()
    assert len(scored) == len(rows)
    for r in scored:
        assert math.isfinite(r["quality_prob"]) and 0.0 <= r["quality_prob"] <= 1.0
