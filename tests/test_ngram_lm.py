"""N-gram LM perplexity curation (operators/ngram_lm.py)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.ngram_lm import (
    BACKOFF_ALPHA,
    NgramLM,
    perplexity_score,
    train_ngram_lm,
)

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog sat together on the mat"),
    (4, "the cat and the dog like the mat and the rug"),
]


def _py_counts(texts, order):
    """Independent reference: counts from plain Python loops."""
    tables = [dict() for _ in range(order)]
    total = 0
    for t in texts:
        words = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        total += len(words)
        for n in range(1, order + 1):
            for i in range(len(words) - n + 1):
                g = tuple(words[i : i + n])
                tables[n - 1][g] = tables[n - 1].get(g, 0) + 1
    return tables, total


def test_training_counts_match_python_reference(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    model = train_ngram_lm(df, order=3, max_entries=10_000)
    tables, total = _py_counts([t for _, t in REF], 3)
    assert model.total == total
    for k in range(3):
        assert dict(model.counts[k]) == tables[k]


def test_training_survives_docs_shorter_than_order(spark):
    """Documents with fewer than `order` tokens (one word, punctuation
    only, empty, NULL) must contribute their short grams and nothing
    else — Spark's sequence(1, 0) counts DOWN, so an unguarded slice
    loop throws on the first sub-order document (the pitfall
    dedup._shingles_of_tokens documents; regression for the same bug
    here)."""
    rows = [
        (0, "one"),
        (1, "two words"),
        (2, "now three tokens here"),
        (3, "!!! ..."),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_ngram_lm(df, order=3, max_entries=10_000)
    tables, total = _py_counts([t or "" for _, t in rows], 3)
    assert model.total == total
    for k in range(3):
        assert dict(model.counts[k]) == tables[k]
    # scoring the same frame stays finite / NULL-for-empty
    out = {r["doc_id"]: r for r in perplexity_score(df, model).collect()}
    assert out[0]["n_tokens"] == 1 and out[0]["log2ppl"] is not None
    assert out[4]["log2ppl"] is None and out[5]["log2ppl"] is None


def test_logprob_stupid_backoff_semantics():
    tables, total = _py_counts([t for _, t in REF], 3)
    m = NgramLM(order=3, counts=tuple(tables), total=total)
    # seen trigram: plain ratio
    num = tables[2][("sat", "on", "the")]
    den = tables[1][("sat", "on")]
    assert m.logprob(("sat", "on", "the")) == pytest.approx(math.log2(num / den))
    # unseen trigram, seen bigram: one backoff step
    got = m.logprob(("rug", "the", "cat"))
    want = math.log2(tables[1][("the", "cat")] / tables[0][("the",)]) + math.log2(
        BACKOFF_ALPHA
    )
    assert got == pytest.approx(want)
    # OOV word: finite floor
    assert math.isfinite(m.logprob(("zz", "qq", "xx")))


def test_scoring_matches_driver_reference_and_separates_quality(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    model = train_ngram_lm(df, order=3, max_entries=10_000)

    cands = [
        (10, "the cat sat on the rug"),              # in-domain
        (11, "rug mat dog the a on cat sat"),        # shuffled (disfluent)
        (12, "zzz qqq www eee rrr ttt yyy uuu"),     # gibberish
        (13, ""),                                    # empty -> NULL
    ]
    cdf = spark.createDataFrame(cands, "doc_id long, text string")
    got = {r["doc_id"]: r for r in perplexity_score(cdf, model).collect()}

    # distributed score == driver-side replay of the same model
    for doc_id, text in cands:
        words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        if not words:
            assert got[doc_id]["log2ppl"] is None
            continue
        lp = sum(
            model.logprob(tuple(words[max(0, i - 2) : i]) + (w,))
            for i, w in enumerate(words)
        )
        assert got[doc_id]["log2ppl"] == pytest.approx(-lp / len(words))

    # the curation signal: fluent < shuffled < gibberish
    assert got[10]["log2ppl"] < got[11]["log2ppl"] < got[12]["log2ppl"]


def test_bounded_model_and_narrow_scoring_plan(spark, sf_smoke):
    from go_vectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    model = train_ngram_lm(docs, order=2, max_entries=50)
    assert len(model.counts[0]) <= 50 and len(model.counts[1]) <= 50
    plan = (
        perplexity_score(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # scoring never shuffles
