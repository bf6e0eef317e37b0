"""BPE tokenizer training + encoding (operators/bpe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.bpe import (
    EOW,
    bpe_encode,
    learn_bpe,
    segment_word,
    train_bpe,
    word_histogram,
)


def _naive_reference_bpe(histogram, n_merges):
    """Independent O(rounds x vocab) reference: counts every pair from
    scratch each round, merges via string join on a spaced
    representation — structurally different from the operator's tuple
    implementation."""
    words = {" ".join(list(w) + [EOW]): c for w, c in histogram}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for spaced, c in words.items():
            syms = spaced.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0
                ) + c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        old = f"{best[0]} {best[1]}"
        new = best[0] + best[1]
        nxt = {}
        for spaced, c in words.items():
            toks = spaced.split(" ")
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == best[0] and toks[i + 1] == best[1]:
                    out.append(new); i += 2
                else:
                    out.append(toks[i]); i += 1
            key = " ".join(out)
            nxt[key] = nxt.get(key, 0) + c
        words = nxt
    return merges


HIST = [("lower", 6), ("low", 8), ("newest", 5), ("widest", 4), ("new", 3)]


def test_learn_bpe_matches_independent_reference():
    assert learn_bpe(HIST, 12) == _naive_reference_bpe(HIST, 12)
    # determinism incl. tie-breaks
    assert learn_bpe(HIST, 12) == learn_bpe(list(HIST), 12)


def test_segment_roundtrip_and_monotone_compression():
    merges = learn_bpe(HIST, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _c in HIST:
        toks = segment_word(w, ranks)
        # lossless: concatenation reproduces word + EOW
        assert "".join(toks) == w + EOW
    # more merges never increase a trained word's token count
    prev = None
    for k in (0, 5, 10, 20):
        r = {p: i for i, p in enumerate(learn_bpe(HIST, k))}
        n = sum(len(segment_word(w, r)) for w, _ in HIST)
        if prev is not None:
            assert n <= prev
        prev = n


def test_end_to_end_training_and_encoding(spark, sf_smoke):
    """Corpus-scale histogram -> merges -> distributed encode: encode
    output matches driver-side segmentation of the same text, token
    streams reassemble the tokenized text, and the result is invariant
    to partitioning."""
    from go_vectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text").limit(50)
    merges = train_bpe(docs, n_merges=200, max_words=5000)
    assert len(merges) > 50

    enc = bpe_encode(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    ranks = {p: i for i, p in enumerate(merges)}

    import re

    from go_vectorsearch_spark.operators.fulltext import TOKEN_SPLIT_RE

    for doc in docs.collect()[:10]:
        want = []
        for w in re.split(TOKEN_SPLIT_RE, (doc["text"] or "").lower()):
            if w:
                want.extend(segment_word(w, ranks))
        got = rows[doc["doc_id"]]
        assert list(got["tokens"]) == want
        assert got["n_tokens"] == len(want)

    repart = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(docs.repartition(7), merges).collect()
    }
    assert repart == {d: list(r["tokens"]) for d, r in rows.items()}


def test_histogram_is_one_shuffle_and_encode_is_narrow(spark, sf_smoke):
    from go_vectorsearch_spark.operators.fulltext import tokenize
    from go_vectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    hist_df = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
    )
    plan = hist_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle of (word, count)

    enc_plan = (
        bpe_encode(docs, [("a", "b")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in enc_plan
