"""BPE tokenizer training + encoding over a document corpus.

Completes the vocabulary track (queries.q_vocab_top_terms counts whole
words; this learns SUBWORD merges): byte-pair encoding per Sennrich et
al. 2016, architected the way production tokenizer trainers run on
corpora — the ONLY corpus-scale stage is a word-frequency aggregation
(one explode + one groupBy shuffle of (word, count) pairs; raw text
never moves), and the merge-learning loop runs driver-side over the
BOUNDED top-``max_words`` histogram, exactly like the engine ranks
centroid probes driver-side over the cached centroid set. Encoding is
a narrow Arrow-batched map with the merge table broadcast by closure
and a per-worker word memo (corpora repeat words; each distinct word
is segmented once per worker).

Determinism: pair-count ties break lexicographically, so the learned
merge list is a pure function of the histogram — re-runs, different
partitionings, and different engines agree bit-for-bit (the same
contract as the content-addressed sampling operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# end-of-word marker (Sennrich's </w>): keeps "low"+"er" from merging
# across word boundaries and makes decode lossless
EOW = "</w>"


def word_histogram(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, int]]:
    """Top-``max_words`` (word, count) pairs, count desc then word asc —
    the one corpus-scale stage. Lowercase, split on non-alphanumeric
    runs (the engine's BM25 tokenizer, so lexical search and tokenizer
    training see one view of the text); the groupBy partial-aggregates
    map-side and the cut is a TakeOrdered, never a global sort."""
    from go_vectorsearch_spark.operators.fulltext import tokenize

    rows = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def learn_bpe(
    histogram: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a (word, count) histogram.

    Classic BPE: words start as character sequences + EOW; each round
    merges the globally most frequent adjacent symbol pair (ties →
    lexicographically smallest pair, for determinism). Runs over the
    bounded histogram — cost is O(n_merges x Σ|word|) driver work on
    at most ``max_words`` entries, independent of corpus size."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, count in histogram:
        syms = tuple(word) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(count)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with a learned merge table (pair -> rank):
    repeatedly apply the lowest-rank applicable merge — the standard
    BPE encode, a pure function shared by the driver tests and the
    distributed encoder."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — Arrow-batched narrow map
    (no shuffle); the merge table ships once per worker in the UDF
    closure and a word memo amortizes segmentation across repeats."""
    import re as _re

    from go_vectorsearch_spark.operators.fulltext import TOKEN_SPLIT_RE

    ranks = {pair: i for i, pair in enumerate(merges)}
    split_re = TOKEN_SPLIT_RE

    def run(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        pat = _re.compile(split_re)
        for pdf in batches:
            ids, toks, ns = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in pat.split((text or "").lower()):
                    if not w:
                        continue
                    if w not in memo:
                        memo[w] = segment_word(w, ranks)
                    out.extend(memo[w])
                ids.append(doc_id)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "tokens": pd.Series(toks, dtype="object"),
                    "n_tokens": pd.Series(ns, dtype="int32"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, tokens array<string>, n_tokens int"
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """One-call train: corpus-scale histogram (Spark) -> merge learning
    (driver, bounded input). The learned merges are the tokenizer."""
    return learn_bpe(word_histogram(docs, text_col, max_words), n_merges)
