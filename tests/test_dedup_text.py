"""Unit tests for the dedup suite and text-analysis functions on planted
fixtures (the parity suite checks oracle equality on the driver tables;
these check the *semantics* on controlled inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.functions import text as T
from go_vectorsearch_spark.operators import dedup as DD

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm window sill and the birds sing in the garden "
    "meanwhile the river runs past the old stone bridge under grey skies "
    "and children play beside the market square until the evening bells "
    "ring out across the quiet town calling everyone home for supper"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-token edit => jaccard ~0.9
OTHER = "completely different content about spark shuffle partitions and joins etc"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE),  # exact dup of 1
            (3, NEAR),  # near dup of 1
            (4, OTHER),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(docs):
    stats = DD.exact_dedup_stats(docs).head()
    assert (stats["n_docs"], stats["n_unique"], stats["n_dups"]) == (4, 3, 1)
    kept = sorted(r["doc_id"] for r in DD.exact_dedup(docs).collect())
    assert kept == [1, 3, 4]  # min doc_id survives per text


def test_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical texts
    assert pairs[(1, 3)] > 0.5  # one-token edit
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_jaccard_hot_shingle_cap(docs):
    # capping shingle frequency at 1 removes every shingle shared by the
    # exact-dup pair => no pairs survive
    out = DD.jaccard_pairs(docs, threshold=0.01, max_shingle_freq=1).collect()
    assert out == []


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    # identical docs share every band; the one-token edit shares >=1 of 4
    # bands with overwhelming probability at jaccard ~0.9
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    assert (1, 4) not in pairs


def test_minhash_signature_determinism(spark, docs):
    sig = docs.select(DD.minhash_signature(F.col("text")).alias("s")).collect()
    sig2 = docs.select(DD.minhash_signature(F.col("text")).alias("s")).collect()
    assert [r["s"] for r in sig] == [r["s"] for r in sig2]
    assert all(len(r["s"]) == len(DD.MINHASH_PERMS) for r in sig)
    assert all(0 <= v < DD.MINHASH_P for r in sig for v in r["s"])


def test_simhash_pairs(docs):
    sims = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs).collect()}
    assert sims[1] == sims[2]  # identical token sets
    assert all(0 <= v < (1 << DD.SIMHASH_BITS) for v in sims.values())
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"] for r in DD.simhash_pairs(docs).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs


def test_embedding_neardup(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),  # ~same direction as 1
            (3, [0.0, 1.0, 0.0]),  # orthogonal
            (4, [0.0, 0.0, 0.0]),  # zero vector: must not divide by zero
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in DD.embedding_neardup_pairs(emb, threshold=0.9).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.99


def test_quality_and_langid(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is in the house"), (2, "der hund und die katze ist")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            T.lang_id(T.ws_tokens(F.col("text"))).alias("lang"),
            T.quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] == "de"
    assert 0.0 <= rows[1]["q"] <= 1.0


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a"), (4, "hello")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]  # deterministic
    assert fps[1] != fps[3]  # order-sensitive (rolling, not bag-of-words)
    # single-token doc: fold seeds with the token hash itself
    assert fps[4] == int("5d41402a", 16)  # md5('hello') prefix


def test_neardup_components_and_dedup(spark):
    from go_vectorsearch_spark.operators.dedup import neardup_components, neardup_dedup

    # two clusters: {1,2,3} via chain 1-2, 2-3 and {7,9}; 5 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    comp = {
        r["doc_id"]: r["component"] for r in neardup_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    # the distributed label-propagation path (forced past the driver
    # union-find guard) must produce identical labels
    comp_dist = {
        r["doc_id"]: r["component"]
        for r in neardup_components(pairs, collect_threshold=0).collect()
    }
    assert comp_dist == comp

    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in (1, 2, 3, 5, 7, 9)], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in neardup_dedup(docs, pairs).collect())
    assert kept == [1, 5, 7]  # min id per cluster + untouched rows


def test_neardup_components_persist_ownership(spark):
    """neardup_components must release ONLY a persist it added (r14):
    it unconditionally unpersisted the caller's pairs frame, silently
    evicting the registry's session-cached jaccard frame — every later
    consumer then recomputed the whole pair pipeline per action while
    the cache dict still claimed a materialized frame."""
    from pyspark import StorageLevel

    from go_vectorsearch_spark.operators.dedup import neardup_components

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")

    # caller-persisted frame survives the call (both code paths)
    mine = pairs.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    mine.count()
    neardup_components(mine).collect()
    assert mine.storageLevel.useMemory, "caller persist evicted (driver path)"
    neardup_components(mine, collect_threshold=0).collect()
    assert mine.storageLevel.useMemory, "caller persist evicted (dist path)"
    mine.unpersist()

    # an unpersisted input comes back unpersisted (the function's own
    # scratch persist is released)
    lazy = pairs.select("id_a", "id_b")
    neardup_components(lazy).collect()
    assert not (lazy.storageLevel.useMemory or lazy.storageLevel.useDisk)


def test_neardup_dedup_end_to_end(spark, docs):
    """Full pipeline: jaccard pairs over the planted fixture -> dedup
    keeps doc 1 (min of the {1,2,3} near-dup cluster) and doc 4."""
    from go_vectorsearch_spark.operators.dedup import jaccard_pairs, neardup_dedup

    pairs = jaccard_pairs(docs, threshold=0.5)
    kept = sorted(r["doc_id"] for r in neardup_dedup(docs, pairs).collect())
    assert kept == [1, 4]


def test_jaccard_default_cap_not_binding_at_sf001(spark, sf_correct):
    """The registry query runs with the default hot-shingle cap; at the
    correctness sf the most frequent shingle is far below the cap, so the
    capped plan is value-identical to the uncapped oracle (asserted here
    rather than trusted)."""
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    sh = docs.select(F.explode(DD.shingles(F.col("text"))).alias("s"))
    max_freq = sh.groupBy("s").count().agg(F.max("count")).head()[0]
    assert max_freq < DD.DEFAULT_MAX_SHINGLE_FREQ


def test_jaccard_cap_bounds_hot_key_fanout(spark):
    """A synthetic hot shingle shared by every doc: uncapped, every pair
    is a candidate (quadratic); capped, docs that share ONLY the hot
    shingle produce no pair while genuinely-similar pairs survive."""
    hot = "common boilerplate footer"
    rows = [(i, f"unique{i} text number{i} " + hot) for i in range(1, 21)]
    rows.append((100, "unique1 text number1 " + hot))  # near-dup of doc 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = DD.jaccard_pairs(docs, threshold=0.2, max_shingle_freq=10).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1, 100) in got  # real near-dup survives the cap
    # boilerplate-only overlaps are gone: candidate set is tiny, not ~20^2
    assert len(got) < 5
    uncapped = DD.jaccard_pairs(docs, threshold=0.01, max_shingle_freq=None).count()
    assert uncapped == 21 * 20 // 2  # every pair shares the hot shingle


def test_embedding_neardup_multiblock_equals_singleblock(spark):
    """The distributed block-pair GEMM must emit the same pairs whatever
    the blocking factor (1 block == the old all-in-one shape)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(6, 8)
    rows = []
    # plant dup pairs as (i, i+6): with rows_per_block=3 -> 4 blocks
    # (id mod 4), pairs like (3, 9) put the LARGER id in the LOWER block
    # (9%4=1 < 3%4=3) — the case a cross-block ia<ib filter would drop
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 6, [float(x) for x in v + rng.randn(8) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    single = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in DD.embedding_neardup_pairs(emb, threshold=0.9, rows_per_block=100).collect()
    }
    multi = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in DD.embedding_neardup_pairs(emb, threshold=0.9, rows_per_block=3).collect()
    }
    assert single == multi
    assert all((i, i + 6) in single for i in range(6))  # planted dups found


def test_embedding_neardup_lsh_recall(spark):
    """LSH-bucketed approximate variant finds planted near-identical
    pairs (same bucket with overwhelming probability at cosine ~1)."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.randn(8, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.randn(16) * 1e-4]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_neardup_pairs(emb, threshold=0.99).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_neardup_pairs_lsh(emb, threshold=0.99, n_bits=4).collect()
    }
    assert approx <= exact  # no false pairs: verification is exact cosine
    assert len(approx & exact) / len(exact) == 1.0  # cosine~1 pairs always collide


def test_neardup_components_raises_when_budget_exhausted(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.neardup_components(chain, max_rounds=1, collect_threshold=0)
    comp = {r["doc_id"]: r["component"] for r in DD.neardup_components(chain).collect()}
    assert set(comp.values()) == {1}  # one chain, one component


def test_minhash_excludes_shingleless_docs(spark):
    """Docs with <3 tokens have no shingles: they must not band-collide
    via the sentinel signature (quadratic candidates) nor produce 0/0
    Jaccard rows — they simply can't pair."""
    docs = spark.createDataFrame(
        [(1, "hi"), (2, "ok"), (3, "no"), (4, "yo")]
        + [(10 + i, "the quick brown fox jumps over the lazy dog") for i in range(2)],
        "doc_id long, text string",
    )
    pairs = DD.minhash_lsh_pairs(docs).collect()
    ids_in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert ids_in_pairs == {10, 11}          # only the real dup pair
    assert all(r["jaccard"] is not None for r in pairs)


def test_simhash_pairs_hot_band_cap(spark):
    """Empty docs all sketch to 0 → one degenerate band bucket feeding
    m²/2 join rows. The cap drops hot buckets (losing only pairs whose
    EVERY agreeing band is hot) while normal near-dup pairs survive."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, "") for i in range(1, 31)] + [
        (100, base),
        (101, base),  # identical text -> hamming 0, pair guaranteed
        (102, "completely different text about spark catalyst plans here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = DD.simhash_pairs(df)
    capped = DD.simhash_pairs(df, max_band_freq=10)
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # uncapped: the 30 empty docs are pairwise hamming-0 -> 435 pairs
    assert sum(1 for a, b in un if a < 31 and b < 31) == 435
    # capped: the degenerate bucket (30 > 10) is dropped entirely...
    assert not any(a < 31 and b < 31 for a, b in cp)
    # ...but real near-dup pairs still come through both ways
    assert (100, 101) in un and (100, 101) in cp
    assert cp <= un


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style, operators/dedup.semantic_dedup)
# ---------------------------------------------------------------------------


def _naive_greedy(ids, mat, threshold):
    """Independent O(n²) reference: ascending-id greedy, no chunking."""
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    mat = mat / norms
    order = np.argsort(ids)
    kept, out = [], {}
    for i in order:
        best_j, best_s = None, -np.inf
        for j in kept:
            s = float(mat[i] @ mat[j])
            if s > best_s:
                best_j, best_s = j, s
        if best_j is not None and best_s >= threshold:
            out[int(ids[i])] = (False, int(ids[best_j]), best_s)
        else:
            kept.append(i)
            out[int(ids[i])] = (True, None, None)
    return out


def test_greedy_semantic_matches_naive_across_chunk_boundaries():
    import numpy as np

    from go_vectorsearch_spark.operators.dedup import _greedy_semantic

    rng = np.random.default_rng(7)
    # 40 vectors in 5 noisy families => plenty of near-dups; chunk=8
    # forces both the intra-block and the cross-block kept paths
    fam = rng.normal(size=(5, 16))
    mat = np.vstack([f + rng.normal(scale=0.05, size=(8, 16)) for f in fam])
    ids = np.arange(1000, 1000 + len(mat), dtype=np.int64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    keep, dup_of, max_sim = _greedy_semantic(ids, mat / norms, 0.9, chunk=8)
    ref = _naive_greedy(ids, mat, 0.9)
    for i, vid in enumerate(ids):
        rkeep, rdup, rsim = ref[int(vid)]
        assert keep[i] == rkeep, vid
        if not rkeep:
            assert dup_of[i] == rdup, vid
            assert abs(max_sim[i] - rsim) < 1e-12, vid


def test_semantic_dedup_invariants_and_cross_cluster_miss(spark):
    import numpy as np

    # two clusters; vec 11 duplicates vec 10 in-cluster (dropped), vec 21
    # duplicates vec 10 but lives in the OTHER cluster (kept - the
    # method's documented cross-cluster miss)
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (10, 0, v),
        (11, 0, [0.999, 0.01, 0.0, 0.0]),
        (12, 0, w),
        (21, 1, v),
        (22, 1, w),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, centroid_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in DD.semantic_dedup(df, threshold=0.8).collect()
    }
    assert out[10]["keep"] and out[12]["keep"] and out[22]["keep"]
    assert not out[11]["keep"]
    assert out[11]["dup_of"] == 10 and out[11]["max_kept_sim"] >= 0.8
    assert out[21]["keep"], "cross-cluster near-dup must NOT be examined"
    # survivors of a cluster are pairwise < threshold (greedy guarantee)
    vecs = {vid: np.array(vec) for vid, _cid, vec in rows}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for cid in (0, 1):
        kept = [r for r in out.values() if r["centroid_id"] == cid and r["keep"]]
        for a in kept:
            for b in kept:
                if a["vec_id"] < b["vec_id"]:
                    assert cos(vecs[a["vec_id"]], vecs[b["vec_id"]]) < 0.8
    # duplicates reference an in-cluster kept row with a smaller id
    for r in out.values():
        if not r["keep"]:
            assert out[r["dup_of"]]["keep"]
            assert out[r["dup_of"]]["centroid_id"] == r["centroid_id"]
            assert r["dup_of"] < r["vec_id"]


def test_semantic_dedup_on_real_embeddings_vs_reference(spark, sf_smoke):
    import numpy as np

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    # synthetic deterministic clustering (id mod 3): the operator's
    # contract is per-cluster greedy, independent of HOW rows clustered
    df = emb.select(
        "vec_id",
        (F.col("vec_id") % 3).alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    got = {r["vec_id"]: r for r in DD.semantic_dedup(df, threshold=0.6).collect()}
    rows = df.collect()
    assert len(got) == len(rows)
    for cid in (0, 1, 2):
        sub = [r for r in rows if r["centroid_id"] == cid]
        ids = np.array([r["vec_id"] for r in sub], dtype=np.int64)
        mat = np.array([r["embedding"] for r in sub])
        ref = _naive_greedy(ids, mat, 0.6)
        for vid, (rkeep, rdup, rsim) in ref.items():
            assert got[vid]["keep"] == rkeep, vid
            if not rkeep:
                assert got[vid]["dup_of"] == rdup, vid
                assert abs(got[vid]["max_kept_sim"] - rsim) < 1e-9, vid


# ---------------------------------------------------------------------------
# kNN graph (operators/dedup.knn_graph_exact / knn_graph)
# ---------------------------------------------------------------------------


def test_knn_graph_shapes_and_recall(spark, sf_smoke):
    """Exact graph: every src has exactly k edges, no self edges, edges
    rank by (round-6 cosine desc, dst asc). Approximate (LSH-bucketed)
    graph: edge recall vs exact is high at radius 1 and monotone in
    probe radius."""
    import pyspark.sql.functions as SF

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").limit(300)
    k = 5
    exact = DD.knn_graph_exact(emb, k=k).collect()
    n = emb.count()
    by_src = {}
    for r in exact:
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], []).append(r)
    assert len(by_src) == n
    assert all(len(v) == k for v in by_src.values())

    exact_edges = {(r["src"], r["dst"]) for r in exact}

    def recall(radius):
        g = DD.knn_graph(emb, k=k, n_bits=6, probe_radius=radius).collect()
        edges = {(r["src"], r["dst"]) for r in g}
        return len(edges & exact_edges) / len(exact_edges)

    r1 = recall(1)
    r2 = recall(2)
    assert r1 <= r2 + 1e-9
    assert r2 >= 0.8, f"radius-2 edge recall {r2:.2f}"
    assert r1 >= 0.5, f"radius-1 edge recall {r1:.2f}"


def test_cluster_embeddings_graph(spark):
    """Two tight vector families + one isolate: graph clustering yields
    two multi-member components (min-id labeled) and a singleton."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.02, 0.0]),
        (3, [0.98, 0.03, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.99, 0.02]),
        (50, [0.0, 0.0, 1.0]),  # isolate
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comp = {
        r["vec_id"]: r["component"]
        for r in DD.cluster_embeddings_graph(
            emb, threshold=0.9, k=3, exact=True
        ).collect()
    }
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[50] == 50
    assert len(comp) == len(rows)


def test_cluster_embeddings_graph_no_edges_all_singletons(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    comp = {
        r["vec_id"]: r["component"]
        for r in DD.cluster_embeddings_graph(
            emb, threshold=1.01, k=2, exact=True
        ).collect()
    }
    assert comp == {1: 1, 2: 2}
