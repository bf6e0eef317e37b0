"""IVF-Flat pipeline invariant tests (SURVEY.md §5: invariants, not
bit-parity - the reference's k-means is wall-clock seeded).

Checked invariants:
  * kmeans returns <= k centroids with the declared schema
  * build_index assigns every row to an existing centroid
  * pruning leaves no leaf under min_leaf (unless a single leaf remains)
  * nprobe = |centroids| search is EXACTLY brute force (the parity case)
  * nprobe=1 recall against brute force is sane (> 0 and self-hit found)
  * partitioned write -> read roundtrip preserves the index and prunes
    partitions at the scan
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.search import brute_force_topk
from go_vectorsearch_spark.plans.ivf import (
    build_index,
    ivf_search,
    kmeans,
    read_index,
    write_partitioned,
)
from go_vectorsearch_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings")


@pytest.fixture(scope="module")
def index(spark, emb):
    return build_index(emb, max_leaf=100, sample_size=500)


@pytest.fixture(scope="module")
def query_vec(emb):
    return emb.filter(F.col("vec_id") == 0).head()["embedding"]


def test_kmeans_shape(spark, emb):
    cents = kmeans(emb, 5, sample_size=500)
    rows = cents.collect()
    assert 1 <= len(rows) <= 5
    assert cents.columns == ["centroid_id", "centroid_vec"]
    assert all(len(r["centroid_vec"]) == 64 for r in rows)
    ids = [r["centroid_id"] for r in rows]
    assert len(set(ids)) == len(ids)


def test_every_row_assigned_to_existing_centroid(index):
    cent_ids = {r["centroid_id"] for r in index.centroids.collect()}
    assigned_ids = {r["centroid_id"] for r in index.assigned.select("centroid_id").distinct().collect()}
    assert assigned_ids <= cent_ids
    assert index.assigned.count() == 500


def test_min_leaf_respected(index):
    sizes = [
        r["cnt"]
        for r in index.assigned.groupBy("centroid_id").agg(F.count("*").alias("cnt")).collect()
    ]
    if len(sizes) > 1:
        assert min(sizes) >= 10  # min_leaf = max_leaf // 10


def test_nprobe_all_equals_brute_force(index, emb, query_vec):
    n_cents = index.centroids.count()
    ivf = ivf_search(index, query_vec, k=10, nprobe=n_cents)
    bf = brute_force_topk(emb, query_vec, 10)
    ivf_rows = [(r["vec_id"], round(r["score"], 9)) for r in ivf.collect()]
    bf_rows = [(r["vec_id"], round(r["score"], 9)) for r in bf.collect()]
    assert ivf_rows == bf_rows


def test_nprobe_one_finds_self(index, query_vec):
    rows = ivf_search(index, query_vec, k=10, nprobe=1).collect()
    assert len(rows) >= 1
    # vec 0 lives in the probed partition (its own nearest centroid)
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == pytest.approx(1.0, abs=1e-9)


def test_partitioned_roundtrip_and_pruning(spark, index, query_vec, tmp_path):
    path = str(tmp_path / "ivf")
    write_partitioned(index, path)
    loaded = read_index(spark, path)
    assert loaded.assigned.count() == index.assigned.count()
    assert loaded.centroids.count() == index.centroids.count()
    res = ivf_search(loaded, query_vec, k=5, nprobe=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or res.count() > 0  # pruned scan executes
    # the pruned scan must read strictly fewer rows than the full table
    probed = loaded.assigned.filter(
        F.col("centroid_id").isin(
            [r["centroid_id"] for r in loaded.centroids.limit(1).collect()]
        )
    )
    assert probed.count() < 500


def test_ivf_search_batch_matches_per_query(spark, index, emb):
    """The batched plan must reproduce ivf_search query-by-query, at
    nprobe=1 and at nprobe=all (where both equal brute force)."""
    from go_vectorsearch_spark.plans.ivf import ivf_search_batch

    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    ]
    n_cents = index.centroids.count()
    for nprobe in (1, n_cents):
        batch = ivf_search_batch(index, queries, k=5, nprobe=nprobe)
        got = {}
        for r in batch.collect():
            got.setdefault(r["q_id"], []).append((r["vec_id"], round(r["score"], 9)))
        for qid, qv in queries:
            single = [
                (r["vec_id"], round(r["score"], 9))
                for r in ivf_search(index, qv, k=5, nprobe=nprobe).collect()
            ]
            assert got[qid] == single, f"q={qid} nprobe={nprobe}"


def test_nearest_centroids_distributed_matches_driver_path(index, query_vec):
    """The TakeOrdered scale path must rank identically to the
    driver-collect path (same score, same (score desc, id asc)
    tie-break)."""
    from go_vectorsearch_spark.plans.ivf import (
        nearest_centroids,
        nearest_centroids_distributed,
    )

    n = index.centroids.count()
    for nprobe in (1, 3, n):
        assert nearest_centroids_distributed(
            index.centroids, query_vec, nprobe
        ) == nearest_centroids(index.centroids, query_vec, nprobe)


def test_write_partitioned_skew_split(spark, index, query_vec, tmp_path):
    """files_per_centroid > 1 spreads a centroid over several files but
    keeps the directory layout (and search results) identical."""
    import os

    path = str(tmp_path / "ivf_skew")
    write_partitioned(index, path, files_per_centroid=3)
    loaded = read_index(spark, path)
    assert loaded.assigned.count() == index.assigned.count()
    # the sub-key spread must produce more data files than centroid
    # dirs (i.e. at least one dir is split across write tasks)
    dirs = [d for d in os.listdir(os.path.join(path, "assigned")) if d.startswith("centroid_id=")]
    n_files = sum(
        len([f for f in os.listdir(os.path.join(path, "assigned", d)) if f.endswith(".parquet")])
        for d in dirs
    )
    assert n_files > len(dirs)
    res = [r["vec_id"] for r in ivf_search(loaded, query_vec, k=5, nprobe=1).collect()]
    base = [r["vec_id"] for r in ivf_search(index, query_vec, k=5, nprobe=1).collect()]
    assert res == base


def test_partitioned_index_prunes_partitions(spark, emb, tmp_path_factory):
    """The written index layout must turn nprobe filters into partition
    pruning: the scan of a partitionBy(centroid_id) table with an isin
    filter shows PartitionFilters, the Spark analog of the reference's
    indexed centroid_id column (database/model.go:16)."""
    from go_vectorsearch_spark.plans.ivf import (
        build_index,
        read_index,
        write_partitioned,
    )

    index = build_index(emb, max_leaf=100, sample_size=500)
    path = str(tmp_path_factory.mktemp("ivf_store"))
    write_partitioned(index, path)
    stored = read_index(spark, path)
    some_id = stored.centroids.select("centroid_id").head()[0]
    pruned = stored.assigned.filter(F.col("centroid_id").isin([int(some_id)]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "centroid_id" in plan.split("PartitionFilters")[1][:200]
    # and the pruned read returns exactly that partition's rows
    expect = index.assigned.filter(F.col("centroid_id") == int(some_id)).count()
    assert pruned.count() == expect


def test_kmeans_mllib_alternate_path(spark, emb):
    """MLlib cosine KMeans is the fully-distributed fit alternative;
    same output contract as the sample-fit path."""
    from go_vectorsearch_spark.operators.assign import assign_nearest
    from go_vectorsearch_spark.plans.ivf import kmeans_mllib

    cents = kmeans_mllib(emb, 5, seed=42)
    rows = cents.collect()
    assert len(rows) == 5
    assert {r["centroid_id"] for r in rows} == set(range(5))
    assert all(len(r["centroid_vec"]) == 64 for r in rows)
    # usable for assignment: every vector lands on a real centroid
    assigned = assign_nearest(emb, cents, out_col="cid")
    got = {r["cid"] for r in assigned.select("cid").distinct().collect()}
    assert got <= set(range(5)) and len(got) >= 2
    # deterministic under a fixed seed
    again = kmeans_mllib(emb, 5, seed=42).collect()
    assert sorted(map(repr, rows)) == sorted(map(repr, again))


def test_mllib_minhash_agrees_with_custom(spark, sf_correct):
    """Cross-check: MLlib's MinHashLSH approxSimilarityJoin finds the
    same high-similarity document pairs as the hand-rolled
    dedup.minhash_lsh_pairs (jaccard >= 0.5 band)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from go_vectorsearch_spark.operators.dedup import minhash_lsh_pairs, shingles
    from go_vectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents")
    ours = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }

    sh = docs.select("doc_id", shingles(F.col("text")).alias("sh"))
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True).fit(sh)
    feats = cv.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    sim = lsh.approxSimilarityJoin(feats, feats, 0.5, distCol="dist")
    theirs = {
        (a, b)
        for a, b in (
            (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
            for r in sim.collect()
        )
        if a < b
    }
    # ours is verified-exact at the threshold; MLlib's approx join must
    # surface every verified pair
    assert ours <= theirs


def test_recenter_quantizes_means(spark):
    """recenter must return the f32 quantize->dequantize round-trip of the
    member mean (the reference re-quantizes saved centroids,
    dnc/dnc.go:402-456), matching the driver-side golden byte-for-byte."""
    from go_vectorsearch_spark.plans.ivf import _quantize_f32_roundtrip, recenter

    rows = [
        (0, [1.0, -2.0, 0.5, 3.25]),
        (0, [0.5, 1.0, -0.25, 0.125]),
        (1, [10.0, 0.0, -5.0, 2.5]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [0.3333333, 0.6666667, 0.1, 0.9]),
    ]
    assigned = spark.createDataFrame(rows, "centroid_id long, embedding array<double>")
    got = {
        r["centroid_id"]: np.array(r["centroid_vec"])
        for r in recenter(assigned, "embedding").collect()
    }
    raw = {
        r["centroid_id"]: np.array(r["centroid_vec"])
        for r in recenter(assigned, "embedding", quantize_output=False).collect()
    }
    for cid, mean_vec in raw.items():
        golden = _quantize_f32_roundtrip(mean_vec.reshape(1, -1))[0]
        assert np.array_equal(got[cid], golden), cid
        # and quantization actually moved at least one non-trivial value
    assert any(not np.array_equal(got[c], raw[c]) for c in raw)


def test_local_and_distributed_build_paths_agree(spark, emb):
    """The adaptive driver-local build (corpus fits the sample budget)
    must produce the same index as the distributed stages: identical
    leaf partitions (up to centroid relabeling across split rounds) and
    the same quantized re-centered vectors. max_leaf=50 forces split
    rounds; min_leaf default prunes, so every stage runs on both paths."""
    loc = build_index(emb, max_leaf=50, sample_size=5000)
    dist = build_index(emb, max_leaf=50, sample_size=5000, _force_distributed=True)

    def parts(ix):
        rows = ix.assigned.select("vec_id", "centroid_id").collect()
        by_c = {}
        for r in rows:
            by_c.setdefault(r["centroid_id"], set()).add(r["vec_id"])
        cents = {
            r["centroid_id"]: np.array(r["centroid_vec"])
            for r in ix.centroids.collect()
        }
        return {frozenset(m): cents[c] for c, m in by_c.items()}

    pl, pd_ = parts(loc), parts(dist)
    assert set(pl.keys()) == set(pd_.keys())
    for m in pl:
        # quantized means may differ by one truncation step where the
        # aggregation-order ulp lands on a code boundary
        assert np.allclose(pl[m], pd_[m], atol=0.05), "centroid vec mismatch"


def test_local_build_is_deterministic_and_schema_stable(spark, emb):
    a = build_index(emb, max_leaf=100, sample_size=5000)
    b = build_index(emb, max_leaf=100, sample_size=5000)
    assert a.assigned.schema == b.assigned.schema
    assert a.assigned.columns == emb.columns + ["centroid_id"]
    ra = sorted(map(tuple, a.assigned.select("vec_id", "centroid_id").collect()))
    rb = sorted(map(tuple, b.assigned.select("vec_id", "centroid_id").collect()))
    assert ra == rb
    ca = sorted(map(repr, a.centroids.collect()))
    cb = sorted(map(repr, b.centroids.collect()))
    assert ca == cb


def test_filtered_search_prefilter_semantics(index, emb, query_vec):
    """where= composes a scalar predicate with the probe as a
    PRE-filter: every hit satisfies the predicate, nprobe=all equals
    filtered brute force, and the top-k is full whenever >= k rows
    match — the guarantee a post-filter over an unfiltered top-k
    breaks (it would return fewer than k rows here: label%7==3 keeps
    only ~1/7 of the corpus, so an unfiltered top-10 rarely holds 10
    matching rows)."""
    pred = F.col("label") % 7 == 3
    n_cents = index.centroids.count()

    filtered = ivf_search(index, query_vec, k=10, nprobe=n_cents, where=pred)
    got = filtered.collect()
    n_matching = emb.filter(pred).count()
    assert len(got) == min(10, n_matching)

    bf = brute_force_topk(emb.filter(pred), query_vec, 10)
    assert [(r["vec_id"], round(r["score"], 9)) for r in got] == [
        (r["vec_id"], round(r["score"], 9)) for r in bf.collect()
    ]

    # post-filtering an unfiltered top-10 demonstrably under-fills
    post = (
        brute_force_topk(emb, query_vec, 10)
        .join(emb.filter(pred).select("vec_id"), "vec_id", "left_semi")
        .collect()
    )
    assert len(post) < len(got)

    # partial probes still honor the predicate on every hit
    partial = (
        ivf_search(index, query_vec, k=10, nprobe=1, where=pred)
        .join(emb.select("vec_id", "label"), "vec_id")
        .collect()
    )
    assert partial and all(row["label"] % 7 == 3 for row in partial)


def test_adaptive_filtered_search_widens_probes(index, emb, query_vec):
    """A selective predicate underfills at nprobe=1; the adaptive
    search widens geometrically until the page fills (or the corpus is
    exhausted), and the final result equals the exact filtered search
    at the widened probe set."""
    from go_vectorsearch_spark.plans.ivf import ivf_search_adaptive

    pred = F.col("label") % 50 == 7  # ~1/50 of rows: forces widening
    n_matching = emb.filter(pred).count()
    k = min(8, n_matching)
    res, used = ivf_search_adaptive(index, query_vec, k=k, nprobe=1, where=pred)
    rows = res.collect()
    assert len(rows) == k
    assert used >= 1
    want = [
        (r["vec_id"], round(r["score"], 9))
        for r in ivf_search(index, query_vec, k=k, nprobe=used, where=pred).collect()
    ]
    assert [(r["vec_id"], round(r["score"], 9)) for r in rows] == want

    # unselective predicate: no widening beyond the initial probe
    res2, used2 = ivf_search_adaptive(
        index, query_vec, k=1, nprobe=1, where=F.col("vec_id") >= 0
    )
    assert used2 == 1 and res2.count() == 1

    # predicate matching fewer than k rows: exhausts probes, returns all
    rare = F.col("vec_id") == 3
    res3, used3 = ivf_search_adaptive(index, query_vec, k=5, nprobe=1, where=rare)
    got3 = res3.collect()
    assert len(got3) == 1 and got3[0]["vec_id"] == 3
    assert used3 == index.centroids.count()


def test_ivf_search_batch_where_matches_per_query(spark, index, emb):
    """Batch where= reproduces ivf_search(where=) per query at
    nprobe=all (both equal filtered brute force)."""
    from go_vectorsearch_spark.plans.ivf import ivf_search_batch

    pred = F.col("label") % 7 == 3
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin([0, 1])).collect()
    ]
    n = index.centroids.count()
    batch = ivf_search_batch(index, queries, k=5, nprobe=n, where=pred)
    got = {}
    for r in batch.collect():
        got.setdefault(r["q_id"], []).append((r["vec_id"], round(r["score"], 9)))
    for qid, qv in queries:
        single = [
            (r["vec_id"], round(r["score"], 9))
            for r in ivf_search(index, qv, k=5, nprobe=n, where=pred).collect()
        ]
        assert got[qid] == single
