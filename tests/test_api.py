"""End-to-end service-parity tests: upload -> search -> fetch -> delete ->
refresh over managed versioned tables (reference API surface §2.11)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.api import Engine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = Engine(spark, str(tmp_path_factory.mktemp("engine_root")))
    ids = eng.upload(
        "acme",
        "wiki",
        [
            {"name": "Doc A", "external_id": "a", "document": json.dumps({"title": "alpha", "body": "spark shuffles data between stages"})},
            {"name": "Doc B", "external_id": "b", "document": json.dumps({"title": "beta", "body": "catalyst optimizes logical plans"})},
            {"name": "Doc C", "external_id": "c", "document": json.dumps(["plain", "list", "payload"])},
        ],
    )
    eng.upload("acme", "blog", [{"name": "Post", "external_id": "p", "document": json.dumps("short post")}])
    eng.upload("other", "wiki", [{"name": "X", "external_id": "x", "document": json.dumps("unrelated tenant")}])
    return eng, ids


def test_upload_created_rows(engine):
    eng, ids = engine
    assert ids == [1, 2, 3]
    docs = eng.t["documents"].read()
    assert docs.count() == 5
    emb = eng.t["embeddings"].read()
    assert emb.count() >= 5  # >=1 chunk per document
    # every embedding assigned to a real centroid of some category
    cents = {r["centroid_id"] for r in eng.t["centroids"].read().collect()}
    assert {r["centroid_id"] for r in emb.collect()} <= cents


def test_search_returns_scoped_ranked(engine):
    eng, ids = engine
    res = eng.search("acme", "wiki", "spark shuffles", count=3, nprobe=-1).collect()
    assert 1 <= len(res) <= 3
    got_ids = {r["document_id"] for r in res}
    assert got_ids <= set(ids)  # never leaks other categories/tenants
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    # hydration carries payload + name (server/search.go:285-308)
    assert all(r["payload_json"] for r in res)


def test_search_missing_scope_empty(engine):
    eng, _ = engine
    assert eng.search("nobody", "wiki", "x").count() == 0
    assert eng.search("acme", "nope", "x").count() == 0


def test_fetch_category_names(engine):
    eng, _ = engine
    assert eng.fetch_category_names("acme") == ["blog", "wiki"]
    assert eng.fetch_category_names("other") == ["wiki"]
    assert eng.fetch_category_names("nobody") == []


def test_refresh_index_reassigns(engine):
    eng, _ = engine
    n = eng.refresh_index("acme", "wiki", max_leaf=2)
    assert n >= 1
    # all wiki embeddings now point at the new centroids of that category
    cid = eng._category_id("acme", "wiki")
    cents = eng.t["centroids"].read().filter(F.col("category_id") == cid)
    cent_ids = {r["centroid_id"] for r in cents.collect()}
    docs = eng.t["documents"].read().filter(F.col("category_id") == cid)
    emb = eng.t["embeddings"].read().join(
        docs.select("document_id"), "document_id", "left_semi"
    )
    assert {r["centroid_id"] for r in emb.collect()} <= cent_ids
    # search still works after refresh
    assert eng.search("acme", "wiki", "plans", nprobe=-1).count() >= 1


def test_delete_document_cascades(engine):
    eng, ids = engine
    eng.delete_document(ids[2])
    docs = eng.t["documents"].read()
    assert docs.filter(F.col("document_id") == ids[2]).count() == 0
    emb = eng.t["embeddings"].read()
    assert emb.filter(F.col("document_id") == ids[2]).count() == 0


def test_delete_category_and_owner_cascade(engine):
    eng, _ = engine
    eng.delete_category("acme", "blog")
    assert eng.fetch_category_names("acme") == ["wiki"]
    eng.delete_owner("other")
    assert eng.fetch_category_names("other") == []
    # other tenant's data fully gone, acme's wiki intact
    assert eng.t["owners"].read().filter(F.col("name") == "other").count() == 0
    assert eng.search("acme", "wiki", "spark", nprobe=-1).count() >= 1


def test_embeddings_store_is_quantized(engine):
    """The managed embeddings table must hold codes+range, never float
    vectors (the reference quantizes at decode and stores only bytes,
    ai/aicomms/embed.go:42-50 + compute/quantization.go:71-80)."""
    eng, _ = engine
    emb = eng.t["embeddings"].read()
    assert {"codes", "lo", "hi"} <= set(emb.columns)
    assert "vector" not in emb.columns
    row = emb.head()
    assert all(0 <= c <= 255 for c in row["codes"])
    assert row["lo"] <= 0.0 <= row["hi"]


def test_assign_embedding_ids_no_global_sort(spark):
    """Bulk-ingest id assignment must not funnel the batch through a
    single-partition Window sort; ids are unique and deterministic."""
    from go_vectorsearch_spark.api import assign_embedding_ids

    chunks = spark.createDataFrame(
        [(100 + d, c) for d in range(50) for c in range((d % 3) + 1)],
        "doc_id long, chunk_idx int",
    )
    out = assign_embedding_ids(chunks, base_emb=7, base_doc=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan
    ids = [r["embedding_id"] for r in out.collect()]
    assert len(ids) == len(set(ids))  # unique
    again = [r["embedding_id"] for r in assign_embedding_ids(chunks, 7, 100).collect()]
    assert sorted(ids) == sorted(again)  # deterministic
    assert min(ids) == 7  # first doc, first chunk
