"""Content-defined chunking + sub-document dedup (operators/cdc.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.cdc import (
    cdc_boundaries,
    cdc_chunks,
    cdc_dup_stats,
)


def _mk_text(seed: str, n: int) -> str:
    out = []
    h = seed
    while sum(len(x) for x in out) < n:
        h = hashlib.md5(h.encode()).hexdigest()
        out.append(h + " ")
    return "".join(out)[:n]


def test_boundaries_deterministic_and_bounded():
    data = _mk_text("a", 20_000).encode()
    cuts = cdc_boundaries(data, min_size=64, avg_size=256, max_size=1024)
    assert cuts == cdc_boundaries(data, min_size=64, avg_size=256, max_size=1024)
    assert cuts[-1] == len(data)
    sizes = [b - a for a, b in zip([0] + cuts[:-1], cuts)]
    assert all(64 <= s <= 1024 for s in sizes[:-1])
    assert 1 <= sizes[-1] <= 1024
    # avg roughly near target (loose band; gear hash, not exact)
    assert 100 <= len(data) / len(sizes) <= 700
    with pytest.raises(ValueError, match="power of two"):
        cdc_boundaries(b"xy", avg_size=100)


def test_chunks_roundtrip_and_match_python_reference(spark):
    docs = [
        (1, _mk_text("x", 5000)),
        (2, "short"),
        (3, ""),
        (4, "héllo wörld " * 400 + "末尾の文字"),  # multi-byte safety
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = cdc_chunks(df, keep_text=True).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in docs:
        got = sorted(by_doc[doc_id], key=lambda r: r["chunk_ix"])
        # lossless reassembly
        assert "".join(r["chunk_text"] for r in got) == text
        # hash/len consistency
        for r in got:
            raw = r["chunk_text"].encode("utf-8")
            assert r["chunk_len"] == len(raw)
            assert r["chunk_hash"] == hashlib.md5(raw).hexdigest()
    # empty doc is represented (one empty chunk)
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_len"] == 0


def test_shared_passage_detected_despite_offset_shift(spark):
    """The CDC promise: a passage shared by two documents at DIFFERENT
    byte offsets produces identical interior chunks in both — a prefix
    insertion must not shift every boundary (fixed-width chunking
    fails exactly this)."""
    shared = _mk_text("shared", 8000)
    docs = [
        (1, shared),
        (2, _mk_text("prefix", 1700) + shared),
        (3, _mk_text("unrelated", 8000)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    chunks = cdc_chunks(df)
    h = {
        d: {r["chunk_hash"] for r in rs}
        for d, rs in _group(chunks.collect()).items()
    }
    overlap_12 = len(h[1] & h[2]) / len(h[1])
    overlap_13 = len(h[1] & h[3]) / len(h[1])
    assert overlap_12 > 0.8, f"shared passage lost: {overlap_12:.2f}"
    assert overlap_13 == 0.0

    stats = {r["doc_id"]: r for r in cdc_dup_stats(chunks).collect()}
    # doc 1 owns the shared chunks (min id); doc 2 carries the dup mass
    assert stats[2]["dup_frac"] > 0.7
    assert stats[1]["dup_chunks"] == 0
    assert stats[3]["dup_chunks"] == 0


def _group(rows):
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r)
    return out


def test_dup_stats_duckdb_parity(spark, tmp_path):
    """Given a materialized chunk frame, the stats aggregation matches
    DuckDB row-for-row (demoted-parity bar)."""
    import duckdb

    docs = [
        (1, _mk_text("p", 4000)),
        (2, _mk_text("p", 4000) + _mk_text("q", 2000)),
        (3, _mk_text("r", 3000)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    chunks = cdc_chunks(df)
    path = str(tmp_path / "chunks")
    chunks.write.parquet(path)

    got = cdc_dup_stats(spark.read.parquet(path)).collect()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW chunks AS SELECT * FROM read_parquet('{path}/*.parquet')"
        )
        want = con.execute("""
WITH owner AS (
  SELECT chunk_hash, min(doc_id) AS _owner, count(*) AS _copies
  FROM chunks GROUP BY chunk_hash
), tagged AS (
  SELECT c.*, CASE WHEN o._copies > 1 AND c.doc_id <> o._owner
                   THEN 1 ELSE 0 END AS _is_dup
  FROM chunks c JOIN owner o USING (chunk_hash)
)
SELECT doc_id, count(*) AS n_chunks, sum(chunk_len) AS total_len,
       sum(_is_dup) AS dup_chunks,
       sum(_is_dup * chunk_len) AS dup_len,
       round(sum(_is_dup * chunk_len)
             / (CASE WHEN sum(chunk_len) > 0
                     THEN sum(chunk_len) ELSE 1 END), 6) AS dup_frac
FROM tagged GROUP BY doc_id
        """).fetchall()
    finally:
        con.close()
    norm = lambda rows: sorted(tuple(float(x) for x in r) for r in rows)
    assert norm([tuple(r) for r in got]) == norm(want)


def test_chunking_plan_is_narrow(spark):
    """Chunking must not shuffle: the plan up to the chunk frame holds
    no Exchange (one Arrow-batched python stage over the scan)."""
    df = spark.createDataFrame(
        [(i, _mk_text(str(i), 1000)) for i in range(8)],
        "doc_id long, text string",
    )
    plan = cdc_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cdc_chunks_stream_equals_batch(spark, tmp_path):
    """cdc_chunks is a stateless narrow map, so it runs unchanged on a
    Structured Streaming frame: an AvailableNow drain over the same
    parquet corpus yields exactly the batch chunk set (the same
    batch-twin contract as streaming/dedup)."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, _mk_text(str(i), 3000)) for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(src)
    docs = spark.read.parquet(src)

    want = sorted(
        tuple(r) for r in cdc_chunks(docs).collect()
    )

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "out")
    q = (
        cdc_chunks(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == want
