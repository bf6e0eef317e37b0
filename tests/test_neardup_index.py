"""Incremental ingest-time near-dup index (api.Engine.build_neardup_index /
append_neardup_index / neardup_check / upload(neardup='skip')).

The corpus-level MinHash+LSH operators (tests/test_dedup_text.py) answer
"which stored docs duplicate each other"; this store answers the ingest
question — "is THIS incoming document a near-dup of anything already
stored" — without rescanning the corpus: band keys of the batch against a
bucket-pruned read of the persisted band table, then exact hashed-shingle
Jaccard over the candidate set only.
"""

from __future__ import annotations

import json
import os

import pytest

from go_vectorsearch_spark.api import Engine

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm window sill and the birds sing in the garden "
    "meanwhile the river runs past the old stone bridge under grey skies"
)
# a one-token mid-text edit (jaccard ~0.8) happens NOT to band-collide
# with the family's fixed 4x4 LSH constants — legitimate ~13% miss odds at
# that similarity. The test needs a DETERMINISTIC hit, so the near-dup is
# a suffix append (jaccard ~0.87, verified to collide).
NEAR = BASE + " extra trailing words"
OTHER = (
    "completely different content about spark shuffle partitions and "
    "joins across executor boundaries with adaptive query execution"
)
THIRD = (
    "a third unrelated passage describing parquet row groups column "
    "chunks page headers and dictionary encoded binary statistics"
)
UNIQUE = (
    "nothing in this sentence resembles any stored document because "
    "every shingle here is novel vocabulary entirely absent elsewhere"
)


def _doc(name, text):
    return {"name": name, "external_id": name, "document": json.dumps(text)}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    """Engine with an indexed 'corpus' category and an unindexed
    'noindex' one — every test below is self-sufficient against THIS
    state (no test depends on another test's uploads)."""
    e = Engine(spark, str(tmp_path_factory.mktemp("neardup_root")))
    ids = e.upload("acme", "corpus", [_doc("base", BASE), _doc("other", OTHER)])
    e.upload("acme", "noindex", [_doc("x", THIRD)])
    n = e.build_neardup_index("acme", "corpus")
    assert n == 2
    return e, ids


def test_check_finds_stored_neardup(eng):
    e, ids = eng
    rows = e.neardup_check("acme", "corpus", [NEAR, UNIQUE]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["q_ix"], r["document_id"]) == (0, ids[0])
    assert r["jaccard"] > 0.5


def test_check_exact_dup_is_jaccard_one(eng):
    e, ids = eng
    # flatten() of a plain JSON string appends a period, so the exact
    # stored text is OTHER + "." — identical shingle set, Jaccard 1.0,
    # identical signature (a deterministic band collision)
    rows = e.neardup_check("acme", "corpus", [OTHER + "."]).collect()
    assert len(rows) == 1
    assert rows[0]["document_id"] == ids[1]
    assert rows[0]["jaccard"] == 1.0


def test_check_errors_without_index(eng):
    e, _ = eng
    with pytest.raises(ValueError, match="no near-dup index"):
        e.neardup_check("acme", "noindex", [THIRD])


def test_upload_auto_appends_index(eng):
    e, _ = eng
    (tid,) = e.upload("acme", "corpus", [_doc("third", THIRD)])
    rows = e.neardup_check("acme", "corpus", [THIRD + "."]).collect()
    assert [r["document_id"] for r in rows] == [tid]


def test_incremental_equals_rebuild(eng):
    e, _ = eng
    # perform an incremental append of our own (upload auto-appends),
    # then compare the grown store against a from-scratch rebuild
    e.upload("acme", "corpus", [_doc("incr", THIRD + " incremental copy")])
    cid = e._category_id("acme", "corpus")
    t = e._neardup_table(cid)
    incremental = sorted(tuple(r) for r in t.read().collect())
    e.build_neardup_index("acme", "corpus")
    rebuilt = sorted(tuple(r) for r in t.read().collect())
    assert incremental == rebuilt


def test_append_carries_existing_files(eng):
    e, _ = eng
    cid = e._category_id("acme", "corpus")
    t = e._neardup_table(cid)
    v0 = t._version()
    before = {d for ds in t._manifest(v0).values() for d in ds}
    (nid,) = e.upload("acme", "corpus", [_doc("fourth", UNIQUE)])
    v1 = t._version()
    after_parts = t._manifest(v1)
    after = {d for ds in after_parts.values() for d in ds}
    # pure append: every pre-existing data dir is carried by reference
    assert v1 == v0 + 1 and before <= after
    # and the new rows are only the new doc's
    import pyspark.sql.functions as F

    new_rows = t.read().filter(F.col("document_id") == nid)
    assert new_rows.count() == 4  # LSH_BANDS rows per doc


@pytest.mark.slow
def test_upload_skip_drops_duplicates(spark, tmp_path):
    e = Engine(spark, str(tmp_path))
    ids = e.upload("o", "c", [_doc("base", BASE), _doc("other", OTHER)])
    e.build_neardup_index("o", "c")
    docs_before = e.t["documents"].read().count()

    out = e.upload(
        "o",
        "c",
        [_doc("n1", NEAR), _doc("f1", THIRD), _doc("n2", THIRD)],
        neardup="skip",
    )
    # slot 0 duplicated stored BASE; slot 1 is fresh; slot 2 exactly
    # duplicates the in-batch survivor at slot 1 (the store cannot see
    # either yet) and resolves to ITS fresh id
    assert out[0] == ids[0]
    assert out[1] not in ids
    assert out[2] == out[1]
    assert e.t["documents"].read().count() == docs_before + 1

    # an all-duplicate batch writes nothing and resolves positionally
    docs_mid = e.t["documents"].read().count()
    out2 = e.upload(
        "o", "c", [_doc("n3", NEAR), _doc("n4", BASE + ".")], neardup="skip"
    )
    assert out2 == [ids[0], ids[0]]
    assert e.t["documents"].read().count() == docs_mid


def test_upload_skip_requires_index(spark, tmp_path):
    from go_vectorsearch_spark.api import NearDupIndexMissing

    e = Engine(spark, str(tmp_path))
    e.upload("o", "c", [_doc("a", BASE)])
    with pytest.raises(NearDupIndexMissing, match="no near-dup index"):
        e.upload("o", "c", [_doc("b", NEAR)], neardup="skip")
    with pytest.raises(ValueError, match="unknown neardup mode"):
        e.upload("o", "c", [_doc("b", NEAR)], neardup="flag")


def test_upload_skip_threshold_plumbs(spark, tmp_path):
    """neardup_threshold reaches the skip check: NEAR (jaccard ~0.87 vs
    BASE) is skipped at the 0.5 default but FRESH at a 0.95 bar."""
    e = Engine(spark, str(tmp_path))
    ids = e.upload("o", "c", [_doc("base", BASE)])
    e.build_neardup_index("o", "c")
    out = e.upload(
        "o", "c", [_doc("n", NEAR)], neardup="skip", neardup_threshold=0.95
    )
    assert out[0] not in ids  # fresh id, not resolved to the stored doc


def test_upload_skip_rejection_is_side_effect_free(spark, tmp_path):
    """A rejected skip-upload to a NEW category must not persistently
    create the owner/category rows (the index check runs read-only
    BEFORE _get_or_create)."""
    from go_vectorsearch_spark.api import NearDupIndexMissing

    e = Engine(spark, str(tmp_path))
    e.upload("o", "c", [_doc("a", BASE)])  # unrelated existing category
    with pytest.raises(NearDupIndexMissing):
        e.upload("o", "fresh_cat", [_doc("b", NEAR)], neardup="skip")
    assert e._category_id("o", "fresh_cat") is None
    with pytest.raises(NearDupIndexMissing):
        e.upload("nobody", "nocat", [_doc("b", NEAR)], neardup="skip")
    assert e._category_id("nobody", "nocat") is None


@pytest.mark.slow
def test_deleted_doc_self_heals(spark, tmp_path):
    e = Engine(spark, str(tmp_path))
    (bid, oid) = e.upload("o", "c", [_doc("base", BASE), _doc("other", OTHER)])
    e.build_neardup_index("o", "c")
    assert e.neardup_check("o", "c", [NEAR]).count() == 1
    e.delete_document("o", "c", bid)
    # the stale band rows still exist, but exact verification joins the
    # live documents table, so the dead doc can never be reported
    assert e.neardup_check("o", "c", [NEAR]).count() == 0
    # a rebuild compacts the stale rows away
    e.build_neardup_index("o", "c")
    cid = e._category_id("o", "c")
    ids_left = {
        r["document_id"]
        for r in e._neardup_table(cid).read().select("document_id").collect()
    }
    assert ids_left == {oid}


def test_cascade_delete_removes_store(spark, tmp_path):
    e = Engine(spark, str(tmp_path))
    e.upload("o", "c", [_doc("a", BASE)])
    e.build_neardup_index("o", "c")
    cid = e._category_id("o", "c")
    path = e._neardup_path(cid)
    assert os.path.isdir(path)
    e.delete_category("o", "c")
    assert not os.path.isdir(path)


def test_status_reports_neardup_index(eng):
    e, _ = eng
    cats = {
        (c["owner"], c["category"]): c for c in e.stats()["categories"]
    }
    assert cats[("acme", "corpus")]["neardup_index"] is True
    assert cats[("acme", "noindex")]["neardup_index"] is False


@pytest.mark.slow
def test_compact_drops_dead_band_rows(spark, tmp_path):
    e = Engine(spark, str(tmp_path))
    (bid, oid) = e.upload("o", "c", [_doc("base", BASE), _doc("other", OTHER)])
    e.build_neardup_index("o", "c")
    e.delete_document("o", "c", bid)
    cid = e._category_id("o", "c")
    t = e._neardup_table(cid)
    # stale rows present until compaction
    assert {r["document_id"] for r in t.read().collect()} == {bid, oid}
    n = e.compact_neardup_index("o", "c")
    assert n == 4  # LSH_BANDS rows for the one live doc
    assert {r["document_id"] for r in t.read().collect()} == {oid}
    # checks still work against the compacted store
    assert e.neardup_check("o", "c", [OTHER + "."]).count() == 1
    # error path: a category without a built index refuses loudly
    e.upload("o", "noindex", [_doc("x", THIRD)])
    with pytest.raises(ValueError, match="no near-dup index"):
        e.compact_neardup_index("o", "noindex")


def test_neardup_pairs_report(eng):
    """Corpus-level pairs over a stored category: the settled-corpus
    complement of neardup_check (stored x stored, not new x stored)."""
    e, _ = eng
    ids = e.upload(
        "acme", "pairs",
        [_doc("a", BASE), _doc("b", BASE + "."), _doc("c", OTHER)],
    )
    rows = e.neardup_pairs_report("acme", "pairs").collect()
    got = {(r["document_id_a"], r["document_id_b"]): r["jaccard"] for r in rows}
    # flatten normalizes both copies to the identical text -> 1.0
    assert got == {(ids[0], ids[1]): 1.0}
    with pytest.raises(ValueError, match="unknown"):
        e.neardup_pairs_report("acme", "missing")
