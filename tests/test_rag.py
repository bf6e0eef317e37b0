"""X5 RAG prompt assembly: golden parity with server/chat.go:109-181
(quoting, history role alternation, "My question is: " marker, singular
"document" quirk), plus batch-form equivalence with the Python builder."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from go_vectorsearch_spark.operators.rag import (
    QUESTION_MARKER,
    build_messages,
    build_question,
    context_block,
    rag_prompts,
)


def test_no_docs_no_history():
    msgs = build_messages("what is spark?")
    assert msgs == [{"role": "user", "content": "My question is: what is spark?"}]


def test_single_doc_golden():
    # chat.go:144-151: count, singular "document" for any N, "part" (no s)
    # for one doc; each doc quoted with """...""" then \n; block ends with
    # an extra \n (chat.go:152-158) before the question marker.
    q = build_question("summarize", ["alpha body."])
    assert q == (
        "I have 1 text document that I'd like to use as context for my "
        'question. Here\'s the relevant part:\n\n"""alpha body."""\n\n'
        "My question is: summarize"
    )


def test_two_docs_pluralizes_part_only():
    q = build_question("compare", ["a.", "b."])
    assert q.startswith(
        "I have 2 text document that I'd like to use as context for my "
        "question. Here's the relevant parts:\n\n"
    )
    assert '"""a."""\n"""b."""\n\nMy question is: compare' in q


def test_prefix_joins_before_question():
    # chat.go:164-167: req.Text = "{prefix}. {text}"
    q = build_question("why?", prefix="search_query")
    assert q == "My question is: search_query. why?"


def test_history_alternates_roles():
    msgs = build_messages("next", history=["hi", "hello!", "more"])
    assert [m["role"] for m in msgs] == ["user", "assistant", "user", "user"]
    assert msgs[:3] == [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello!"},
        {"role": "user", "content": "more"},
    ]
    assert msgs[3]["content"].endswith("My question is: next")


def test_context_block_empty():
    assert context_block([]) == ""


@pytest.mark.parametrize("prefix", ["", "answer in english"])
def test_rag_prompts_matches_python_builder(spark, prefix):
    """The distributed expression form must produce byte-identical
    prompts to the sequential reference-shaped builder, including rank
    order, no-docs questions, and the prefix join."""
    questions = spark.createDataFrame(
        [(1, "first q"), (2, "second q"), (3, "lonely q")],
        "q_id long, question string",
    )
    retrieved = spark.createDataFrame(
        [(1, 2, "doc B."), (1, 1, "doc A."), (2, 1, "doc C.")],
        "q_id long, rank int, doc_text string",
    )
    out = {
        r["q_id"]: r["prompt"]
        for r in rag_prompts(questions, retrieved, prefix=prefix).collect()
    }
    expected = {
        1: build_question("first q", ["doc A.", "doc B."], prefix),
        2: build_question("second q", ["doc C."], prefix),
        3: build_question("lonely q", [], prefix),
    }
    assert out == expected


def test_rag_prompts_is_expression_only(spark):
    """No Python UDF in the batch plan: prompt assembly must stay
    JVM-side (the 100 TB path)."""
    questions = spark.createDataFrame([(1, "q")], "q_id long, question string")
    retrieved = spark.createDataFrame(
        [(1, 1, "t.")], "q_id long, rank int, doc_text string"
    )
    plan = (
        rag_prompts(questions, retrieved)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_engine_chat_messages(spark, tmp_path):
    """Engine.chat_messages: S4 retrieval + Flatten + assembly, doc order
    following the caller's id list (chat.go:115-124)."""
    from go_vectorsearch_spark.api import Engine

    eng = Engine(spark, str(tmp_path / "store"))
    ids = eng.upload(
        "acme",
        "wiki",
        [
            {"name": "n1", "external_id": "e1", "document": json.dumps({"a": "alpha text"})},
            {"name": "n2", "external_id": "e2", "document": json.dumps({"b": "beta text"})},
        ],
    )
    from go_vectorsearch_spark.operators.documents import flatten

    msgs = eng.chat_messages(
        "what?", document_ids=[ids[1], ids[0]], history=["hey", "yo"]
    )
    assert [m["role"] for m in msgs] == ["user", "assistant", "user"]
    body = msgs[-1]["content"]
    f1, f2 = flatten({"a": "alpha text"}), flatten({"b": "beta text"})
    # caller order: ids[1] (beta) first
    assert body.index(f'"""{f2}"""') < body.index(f'"""{f1}"""')
    assert body.endswith(f"{QUESTION_MARKER}what?")
    assert "I have 2 text document" in body
