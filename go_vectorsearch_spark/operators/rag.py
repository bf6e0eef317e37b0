"""X5: RAG chat prompt assembly (reference server/chat.go:109-181).

The reference's Chat endpoint builds one LLM request from (history,
retrieved documents, question): history entries alternate user/assistant
roles (even index = user, chat.go:125-139), retrieved documents are
flattened and quoted into a context preamble (chat.go:141-158), and the
question is appended after the literal "My question is: " marker, with
an optional prefix joined as "{prefix}. {text}" (chat.go:160-168). The
LLM call itself is out of scope for the engine (VERDICT §Missing 5);
everything up to the request payload is reproduced here.

Two forms:

* :func:`build_question` / :func:`build_messages` — plain-Python,
  request-sized (one chat turn), byte-identical to the reference
  (golden tests in tests/test_rag.py);
* :func:`rag_prompts` — the batch/distributed form: assemble prompts
  for a whole DataFrame of questions, each joined to its retrieved
  documents, as pure Catalyst expressions (sort_array over collected
  (rank, text) structs → concat) — one shuffle, no UDFs. This is the
  shape a 100 TB training-data pipeline uses to build instruction
  corpora; the reference's sequential string builder cannot.

Quirks reproduced on purpose (locked by golden tests):

* "I have N text document that I'd like..." — "document" stays singular
  for any N; only "part" is pluralized (chat.go:144-151).
* Each quoted doc is followed by "\n", and the block by one more "\n".
* No-docs requests skip the context preamble entirely — the content is
  just "My question is: ..." (chat.go:142 guards on len > 0).
* The prefix joins with ". " BEFORE the question marker's text, i.e.
  'My question is: {prefix}. {text}' (chat.go:164-167).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUESTION_MARKER = "My question is: "


def context_block(doc_texts: Sequence[str]) -> str:
    """The quoted-documents preamble (chat.go:141-158); "" when no docs."""
    if not doc_texts:
        return ""
    plural = "s" if len(doc_texts) > 1 else ""
    quoted = "".join(f'"""{t}"""\n' for t in doc_texts)
    return (
        f"I have {len(doc_texts)} text document that I'd like to use as "
        f"context for my question. Here's the relevant part{plural}:\n\n"
        f"{quoted}\n"
    )


def build_question(
    text: str, doc_texts: Sequence[str] = (), prefix: str = ""
) -> str:
    """The final user-message content (context + marker + question)."""
    if prefix:
        text = f"{prefix}. {text}"
    return f"{context_block(doc_texts)}{QUESTION_MARKER}{text}"


def build_messages(
    text: str,
    doc_texts: Sequence[str] = (),
    history: Sequence[str] = (),
    prefix: str = "",
) -> list[dict[str, str]]:
    """Full chat payload: alternating history + the assembled question
    (chat.go:125-139, 170-175). History strings alternate roles starting
    at "user" (even index = user)."""
    messages = [
        {"role": "user" if i % 2 == 0 else "assistant", "content": h}
        for i, h in enumerate(history)
    ]
    messages.append({"role": "user", "content": build_question(text, doc_texts, prefix)})
    return messages


# ---------------------------------------------------------------------------
# Batch form: one prompt per question row, documents joined by rank
# ---------------------------------------------------------------------------


def _context_expr(texts_sorted: Column) -> Column:
    """Expression twin of :func:`context_block` over array<string>."""
    n = F.size(texts_sorted)
    quoted = F.aggregate(
        texts_sorted,
        F.lit(""),
        lambda acc, t: F.concat(acc, F.lit('"""'), t, F.lit('"""\n')),
    )
    return F.when(
        n > 0,
        F.concat(
            F.lit("I have "),
            n.cast("string"),
            F.lit(
                " text document that I'd like to use as context for my "
                "question. Here's the relevant part"
            ),
            F.when(n > 1, F.lit("s")).otherwise(F.lit("")),
            F.lit(":\n\n"),
            quoted,
            F.lit("\n"),
        ),
    ).otherwise(F.lit(""))


def rag_prompts(
    questions: DataFrame,
    retrieved: DataFrame,
    q_id: str = "q_id",
    text_col: str = "question",
    doc_text_col: str = "doc_text",
    rank_col: str = "rank",
    prefix: str = "",
    out_col: str = "prompt",
) -> DataFrame:
    """Assemble one reference-shaped prompt per question from its
    retrieved documents — distributed, expression-only.

    ``retrieved`` carries (q_id, rank_col, doc_text_col) — e.g. the
    output of a batch top-k search (queries.batch_search_topk) joined to
    document text. Plan: ONE shuffle grouping (rank, text) structs per
    question, sort_array for deterministic rank order (collect_list
    order is not stable across retries — sorting restores it), then the
    same concat tree as :func:`context_block`. Questions with no
    retrieved docs keep the bare "My question is: " form via the left
    join.
    """
    # a NULL doc_text (upstream left-join miss) must not poison the
    # whole prompt to NULL through the concat fold — treat it as
    # not-retrieved, matching the no-docs path
    retrieved = retrieved.filter(F.col(doc_text_col).isNotNull())
    packed = (
        retrieved.groupBy(q_id)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(rank_col).alias("r"), F.col(doc_text_col).alias("t")))
            ).alias("_rt")
        )
        .select(q_id, F.col("_rt.t").alias("_texts"))
    )
    q = questions.join(packed, q_id, "left")
    texts = F.coalesce(F.col("_texts"), F.array().cast("array<string>"))
    body = (
        F.concat(F.lit(prefix), F.lit(". "), F.col(text_col))
        if prefix
        else F.col(text_col)
    )
    return q.withColumn(
        out_col, F.concat(_context_expr(texts), F.lit(QUESTION_MARKER), body)
    ).drop("_texts")
