"""Round-trip tests for the multi-format table IO (sources/io.py):
every format must reproduce the exact rows, including array columns."""

from __future__ import annotations

import pytest

from go_vectorsearch_spark.sources.io import FORMATS, read_table, write_table
from go_vectorsearch_spark.sources.tables import load_table


def _rows(df):
    return sorted(
        [tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in df.collect()],
        key=repr,
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_embeddings(spark, sf_smoke, tmp_path_factory, fmt):
    emb = load_table(spark, sf_smoke, "embeddings").limit(100)
    path = str(tmp_path_factory.mktemp("io") / f"emb_{fmt}")
    write_table(emb, path, fmt)
    back = read_table(spark, path, fmt, schema=emb.schema)
    assert back.schema == emb.schema
    assert _rows(back) == _rows(emb)


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_documents(spark, sf_smoke, tmp_path_factory, fmt):
    docs = load_table(spark, sf_smoke, "documents").limit(100)
    path = str(tmp_path_factory.mktemp("io") / f"docs_{fmt}")
    write_table(docs, path, fmt)
    back = read_table(spark, path, fmt, schema=docs.schema)
    assert _rows(back) == _rows(docs)


def test_unknown_format_rejected(spark, sf_smoke, tmp_path_factory):
    docs = load_table(spark, sf_smoke, "documents")
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(docs, "/tmp/x", "avro")
    with pytest.raises(ValueError, match="schema required"):
        read_table(spark, "/tmp/x", "json")


def test_events_loader_handles_both_timestamp_layouts(spark, sf_smoke, tmp_path):
    """The driver has shipped events.ts as TIMESTAMP(NANOS) (round 1,
    readable only as int64 nanos) and TIMESTAMP(MICROS, NTZ) (round 2).
    load_table must normalize BOTH to a plain UTC TIMESTAMP with
    identical instants."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from go_vectorsearch_spark.sources.tables import load_table

    current = load_table(spark, sf_smoke, "events")
    assert isinstance(current.schema["ts"].dataType, T.TimestampType)

    # synthesize the round-1 layout: ts as int64 nanoseconds
    nanos_dir = str(tmp_path / "sfnanos")
    current.withColumn(
        "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
    ).write.parquet(f"{nanos_dir}/events.parquet")
    legacy = load_table(spark, nanos_dir, "events")
    assert isinstance(legacy.schema["ts"].dataType, T.TimestampType)

    a = sorted((r["event_id"], r["ts"]) for r in current.select("event_id", "ts").collect())
    b = sorted((r["event_id"], r["ts"]) for r in legacy.select("event_id", "ts").collect())
    assert a == b


def test_csv_roundtrip_quotes_and_newlines(spark, tmp_path):
    """Document text containing double quotes, commas, AND embedded
    newlines must survive the CSV round-trip byte-for-byte: the writer
    doubles inner quotes (escape='"', RFC-4180) to match the reader —
    Spark's default backslash escape silently corrupts such rows (the
    round-2 advisor finding; plain-fixture tests can't catch it)."""
    rows = [
        (1, 'She said "hello, world" and left', [1.0, -2.5]),
        (2, 'line one\nline "two", with comma', [0.0]),
        (3, '""already double-quoted""', [3.25, 4.0]),
        (4, 'trailing backslash \\ and "quote"', []),
        (5, None, [9.0]),
    ]
    df = spark.createDataFrame(rows, "id long, text string, vec array<double>")
    path = str(tmp_path / "quotes_csv")
    write_table(df, path, "csv")
    back = read_table(spark, path, "csv", schema=df.schema)
    assert _rows(back) == _rows(df)


def test_csv_roundtrip_distinguishes_empty_string_from_null(spark, tmp_path):
    """CSV has no native null: Spark's defaults write null and '' both
    as an empty field and read empty fields back as NULL, so an EMPTY
    document silently became null on round-trip (md5(null)=null in
    dedup, dropped from non-null counts). The writer/reader pair now
    encodes null as a distinct token; '' stays '' and a LITERAL
    backslash-N in text is quote-protected."""
    rows = [
        (1, ""),
        (2, None),
        (3, "x"),
        (4, "\\N literal in text"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    path = str(tmp_path / "null_csv")
    write_table(df, path, "csv")
    back = read_table(spark, path, "csv", schema=df.schema)
    assert _rows(back) == _rows(df)
