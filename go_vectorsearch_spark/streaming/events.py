"""Structured Streaming operators over the ``events`` stream.

The reference has no true streaming (its only stream is an LLM token
passthrough, server/chat.go:85-105); this module is the engine extension a
continuously-ingesting deployment needs: event-time analytics with
watermarked late-data handling. Each operator has a batch twin registered
in queries.py (events_tumbling_hour / events_sessionize) whose DuckDB
oracle pins the semantics; the streaming tests assert that a
Trigger.AvailableNow run over the same parquet produces exactly the batch
answer — Spark's unified batch/streaming semantics make that equality the
correctness contract.

Scale notes: watermark + windowed aggregation is incremental state in the
state store (RocksDB on a real cluster) keyed by (window, group keys) —
state size is bounded by watermark horizon × key cardinality, independent
of total stream length. ``foreachBatch`` sinks would write parquet/Delta
partitions per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver testdata has shipped ``ts`` as TIMESTAMP(NANOS) (readable only
# as long nanos) and as TIMESTAMP(MICROS, NTZ). A streaming source needs
# an explicit schema, so sniff the actual type from the parquet footer
# with a zero-job batch read and build the matching stream DDL — then
# normalize to a plain TIMESTAMP exactly like sources/tables.load_table.
def _events_ddl(spark: SparkSession, sf_dir: str) -> str:
    from pyspark.sql import types as T

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = batch.schema["ts"].dataType
    ts_ddl = "long" if isinstance(ts_type, T.LongType) else ts_type.simpleString()
    return (
        f"event_id long, ts {ts_ddl}, user_id long, event_type string, "
        "value double, props string"
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_vectorsearch_spark.sources.tables import _has_nanos_ts

    # session-wide conf: set only when the file actually stores
    # TIMESTAMP(NANOS), mirroring sources/tables.load_table — an
    # unconditional set would turn other nanos-timestamp parquet reads
    # into int64 columns for the rest of the session
    if _has_nanos_ts(f"{sf_dir}/events.parquet"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ddl = _events_ddl(spark, sf_dir)
    # file-stream sources want a directory; an explicit basePath plus a
    # file glob restricts the stream to the events table only
    raw = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", sf_dir)
        .parquet(f"{sf_dir}/events.parque[t]")
    )
    if " ts long," in f" {ddl}":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NTZ→LTZ cast reads the naive wall clock in the SESSION timezone;
    # the batch twin (load_table) and every oracle treat it as UTC, so
    # pin it here too — the driver may supply a non-UTC session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: decorate each streamed event with
    dimension attributes (user → customer profile, document → category,
    …) — the standard ingest-time denormalization step of a streaming
    pipeline.

    Scale notes: a stream-static join is STATELESS — each micro-batch
    joins against the current static relation, no streaming state store
    involved. Catalyst broadcasts the static side per micro-batch when
    it is broadcast-sized (the usual dimension-table case, so every
    batch is a map-side hash join on the stream partitions); an
    over-broadcast-size dimension degrades to a shuffled join per batch,
    at which point pre-bucketing the dimension on the join key is the
    deployment fix. Left join keeps events with no dimension row
    (late-arriving dimension data) instead of silently dropping them.
    """
    return events.join(dim, on, how)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling event-time window: count + sum(value) per
    (window, event_type). Late events beyond the watermark are dropped;
    within it, the window's state is updated incrementally."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time window (each event lands in window/slide panes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: sessions close after ``gap`` of
    inactivity (the streaming-native form of the batch lag+cumsum
    sessionization in queries.py events_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def user_running_stats(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum, max) over the whole stream — state the built-in
    windowed aggregates can't express (no window bound; state lives for
    the key's lifetime). Each micro-batch updates the key's state struct
    and emits the refreshed totals. At scale, state is partitioned by
    user_id in the state store; per-batch work is one Arrow pass.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    out_schema = "user_id long, n_events long, sum_value double, max_value double"
    # nn = count of NON-NULL values: SQL sum/max skip nulls and return
    # NULL when every value is null — a -inf/NaN seed would diverge from
    # the batch twin for an all-null-value user
    state_schema = "n long, nn long, s double, m double"

    def update(key, pdfs, state: GroupState):
        n, nn, s, m = state.get if state.exists else (0, 0, 0.0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value"]
            k = int(vals.notna().sum())
            if k:
                s += float(vals.sum())  # pandas sum skips NaN
                batch_max = float(vals.max())
                m = batch_max if nn == 0 else max(m, batch_max)
                nn += k
        state.update((n, nn, s, m))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s if nn else None],
                "max_value": [m if nn else None],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: str | None = None,
) -> None:
    """Deployment sink: drain the stream into a parquet table via
    ``foreachBatch`` with AvailableNow semantics. foreachBatch (not the
    built-in parquet sink) is the production shape because a real
    pipeline upgrades this lambda to MERGE/overwrite-partition on a
    table format — but foreachBatch alone is only at-least-once: a crash
    after the write commits and before the checkpoint records the epoch
    replays that epoch on restart. The writer here is IDEMPOTENT to make
    that exactly-once: each epoch overwrites its own ``_epoch=<id>``
    directory, so a CHECKPOINT-RESUMED replay rewrites the same rows
    instead of appending them twice (the same job the built-in sink's
    _spark_metadata manifest does); a FRESH checkpoint gets an empty
    sink first, since its epoch numbering need not match a previous
    run's. Read the sink back with :func:`read_parquet_sink`, which
    hides the bookkeeping column.
    """

    import os
    import shutil

    from go_vectorsearch_spark.streaming import require_local_path

    # the fresh-vs-resumed branch below answers via os.path — on a
    # remote URI it would silently pick the wrong branch (stale epochs
    # resurrect, or committed epochs get deleted), so refuse loudly
    require_local_path(checkpoint_dir, "stream_to_parquet checkpoint_dir")
    require_local_path(path, "stream_to_parquet path")

    # a FRESH checkpoint replays the source from scratch with its own
    # epoch numbering/batching, which need not line up with a previous
    # run's (fewer, larger micro-batches would overwrite only the low
    # epoch ids and resurrect the stale high ones as duplicates) — so a
    # fresh run starts from an empty sink. A RESUMED checkpoint keeps
    # its dirs: epoch ids continue, and the replayed epoch overwrites
    # exactly its own directory.
    if not os.path.isdir(checkpoint_dir) and os.path.isdir(path):
        for d in os.listdir(path):
            if d.startswith("_epoch="):
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        epoch_path = f"{path}/_epoch={epoch_id}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = df.repartition(partition_by).write.mode("overwrite").partitionBy(
                partition_by
            )
        w.parquet(epoch_path)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_parquet_sink(spark, path: str) -> DataFrame:
    """Read a :func:`stream_to_parquet` sink: partition discovery picks
    up the per-epoch directories; the ``_epoch`` bookkeeping column is
    dropped so consumers see exactly the streamed schema."""
    return spark.read.option("basePath", path).parquet(path).drop("_epoch")


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into an in-memory table
    and return it as a DataFrame (test/bench harness; a deployment would
    use foreachBatch → parquet/Delta)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
