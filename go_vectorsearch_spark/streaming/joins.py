"""Stream-stream joins: watermarked funnel/attribution over two streams.

The last stateful-streaming class the engine covers (windows, sessions,
arbitrary state, and dedup live in streaming/events.py / dedup.py): an
INNER JOIN OF TWO STREAMS, here the canonical conversion funnel — every
(view, purchase) pair of the same user with the purchase inside the
attribution window after the view. The reference has no streaming at
all (SURVEY.md §2.10); this is the engine extension a continuously
ingesting deployment uses for attribution, sessionized funnels, and
click-through joins.

Why the shape is scale-safe (the two things stream-stream joins demand):

  * Both sides carry a WATERMARK, and the join condition contains an
    explicit EVENT-TIME BOUND (purchase_ts in [view_ts, view_ts +
    attribution]). Spark derives state retention from the two: a
    buffered view can be evicted once the purchase-side watermark
    passes view_ts + attribution, so per-key state is bounded by
    (watermark delay + attribution window) x arrival rate — never the
    stream's history. Omitting the time bound keeps every row in state
    forever; this module makes it impossible to express that.
  * State is hash-partitioned by the join key (user_id): each task
    holds only its users' open windows, the same sharding the state
    store uses for windowed aggregation.

The batch twin (:func:`funnel_join_batch`) is the same logical join on
a static frame — pytest drains the stream with AvailableNow and asserts
row equality, and pins the batch twin against a DuckDB range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sides(events: DataFrame, left_type: str, right_type: str):
    views = events.filter(F.col("event_type") == left_type).select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return views, purchases


def _joined(views: DataFrame, purchases: DataFrame, attribution: str) -> DataFrame:
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {attribution}")
        )
    )
    out = views.join(purchases, cond, "inner")
    return out.select(
        "user_id",
        "view_id",
        "purchase_id",
        # epoch integers, not timestamps: value-stable across session
        # timezones and engines (the registry's events convention)
        F.unix_micros(F.col("view_ts")).alias("view_epoch_us"),
        F.unix_micros(F.col("purchase_ts")).alias("purchase_epoch_us"),
        (
            (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("view_ts")))
            / F.lit(1_000_000)
        ).alias("lag_seconds"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def funnel_join_stream(
    events_stream: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    attribution: str = "1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join over ONE events stream split
    into two sides (a self-join of the source — Spark plans the two
    filters as independent stream instances)."""
    views, purchases = _sides(events_stream, left_type, right_type)
    return _joined(
        views.withWatermark("view_ts", watermark),
        purchases.withWatermark("purchase_ts", watermark),
        attribution,
    )


def funnel_join_batch(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    attribution: str = "1 HOUR",
) -> DataFrame:
    """The batch twin: identical logical join on a static frame."""
    views, purchases = _sides(events, left_type, right_type)
    return _joined(views, purchases, attribution)
