"""Windowed streaming aggregations (tumbling / sliding / session).

No reference counterpart (Snowflake has no streaming windows) — these are
the Spark-native extension the survey calls for (§2.11), exposed over the
``events`` table shape (ts, user_id, event_type, value). Each works on
both a batch DataFrame and a watermarked stream (unified engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        events.groupBy(F.window(ts_col, window_len).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        events.groupBy(F.window(ts_col, window_len, slide).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "avg_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Spark-native session windows (``session_window``); the batch analog
    (lag + running sum) is the ``events_sessionize`` query."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )
