"""Dynamic-table / microbatch analogs (SURVEY §2.11).

The reference's nearest-real-time constructs map to Structured Streaming:

- Snowflake dynamic table (``target_lag`` / ``refresh_mode=incremental``,
  ``dbt-snowflake/macros/relations/dynamic_table/create.sql:36-47``) ->
  a streaming query with ``trigger(processingTime=target_lag)`` whose
  sink keeps a continuously-refreshed result table.
- dbt microbatch incremental strategy (event-time window delete+insert,
  ``dbt-snowflake/macros/materializations/incremental/merge.sql:73-101``)
  -> ``withWatermark`` + ``foreachBatch`` applying the same windowed
  delete+insert through the batch engine's ``incremental_run``.

Both reuse the *batch* transformation function unchanged — the engine's
models are stream/batch agnostic (DataFrame in, DataFrame out), which is
exactly Spark's unified-engine design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def dynamic_table(
    source_stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    name: str,
    target_lag: str = "10 seconds",
    checkpoint_dir: str | None = None,
    output_mode: str = "complete",
) -> StreamingQuery:
    """Continuously-refreshed derived table: the transform runs over the
    stream; each trigger refreshes the in-memory/catalog result table
    ``name``. ``target_lag`` becomes the processing-time trigger."""
    out = transform(source_stream)
    writer = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime=target_lag)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def microbatch_stream(
    source_stream: DataFrame,
    name: str,
    event_time: str,
    watermark_delay: str = "30 minutes",
    checkpoint_dir: str | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Microbatch incremental: each foreachBatch applies the reference's
    windowed delete+insert (I5) for the batch's event-time span — late
    rows inside the watermark re-land in their window; rows beyond it are
    dropped, matching dbt microbatch re-run semantics."""
    from ..operators.incremental import incremental_run
    from pyspark.sql import functions as F

    stream = source_stream.withWatermark(event_time, watermark_delay)
    if transform is not None:
        stream = transform(stream)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bounds = batch_df.agg(
            F.min(event_time).alias("lo"), F.max(event_time).alias("hi")
        ).collect()[0]
        incremental_run(
            batch_df.sparkSession,
            name,
            batch_df,
            strategy="microbatch",
            event_time=event_time,
            batch_start=bounds.lo,
            batch_end=bounds.hi + __import__("datetime").timedelta(microseconds=1),
        )

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
