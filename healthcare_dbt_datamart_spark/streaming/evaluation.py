"""Streaming classifier-evaluation maintenance — the streaming face of
``llmops/evaluation.py``'s calibration cells, following the
``streaming/sketches.py`` twin pattern: the bin-cell table is a set of
ASSOCIATIVE BIGINT sums, so a continuously-scored feed (a quality
filter running on live ingest) maintains its calibration scorecard by
sum-merging each micro-batch's bounded cells into a persistent table —
no history replay, state bounded by ``n_bins + 1`` rows forever.

Exactly-once across foreachBatch replays: sum-merges double-count on a
crash-replay, so the sink records the applied batch id INSIDE the cell
table (one ``bin = -2`` meta row riding the same atomic table swap as
the merged cells) and skips any batch id at or below the stored
high-water mark — the ``cms_merge_batch`` ledger, unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

_META_BIN = -2  # ledger row: (bin=-2, n=last_batch_id, zeros elsewhere)

_CELL_SCHEMA = (
    "bin int, n bigint, pos bigint, s_sum bigint, s2_sum bigint,"
    " sy_sum bigint, bad bigint"
)
_CELL_COLS = ["bin", "n", "pos", "s_sum", "s2_sum", "sy_sum", "bad"]


def calib_cells_merge_batch(
    spark: SparkSession,
    target_table: str,
    batch_cells: DataFrame,
    batch_id: int,
) -> bool:
    """Merge one micro-batch's calibration cells into ``target_table``
    by (bin) SUM over every counter column, atomically (the
    materialize_table swap) and idempotently (skip when ``batch_id`` ≤
    the stored high-water mark — ledger and cells travel in the same
    swap, so a crash between them cannot desynchronize). Returns
    whether the batch was applied. The merge aggregate runs over ≤
    2·(n_bins + 1) rows — bounded model state, never corpus-sized."""
    from ..operators.materialize import materialize_table

    if spark.catalog.tableExists(target_table):
        cur = spark.table(target_table)
        mark = cur.filter(F.col("bin") == _META_BIN).select("n").collect()
        if mark and batch_id <= mark[0][0]:
            return False  # replay of an already-applied batch
        # NULL-safe: the dirty-row counter cell from _bin_cells carries
        # bin = NULL, and `bin != -2` evaluates to NULL on it — a plain
        # filter would silently drop merged dirty counts every batch.
        base = cur.filter(~F.col("bin").eqNullSafe(F.lit(_META_BIN)))
        merged = (
            base.unionByName(batch_cells)
            .groupBy("bin")
            .agg(*[F.sum(c).alias(c) for c in _CELL_COLS[1:]])
        )
    else:
        merged = batch_cells
    meta = spark.createDataFrame(
        [(_META_BIN, int(batch_id), 0, 0, 0, 0, 0)], _CELL_SCHEMA
    )
    materialize_table(
        spark,
        target_table,
        merged.select(
            F.col("bin").cast("int"),
            *[F.col(c).cast("bigint") for c in _CELL_COLS[1:]],
        ).unionByName(meta),
    )
    return True


def streaming_calibration_ingest(
    stream: DataFrame,
    target_table: str,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 10**6,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain a calibration cell table over a scored stream: each
    micro-batch builds its own bounded ``_bin_cells`` aggregate
    (map-side combine inside the batch) and sum-merges it via
    ``calib_cells_merge_batch``. Read the live scorecard any time with
    ``calibration_from_cells`` — identical numbers to running
    ``calibration_summary`` over everything ingested so far (the
    batch-parity property the twin tests pin)."""
    from ..llmops.evaluation import _bin_cells

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cells = _bin_cells(
            batch_df, score_col, label_col, int(n_bins), int(scale)
        )
        calib_cells_merge_batch(
            batch_df.sparkSession, target_table, cells, batch_id
        )

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def calibration_from_cells(
    spark: SparkSession,
    target_table: str,
    scale: int = 10**6,
) -> DataFrame:
    """One-row ECE / MCE / Brier scorecard from a streamed cell table —
    the exact ``calibration_summary`` arithmetic (shared
    ``scorecard_from_cells`` fold) over the merged cells, meta row
    excluded. Collecting the table is bounded: ≤ n_bins + 2 rows."""
    from ..llmops.evaluation import scorecard_from_cells

    rows = (
        spark.table(target_table)
        # NULL-safe: keep the NULL-bin dirty cell so the fold raises on
        # dirty input exactly like the batch path (parity guarantee)
        .filter(~F.col("bin").eqNullSafe(F.lit(_META_BIN)))
        .collect()
    )
    vals = scorecard_from_cells(rows, int(scale))
    return spark.createDataFrame(
        [vals],
        "n_rows bigint, n_pos bigint, n_bins_used int, ece double,"
        " mce double, brier double",
    )
