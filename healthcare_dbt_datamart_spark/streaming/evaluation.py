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


_AUC_SCHEMA = "kind string, s_fp bigint, cnt bigint, pos bigint, bad bigint"
_AUC_COLS = ["cnt", "pos", "bad"]


def auc_cells_merge_batch(
    spark: SparkSession,
    target_table: str,
    batch_cells: DataFrame,
    batch_id: int,
) -> bool:
    """Merge one micro-batch's quantized-score cells (``llmops.
    evaluation._quantized_cells`` output) into ``target_table`` by
    (s_fp) SUM — the ``calib_cells_merge_batch`` ledger discipline with
    a ``kind`` discriminator column instead of a sentinel key value:
    AUC score cells span the whole BIGINT range (scores can be
    negative), so no s_fp value is safe to reserve, and the dirty-row
    cell already owns s_fp = NULL. Meta row: ``(kind='meta', cnt =
    last applied batch id)``; cells ride as ``kind='cell'`` and the
    merge groupBy keys (kind, s_fp) — NULL s_fp is a real group, never
    filtered (the round-7 streamed-calibration lesson, applied from
    birth)."""
    from ..operators.materialize import materialize_table

    cells = batch_cells.select(
        F.lit("cell").alias("kind"),
        F.col("s_fp").cast("bigint"),
        F.col("cnt").cast("bigint"),
        F.col("pos").cast("bigint"),
        F.col("bad").cast("bigint"),
    )
    if spark.catalog.tableExists(target_table):
        cur = spark.table(target_table)
        mark = cur.filter(F.col("kind") == "meta").select("cnt").collect()
        if mark and batch_id <= mark[0][0]:
            return False  # replay of an already-applied batch
        merged = (
            cur.filter(F.col("kind") == "cell")
            .unionByName(cells)
            .groupBy("kind", "s_fp")
            .agg(*[F.sum(c).alias(c) for c in _AUC_COLS])
        )
    else:
        merged = cells
    meta = spark.createDataFrame(
        [("meta", None, int(batch_id), 0, 0)], _AUC_SCHEMA
    )
    materialize_table(spark, target_table, merged.unionByName(meta))
    return True


def streaming_auc_ingest(
    stream: DataFrame,
    target_table: str,
    score_col: str,
    label_col: str,
    scale: int = 10**4,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain a ROC-AUC cell table over a scored stream — the
    ``streaming_calibration_ingest`` twin for the ranking metric: each
    micro-batch partial-aggregates its own (s_fp, cnt, pos, bad) cells
    and sum-merges them. Read the live AUC any time with
    ``auc_from_cells`` — identical numbers to running ``roc_auc`` over
    everything ingested so far (rank-sums derive from the cells, and
    cells are associative BIGINT sums, so merge order cannot matter).

    State bound: one row per DISTINCT quantized score, ≤ scale + 1 rows
    for in-[0,1] scores — the default ``scale = 10⁴`` is the streaming
    monitor's resolution knob (the batch operator's 10⁶ would mean up
    to a million register rows; a tie-granularity of 10⁻⁴ changes AUC
    only below any live-dashboard decision threshold)."""
    from ..llmops.evaluation import _quantized_cells

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cells = _quantized_cells(batch_df, score_col, label_col, int(scale))
        auc_cells_merge_batch(
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


def auc_from_cells(
    spark: SparkSession,
    target_table: str,
) -> DataFrame:
    """One-row exact AUC from a streamed cell table — the ``roc_auc``
    arithmetic (tie-aware BIGINT rank-sum, one float division on exact
    operands) folded in driver Python over the collected cells (bounded
    by the ingest ``scale``). Same guards as the batch operator: dirty
    rows and single-class relations raise."""
    rows = (
        spark.table(target_table)
        .filter(F.col("kind") == "cell")
        .collect()
    )
    n_bad = sum(int(r.bad) for r in rows)
    if n_bad > 0:
        raise ValueError(
            f"roc_auc: {n_bad} rows have NULL/NaN scores or labels outside"
            " {0, 1} — clean the eval relation first (silent exclusion"
            " would misreport the operating population)"
        )
    clean = sorted(
        ((int(r.s_fp), int(r.cnt), int(r.pos)) for r in rows),
        key=lambda t: t[0],
    )
    n = sum(c for _, c, _ in clean)
    n_pos = sum(p for _, _, p in clean)
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"roc_auc is undefined on a single-class relation: "
            f"n_pos={n_pos}, n_neg={n_neg}"
        )
    pr2, below = 0, 0
    for _, cnt, pos in clean:
        pr2 += pos * (2 * below + cnt + 1)
        below += cnt
    auc = round((pr2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg), 6)
    return spark.createDataFrame(
        [(n, n_pos, n_neg, len(clean), auc)],
        "n_rows bigint, n_pos bigint, n_neg bigint,"
        " n_score_cells bigint, auc double",
    )


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


def conformal_from_cells(
    spark: SparkSession,
    target_table: str,
    alpha: float = 0.1,
    scale: int = 10**4,
) -> DataFrame:
    """Live split-conformal threshold from a streamed score-cell table
    (``streaming_auc_ingest``'s (s_fp, cnt) state — labels ride along
    unused; a label-free calibration feed can ingest with a constant
    label): the ``llmops.evaluation.conformal_report`` order-statistic
    arithmetic folded over the collected bounded cells, so the
    monitor's threshold is IDENTICAL to the batch operator's at the
    same ingest ``scale``. Dirty rows raise like the batch path (a
    silently shrunk calibration set quietly weakens the guarantee).
    Returns one row: ``(n_cal, k, threshold)``."""
    import math
    from fractions import Fraction

    if not 0.0 < float(alpha) < 1.0:
        raise ValueError(f"alpha must be in (0, 1): got {alpha!r}")
    rows = (
        spark.table(target_table)
        .filter(F.col("kind") == "cell")
        .collect()
    )
    n_bad = sum(int(r.bad) for r in rows if r.s_fp is None)
    if n_bad > 0:
        raise ValueError(
            f"conformal_from_cells: {n_bad} ingested rows had NULL"
            " scores — the guarantee needs every held-out score"
        )
    clean = sorted(
        ((int(r.s_fp), int(r.cnt)) for r in rows if r.s_fp is not None),
        key=lambda t: t[0],
    )
    n_cal = sum(c for _, c in clean)
    k = math.ceil((n_cal + 1) * (1 - Fraction(float(alpha))))
    if k > n_cal:
        raise ValueError(
            f"conformal_from_cells: calibration set too small for"
            f" alpha={alpha!r} — k={k} > n_cal={n_cal}"
        )
    cum = 0
    q_fp = None
    for s_fp, cnt in clean:
        cum += cnt
        if cum >= k:
            q_fp = s_fp
            break
    return spark.createDataFrame(
        [(n_cal, int(k), round(q_fp / int(scale), 6))],
        "n_cal bigint, k bigint, threshold double",
    )


_MCN_SCHEMA = (
    "kind string, rr bigint, b bigint, c bigint, ww bigint, bad bigint"
)
_MCN_COLS = ["rr", "b", "c", "ww", "bad"]


def mcnemar_cells_merge_batch(
    spark: SparkSession,
    target_table: str,
    batch_cells: DataFrame,
    batch_id: int,
) -> bool:
    """Merge one micro-batch's 2×2 contingency fold (``llmops.
    evaluation._contingency_cells`` output) into ``target_table`` —
    the ``auc_cells_merge_batch`` ledger discipline at its smallest:
    the whole state is ONE cell row of five associative BIGINTs plus
    the ``(kind='meta', rr = last applied batch id)`` marker, so
    replays are idempotent and a crash between write and commit
    re-merges nothing twice."""
    from ..operators.materialize import materialize_table

    cells = batch_cells.select(
        F.lit("cell").alias("kind"),
        *[F.col(c).cast("bigint") for c in _MCN_COLS],
    )
    if spark.catalog.tableExists(target_table):
        cur = spark.table(target_table)
        mark = cur.filter(F.col("kind") == "meta").select("rr").collect()
        if mark and batch_id <= mark[0][0]:
            return False  # replay of an already-applied batch
        merged = (
            cur.filter(F.col("kind") == "cell")
            .unionByName(cells)
            .groupBy("kind")
            .agg(*[F.sum(c).alias(c) for c in _MCN_COLS])
        )
    else:
        merged = cells
    meta = spark.createDataFrame(
        [("meta", int(batch_id), 0, 0, 0, 0)], _MCN_SCHEMA
    )
    materialize_table(spark, target_table, merged.unionByName(meta))
    return True


def streaming_mcnemar_ingest(
    stream: DataFrame,
    target_table: str,
    correct_a_col: str,
    correct_b_col: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain the paired-classifier contingency table over a live
    judged stream — the ``streaming_auc_ingest`` twin for A/B model
    comparison: each micro-batch folds to its own five-integer cell
    row and sum-merges. Read the live verdict any time with
    ``mcnemar_from_cells`` — identical to running ``mcnemar_test``
    over everything ingested so far (the cells are associative sums,
    so merge order cannot matter)."""
    from ..llmops.evaluation import _contingency_cells

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cells = _contingency_cells(batch_df, correct_a_col, correct_b_col)
        mcnemar_cells_merge_batch(
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


def mcnemar_from_cells(
    spark: SparkSession, target_table: str, alpha: float = 0.05
) -> DataFrame:
    """The McNemar report off the streamed contingency table —
    batch-parity with ``mcnemar_test`` over everything ingested.
    Dirty ingests RAISE exactly like the batch operator (a paired
    contingency table with holes misreports both classifiers)."""
    from ..llmops.evaluation import mcnemar_report_from_counts

    row = (
        spark.table(target_table)
        .filter(F.col("kind") == "cell")
        .collect()
    )
    if len(row) != 1:
        raise ValueError(
            f"mcnemar_from_cells: expected exactly one cell row in"
            f" {target_table!r}, found {len(row)} — ingest first"
        )
    r = row[0]
    if int(r.bad) > 0:
        raise ValueError(
            f"mcnemar_test: {r.bad} items have NULL or non-binary"
            " outcomes — a paired contingency table needs both verdicts"
            " on every item"
        )
    return mcnemar_report_from_counts(
        spark, r.rr, r.b, r.c, r.ww, alpha=alpha
    )


_CHRF_SCHEMA = (
    "kind string, n int, a bigint, b bigint, c bigint"
)


def chrf_cells_merge_batch(
    spark: SparkSession,
    target_table: str,
    n_pairs: int,
    n_nulls: int,
    per_n_rows: list,
    batch_id: int,
    max_n: int = 6,
) -> bool:
    """Merge one micro-batch's chrF sufficient statistics into
    ``target_table`` under the exactly-once ledger (the
    ``mcnemar_cells_merge_batch`` discipline): state = one
    ``kind='cell'`` row per char-gram order carrying the three
    associative BIGINT sums (cand/ref/match as a/b/c), one
    ``kind='pairs'`` row carrying (n_pairs, n_null_pairs), and the
    ``kind='meta'`` marker whose ``a`` is the last applied batch id.
    Clipping is PER PAIR (inside one row), so per-batch cells
    sum-merge to exactly the whole-corpus counts as long as each
    (cand, ref) pair arrives whole in one batch — the document-level
    atomicity every row-shaped ingest has by construction."""
    from ..operators.materialize import materialize_table

    rows = [
        ("cell", int(n), int(cn), int(rn), int(mn))
        for (n, cn, rn, mn) in per_n_rows
    ]
    rows.append(("pairs", 0, int(n_pairs), int(n_nulls), 0))
    cells = spark.createDataFrame(rows, _CHRF_SCHEMA)
    if spark.catalog.tableExists(target_table):
        cur = spark.table(target_table)
        mark = cur.filter(F.col("kind") == "meta").select("a").collect()
        if mark and batch_id <= mark[0][0]:
            return False  # replay of an already-applied batch
        merged = (
            cur.filter(F.col("kind") != "meta")
            .unionByName(cells)
            .groupBy("kind", "n")
            .agg(
                F.sum("a").alias("a"),
                F.sum("b").alias("b"),
                F.sum("c").alias("c"),
            )
        )
    else:
        merged = cells
    meta = spark.createDataFrame(
        [("meta", 0, int(batch_id), 0, 0)], _CHRF_SCHEMA
    )
    materialize_table(spark, target_table, merged.unionByName(meta))
    return True


def streaming_chrf_ingest(
    stream: DataFrame,
    target_table: str,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_n: int = 6,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain corpus chrF over a live (candidate, reference) stream
    — the generation-eval twin of ``streaming_mcnemar_ingest``: each
    micro-batch folds to its bounded per-order count cells
    (``llmops.evaluation._chrf_gram_counts``) and sum-merges under the
    ledger. Read the live report any time with ``chrf_from_cells`` —
    identical to ``chrf_report`` over everything ingested (associative
    sums; per-pair clipping closed inside each batch row)."""
    from ..llmops.evaluation import _chrf_gram_counts

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        n_pairs, n_nulls, per_n = _chrf_gram_counts(
            batch_df, cand_col, ref_col, id_col, int(max_n)
        )
        rows = [
            (r["n"], r["cand_ngrams"], r["ref_ngrams"], r["match_ngrams"])
            for r in per_n.collect()  # bounded: <= max_n rows
        ]
        chrf_cells_merge_batch(
            batch_df.sparkSession, target_table, n_pairs, n_nulls, rows,
            batch_id, max_n=int(max_n),
        )

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def chrf_from_cells(
    spark: SparkSession,
    target_table: str,
    max_n: int = 6,
    beta: int = 2,
) -> DataFrame:
    """The chrF report off the streamed cells — batch-parity with
    ``chrf_report`` over everything ingested (the shared
    ``_chrf_assemble`` arithmetic on the summed integers). Raises when
    nothing valid was ingested, exactly like the batch operator."""
    from ..llmops.evaluation import _chrf_assemble

    state = spark.table(target_table)
    pr = state.filter(F.col("kind") == "pairs").collect()
    if len(pr) != 1:
        raise ValueError(
            f"chrf_from_cells: expected exactly one pairs row in"
            f" {target_table!r}, found {len(pr)} — ingest first"
        )
    n_pairs, n_nulls = int(pr[0].a), int(pr[0].b)
    if n_pairs == 0:
        raise ValueError("chrf_report: no non-NULL candidate/ref pairs")
    per_n = state.filter(F.col("kind") == "cell").select(
        F.col("n"),
        F.col("a").alias("cand_ngrams"),
        F.col("b").alias("ref_ngrams"),
        F.col("c").alias("match_ngrams"),
    )
    return _chrf_assemble(
        spark, n_pairs, n_nulls, per_n, int(max_n), int(beta) ** 2
    )
