"""Distribution-drift monitoring over mergeable sketches: PSI and KS.

A corpus pipeline re-ingests continuously; "did this week's crawl shift
the length/quality/score distribution?" is a standing question. Both
classic answers are computed here ON THE LOG-BUCKET SKETCH
(sketches.py::logbucket_sketch) rather than the raw data:

- PSI (population stability index, the credit-scoring / ML-ops
  standard): sum over bins of (p - q) · ln(p / q). Rule-of-thumb
  thresholds 0.1 (watch) / 0.25 (act).
- KS statistic: max |CDF_a - CDF_b| over the bucket boundaries — the
  exact KS up to the sketch's 2^-s relative bucket width.

Why sketch-side: each snapshot collapses to ≤ 63·2^s integer cells in
ONE shuffle with full partial aggregation, the cells SUM-merge across
shards/days/micro-batches (the count-min discipline), and the drift
comparison itself joins two model-sized tables — so a daily monitor
over a 100 TB corpus stores kilobytes per day and never rescans
history. Laplace +1 smoothing keeps PSI finite when a bucket is empty
on one side (the standard practical fix), applied to BOTH sides so the
statistic stays symmetric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import logbucket_sketch


def sketch_drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    s: int = 4,
) -> DataFrame:
    """One-row drift report between two snapshots of an integral metric
    column: ``(n_a, n_b, n_bins, psi, ks)``, both statistics rounded
    6dp. ``df_a`` is the reference (training-time / last-accepted)
    snapshot, ``df_b`` the candidate.

    Shape: two sketch shuffles (one per input — unavoidable: two
    corpora), a full-outer join of the two bounded cell tables on
    (b, m), then single-partition windows over ≤ 63·2^s rows for the
    CDF walk. Totals fold as windows over the joined sketch — no
    plan-splitting aggregate branches (the temperature_weights
    discipline)."""
    return sketch_drift_from_cells(
        logbucket_sketch(df_a, value_col, s=s),
        logbucket_sketch(df_b, value_col, s=s),
    )


def sketch_drift_from_cells(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
) -> DataFrame:
    """The drift report from two ALREADY-BUILT cell tables (b, m, cnt)
    — the incremental path: the streaming sinks
    (``streaming/sketches.py::streaming_logbucket_ingest``) maintain
    exactly this shape per feed, so a continuously-updated drift
    monitor joins two kilobyte tables and never touches raw data at
    all. ``sketch_drift_report`` is the batch convenience over this."""
    from pyspark.sql.window import Window

    ka = sketch_a.withColumnsRenamed({"cnt": "cnt_a"})
    kb = sketch_b.withColumnsRenamed({"cnt": "cnt_b"})
    cells = (
        ka.join(kb, ["b", "m"], "full_outer")
        .select(
            "b",
            "m",
            F.coalesce("cnt_a", F.lit(0)).alias("ca"),
            F.coalesce("cnt_b", F.lit(0)).alias("cb"),
        )
    )
    all_rows = Window.partitionBy()  # sketch-sized: bounded model state
    walk = Window.orderBy("b", "m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = (
        cells.withColumn("_na", F.sum("ca").over(all_rows))
        .withColumn("_nb", F.sum("cb").over(all_rows))
        .withColumn("_nbins", F.count(F.lit(1)).over(all_rows))
        # Laplace +1 smoothing on both sides: finite log-ratio on
        # one-sided bins, symmetric, vanishing as counts grow
        .withColumn(
            "_p",
            (F.col("ca") + F.lit(1)).cast("double")
            / (F.col("_na") + F.col("_nbins")),
        )
        .withColumn(
            "_q",
            (F.col("cb") + F.lit(1)).cast("double")
            / (F.col("_nb") + F.col("_nbins")),
        )
        .withColumn(
            "_psi_term",
            (F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q")),
        )
        # raw (unsmoothed) CDFs for KS — exact at bucket boundaries. An
        # EMPTY side means maximal drift BY DEFINITION (an upstream
        # ingest failure is exactly what the monitor must catch), not
        # an unknowable one: the NULL a 0-division would produce reads
        # as "no drift" to any `ks > threshold` alarm
        .withColumn(
            "_cdf_gap",
            F.when(
                (F.col("_na") == 0) | (F.col("_nb") == 0), F.lit(1.0)
            ).otherwise(
                F.abs(
                    F.sum("ca").over(walk).cast("double") / F.col("_na")
                    - F.sum("cb").over(walk).cast("double") / F.col("_nb")
                )
            ),
        )
    )
    return t.agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max("_nbins").alias("n_bins"),
        F.round(F.sum("_psi_term"), 6).alias("psi"),
        F.round(F.max("_cdf_gap"), 6).alias("ks"),
    )
