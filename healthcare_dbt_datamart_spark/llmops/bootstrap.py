"""Deterministic Poisson bootstrap — uncertainty for per-group metrics.

An eval pipeline that reports "source A's mean quality is 0.61 vs
B's 0.58" needs to know whether that gap is noise. The Poisson
bootstrap (Chamandy et al., "Estimating Uncertainty for Massive Data
Streams", Google 2012) is THE distributed-friendly resampling scheme:
instead of drawing n rows with replacement (which needs global
coordination), each row independently joins each replicate with weight
w ~ Poisson(1) — E[w] = 1, so every replicate is a with-replacement
resample in expectation, and the whole procedure is a map-side explode.

Everything here is DERANDOMIZED the way the sampling family is
(splits.py): the Poisson draw inverts the exact CDF against a uniform
from ``md5(seed:rep:id)`` — no RNG state, any engine with md5
reproduces every weight, every replicate, every interval (replayed
bit-for-bit against DuckDB in tests).

Integer discipline: the metric column must be integral (scale first —
cents, chars, tokens; the logbucket_sketch convention). Weighted sums
are then exact BIGINT arithmetic — merge-order-independent under ANY
partitioning — and the single float division per (group, replicate)
happens on exact operands, so engines agree on every replicate mean.

Scale shape: the explode is a map-side ×n_boot fan-out of (group, w, v)
triples — skinny rows, no raw text/vectors ride along; ONE shuffle
aggregates (group, rep) partial sums with full map-side combine; the
percentile walk runs over the bounded |groups|·n_boot replicate table,
windows partitioned by group. Nothing global, nothing driver-side.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# Exact Poisson(1) CDF thresholds: P(X <= k) = e^-1 * sum_{i<=k} 1/i!.
# Literals are the shortest round-trip doubles, shared verbatim with the
# DuckDB replay; draws above the last threshold cap at 7 (P ~ 1e-5).
_POISSON1_CDF = tuple(
    math.exp(-1.0) * sum(1.0 / math.factorial(i) for i in range(k + 1))
    for k in range(7)
)


def _u60(seed: str, rep: Column, ident: Column) -> Column:
    """Uniform in [0, 1): the first 15 hex digits of md5(seed:rep:id)
    as a 60-bit integer over 2^60 — the weighted_sample draw, keyed by
    replicate so each replicate is an independent resample."""
    h = F.md5(
        F.concat_ws(
            ":", F.lit(seed), rep.cast("string"), ident.cast("string")
        )
    )
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint").cast("double")
        / F.lit(float(1 << 60))
    )


def poisson1_weight(u: Column) -> Column:
    """Invert the exact Poisson(1) CDF at uniform ``u`` — the bootstrap
    replicate weight. Pure CASE chain on exact double literals."""
    w: Column = F.lit(7)
    for k in reversed(range(7)):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    n_boot: int = 40,
    alpha: float = 0.05,
    seed: str = "b1",
) -> DataFrame:
    """Percentile-bootstrap confidence interval for each group's mean of
    an INTEGRAL metric column: n_boot Poisson(1) replicates, each
    replicate's weighted mean computed in exact BIGINT sums, interval =
    the ceil(alpha/2·n)-th / ceil((1-alpha/2)·n)-th replicate means.

    Returns ``(group, n_rows, mean, ci_lo, ci_hi)`` — mean is the plain
    group mean of the original rows; all three statistics rounded 6dp.
    Empty replicates (all weights 0 — vanishingly rare beyond tiny
    groups) are excluded from the percentile walk, mirroring the
    standard practice of dropping degenerate resamples."""
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("bigint")
    rep_means = _replicate_means(df, value_col, group_col, id_col, n_boot, seed)
    by_mean = Window.partitionBy("grp").orderBy(
        F.col("_m").asc(), F.col("rep").asc()
    )
    per_grp = Window.partitionBy("grp")
    ranked = rep_means.withColumn(
        "_rn", F.row_number().over(by_mean)
    ).withColumn("_nb", F.count(F.lit(1)).over(per_grp))
    lo_rank = F.ceil(F.lit(alpha / 2.0) * F.col("_nb")).cast("int")
    hi_rank = F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("_nb")).cast("int")
    bounds = (
        ranked.filter(
            (F.col("_rn") == F.greatest(lo_rank, F.lit(1)))
            | (F.col("_rn") == hi_rank)
        )
        .groupBy("grp")
        .agg(
            F.round(F.min("_m"), 6).alias("ci_lo"),
            F.round(F.max("_m"), 6).alias("ci_hi"),
        )
    )
    base = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(v).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean"),
    )
    return (
        base.join(bounds, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            "mean",
            "ci_lo",
            "ci_hi",
        )
    )


def _replicate_means(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    n_boot: int,
    seed: str,
) -> DataFrame:
    """(grp, rep, _m): each replicate's Poisson-weighted mean per group
    — the shared resampling core of ``bootstrap_ci`` and
    ``bootstrap_diff_ci`` (one weighting rule, one place to fix it).
    Exact BIGINT weighted sums; empty replicates dropped."""
    v = F.col(value_col).cast("bigint")
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(int(n_boot) - 1))
    ).alias("rep")
    triples = df.select(
        F.col(group_col).alias("grp"), v.alias("_v"), F.col(id_col), reps
    ).select(
        "grp",
        "rep",
        "_v",
        poisson1_weight(_u60(seed, F.col("rep"), F.col(id_col))).alias("_w"),
    )
    return (
        triples.groupBy("grp", "rep")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("_ws"),
            F.sum("_w").alias("_wn"),
        )
        .filter(F.col("_wn") > 0)
        .select(
            "grp",
            "rep",
            (F.col("_ws").cast("double") / F.col("_wn")).alias("_m"),
        )
    )


def bootstrap_diff_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    group_a: str,
    group_b: str,
    n_boot: int = 40,
    alpha: float = 0.05,
    seed: str = "b1",
) -> DataFrame:
    """The A/B question itself: a percentile-bootstrap interval for
    mean(A) − mean(B). Replicates PAIR by index — replicate r resamples
    BOTH groups with the same r-keyed draws and contributes one
    difference — which is the correct bootstrap of a difference (the
    two groups' rows are disjoint, so the pairing costs nothing and the
    replicate count stays n_boot, not n_boot²).

    Returns ONE row: ``(mean_a, mean_b, diff, ci_lo, ci_hi,
    significant)`` — ``significant`` is true when the interval excludes
    0 (the "act on this gap" bit a curation dashboard wants). Same
    integer-exact, md5-derandomized machinery as ``bootstrap_ci``:
    identical inputs reproduce the identical verdict on any engine.

    Scale shape: one ×n_boot map-side fan-out of the two groups' rows,
    ONE (group, rep) shuffle with full partial aggregation, then a
    2·n_boot-row table pivots and walks driver-free."""
    from pyspark.sql.window import Window

    # retag groups to fixed 'a'/'b' labels BEFORE any pivot: group
    # VALUES become column names downstream, and a raw value holding a
    # dot or backtick (model ids like 'model.v1' — the natural A/B
    # keys) would break F.col resolution on the pivoted frame
    two = df.filter(F.col(group_col).isin([group_a, group_b])).withColumn(
        "_tag",
        F.when(F.col(group_col) == group_a, F.lit("a")).otherwise(
            F.lit("b")
        ),
    )
    v = F.col(value_col).cast("bigint")
    rep_means = _replicate_means(two, value_col, "_tag", id_col, n_boot, seed)
    diffs = (
        rep_means.groupBy("rep")
        .pivot("grp", ["a", "b"])
        .agg(F.first("_m"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .select("rep", (F.col("a") - F.col("b")).alias("_d"))
    )
    by_diff = Window.orderBy(F.col("_d").asc(), F.col("rep").asc())
    all_rows = Window.partitionBy()
    ranked = diffs.withColumn("_rn", F.row_number().over(by_diff)).withColumn(
        "_nb", F.count(F.lit(1)).over(all_rows)
    )
    lo_rank = F.ceil(F.lit(alpha / 2.0) * F.col("_nb")).cast("int")
    hi_rank = F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("_nb")).cast("int")
    bounds = ranked.filter(
        (F.col("_rn") == F.greatest(lo_rank, F.lit(1)))
        | (F.col("_rn") == hi_rank)
    ).agg(
        F.round(F.min("_d"), 6).alias("ci_lo"),
        F.round(F.max("_d"), 6).alias("ci_hi"),
    )
    base = (
        two.groupBy(F.col("_tag").alias("grp"))
        .agg((F.sum(v).cast("double") / F.count(F.lit(1))).alias("_m"))
        .groupBy()
        .pivot("grp", ["a", "b"])
        .agg(F.first("_m"))
        .select(
            F.round(F.col("a"), 6).alias("mean_a"),
            F.round(F.col("b"), 6).alias("mean_b"),
            F.round(F.col("a") - F.col("b"), 6).alias("diff"),
        )
    )
    return base.crossJoin(broadcast(bounds)).select(
        "mean_a",
        "mean_b",
        "diff",
        "ci_lo",
        "ci_hi",
        ((F.col("ci_lo") > 0) | (F.col("ci_hi") < 0)).alias("significant"),
    )


def paired_bootstrap_test(
    df: DataFrame,
    value_a_col: str,
    value_b_col: str,
    id_col: str,
    n_boot: int = 40,
    alpha: float = 0.05,
    seed: str = "p1",
) -> DataFrame:
    """PAIRED bootstrap significance test for two systems scored on the
    SAME items (Koehn 2004, "Statistical Significance Tests for Machine
    Translation Evaluation" — the standard eval-comparison test):
    resample ITEMS once per replicate and average the per-item
    differences ``a_i − b_i``. Pairing is the point: when per-item
    scores correlate (they always do — hard items are hard for both
    systems), the difference variance is far below either system's
    variance, so the paired interval detects gains the UNPAIRED
    ``bootstrap_diff_ci`` cannot (its two groups resample
    independently; use it when the rows are genuinely disjoint
    populations). The test pins exactly this: a small consistent gain
    under large item variance is significant here, invisible there.

    Same conventions as the rest of the family: both metric columns
    INTEGRAL (the per-item difference is exact BIGINT), one
    ``md5(seed:rep:id)`` Poisson(1) draw per (replicate, item) — one
    draw, since the pair shares its weight by construction — exact
    weighted sums, percentile walk on ceil ranks, NULL scores raise
    (a hole in a paired grid silently unpairs the test).

    Returns ONE row: ``(n_items, mean_a, mean_b, diff, ci_lo, ci_hi,
    significant, n_a_wins, n_b_wins, n_ties)`` — wins are per-item
    sign counts, the quick-read column next to the interval.
    """
    from pyspark.sql.window import Window

    a = F.col(value_a_col).cast("bigint")
    b = F.col(value_b_col).cast("bigint")
    chk = df.agg(
        F.sum((a.isNull() | b.isNull()).cast("bigint")).alias("nb"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if int(chk.nb or 0) > 0:
        raise ValueError(
            f"paired_bootstrap_test: {chk.nb} items have a NULL score —"
            " a paired test needs BOTH systems scored on every item"
        )
    if int(chk.n or 0) < 2:
        raise ValueError(
            f"paired_bootstrap_test needs >= 2 items: got {chk.n}"
        )

    proj = df.select(
        F.lit("x").alias("_g"), (a - b).alias("_d"), F.col(id_col)
    )
    rep_means = _replicate_means(proj, "_d", "_g", id_col, n_boot, seed)
    by_diff = Window.orderBy(F.col("_m").asc(), F.col("rep").asc())
    all_rows = Window.partitionBy()
    ranked = rep_means.withColumn(
        "_rn", F.row_number().over(by_diff)
    ).withColumn("_nb", F.count(F.lit(1)).over(all_rows))
    lo_rank = F.ceil(F.lit(alpha / 2.0) * F.col("_nb")).cast("int")
    hi_rank = F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("_nb")).cast("int")
    bounds = ranked.filter(
        (F.col("_rn") == F.greatest(lo_rank, F.lit(1)))
        | (F.col("_rn") == hi_rank)
    ).agg(
        F.round(F.min("_m"), 6).alias("ci_lo"),
        F.round(F.max("_m"), 6).alias("ci_hi"),
    )
    base = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum(a).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_a"
        ),
        F.round(F.sum(b).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_b"
        ),
        F.round(
            F.sum(a - b).cast("double") / F.count(F.lit(1)), 6
        ).alias("diff"),
        F.sum((a > b).cast("bigint")).alias("n_a_wins"),
        F.sum((a < b).cast("bigint")).alias("n_b_wins"),
        F.sum((a == b).cast("bigint")).alias("n_ties"),
    )
    return base.crossJoin(broadcast(bounds)).select(
        "n_items",
        "mean_a",
        "mean_b",
        "diff",
        "ci_lo",
        "ci_hi",
        ((F.col("ci_lo") > 0) | (F.col("ci_hi") < 0)).alias("significant"),
        "n_a_wins",
        "n_b_wins",
        "n_ties",
    )
