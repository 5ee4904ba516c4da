"""The model-LEADERBOARD release pipeline on the engine runtime — the
evaluation capstone beside ``corpus_release`` (data funnel) and
``index_release`` (ANN serving): the third loop the engine closes with
the fail-as-data gate pattern.

A published leaderboard is a RELEASE ARTIFACT exactly like a curated
corpus or a serving index: an aggregated state table + derived rating
frames + a manifest row whose fields ARE the verdict (reference analog:
``dbt-adapters/macros/materializations/tests/helpers.sql:7-16`` — a
gate is a query whose rows are the result). The same registry that runs
the datamart runs this:

  stg_matches      stage view: typed projection of the raw pairwise
                   match log (winner, loser, rating period)
  pair_period_counts TABLE — the ONE corpus-scale collapse: (winner,
                   loser, period, n) pair counts, sufficient statistics
                   for every rating frame below (within a period all
                   (w, l) matches share one Elo expected score), so the
                   raw log is scanned exactly once per release
  pair_counts      TABLE — the bounded SUM-mergeable directed win-count
                   state (``bradley_terry_from_pairs``'s input shape;
                   a streaming ingest maintains exactly this relation,
                   streaming/sketches.py::pref_counts_merge_batch), so
                   the leaderboard re-derives between releases without
                   re-scanning outcomes; re-aggregated from
                   ``pair_period_counts``
  bt_ratings       Bradley-Terry MM fit FROM the state table — the
                   static latent-quality ranking
  elo_snapshot     period-batched Elo over the same log — the
                   through-time ranking (``elo_ratings``)
  wilson_board     win rates with Wilson intervals + lower-bound ranks
  leaderboard      the published join: one row per item carrying both
                   ratings, the interval, and both rank columns
  leaderboard_gate terminal ONE-row verdict, exact-integer/boolean
                   release arithmetic: enough items, every ranked item
                   above the match-volume floor, the two rating systems
                   agreeing on the leader, and the leader's Wilson
                   lower bound clearing the runner-up's upper bound
                   (statistical separation — reported AND gated only by
                   agreement + volume, the separation bit published for
                   the release notes).

Scale: the raw log collapses once to ``pair_counts`` (one shuffle,
partial-agg); every rating frame is bounded model state (one row per
item — a leaderboard's item set is its model list); the gate is a
3-way join of bounded frames. The DAG's lineage/retry machinery is the
registry's — nothing here is new execution machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ModelRegistry

BT_ROUNDS = 3
ELO_K = 32
MIN_MATCHES = 10  # release bar: every ranked item has >= this many


def build_leaderboard_release(
    spark: SparkSession,
    raw_matches: DataFrame,
    precomputed: dict[str, DataFrame] | None = None,
) -> ModelRegistry:
    """``precomputed`` optionally injects session-cached frames for the
    state/rating models (keys: ``pair_period_counts``, ``bt_ratings``,
    ``elo_snapshot``, ``wilson_board``). Each must be the EXACT
    relation the model would compute — a session cache or a streaming
    ingest's state/serving table — so the release skips recomputation
    and only materializes the artifact. A warm-start hook, not a
    semantic knob: downstream frames are bit-identical by the caller's
    contract (the same hook a production release uses to serve ratings
    maintained incrementally between releases). Every injected frame
    passes through the same normalizing select as the computed path
    (expected columns + casts — the ``pair_period_counts`` discipline),
    so a caller-supplied frame with stray columns or drifted types
    cannot flow silently into the leaderboard join and gate."""
    pre = precomputed or {}
    unknown = set(pre) - {
        "pair_period_counts", "bt_ratings", "elo_snapshot", "wilson_board",
    }
    if unknown:
        raise ValueError(
            f"build_leaderboard_release: unknown precomputed keys {unknown}"
        )
    r = ModelRegistry(spark)
    r.add_source("raw_matches", raw_matches)
    for k, df in pre.items():
        r.add_source(f"{k}_pre", df)

    @r.model()
    def stg_matches(ctx):
        return ctx.source("raw_matches").select(
            F.col("winner_id").cast("string").alias("winner_id"),
            F.col("loser_id").cast("string").alias("loser_id"),
            F.col("period").cast("bigint").alias("period"),
        )

    @r.model(materialized="table")
    def pair_period_counts(ctx):
        # TABLE: the ONE corpus-scale collapse. Within a rating period
        # every (w, l) pair shares one Elo expected score, so this
        # (winner, loser, period, n) relation is sufficient statistics
        # for EVERY downstream rating frame — the raw match log is
        # scanned exactly once per release, and Elo/Wilson/BT all
        # derive from the bounded pair table (items²·periods, model
        # state at leaderboard scale).
        if "pair_period_counts" in pre:
            # pre-collapsed injection: normalize types, keep the
            # degenerate-row guard (cheap on the bounded pair table)
            return ctx.source("pair_period_counts_pre").select(
                F.col("winner_id").cast("string").alias("winner_id"),
                F.col("loser_id").cast("string").alias("loser_id"),
                F.col("period").cast("bigint").alias("period"),
                F.col("n_m").cast("long").alias("n_m"),
            ).filter(F.col("winner_id") != F.col("loser_id"))
        m = ctx.ref("stg_matches").filter(
            F.col("winner_id") != F.col("loser_id")
        )
        return m.groupBy("winner_id", "loser_id", "period").agg(
            F.count(F.lit(1)).cast("long").alias("n_m")
        )

    @r.model()
    def pair_counts(ctx):
        # doubled directed win counts, the SUM-mergeable shape a
        # streaming ingest maintains (bradley_terry_from_pairs input);
        # re-aggregated from the period table, NOT the raw log. A VIEW:
        # it is one groupBy of the materialized pair_period_counts
        # table and is read exactly once (by bt_ratings, which persists
        # its own pair frame) — a table write buys nothing at release
        # cadence.
        return ctx.ref("pair_period_counts").groupBy(
            F.col("winner_id").alias("i"), F.col("loser_id").alias("j")
        ).agg((F.lit(2) * F.sum("n_m")).alias("w2"))

    @r.model()
    def bt_ratings(ctx):
        if "bt_ratings" in pre:
            # normalizing select: exactly bradley_terry_from_pairs'
            # output shape, types pinned (item joins the string-keyed
            # elo/wilson frames downstream)
            return ctx.source("bt_ratings_pre").select(
                F.col("item").cast("string").alias("item"),
                F.col("wins2").cast("long").alias("wins2"),
                F.col("comparisons2").cast("long").alias("comparisons2"),
                F.col("rating_fp").cast("long").alias("rating_fp"),
            )
        from ..llmops.preferences import bradley_terry_from_pairs

        # pair_counts is one groupBy of the pair-period table — unique
        # per (i, j) by construction; skip the defensive re-aggregation
        return bradley_terry_from_pairs(
            ctx.ref("pair_counts"), n_iter=BT_ROUNDS, pre_collapsed=True
        )

    @r.model()
    def elo_snapshot(ctx):
        if "elo_snapshot" in pre:
            # the published through-time board (k=ELO_K) served from a
            # session cache or streaming state — normalized to
            # elo_ratings' exact output shape
            return ctx.source("elo_snapshot_pre").select(
                F.col("item").cast("string").alias("item"),
                F.col("n_matches").cast("long").alias("n_matches"),
                F.col("wins").cast("long").alias("wins"),
                F.col("rating_fp").cast("long").alias("rating_fp"),
            )
        from ..llmops.preferences import elo_ratings

        # weighted rows over the shared collapse — bit-identical to
        # per-match rows (shared period expected score), one log scan;
        # pre_collapsed: the state table is unique by construction, so
        # the internal re-aggregation would be a wasted shuffle
        return elo_ratings(
            ctx.ref("pair_period_counts"), k=ELO_K, n_col="n_m",
            pre_collapsed=True,
        )

    @r.model()
    def wilson_board(ctx):
        if "wilson_board" in pre:
            # normalizing select: wilson_winrate's exact output shape
            return ctx.source("wilson_board_pre").select(
                F.col("item").cast("string").alias("item"),
                F.col("n_matches").cast("long").alias("n_matches"),
                F.col("wins").cast("long").alias("wins"),
                F.col("winrate").cast("double").alias("winrate"),
                F.col("ci_lo").cast("double").alias("ci_lo"),
                F.col("ci_hi").cast("double").alias("ci_hi"),
                F.col("rank_lb").cast("long").alias("rank_lb"),
            )
        from ..llmops.preferences import wilson_winrate

        return wilson_winrate(
            ctx.ref("pair_period_counts"), n_col="n_m"
        )

    @r.model()
    def leaderboard(ctx):
        from pyspark.sql.window import Window

        bt = ctx.ref("bt_ratings").select(
            "item", F.col("rating_fp").alias("bt_fp")
        )
        elo = ctx.ref("elo_snapshot").select(
            "item", "n_matches", "wins", F.col("rating_fp").alias("elo_fp")
        )
        wb = ctx.ref("wilson_board").select(
            "item", "winrate", "ci_lo", "ci_hi", "rank_lb"
        )
        # rank windows run on the bounded item frame (model state)
        w_bt = Window.orderBy(F.col("bt_fp").desc(), F.col("item").asc())
        w_elo = Window.orderBy(F.col("elo_fp").desc(), F.col("item").asc())
        return (
            elo.join(bt, "item")
            .join(wb, "item")
            .withColumn("rank_bt", F.row_number().over(w_bt).cast("bigint"))
            .withColumn(
                "rank_elo", F.row_number().over(w_elo).cast("bigint")
            )
        )

    @r.model()
    def leaderboard_gate(ctx):
        lb = ctx.ref("leaderboard")
        top_bt = F.min(F.when(F.col("rank_bt") == 1, F.col("item")))
        top_elo = F.min(F.when(F.col("rank_elo") == 1, F.col("item")))
        top_lo = F.min(F.when(F.col("rank_lb") == 1, F.col("ci_lo")))
        runner_hi = F.max(
            F.when(F.col("rank_lb") != 1, F.col("ci_hi"))
        )
        agg = lb.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            # each match counts once per side; integer `div` keeps the
            # halved count exact BIGINT past 2^53 (float `/` would not)
            F.expr("sum(n_matches) div 2").cast("bigint").alias(
                "n_matches"
            ),
            F.min("n_matches").cast("bigint").alias("min_item_matches"),
            top_bt.alias("bt_top"),
            top_elo.alias("elo_top"),
            top_lo.alias("top_ci_lo"),
            runner_hi.alias("runner_ci_hi"),
        )
        return agg.select(
            "n_items",
            "n_matches",
            "min_item_matches",
            "bt_top",
            "elo_top",
            (F.col("bt_top") == F.col("elo_top")).alias("tops_agree"),
            "top_ci_lo",
            "runner_ci_hi",
            (F.col("top_ci_lo") > F.col("runner_ci_hi")).alias("separated"),
            (
                (F.col("n_items") >= F.lit(2))
                & (F.col("min_item_matches") >= F.lit(MIN_MATCHES))
                & (F.col("bt_top") == F.col("elo_top"))
            ).alias("released"),
        )

    return r
