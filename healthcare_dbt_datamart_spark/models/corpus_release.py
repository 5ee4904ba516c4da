"""The training-corpus release pipeline assembled on the engine runtime.

The LLM-data capstone, mirroring how ``datamart.py`` assembles the
reference datamart (dbt layered DAG: stage → intermediate → mart,
reference ``models/`` layout): every release step a curation team runs
before handing a corpus to a trainer, as registry models —

  stg_corpus        stage view: typed projection
  corpus_dedup      exact-dup resolution: keep the best copy per
                    md5(text) fingerprint (rank by quality desc, id asc)
  corpus_quality    gate: composite quality score + token floor
  corpus_release    eval-decontaminated release with split labels:
                    drop train/val docs sharing >= half their distinct
                    5-grams with the content-hash test split
  release_manifest  per-(source, split) release stats: doc count, token
                    total, quality range — what a data card reports

Every stage is a VIEW: ref() chains inline and Catalyst compiles the
whole funnel into one plan per consumer — the registry adds lineage and
operability, not execution cost. All decisions are engine-independent
(md5 fingerprints/splits, 6dp-rounded ratios), so the terminal manifest
has an exact DuckDB oracle.

Scale: dedup is one fingerprint groupBy-rank; quality is a projection;
decontamination is ONE join of md5-compressed gram keys against the
deduplicated eval gram set + one per-doc aggregation
(llmops/filtering.py::ngram_contamination); the manifest is one
partial-agg groupBy. No stage shuffles more than once, nothing
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans import ModelRegistry

QUALITY_FLOOR = 0.5
TOKEN_FLOOR = 5
CONTAMINATION_N = 5
CONTAMINATION_MAX = 0.5


def build_corpus_release(
    spark: SparkSession, raw_documents: DataFrame
) -> ModelRegistry:
    r = ModelRegistry(spark)
    r.add_source("raw_documents", raw_documents)

    @r.model()
    def stg_corpus(ctx):
        return ctx.source("raw_documents").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("text").cast("string").alias("text"),
            F.col("source").cast("string").alias("source"),
        )

    @r.model()
    def corpus_dedup(ctx):
        from ..llmops.textstats import quality_stats

        docs = ctx.ref("stg_corpus")
        q = quality_stats(docs, "text", "doc_id").select(
            "doc_id", "n_tokens", "quality_score"
        )
        scored = docs.join(q, "doc_id").withColumn(
            "fingerprint", F.md5("text")
        )
        w = Window.partitionBy("fingerprint").orderBy(
            F.col("quality_score").desc(), F.col("doc_id").asc()
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "fingerprint")
        )

    @r.model(materialized="table")
    def corpus_quality(ctx):
        # TABLE, not view: three downstream consumers read this relation
        # (the eval split, the candidate split, and the gram join inside
        # decontamination), and a view would inline the dedup window +
        # quality scan into each — Catalyst reuses plans, not results.
        # Materializing once is the dbt mid-funnel pattern (marts tables,
        # dbt_project.yml:31-33) and exactly what you'd do at 100 TB
        # (write the curated corpus once, fan out from the files).
        return ctx.ref("corpus_dedup").filter(
            (F.col("quality_score") >= QUALITY_FLOOR)
            & (F.col("n_tokens") >= TOKEN_FLOOR)
        )

    @r.model()
    def corpus_release(ctx):
        from ..llmops.filtering import ngram_contamination
        from ..llmops.splits import split_col

        sp = ctx.ref("corpus_quality").withColumn("split", split_col("text"))
        ev = sp.filter(F.col("split") == "test")
        cand = sp.filter(F.col("split") != "test")
        contam = ngram_contamination(
            ev, cand, "text", "doc_id", n=CONTAMINATION_N
        )
        dropped = contam.filter(
            F.col("contamination_ratio") >= CONTAMINATION_MAX
        ).select("doc_id")
        kept = cand.join(dropped, "doc_id", "left_anti")
        return kept.unionByName(ev)

    @r.model()
    def release_manifest(ctx):
        # integer counts + min/max (value SELECTION, not arithmetic) only:
        # a float mean over arbitrary partial-sum order is not
        # cross-engine hash-stable, and a data card wants totals anyway
        return (
            ctx.ref("corpus_release")
            .groupBy("source", "split")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                F.min("quality_score").alias("min_quality"),
                F.max("quality_score").alias("max_quality"),
            )
        )

    return r
