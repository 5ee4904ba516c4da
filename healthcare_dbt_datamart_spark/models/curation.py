"""A corpus-curation pipeline assembled on the engine runtime.

The LLM-data operators (llmops/) and the dbt-style runtime (plans/
registry) are one engine: this module registers a curation DAG the same
way ``datamart.py`` registers the reference datamart —

  stg_documents      stage view: typed projection (the staging idiom)
  curation_report    mart: the per-source filter-funnel rollup (all
                     per-doc signals from ONE tokenized projection
                     inside textstats.curation_funnel)

so ``ref()`` resolution, view inlining, hooks, manifest, and graph
selection all apply to corpus work unchanged. A team that runs the
datamart with ``build_datamart(...).run()`` runs corpus QA with
``build_curation(...).run()``.

Catalyst sees the whole DAG as one plan (views inline), so the funnel
mart compiles to the same single-scan shape as calling
``textstats.curation_funnel`` directly — the registry adds lineage and
operability, not execution cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ModelRegistry


def build_curation(spark: SparkSession, raw_documents: DataFrame) -> ModelRegistry:
    r = ModelRegistry(spark)
    r.add_source("raw_documents", raw_documents)

    @r.model()
    def stg_documents(ctx):
        # stage: typed projection, the datamart staging idiom on a corpus
        return ctx.source("raw_documents").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("text").cast("string").alias("text"),
            F.col("lang").cast("string").alias("lang"),
            F.col("source").cast("string").alias("source"),
        )

    @r.model()
    def curation_report(ctx):
        from ..llmops.textstats import curation_funnel

        return curation_funnel(
            ctx.ref("stg_documents"), "text", "doc_id", "lang", "source"
        )

    return r
