"""The reference datamart assembled on the engine runtime.

Recreates the reference project's DAG (``dbt_project.yml:19-33``: stage
views -> intermediate views -> marts tables/incremental) as registered
models:

  stg_members          <- models/stage/members/stg_members.sql
  stg_claim_lines      <- models/stage/claims/stg_claim_lines.sql:3-8
  int_gap_col_status   <- models/intermediate/gaps/col/int_gap_col_status.sql
  int_gap_col_violations <- .../int_gap_col_violations.sql:3-30
  fct_gap_exceptions   <- models/marts/gaps/fct_gap_exceptions.sql
                          (incremental, unique_key=exception_key)

A user of the reference runs ``dbt run``; a user of this engine calls
``build_datamart(...).run()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ModelRegistry
from .gap_pipeline import (
    GapParams,
    fct_gap_exceptions,
    gap_status,
    gap_tri_state_violations,
)


def build_datamart(
    spark: SparkSession,
    raw_members: DataFrame,
    raw_claim_lines: DataFrame,
    codes: DataFrame,
    params: GapParams,
    run_ts: str = "1970-01-01 00:00:00",
) -> ModelRegistry:
    r = ModelRegistry(spark)
    r.add_source("raw_members", raw_members)
    r.add_source("raw_claim_lines", raw_claim_lines)
    r.add_source("col_fit_fobt_codes", codes)

    @r.model()
    def stg_members(ctx):
        # stg_members.sql: typed projection of the member seed
        return ctx.source("raw_members").select(
            F.col("member_id").cast("long").alias("member_id"),
            F.col("birth_date").cast("date").alias("birth_date"),
        )

    @r.model()
    def stg_claim_lines(ctx):
        # stg_claim_lines.sql:3-8: cast + upper-normalize proc_code
        return ctx.source("raw_claim_lines").select(
            F.col("claim_id").cast("long").alias("claim_id"),
            F.col("member_id").cast("long").alias("member_id"),
            F.col("service_date").cast("date").alias("service_date"),
            F.upper(F.col("proc_code")).alias("proc_code"),
        )

    @r.model()
    def int_gap_col_status(ctx):
        return gap_status(
            ctx.ref("stg_members"),
            ctx.ref("stg_claim_lines"),
            ctx.source("col_fit_fobt_codes"),
            params,
        )

    @r.model()
    def int_gap_col_violations(ctx):
        return gap_tri_state_violations(ctx.ref("int_gap_col_status"))

    @r.model(
        name="fct_gap_exceptions",
        materialized="incremental",
        incremental_strategy="append",
        unique_key="exception_key",
    )
    def fct_gap_exceptions_model(ctx):
        violations = ctx.ref("int_gap_col_violations")
        existing = ctx.this if ctx.is_incremental() else None
        return fct_gap_exceptions(violations, run_ts, existing=existing)

    return r
