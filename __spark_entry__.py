"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship tri-state gap-status pipeline at sf0.001;
``queries``/``oracle_sql`` expose the operator inventory from SURVEY.md §2
implemented in ``healthcare_dbt_datamart_spark`` with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from healthcare_dbt_datamart_spark.models import testdata_queries as tq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tq.q_gap_status(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(tq.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/types)."""
    return dict(tq.ORACLE)
