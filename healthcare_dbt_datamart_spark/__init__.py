"""healthcare_dbt_datamart_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference dbt
project ``jdvisual/healthcare-dbt-datamart`` (a HEDIS COL gap-closure
datamart targeting Snowflake) as an idiomatic Spark engine:

- the datamart layer (staging -> intermediate -> marts SQL transforms)
  becomes lazy DataFrame pipelines optimized by Catalyst;
- the dbt runtime layer (DAG scheduling, view/table/incremental/snapshot
  materializations, schema tests, freshness, the cross-database macro
  surface) becomes a small Python runtime over Spark's catalog;
- beyond the reference: LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) and Structured Streaming
  analogs of Snowflake dynamic tables / microbatch.

Everything is designed for 100 TB scale: no driver-side collects on data
paths, bounded broadcasts for code sets / dimensions, partial aggregation,
range-partitioned writes, AQE-friendly shuffles.
"""

__version__ = "0.1.0"
