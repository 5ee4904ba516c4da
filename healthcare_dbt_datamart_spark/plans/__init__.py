"""Model registry + DAG runner (the dbt-core analog, SURVEY §3)."""

from .registry import ModelContext, ModelRegistry  # noqa: F401
