"""Custom stateful streaming operators (``applyInPandasWithState``).

No reference counterpart (Snowflake dynamic tables are stateless
re-materializations) — this is the Spark-native extension point SURVEY
§2.11/§2.12 reserves for operators the built-in windowed aggregations
can't express: per-key running state that survives across micro-batches.

Scale notes: state lives in the executors' state store partitioned by the
grouping key (RocksDB-backed in production via
``spark.sql.streaming.stateStore.providerClass``); each micro-batch
shuffles only that batch's rows to their key's partition, and the Arrow
batch transfer keeps the Python boundary vectorized (one pandas frame per
key-group per batch, not per row).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches.

    Each trigger emits one updated row per user seen in the batch — the
    canonical "running aggregate" custom stateful operator. Works only on
    a streaming DataFrame (use a plain groupBy/agg for batch).
    """
    out_schema = f"{user_col} long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
