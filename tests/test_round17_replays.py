"""Driver-SHAPE DuckDB oracle replays for the round-17 promotion queue.

Eighth file in the pre-proof convention. Cohort here: the RLHF
data-construction pair — best_of_n (rejection sampling over a reward
column) and dpo_pairs (chosen/rejected preference pairs with a reward
margin), both over the events table as the natural (prompt, response,
reward) relation (user = prompt, event = response, value = reward).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.battery  # opt-out: `-m "not battery"` fast path

SF_DIR = "/root/testdata/sf0.001"


def _compare(spark_df, oracle_sql, tables=("events",)):
    import duckdb

    from tools.check_correctness import frame_fingerprint

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        res = con.execute(oracle_sql)
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    sc, sn, sh = frame_fingerprint(s_cols, s_rows)
    dc, dn, dh = frame_fingerprint(d_cols, d_rows)
    assert sn > 0, "empty Spark result voids the replay"
    assert sc == dc, f"schema {sc} vs oracle {dc}"
    assert sn == dn, f"rows {sn} vs oracle {dn}"
    assert sh == dh, "value-hash mismatch vs DuckDB oracle"


def test_best_of_n_driver_shape_duckdb_replay(spark):
    """Best-of-n at the future query shape: per user keep the
    highest-value event — one rank-then-filter window per prompt
    partition, ties on ascending event id, NULL rewards never win."""
    from healthcare_dbt_datamart_spark.llmops.preferences import best_of_n

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").alias("prompt_id"),
        F.col("event_id").alias("response_id"),
        F.col("value").cast("double").alias("reward"),
    )
    out = best_of_n(ev)

    sql = """
WITH s AS (
  SELECT user_id AS prompt_id, event_id AS response_id,
         CAST(value AS DOUBLE) AS reward
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY prompt_id
              ORDER BY reward DESC NULLS LAST, response_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY prompt_id) AS n_samples
  FROM s
)
SELECT prompt_id, response_id, reward,
       CAST(n_samples AS BIGINT) AS n_samples
FROM ranked WHERE rn = 1
"""
    _compare(out, sql)


def test_dpo_pairs_driver_shape_duckdb_replay(spark):
    """DPO pair construction at the future query shape: per user the
    highest-value event (chosen) against the lowest (rejected), kept
    only when the reward gap exceeds the margin — 6dp gap, NULL
    rewards excluded up front, single-response prompts pair with
    themselves and drop."""
    from healthcare_dbt_datamart_spark.llmops.preferences import dpo_pairs

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").alias("prompt_id"),
        F.col("event_id").alias("response_id"),
        F.col("value").cast("double").alias("reward"),
    )
    out = dpo_pairs(ev, min_margin=0.5)

    sql = """
WITH s AS (
  SELECT user_id AS prompt_id, event_id AS response_id,
         CAST(value AS DOUBLE) AS reward
  FROM events
  WHERE value IS NOT NULL
),
ranked AS (
  SELECT prompt_id AS prompt, response_id AS resp, reward AS r,
    row_number() OVER (PARTITION BY prompt_id
      ORDER BY reward DESC, response_id ASC) AS best,
    row_number() OVER (PARTITION BY prompt_id
      ORDER BY reward ASC, response_id ASC) AS worst
  FROM s
),
b AS (SELECT prompt, resp AS chosen, r AS reward_chosen
      FROM ranked WHERE best = 1),
w AS (SELECT prompt, resp AS rejected, r AS reward_rejected
      FROM ranked WHERE worst = 1)
SELECT prompt AS prompt_id, chosen, rejected,
       reward_chosen, reward_rejected,
       round(reward_chosen - reward_rejected, 6) AS reward_gap
FROM b JOIN w USING (prompt)
WHERE chosen != rejected
  AND round(reward_chosen - reward_rejected, 6) > 0.5
"""
    _compare(out, sql)
    rows = out.collect()
    assert all(r.reward_gap > 0.5 for r in rows)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))
