"""Driver-SHAPE DuckDB oracle replays for the round-10 queue leaders.

The round-10 queue registers the leaderboard/mixture wave
(models/testdata_queries.py rotation comment). Promotion requires a
``queries()`` builder + ``oracle_sql()`` twin; these tests pre-build
BOTH at the exact input shape the future query will use (cheaper-
supplier-wins matches from lineitem with period = order year, over the
REAL sf0.001 parquet) and compare with the driver gate's exact
fingerprint (``tools/check_correctness.frame_fingerprint`` — columns
sorted by name, rows sorted, order-insensitive md5). When the round-10
rotation promotes ``elo_ratings``/``wilson_winrate``, the query bodies
and oracle SQL lift from here already hash-proven — the
``test_deferral_replays`` convention applied before promotion instead
of after deferral.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.battery  # opt-out: `-m "not battery"` fast path

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_MATCH_CTE = """
lx AS MATERIALIZED (
  SELECT l_orderkey, l_suppkey AS supp,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
),
m AS MATERIALIZED (
  SELECT CAST(a.supp AS VARCHAR) AS w, CAST(b.supp AS VARCHAR) AS l,
         CAST(year(o_orderdate) AS BIGINT) AS p
  FROM lx a JOIN lx b USING (l_orderkey)
  JOIN orders ON l_orderkey = o_orderkey
  WHERE a.supp != b.supp AND a.cents * b.qty < b.cents * a.qty
),
tot AS MATERIALIZED (
  SELECT item, COUNT(*) AS n_matches, SUM(win) AS wins
  FROM (SELECT w AS item, 1 AS win FROM m
        UNION ALL SELECT l, 0 FROM m)
  GROUP BY item
)"""


def _spark_matches(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lx = li.select(
        "l_orderkey",
        F.col("l_suppkey").alias("supp"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    a, b = lx.alias("a"), lx.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(
            (F.col("a.supp") != F.col("b.supp"))
            & (
                F.col("a.cents") * F.col("b.qty")
                < F.col("b.cents") * F.col("a.qty")
            )
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("a.supp").alias("winner_id"),
            F.col("b.supp").alias("loser_id"),
            F.year("o_orderdate").alias("period"),
        )
    )


def _compare(spark_df, oracle_sql):
    import duckdb

    from tools.check_correctness import frame_fingerprint

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb.connect()
    try:
        for t in ["lineitem", "orders"]:
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


def test_elo_ratings_driver_shape_duckdb_replay(spark):
    """Period-batched Elo at the future query shape: the oracle
    unrolls one CTE round per order-year rating period (the
    bradley_terry unrolled-CTE discipline) — a perturbed expected-score
    quantization, update rule, or period order flips the hash."""
    from healthcare_dbt_datamart_spark.llmops.preferences import elo_ratings

    m = _spark_matches(spark)
    periods = sorted(
        r[0] for r in m.select("period").distinct().collect()
    )
    assert len(periods) >= 3  # the construction spans real years

    out = elo_ratings(m, k=16).select(
        "item", "n_matches", "wins", "rating_fp"
    )

    sql = "WITH " + _MATCH_CTE + """,
r0 AS MATERIALIZED (SELECT item, CAST(1000000000 AS BIGINT) AS r_fp FROM tot)"""
    for idx, per in enumerate(periods):
        sql += f""",
c{idx} AS MATERIALIZED (
  SELECT item, SUM(c) AS C FROM (
    SELECT w AS item,
           1000000 - CAST(floor(1000000.0 / (1.0 + pow(10.0,
             CAST(rl.r_fp - rw.r_fp AS DOUBLE) / 400000000.0)) + 0.5)
             AS BIGINT) AS c
    FROM m JOIN r{idx} rw ON m.w = rw.item
           JOIN r{idx} rl ON m.l = rl.item
    WHERE m.p = {per}
    UNION ALL
    SELECT l,
           CAST(floor(1000000.0 / (1.0 + pow(10.0,
             CAST(rl.r_fp - rw.r_fp AS DOUBLE) / 400000000.0)) + 0.5)
             AS BIGINT) - 1000000
    FROM m JOIN r{idx} rw ON m.w = rw.item
           JOIN r{idx} rl ON m.l = rl.item
    WHERE m.p = {per}
  ) GROUP BY item
),
r{idx + 1} AS MATERIALIZED (
  SELECT r.item, r.r_fp + 16 * COALESCE(c.C, 0) AS r_fp
  FROM r{idx} r LEFT JOIN c{idx} c USING (item)
)"""
    sql += f"""
SELECT t.item, t.n_matches, t.wins, r.r_fp AS rating_fp
FROM r{len(periods)} r JOIN tot t USING (item)"""
    _compare(out, sql)


def test_wilson_winrate_driver_shape_duckdb_replay(spark):
    """Wilson board at the future query shape: IEEE-only arithmetic,
    so the oracle is one window SQL — a perturbed interval formula or
    rank tie-break flips the hash."""
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        wilson_winrate,
    )

    out = wilson_winrate(_spark_matches(spark))
    z = 1.959964
    sql = "WITH " + _MATCH_CTE + f""",
sc AS (
  SELECT item, n_matches, wins,
    round(wins / CAST(n_matches AS DOUBLE), 6) AS winrate,
    round(((wins / CAST(n_matches AS DOUBLE)) + {z}*{z}/(2.0*n_matches))
          / (1.0 + {z}*{z}/n_matches)
          - {z} * sqrt((wins / CAST(n_matches AS DOUBLE))
              * (1.0 - wins / CAST(n_matches AS DOUBLE)) / n_matches
              + {z}*{z}/(4.0*n_matches*n_matches))
            / (1.0 + {z}*{z}/n_matches), 6) AS ci_lo,
    round(((wins / CAST(n_matches AS DOUBLE)) + {z}*{z}/(2.0*n_matches))
          / (1.0 + {z}*{z}/n_matches)
          + {z} * sqrt((wins / CAST(n_matches AS DOUBLE))
              * (1.0 - wins / CAST(n_matches AS DOUBLE)) / n_matches
              + {z}*{z}/(4.0*n_matches*n_matches))
            / (1.0 + {z}*{z}/n_matches), 6) AS ci_hi
  FROM tot
)
SELECT item, n_matches, wins, winrate, ci_lo, ci_hi,
       CAST(row_number() OVER (ORDER BY ci_lo DESC, item ASC) AS BIGINT)
         AS rank_lb
FROM sc"""
    _compare(out, sql)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))


def test_leaderboard_gate_driver_shape_duckdb_replay(spark):
    """The WHOLE leaderboard-release gate DAG replayed as one DuckDB
    statement at the future query shape: pair counts -> 3 unrolled BT
    MM rounds -> per-period unrolled Elo -> Wilson board -> the
    exact-integer verdict row. A perturbed MM denominator, Elo
    quantization, interval formula, rank tie-break, or gate predicate
    flips the hash — the curation_dag-grade evidence for the fourth
    release DAG."""
    from healthcare_dbt_datamart_spark.models.leaderboard_release import (
        build_leaderboard_release,
    )

    m = _spark_matches(spark)
    periods = sorted(
        r[0] for r in m.select("period").distinct().collect()
    )
    gate = build_leaderboard_release(spark, m).build("leaderboard_gate")

    s2 = 10**12  # BT scale^2 at the DAG's default scale 1e6
    sql = "WITH " + _MATCH_CTE + """,
pc AS MATERIALIZED (
  SELECT w AS i, l AS j, CAST(2 * COUNT(*) + 1 AS BIGINT) AS w2
  FROM m GROUP BY 1, 2
),
obs AS (SELECT i, j FROM pc UNION SELECT j, i FROM pc),
bth AS MATERIALIZED (
  SELECT obs.i, obs.j, COALESCE(pc.w2, 1) AS w2
  FROM obs LEFT JOIN pc ON pc.i = obs.i AND pc.j = obs.j
),
pairs AS MATERIALIZED (
  SELECT a.i, a.j, a.w2, a.w2 + b.w2 AS n2
  FROM bth a JOIN bth b ON b.i = a.j AND b.j = a.i
),
wt AS MATERIALIZED (
  SELECT i, CAST(SUM(w2) AS BIGINT) AS wins2 FROM pairs GROUP BY 1
),
bt0 AS MATERIALIZED (
  SELECT i AS id, CAST(1000000 AS BIGINT) AS p FROM wt
)"""
    for r in range(3):
        sql += f""",
btd{r} AS MATERIALIZED (
  SELECT pairs.i,
         CAST(SUM((n2 * CAST({s2} AS BIGINT)) // (ri.p + rj.p))
              AS BIGINT) AS D
  FROM pairs JOIN bt{r} ri ON ri.id = pairs.i
             JOIN bt{r} rj ON rj.id = pairs.j
  GROUP BY 1
),
bt{r + 1} AS MATERIALIZED (
  SELECT btd{r}.i AS id,
         CAST((wins2 * CAST({s2} AS BIGINT)) // D AS BIGINT) AS p
  FROM btd{r} JOIN wt ON wt.i = btd{r}.i
)"""
    sql += """,
er0 AS MATERIALIZED (
  SELECT item, CAST(1000000000 AS BIGINT) AS r_fp FROM tot
)"""
    for idx, per in enumerate(periods):
        sql += f""",
ec{idx} AS MATERIALIZED (
  SELECT item, SUM(c) AS C FROM (
    SELECT w AS item,
           1000000 - CAST(floor(1000000.0 / (1.0 + pow(10.0,
             CAST(rl.r_fp - rw.r_fp AS DOUBLE) / 400000000.0)) + 0.5)
             AS BIGINT) AS c
    FROM m JOIN er{idx} rw ON m.w = rw.item
           JOIN er{idx} rl ON m.l = rl.item
    WHERE m.p = {per}
    UNION ALL
    SELECT l,
           CAST(floor(1000000.0 / (1.0 + pow(10.0,
             CAST(rl.r_fp - rw.r_fp AS DOUBLE) / 400000000.0)) + 0.5)
             AS BIGINT) - 1000000
    FROM m JOIN er{idx} rw ON m.w = rw.item
           JOIN er{idx} rl ON m.l = rl.item
    WHERE m.p = {per}
  ) GROUP BY item
),
er{idx + 1} AS MATERIALIZED (
  SELECT r.item, r.r_fp + 32 * COALESCE(c.C, 0) AS r_fp
  FROM er{idx} r LEFT JOIN ec{idx} c USING (item)
)"""
    z = 1.959964
    sql += f""",
wil AS MATERIALIZED (
  SELECT item,
    ((wins / CAST(n_matches AS DOUBLE))
           + {z}*{z}/(2.0*n_matches)) / (1.0 + {z}*{z}/n_matches)
          - {z} * sqrt((wins / CAST(n_matches AS DOUBLE))
              * (1.0 - wins / CAST(n_matches AS DOUBLE)) / n_matches
              + {z}*{z}/(4.0*n_matches*n_matches))
            / (1.0 + {z}*{z}/n_matches) AS ci_lo_raw,
    ((wins / CAST(n_matches AS DOUBLE))
           + {z}*{z}/(2.0*n_matches)) / (1.0 + {z}*{z}/n_matches)
          + {z} * sqrt((wins / CAST(n_matches AS DOUBLE))
              * (1.0 - wins / CAST(n_matches AS DOUBLE)) / n_matches
              + {z}*{z}/(4.0*n_matches*n_matches))
            / (1.0 + {z}*{z}/n_matches) AS ci_hi_raw
  FROM tot
),
lb AS MATERIALIZED (
  SELECT t.item, t.n_matches, t.wins,
    bt3.p AS bt_fp, er{len(periods)}.r_fp AS elo_fp,
    round(wil.ci_lo_raw, 6) AS ci_lo, round(wil.ci_hi_raw, 6) AS ci_hi,
    row_number() OVER (ORDER BY bt3.p DESC, t.item ASC) AS rank_bt,
    row_number() OVER (ORDER BY er{len(periods)}.r_fp DESC, t.item ASC)
      AS rank_elo,
    row_number() OVER (ORDER BY round(wil.ci_lo_raw, 6) DESC, t.item ASC)
      AS rank_lb
  FROM tot t JOIN bt3 ON bt3.id = t.item
    JOIN er{len(periods)} ON er{len(periods)}.item = t.item
    JOIN wil ON wil.item = t.item
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(n_matches) // 2 AS BIGINT) AS n_matches,
  CAST(MIN(n_matches) AS BIGINT) AS min_item_matches,
  MIN(CASE WHEN rank_bt = 1 THEN item END) AS bt_top,
  MIN(CASE WHEN rank_elo = 1 THEN item END) AS elo_top,
  MIN(CASE WHEN rank_bt = 1 THEN item END)
    = MIN(CASE WHEN rank_elo = 1 THEN item END) AS tops_agree,
  MIN(CASE WHEN rank_lb = 1 THEN ci_lo END) AS top_ci_lo,
  MAX(CASE WHEN rank_lb != 1 THEN ci_hi END) AS runner_ci_hi,
  MIN(CASE WHEN rank_lb = 1 THEN ci_lo END)
    > MAX(CASE WHEN rank_lb != 1 THEN ci_hi END) AS separated,
  (COUNT(*) >= 2 AND MIN(n_matches) >= 10
   AND MIN(CASE WHEN rank_bt = 1 THEN item END)
     = MIN(CASE WHEN rank_elo = 1 THEN item END)) AS released
FROM lb"""
    _compare(gate, sql)
