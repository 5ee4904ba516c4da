"""Driver-SHAPE DuckDB oracle replays for the round-11 queue leaders.

The round-10 rotation promotes the elo/wilson-led cohort; this file
pre-proves the NEXT cohort the same way tests/test_round10_replays.py
pre-proved that one: each test builds the future ``queries()`` body
AND its ``oracle_sql()`` twin at the exact input shape the promoted
query will use (the REAL sf0.001 parquet tables) and compares with the
driver gate's exact fingerprint (``tools/check_correctness.
frame_fingerprint``). When the round-11 rotation promotes
``unimax_allocation`` / ``conformal_report`` / ``vocab_richness`` /
``personalized_pagerank``, the bodies and oracle SQL lift from here
already hash-proven. (``leaderboard_gate``'s whole-DAG replay already
lives in test_round10_replays.py.)
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.battery  # opt-out: `-m "not battery"` fast path

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _compare(spark_df, oracle_sql, tables=("documents",)):
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


def test_unimax_allocation_driver_shape_duckdb_replay(spark):
    """UniMax water-filling at the future query shape: per-language
    character budgets over documents, budget 300k / max_epochs 2 (a
    mixed capped/uncapped fill at sf0.001) — the closed-form window
    SQL replays every output column."""
    from healthcare_dbt_datamart_spark.llmops.splits import (
        unimax_allocation,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    counts = docs.groupBy(F.col("lang").alias("grp")).agg(
        F.sum("n_chars").alias("n_tokens")
    )
    out = unimax_allocation(counts, budget=300_000, max_epochs=2)

    B, E = 300_000, 2
    sql = f"""
WITH counts AS (
  SELECT lang AS grp, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT grp, n_tokens, n_tokens * {E} AS cap,
    row_number() OVER w AS r,
    COALESCE(SUM(n_tokens * {E}) OVER (w ROWS BETWEEN UNBOUNDED
      PRECEDING AND 1 PRECEDING), 0) AS cum_before,
    COUNT(*) OVER () AS n
  FROM counts
  WINDOW w AS (ORDER BY n_tokens * {E} ASC, grp ASC)
),
staged AS (
  SELECT *, cap * (n - r + 1) <= {B} - cum_before AS capped
  FROM ranked
),
tot AS (
  SELECT *,
    SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,
    COALESCE(SUM(CASE WHEN capped THEN cap END) OVER (), 0) AS s
  FROM staged
)
SELECT grp, n_tokens, CAST(cap AS BIGINT) AS cap, capped,
  CAST(CASE WHEN capped THEN cap ELSE
    ({B} - s) // (n - k)
    + CASE WHEN r - k <= ({B} - s) % (n - k) THEN 1 ELSE 0 END
  END AS BIGINT) AS alloc,
  round(CAST(CASE WHEN capped THEN cap ELSE
    ({B} - s) // (n - k)
    + CASE WHEN r - k <= ({B} - s) % (n - k) THEN 1 ELSE 0 END
  END AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS epochs_alloc
FROM tot
"""
    _compare(out, sql)


def test_conformal_report_driver_shape_duckdb_replay(spark):
    """Split conformal at the future query shape: calibration =
    documents with doc_id % 5 = 0 scored by n_chars/1000, eval = the
    rest, alpha = 0.25 (exactly dyadic, so ceil((n+1)·(1−alpha)) is
    the same integer in exact-rational and double arithmetic) — the
    order-stat threshold and coverage replay as cumulative-count SQL."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        conformal_report,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", (F.col("n_chars") / F.lit(1000.0)).alias("s")
    )
    cal = docs.filter(F.col("doc_id") % 5 == 0)
    ev = docs.filter(F.col("doc_id") % 5 != 0)
    out = conformal_report(cal, ev, "s", alpha=0.25)

    sql = """
WITH cal AS (
  SELECT CAST(floor((n_chars / 1000.0) * 1000000 + 0.5) AS BIGINT) AS s_fp
  FROM documents WHERE doc_id % 5 = 0
),
ev AS (
  SELECT CAST(floor((n_chars / 1000.0) * 1000000 + 0.5) AS BIGINT) AS s_fp
  FROM documents WHERE doc_id % 5 != 0
),
kk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
         CAST(ceil((COUNT(*) + 1) * 0.75) AS BIGINT) AS k
  FROM cal
),
cells AS (
  SELECT s_fp, COUNT(*) AS cnt FROM cal GROUP BY 1
),
thr AS (
  SELECT MIN(s_fp) AS q_fp FROM (
    SELECT s_fp, SUM(cnt) OVER (ORDER BY s_fp) AS cum FROM cells
  ), kk WHERE cum >= kk.k
)
SELECT kk.n_cal, kk.k,
  round(thr.q_fp / 1000000.0, 6) AS threshold,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ev) AS n_eval,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ev, thr
    WHERE ev.s_fp <= thr.q_fp) AS n_covered,
  round((SELECT COUNT(*) FROM ev, thr WHERE ev.s_fp <= thr.q_fp)
    / CAST((SELECT COUNT(*) FROM ev) AS DOUBLE), 6) AS coverage
FROM kk, thr
"""
    _compare(out, sql)


def test_vocab_richness_driver_shape_duckdb_replay(spark):
    """Vocabulary diagnostics at the future query shape: the whole
    documents corpus, zipf_top_k = 200 — V/N/f1/f2 integer folds, the
    Chao1 closed form, and the quantized-integer Zipf regression all
    replay field-for-field."""
    from healthcare_dbt_datamart_spark.llmops.textstats import (
        vocab_richness,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = vocab_richness(docs, "text", zipf_top_k=200)

    sql = """
WITH freq AS (
  SELECT t, COUNT(*) AS tc FROM (
    SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
      '\\s+'), x -> x != '')) AS t
    FROM documents
  ) GROUP BY t
),
tot AS (
  SELECT CAST(SUM(tc) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v,
    CAST(SUM(CASE WHEN tc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
    CAST(SUM(CASE WHEN tc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM freq
),
topk AS (
  SELECT tc, row_number() OVER (ORDER BY tc DESC, t ASC) AS r
  FROM freq ORDER BY tc DESC, t ASC LIMIT 200
),
reg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
    CAST(SUM(CAST(floor(ln(r) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
    CAST(SUM(CAST(floor(ln(tc) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
    CAST(SUM(CAST(floor(ln(r) * ln(tc) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(SUM(CAST(floor(ln(r) * ln(r) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sx2
  FROM topk
)
SELECT tot.n AS n_tokens, tot.v AS vocab_size, tot.f1, tot.f2,
  round(tot.f1 / CAST(tot.v AS DOUBLE), 6) AS hapax_ratio,
  round(tot.v + CASE WHEN tot.f2 > 0
    THEN tot.f1 * tot.f1 / (2.0 * tot.f2)
    ELSE tot.f1 * (tot.f1 - 1) / 2.0 END, 6) AS chao1,
  reg.k AS zipf_k,
  round(CAST(CAST(reg.k AS HUGEINT) * reg.sxy * 1000000000
      - CAST(reg.sx AS HUGEINT) * reg.sy AS DOUBLE)
    / CAST(CAST(reg.k AS HUGEINT) * reg.sx2 * 1000000000
      - CAST(reg.sx AS HUGEINT) * reg.sx AS DOUBLE), 6)
    AS zipf_slope
FROM tot, reg
"""
    _compare(out, sql)


def test_personalized_pagerank_driver_shape_duckdb_replay(spark):
    """Seed-restart PageRank at the future query shape: the verified
    near-dup graph (the pagerank_docs edge construction), seeded at
    the graph's smallest doc id, 3 rounds — unrolled MATERIALIZED CTEs
    with the src-UNION-dst node universe and the seed/teleport masses
    computed in-SQL (no data-dependent literals)."""
    from healthcare_dbt_datamart_spark.llmops.dedup import (
        candidate_pairs,
        jaccard_pairs,
        lsh_band_buckets,
        minhash_signatures,
    )
    from healthcare_dbt_datamart_spark.llmops.graph import (
        personalized_pagerank,
        undirected_edges,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        _LLM_ORACLE,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8, n_shingle=3)
    pairs = candidate_pairs(lsh_band_buckets(sigs, "doc_id", 8, 2), "doc_id")
    verified = jaccard_pairs(
        pairs, docs, "text", "doc_id", threshold=0.4, n_shingle=3
    )
    edges = undirected_edges(verified.select("id_a", "id_b"))
    seed = str(
        edges.select(F.least("src", "dst").alias("m"))
        .agg(F.min("m")).collect()[0][0]
    )
    out = personalized_pagerank(edges, [seed], n_iter=3).select(
        F.col("id").cast("bigint").alias("doc_id"),
        "rank_fp",
    )

    sql = f"""
WITH
v AS MATERIALIZED ({_LLM_ORACLE["near_dup_jaccard"]}),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM v
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM v
),
nodes AS MATERIALIZED (
  SELECT src AS id FROM edges UNION SELECT dst FROM edges
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
sd AS (SELECT MIN(id) AS seed FROM nodes),
ts AS (
  SELECT CAST((15 * COUNT(*) * 1000000000000) // 100 AS BIGINT) AS t
  FROM nodes
),
r0 AS MATERIALIZED (
  SELECT n.id, CAST(CASE WHEN n.id = sd.seed THEN ts.t ELSE 0 END
    AS BIGINT) AS r
  FROM nodes n, sd, ts
)"""
    for i in range(3):
        sql += f""",
c{i} AS MATERIALIZED (
  SELECT e.dst, SUM(p.r // d.deg) AS s
  FROM edges e JOIN r{i} p ON p.id = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r{i + 1} AS MATERIALIZED (
  SELECT n.id, CAST(CASE WHEN n.id = sd.seed THEN ts.t ELSE 0 END
    + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n CROSS JOIN sd CROSS JOIN ts
  LEFT JOIN c{i} c ON c.dst = n.id
)"""
    sql += """
SELECT id AS doc_id, r AS rank_fp FROM r3"""
    _compare(out, sql)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))
