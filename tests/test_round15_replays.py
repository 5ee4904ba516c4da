"""Driver-SHAPE DuckDB oracle replays for the round-15 promotion queue.

Sixth file in the pre-proof convention: each test builds the future
``queries()`` body AND its ``oracle_sql()`` twin at the exact input
shape the promoted query will use, over the REAL sf0.001 parquet, and
compares with the driver gate's fingerprint. Cohort here:
retrieval_metrics (MRR/P@k/R@k beside the driver-green ndcg_at_k),
trigram_interp_scores (the recursive-JM rung above the driver-green
bigram scorer), line_dedup (the CCNet paragraph-hash pass over a
deterministic line-shaped rebuild — the c4_line_filter construction),
and hits_fixedpoint (integer hubs/authorities over the verified
near-dup graph, unrolled like the pagerank_docs oracle). Excluded with
reasons: calibration_summary rounds exact Fractions with Python
banker's rounding where SQL rounds half-up doubles — its by-group
sibling (round-14 file) is the hash-gateable form, and the
streamed-cells twin replays the scalar in pytest. (mmr_rerank was
initially excluded here for float-addition-order doubt; the round-17
file PROVES it hash-gateable — list_reduce pins the SQL fold to the
driver's element order.)
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.battery  # opt-out: `-m "not battery"` fast path

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


def test_retrieval_metrics_driver_shape_duckdb_replay(spark):
    """MRR / precision@10 / recall@10 per language over the
    driver-green ndcg_at_k judged pool (query = lang, score = doc
    length, graded rel = doc_id mod 4 coerced binary) — integer
    counts, three 6dp divisions."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        retrieval_metrics,
    )

    pool = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 3 == 0)
        .select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("double").alias("score"),
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("rel"),
        )
    )
    out = retrieval_metrics(
        pool, "lang", "doc_id", "score", "rel", k=10
    ).withColumnRenamed("lang", "query")

    sql = """
WITH pool AS (
  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS score,
         CAST((doc_id % 4) > 0 AS INT) AS rel
  FROM documents WHERE doc_id % 3 = 0
),
ranked AS (
  SELECT lang, rel,
    row_number() OVER (PARTITION BY lang
      ORDER BY score DESC, doc_id ASC) AS r
  FROM pool
),
agg AS (
  SELECT lang AS query, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(rel) AS BIGINT) AS n_relevant,
    CAST(MIN(CASE WHEN rel = 1 THEN r END) AS BIGINT) AS first_rel_rank,
    CAST(SUM(CASE WHEN r <= 10 AND rel = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS hits
  FROM ranked GROUP BY 1
)
SELECT query, n_docs, n_relevant, first_rel_rank,
  round(1.0 / first_rel_rank, 6) AS mrr,
  round(hits / 10.0, 6) AS precision_at_k,
  CASE WHEN n_relevant > 0
       THEN round(hits::DOUBLE / n_relevant, 6) END AS recall_at_k
FROM agg
"""
    _compare(out, sql)


def test_trigram_interp_scores_driver_shape_duckdb_replay(spark):
    """Recursive-JM trigram scoring at the future query shape: the
    bigram_interp_scores CCNet split (fit on src0, score the rest),
    one rung up — the exact recursive-formula SQL from the unit
    replay, over the real corpus."""
    from healthcare_dbt_datamart_spark.llmops.filtering import (
        trigram_interp_scores,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = trigram_interp_scores(
        docs.filter(F.col("source") != "src0"),
        "text",
        "doc_id",
        ref_df=docs.filter(F.col("source") == "src0"),
    ).withColumnRenamed("id", "doc_id")

    sql = r"""
WITH rarr AS (
  SELECT string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents WHERE source = 'src0'
),
ucnt AS (
  SELECT t, COUNT(*) AS uc FROM (SELECT unnest(w) AS t FROM rarr)
  GROUP BY t
),
rp AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> {'w1': w[i], 'w2': w[i+1]})) AS p
  FROM rarr WHERE len(w) >= 2
),
bcnt AS (
  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS bc FROM rp GROUP BY 1, 2
),
rt AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 2),
           i -> {'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]})) AS g
  FROM rarr WHERE len(w) >= 3
),
tcnt AS (
  SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, COUNT(*) AS tc
  FROM rt GROUP BY 1, 2, 3
),
c12 AS (SELECT w1, w2, SUM(tc) AS c12 FROM tcnt GROUP BY 1, 2),
c2 AS (SELECT w1, SUM(bc) AS c2 FROM bcnt GROUP BY 1),
nv AS (SELECT (SUM(uc) + COUNT(*) + 1)::DOUBLE AS n_v1 FROM ucnt),
darr AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents WHERE source != 'src0'
),
dt AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 2),
           i -> {'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]})) AS g
  FROM darr WHERE len(w) >= 3
),
tg AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM dt)
SELECT tg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       round(-avg(ln(
         0.5 * COALESCE(tc::DOUBLE / c12.c12, 0.0)
         + 0.5 * (0.75 * COALESCE(bc::DOUBLE / c2.c2, 0.0)
                  + 0.25 * ((COALESCE(uc, 0) + 1)::DOUBLE
                            / nv.n_v1)))), 6) AS lm_score
FROM tg
LEFT JOIN tcnt USING (w1, w2, w3)
LEFT JOIN c12 USING (w1, w2)
LEFT JOIN bcnt ON bcnt.w1 = tg.w2 AND bcnt.w2 = tg.w3
LEFT JOIN c2 ON c2.w1 = tg.w2
LEFT JOIN ucnt ON ucnt.t = tg.w3
CROSS JOIN nv
GROUP BY tg.doc_id
"""
    _compare(out, sql)


def test_line_dedup_driver_shape_duckdb_replay(spark):
    """CCNet line dedup at the future query shape: the c4_line_filter
    line-shaped rebuild gives every doc 4 lines where the
    javascript/sentence filler lines repeat corpus-wide — min_copies=2
    drops every copy but the deterministically first, and the rebuild
    keeps original bytes and order."""
    from healthcare_dbt_datamart_spark.llmops.dedup import line_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    nl = F.lit("\n")
    lined = docs.select(
        "doc_id",
        F.concat(
            F.concat(F.substring("text", 1, 60), F.lit(".")),
            nl,
            F.substring("text", 61, 15),
            nl,
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("Enable javascript to view this content please."),
            ).otherwise(
                F.lit("Another proper sentence arrives with plenty of words.")
            ),
            nl,
            F.concat(F.substring("text", 76, 60), F.lit("?")),
        ).alias("text"),
    )
    out = line_dedup(lined, "text", "doc_id")

    sql = """
WITH lined AS (
  SELECT doc_id,
    substr(text, 1, 60) || '.' || chr(10)
    || substr(text, 61, 15) || chr(10)
    || CASE WHEN doc_id % 7 = 0
       THEN 'Enable javascript to view this content please.'
       ELSE 'Another proper sentence arrives with plenty of words.' END
    || chr(10)
    || substr(text, 76, 60) || '?' AS t
  FROM documents
),
lines AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, l[i] AS line
  FROM (SELECT doc_id, string_split(COALESCE(t, ''), chr(10)) AS l
        FROM lined),
       unnest(generate_series(1, len(l))) AS u(i)
),
keyed AS (
  SELECT doc_id, pos, line,
    CASE WHEN regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') != ''
         THEN md5(regexp_replace(lower(trim(line)), '\\s+', ' ', 'g'))
    END AS k
  FROM lines
),
stats AS (
  SELECT k, COUNT(*) AS copies,
         MIN(ROW(doc_id, pos)) AS first
  FROM keyed WHERE k IS NOT NULL GROUP BY k
),
marked AS (
  SELECT keyed.doc_id, keyed.pos, keyed.line,
    COALESCE(stats.copies >= 2
             AND NOT (stats.first = ROW(keyed.doc_id, keyed.pos)),
             FALSE) AS dropped
  FROM keyed LEFT JOIN stats USING (k)
)
SELECT doc_id,
  COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
                      chr(10) ORDER BY pos), '') AS text_deduped,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
    AS n_lines_dropped,
  CAST(SUM(CASE WHEN dropped THEN length(line) ELSE 0 END) AS BIGINT)
    AS chars_removed
FROM marked GROUP BY doc_id
"""
    _compare(out, sql)
    # the dedup really fires: the shared filler line survives exactly
    # once per distinct normalized text across the corpus
    rows = out.collect()
    assert any(r.n_lines_dropped > 0 for r in rows)
    assert all(r.n_lines == 4 for r in rows)


def test_hits_fixedpoint_driver_shape_duckdb_replay(spark):
    """Integer HITS over the verified near-dup graph (directed
    id_a -> id_b, the pagerank_docs edge construction): 3 power
    iterations unrolled as MATERIALIZED CTEs with the per-round L-inf
    max computed in-SQL — hubs/authorities in exact scale units."""
    from healthcare_dbt_datamart_spark.llmops.graph import hits_fixedpoint
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        ORACLE,
        _near_dup_verified,
    )

    edges = _near_dup_verified(spark, SF_DIR).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    out = hits_fixedpoint(edges, n_iter=3).select(
        F.col("id").cast("bigint").alias("doc_id"), "hub_fp", "auth_fp"
    )

    sql = f"""
WITH e AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM ({ORACLE["near_dup_jaccard"]})
),
h0 AS MATERIALIZED (
  SELECT id, CAST(1000000 AS BIGINT) AS h
  FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)
)"""
    for r in range(1, 4):
        sql += f""",
a{r}raw AS MATERIALIZED (
  SELECT dst, CAST(SUM(h) AS BIGINT) AS s
  FROM e JOIN h{r - 1} ON e.src = h{r - 1}.id GROUP BY dst
),
a{r} AS MATERIALIZED (
  SELECT dst AS id,
         CAST((s * 1000000) // (SELECT MAX(s) FROM a{r}raw) AS BIGINT)
           AS a
  FROM a{r}raw
),
h{r}raw AS MATERIALIZED (
  SELECT src, CAST(SUM(a) AS BIGINT) AS s
  FROM e JOIN a{r} ON e.dst = a{r}.id GROUP BY src
),
h{r} AS MATERIALIZED (
  SELECT src AS id,
         CAST((s * 1000000) // (SELECT MAX(s) FROM h{r}raw) AS BIGINT)
           AS h
  FROM h{r}raw
)"""
    sql += """
SELECT CAST(COALESCE(h3.id, a3.id) AS BIGINT) AS doc_id,
       COALESCE(h3.h, 0) AS hub_fp,
       COALESCE(a3.a, 0) AS auth_fp
FROM h3 FULL OUTER JOIN a3 ON h3.id = a3.id
"""
    _compare(out, sql)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))
