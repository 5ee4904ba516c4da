"""Driver-SHAPE DuckDB oracle replays for the round-14 promotion queue.

Fifth file in the pre-proof convention (test_round10 → elo/wilson,
test_round11 → unimax/conformal/vocab/ppr, test_round12 → the round-11
cohort, test_round13 → the round-13 queue): each test builds the future
``queries()`` body AND its ``oracle_sql()`` twin at the exact input
shape the promoted query will use, over the REAL sf0.001 parquet, and
compares with the driver gate's fingerprint. Cohort here: the
evaluation/report wave — spearman_rho (rank-correlation quality
validation), distinct_n (mode-collapse diversity report),
wilson_from_pairs (the streamed-state Wilson board, from-pairs ≡
from-log parity AS the oracle), roc_auc_by_group +
calibration_by_group (the per-language data-card slices), and
source_data_card (the per-source release summary). Excluded with
reasons: bleu_corpus / brier_decomposition hash-gate a final
transcendental (exp/ln) / exact-Fraction fold that the DuckDB float
path cannot reproduce bit-stably — they stay pytest-gated with
pure-Python exact replays (the unigram_lm_train class).
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


def test_spearman_rho_driver_shape_duckdb_replay(spark):
    """Spearman at the future query shape: does document LENGTH rank
    like TOKEN COUNT (heavily tied short docs exercise the
    average-rank cells)? Both axes quantized to BIGINT cells, five
    exact sums, one IEEE formula — the rho arithmetic is (int-exact
    numerator) / sqrt / sqrt on both engines."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import spearman_rho

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("n_chars").cast("double").alias("x"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("double")
        .alias("y"),
    )
    out = spearman_rho(docs, "x", "y")

    sql = r"""
WITH q AS (
  SELECT CAST(floor(CAST(n_chars AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           AS xq,
         CAST(floor(CAST(len(string_split_regex(lower(trim(text)),
           '\s+')) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS yq
  FROM documents
),
rx AS (
  SELECT xq, 2 * COALESCE(SUM(c) OVER (ORDER BY xq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + c + 1 AS r_x
  FROM (SELECT xq, COUNT(*) AS c FROM q GROUP BY 1)
),
ry AS (
  SELECT yq, 2 * COALESCE(SUM(c) OVER (ORDER BY yq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + c + 1 AS r_y
  FROM (SELECT yq, COUNT(*) AS c FROM q GROUP BY 1)
),
j AS (SELECT r_x, r_y FROM q JOIN rx USING (xq) JOIN ry USING (yq)),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(r_x AS HUGEINT)) AS sx, SUM(CAST(r_y AS HUGEINT)) AS sy,
         SUM(CAST(r_x AS HUGEINT) * CAST(r_y AS HUGEINT)) AS sxy,
         SUM(CAST(r_x AS HUGEINT) * CAST(r_x AS HUGEINT)) AS sxx,
         SUM(CAST(r_y AS HUGEINT) * CAST(r_y AS HUGEINT)) AS syy,
         CAST(COUNT(DISTINCT r_x) AS BIGINT) AS ncx,
         CAST(COUNT(DISTINCT r_y) AS BIGINT) AS ncy
  FROM j
)
SELECT n AS n_rows, ncx AS n_x_cells, ncy AS n_y_cells,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
FROM s
"""
    _compare(out, sql)


def test_distinct_n_driver_shape_duckdb_replay(spark):
    """distinct-1/2/3 over the real documents corpus — exact BIGINT
    gram counts, one 6dp ratio per order."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import distinct_n

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = distinct_n(docs, "text")

    def order_cte(n):
        return f"""
SELECT {n} AS n, unnest([array_to_string(t[i:i+{n - 1}], ' ')
  for i in range(1, greatest(len(t) - {n - 1}, 0) + 1)]) AS g
FROM w"""

    sql = (
        r"""
WITH w AS (
  SELECT string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
),
g AS ("""
        + " UNION ALL ".join(order_cte(n) for n in (1, 2, 3))
        + """)
SELECT n, CAST(COUNT(*) AS BIGINT) AS total_ngrams,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_ngrams,
       round(COUNT(DISTINCT g)::DOUBLE / COUNT(*), 6) AS distinct_ratio
FROM g GROUP BY n
"""
    )
    _compare(out, sql)


def test_wilson_from_pairs_driver_shape_duckdb_replay(spark):
    """The streamed-state Wilson board at the future query shape: the
    doubled pair-count table (the relation a streaming arena ingest
    maintains) halves back to exact match units, so from-pairs output
    IS from-log output — the proven wilson_winrate oracle is the
    oracle, which makes the parity claim itself the hash gate."""
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        wilson_from_pairs,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        ORACLE,
        _supplier_pair_periods,
    )

    pc = _supplier_pair_periods(spark, SF_DIR).groupBy(
        F.col("winner_id").alias("i"), F.col("loser_id").alias("j")
    ).agg((F.lit(2) * F.sum("n_m")).alias("w2"))
    out = wilson_from_pairs(pc)
    _compare(out, ORACLE["wilson_winrate"], tables=("lineitem", "orders"))


def test_roc_auc_by_group_driver_shape_duckdb_replay(spark):
    """Per-source AUC slices at the future query shape: a
    deterministic doc_id-hash score against the lang='en' label,
    sliced by source — the grouped rank-sum under a PARTITION BY
    window, all-integer until the final division."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        roc_auc_by_group,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source",
        (F.pmod(F.col("doc_id") * F.lit(31), F.lit(1000)) / F.lit(999.0))
        .alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    out = roc_auc_by_group(docs, "score", "label", "source")

    sql = """
WITH s AS (
  SELECT source AS grp,
         ((doc_id * 31) % 1000) / 999.0 AS score,
         CAST(lang = 'en' AS INT) AS y
  FROM documents
),
cells AS (
  SELECT grp, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS s_fp,
         COUNT(*) AS cnt, SUM(y) AS pos
  FROM s GROUP BY 1, 2
),
ranked AS (
  SELECT grp, cnt, pos,
         2 * COALESCE(SUM(cnt) OVER (PARTITION BY grp ORDER BY s_fp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS rank2
  FROM cells
),
agg AS (
  SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS np,
         CAST(SUM(pos * rank2) AS BIGINT) AS pr2,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM ranked GROUP BY grp
)
SELECT grp AS source, n AS n_rows, np AS n_pos, n - np AS n_neg,
       CAST(0 AS BIGINT) AS n_bad, n_cells AS n_score_cells,
       CASE WHEN np > 0 AND n - np > 0 THEN
         round((pr2 - np * (np + 1))::DOUBLE / (2.0 * np * (n - np)), 6)
       END AS auc
FROM agg
"""
    _compare(out, sql)


def test_calibration_by_group_driver_shape_duckdb_replay(spark):
    """Per-linestatus ECE/MCE/Brier at the future query shape: the
    q_calibration_report scoring (mod-1000 key hash, returns-bit
    label) sliced by l_linestatus — per-group integer bin cells, every
    metric a division of exact BIGINT sums."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        calibration_by_group,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_linestatus").alias("status"),
        (
            F.pmod(
                F.col("l_orderkey") * F.lit(31)
                + F.col("l_linenumber") * F.lit(17),
                F.lit(1000),
            )
            / F.lit(999.0)
        ).alias("score"),
        (F.col("l_returnflag") == F.lit("R")).cast("int").alias("label"),
    )
    out = calibration_by_group(li, "score", "label", "status", n_bins=10)

    sql = """
WITH s AS (
  SELECT l_linestatus AS grp,
         ((l_orderkey * 31 + l_linenumber * 17) % 1000) / 999.0 AS score,
         CAST(l_returnflag = 'R' AS INT) AS y
  FROM lineitem
),
cells AS (
  SELECT grp,
         least(CAST(floor(score * 10) AS INT), 9) AS bin,
         COUNT(*) AS n, SUM(y) AS pos,
         SUM(CAST(floor(score * 1000000 + 0.5) AS BIGINT)) AS s_sum,
         SUM(CAST(floor(score * score * 1000000 + 0.5) AS BIGINT))
           AS s2_sum,
         SUM(CAST(floor(score * 1000000 + 0.5) AS BIGINT) * y) AS sy_sum
  FROM s GROUP BY 1, 2
),
perbin AS (
  SELECT grp, n, pos, s2_sum, sy_sum,
         abs(s_sum - 1000000 * pos) AS gap_num,
         abs(s_sum - 1000000 * pos)::DOUBLE / (n * 1000000.0) AS mce_term
  FROM cells
),
agg AS (
  SELECT grp, CAST(SUM(n) AS BIGINT) AS N, CAST(SUM(pos) AS BIGINT)
           AS npos,
         SUM(gap_num) AS gap_sum, MAX(mce_term) AS mce,
         SUM(s2_sum) AS s2, SUM(sy_sum) AS sy,
         CAST(COUNT(*) AS INT) AS n_bins_used
  FROM perbin GROUP BY grp
)
SELECT grp AS status, N AS n_rows, npos AS n_pos,
       CAST(0 AS BIGINT) AS n_bad, CAST(0 AS BIGINT) AS n_oob,
       n_bins_used,
       round(gap_sum::DOUBLE / (CAST(N AS DOUBLE) * 1000000), 6) AS ece,
       round(mce, 6) AS mce,
       round((s2 - 2 * sy + 1000000 * npos)::DOUBLE
             / (CAST(N AS DOUBLE) * 1000000), 6) AS brier
FROM agg
"""
    _compare(out, sql, tables=("lineitem",))


def test_source_data_card_driver_shape_duckdb_replay(spark):
    """The per-source release summary at the future query shape —
    dup counts, token totals, majority language, and the
    quality_classifier gate means, every ratio a 6dp division of
    exact integer sums; the oracle composes the PROVEN
    quality_classifier oracle for the score column."""
    from healthcare_dbt_datamart_spark.models.data_card import (
        source_data_card,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import ORACLE

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = source_data_card(docs)

    sql = f"""
WITH qc AS ({ORACLE["quality_classifier"]}),
toks AS (
  SELECT doc_id, source, lang,
         COALESCE(text, '') AS t,
         len(list_filter(string_split_regex(lower(trim(COALESCE(text,
           ''))), '\\s+'), x -> x != '')) AS n_toks
  FROM documents
),
base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS total_tokens
  FROM toks GROUP BY source
),
dups AS (
  SELECT source,
         CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_exact_dup_docs
  FROM (SELECT source, md5(t) AS fp, COUNT(*) AS c
        FROM toks GROUP BY 1, 2)
  GROUP BY source
),
lang_cells AS (
  SELECT source, lang, COUNT(*) AS c FROM toks GROUP BY 1, 2
),
langs AS (
  SELECT source,
         MIN(CASE WHEN rn = 1 THEN lang END) AS majority_lang,
         CAST(COUNT(*) AS INT) AS n_langs
  FROM (SELECT source, lang,
          row_number() OVER (PARTITION BY source
            ORDER BY c DESC, lang ASC) AS rn
        FROM lang_cells)
  GROUP BY source
),
qual AS (
  SELECT toks.source,
         SUM(CAST(floor(qc.score * 1000000 + 0.5) AS BIGINT)) AS sq_sum,
         SUM(qc.keep) AS kp_sum,
         COUNT(*) AS nq
  FROM toks JOIN qc ON qc.doc_id = toks.doc_id
  GROUP BY 1
)
SELECT base.source, n_docs, n_exact_dup_docs,
       round(n_exact_dup_docs::DOUBLE / n_docs, 6) AS dup_rate,
       total_tokens,
       round(total_tokens::DOUBLE / n_docs, 6) AS mean_tokens,
       majority_lang, n_langs,
       round(sq_sum::DOUBLE / (nq * 1000000.0), 6) AS mean_quality,
       round(kp_sum::DOUBLE / nq, 6) AS keep_rate
FROM base JOIN dups USING (source) JOIN langs USING (source)
JOIN qual ON qual.source = base.source
"""
    _compare(out, sql)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))
