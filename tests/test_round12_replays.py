"""Driver-SHAPE DuckDB oracle replays for the round-12 queue leaders.

Third file in the pre-proof convention (test_round10_replays.py proved
the elo/wilson cohort before its promotion; test_round11_replays.py the
unimax/conformal/vocab/ppr cohort): each test builds the future
``queries()`` body AND its ``oracle_sql()`` twin at the exact input
shape the promoted query will use, over the REAL sf0.001 parquet, and
compares with the driver gate's fingerprint. Cohort here: the round-9
second wave — rrf_fuse (BM25+ANN hybrid board), kendall_tau (BT-vs-Elo
leaderboard agreement), gopher_rules (the quality battery over
documents), mcnemar_test (paired classifier comparison).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.battery  # opt-out: `-m "not battery"` fast path

from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def test_rrf_fuse_driver_shape_duckdb_replay(spark):
    """Hybrid retrieval at the future query shape: fuse the driver-green
    BM25 board (top-15 for 'filter join spark') with the ANN cosine
    board (top-10 vs vec_id 0, vec_id ≡ doc_id) — integer scale-div
    terms, fused board ranked by (rrf_fp DESC, id ASC)."""
    from healthcare_dbt_datamart_spark.llmops.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from healthcare_dbt_datamart_spark.llmops.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    b = bm25_topk(docs, ["filter", "join", "spark"], k=15)
    a = cosine_topk(emb, query_id=0, k=10)
    rankings = b.select(
        F.lit("bm25").alias("system"),
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    ).unionByName(
        a.select(
            F.lit("ann").alias("system"),
            F.col("vec_id").alias("id"),
            F.row_number()
            .over(
                Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
            )
            .alias("rank"),
        )
    )
    out = rrf_fuse(rankings).withColumn(
        "rank_fused",
        F.row_number()
        .over(Window.orderBy(F.col("rrf_fp").desc(), F.col("id").asc()))
        .cast("bigint"),
    )

    from healthcare_dbt_datamart_spark.models.testdata_queries import ORACLE

    sql = f"""
WITH bm AS ({ORACLE["bm25_topk"]}),
ann AS ({ORACLE["cosine_topk"]}),
u AS (
  SELECT 'bm25' AS sys, doc_id AS id,
    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
  FROM bm
  UNION ALL
  SELECT 'ann', vec_id,
    row_number() OVER (ORDER BY cosine DESC, vec_id ASC)
  FROM ann
),
f AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_systems,
    CAST(MIN(r) AS BIGINT) AS best_rank,
    CAST(SUM(1000000000 // (r + 60)) AS BIGINT) AS rrf_fp,
    round(CAST(SUM(1000000000 // (r + 60)) AS DOUBLE) / 1000000000.0, 6)
      AS rrf
  FROM u GROUP BY id
)
SELECT *, CAST(row_number() OVER (ORDER BY rrf_fp DESC, id ASC) AS BIGINT)
  AS rank_fused
FROM f
"""
    _compare(out, sql, tables=("documents", "embeddings"))


def test_kendall_tau_driver_shape_duckdb_replay(spark):
    """Leaderboard agreement at the future query shape: tau-b between
    the Bradley-Terry and Elo ratings of the supplier match log — the
    list-level number behind the release gate's tops_agree boolean.
    The oracle composes the two PROVEN rating replays (3 unrolled BT
    MM rounds, per-period unrolled Elo) with an exact sign-pair fold."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import kendall_tau
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        bradley_terry,
        elo_ratings,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        _MATCH_CTE,
        _supplier_matches,
    )

    m = _supplier_matches(spark, SF_DIR)
    bt = bradley_terry(m, n_iter=3).select(
        "item", F.col("rating_fp").alias("bt")
    )
    elo = elo_ratings(m, k=16).select(
        "item", F.col("rating_fp").alias("elo")
    )
    out = kendall_tau(bt.join(elo, "item"), "item", "bt", "elo")

    s2 = 10**12
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
    years = list(range(1995, 2002))
    for idx, per in enumerate(years):
        sql += f""",
ec{idx} AS MATERIALIZED (
  SELECT item, CAST(SUM(c) AS BIGINT) AS C FROM (
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
  SELECT r.item, CAST(r.r_fp + 16 * COALESCE(c.C, 0) AS BIGINT) AS r_fp
  FROM er{idx} r LEFT JOIN ec{idx} c USING (item)
)"""
    sql += f""",
board AS MATERIALIZED (
  SELECT bt3.id AS item, CAST(bt3.p AS DOUBLE) AS sa,
         CAST(er{len(years)}.r_fp AS DOUBLE) AS sb
  FROM bt3 JOIN er{len(years)} ON er{len(years)}.item = bt3.id
),
p AS (
  SELECT sign(x.sa - y.sa) AS da, sign(x.sb - y.sb) AS db
  FROM board x JOIN board y ON x.item < y.item
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
    CAST(SUM(CASE WHEN da * db = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN da * db = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
    CAST(SUM(CASE WHEN da = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ta,
    CAST(SUM(CASE WHEN db = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tb,
    CAST(SUM(CASE WHEN da = 0 AND db = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS tboth
  FROM p
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM board) AS n_items,
  n0 AS n_pairs, c AS concordant, d AS discordant,
  ta AS tie_a, tb AS tie_b, tboth AS tie_both,
  round((c - d) / sqrt(CAST(n0 - ta AS DOUBLE)
    * CAST(n0 - tb AS DOUBLE)), 6) AS tau_b
FROM agg"""
    _compare(out, sql, tables=("lineitem", "orders"))


def test_gopher_rules_driver_shape_duckdb_replay(spark):
    """The Gopher battery at the future query shape: every counter and
    rule boolean over the real documents table (no bullets/symbols in
    the synthetic corpus — those counters replay as exact zeros, the
    word/stopword/alpha rules carry the variation)."""
    from healthcare_dbt_datamart_spark.llmops.textstats import gopher_rules

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = gopher_rules(docs, "text", "doc_id")

    sql = """
WITH base AS (
  SELECT doc_id,
    len(w) AS n_words,
    CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0)
      AS BIGINT) AS n_word_chars,
    len(lns) AS n_lines,
    (length(t) - length(replace(t, '#', '')))
      + (length(t) - length(replace(t, '…', '')))
      + (length(t) - length(replace(t, '...', ''))) // 3 AS n_symbols,
    len(list_filter(lns, x -> substr(ltrim(x), 1, 1) IN ('•','-','*')))
      AS n_bullet_lines,
    len(list_filter(lns, x -> rtrim(x) LIKE '%...'
      OR rtrim(x) LIKE '%…')) AS n_ellipsis_lines,
    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha_words,
    len(list_intersect(list_distinct(w),
      ['the','be','to','of','and','that','have','with'])) AS n_stop_kinds
  FROM (
    SELECT doc_id, COALESCE(text, '') AS t,
      list_filter(string_split_regex(lower(trim(COALESCE(text, ''))),
        '\\s+'), x -> x != '') AS w,
      list_filter(string_split(COALESCE(text, ''), chr(10)),
        x -> trim(x) != '') AS lns
    FROM documents
  )
),
rules AS (
  SELECT doc_id,
    CAST(n_words AS BIGINT) AS n_words, n_word_chars,
    CAST(n_lines AS BIGINT) AS n_lines, CAST(n_symbols AS BIGINT) AS n_symbols,
    CAST(n_bullet_lines AS BIGINT) AS n_bullet_lines,
    CAST(n_ellipsis_lines AS BIGINT) AS n_ellipsis_lines,
    CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
    CAST(n_stop_kinds AS BIGINT) AS n_stop_kinds,
    (n_words >= 50 AND n_words <= 100000) AS r_word_count,
    (n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
      AND n_words > 0) AS r_mean_word_len,
    (100 * n_symbols <= 10 * n_words) AS r_symbol_ratio,
    (100 * n_bullet_lines <= 90 * n_lines) AS r_bullet_lines,
    (100 * n_ellipsis_lines <= 30 * n_lines) AS r_ellipsis_lines,
    (100 * n_alpha_words >= 80 * n_words) AS r_alpha_words,
    (n_stop_kinds >= 2) AS r_stop_words
  FROM base
)
SELECT *,
  (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet_lines
   AND r_ellipsis_lines AND r_alpha_words AND r_stop_words) AS keep
FROM rules
"""
    _compare(out, sql)


def test_mcnemar_driver_shape_duckdb_replay(spark):
    """Paired classifier comparison at the future query shape: a
    length-threshold classifier vs a token-budget classifier judged on
    lang='en' over documents — one exact contingency fold, replayed."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import mcnemar_test

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    judged = docs.select(
        ((F.col("n_chars") >= 250) == (F.col("lang") == "en"))
        .cast("int").alias("ca"),
        (
            (
                F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
                >= 40
            )
            == (F.col("lang") == "en")
        ).cast("int").alias("cb"),
    )
    out = mcnemar_test(judged, "ca", "cb")

    sql = """
WITH j AS (
  SELECT CAST((n_chars >= 250) = (lang = 'en') AS INT) AS ca,
    CAST((len(string_split_regex(lower(trim(text)), '\\s+')) >= 40)
      = (lang = 'en') AS INT) AS cb
  FROM documents
),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
    CAST(SUM(CASE WHEN ca=1 AND cb=1 THEN 1 ELSE 0 END) AS BIGINT)
      AS both_right,
    CAST(SUM(CASE WHEN ca=1 AND cb=0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN ca=0 AND cb=1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN ca=0 AND cb=0 THEN 1 ELSE 0 END) AS BIGINT)
      AS both_wrong
  FROM j
)
SELECT n_items, both_right, b AS only_a, c AS only_b, both_wrong,
  CASE WHEN b + c > 0 THEN round(
    CAST(greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
      AS DOUBLE) / CAST(b + c AS DOUBLE), 6) END AS chi2,
  (CASE WHEN b + c > 0 THEN round(
    CAST(greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
      AS DOUBLE) / CAST(b + c AS DOUBLE), 6) END) IS NOT NULL
  AND (CASE WHEN b + c > 0 THEN round(
    CAST(greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
      AS DOUBLE) / CAST(b + c AS DOUBLE), 6) END) > 3.841459
    AS significant
FROM cells
"""
    _compare(out, sql)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))


def test_rbo_driver_shape_duckdb_replay(spark):
    """RBO at the future query shape: top-weighted agreement between
    the EXACT cosine top-10 and the IVF(nprobe=2) top-10 for the same
    query — the list-level number behind an ANN release's recall gate.
    The oracle composes the two PROVEN board oracles (incl. the
    unrolled Lloyd fit) with the prefix-form overlap series."""
    from pyspark.sql.window import Window as W

    from healthcare_dbt_datamart_spark.llmops.evaluation import rbo
    from healthcare_dbt_datamart_spark.llmops.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import ORACLE

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_topk(emb, query_id=0, k=10).select(
        F.col("vec_id").alias("item"),
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()))
        .cast("bigint")
        .alias("ra"),
    )
    approx = ivf_topk(
        emb, query_id=0, k=10, n_centroids=8, nprobe=2, n_iter=2
    ).select(
        F.col("vec_id").alias("item"),
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()))
        .cast("bigint")
        .alias("rb"),
    )
    both = exact.join(approx, "item", "full_outer")
    out = rbo(both, "item", "ra", "rb")

    sql = f"""
WITH ex AS ({ORACLE["cosine_topk"]}),
ap AS ({ORACLE["ivf_topk"]}),
ra AS (
  SELECT vec_id AS item,
    row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS r
  FROM ex
),
rb AS (
  SELECT vec_id AS item,
    row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS r
  FROM ap
),
j AS (
  SELECT COALESCE(ra.item, rb.item) AS item, ra.r AS r1, rb.r AS r2
  FROM ra FULL OUTER JOIN rb ON ra.item = rb.item
),
dep AS (
  SELECT CAST(GREATEST(MAX(r1), MAX(r2)) AS BIGINT) AS d FROM j
),
series AS (SELECT unnest(range(1, (SELECT d FROM dep) + 1)) + 0 AS i),
ov AS (
  SELECT s.i, CAST(COUNT(j.item) AS BIGINT) AS o
  FROM series s LEFT JOIN j
    ON j.r1 IS NOT NULL AND j.r2 IS NOT NULL
    AND GREATEST(j.r1, j.r2) <= s.i
  GROUP BY s.i
)
SELECT (SELECT d FROM dep) AS depth,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM j
    WHERE r1 IS NOT NULL AND r2 IS NOT NULL) AS n_common,
  round((1 - 0.9) * SUM(pow(0.9, i - 1) * o / i), 6) AS rbo
FROM ov
"""
    _compare(out, sql, tables=("embeddings",))


def test_leakage_safe_split_driver_shape_duckdb_replay(spark):
    """Leakage-safe splits at the future query shape: the full
    per-document (id, component, split) assignment over documents —
    the oracle composes the PROVEN recursive-closure component oracle
    with the cluster-min-fingerprint split rule."""
    from healthcare_dbt_datamart_spark.llmops.splits import (
        leakage_safe_split,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import ORACLE

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = leakage_safe_split(docs, "text", "doc_id")

    sql = f"""
WITH comp AS ({ORACLE["near_dup_clusters"]}),
fp AS (SELECT doc_id, md5(text) AS f FROM documents),
rep AS (
  SELECT comp.component, MIN(fp.f) AS rf
  FROM comp JOIN fp ON fp.doc_id = comp.doc_id
  GROUP BY 1
),
keyed AS (
  SELECT d.doc_id AS id, comp.component,
    COALESCE(rep.rf, fp.f) AS kf
  FROM documents d
  JOIN fp ON fp.doc_id = d.doc_id
  LEFT JOIN comp ON comp.doc_id = d.doc_id
  LEFT JOIN rep ON rep.component = comp.component
)
SELECT id, component,
  CASE WHEN substr(kf, 1, 1) IN ('0','1','2','3','4','5','6','7','8',
    '9','a','b') THEN 'train'
  WHEN substr(kf, 1, 1) IN ('c','d') THEN 'val'
  ELSE 'test' END AS split
FROM keyed
"""
    _compare(out, sql)


def test_winsorize_scores_driver_shape_duckdb_replay(spark):
    """Winsorization at the future query shape: per-language document
    lengths clamped at the exact 5th/95th ceil-rank order statistics —
    window SQL replays every output column."""
    from healthcare_dbt_datamart_spark.llmops.splits import winsorize_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("len_d")
    )
    out = winsorize_scores(
        docs, "len_d", "doc_id", grp_col="lang", lo_pct=5, hi_pct=95
    )

    sql = """
WITH t AS (
  SELECT lang, doc_id AS id, CAST(n_chars AS DOUBLE) AS v FROM documents
),
ranked AS (
  SELECT lang, id, v,
    row_number() OVER (PARTITION BY lang ORDER BY v ASC, id ASC) AS r,
    COUNT(*) OVER (PARTITION BY lang) AS n
  FROM t
),
bounds AS (
  SELECT lang,
    MIN(CASE WHEN r = GREATEST((n * 5 + 99) // 100, 1) THEN v END) AS lo,
    MIN(CASE WHEN r = GREATEST((n * 95 + 99) // 100, 1) THEN v END) AS hi
  FROM ranked GROUP BY lang
)
SELECT t.lang, t.id, t.v AS value, b.lo, b.hi,
  GREATEST(LEAST(t.v, b.hi), b.lo) AS value_w,
  (t.v < b.lo OR t.v > b.hi) AS clipped
FROM t JOIN bounds b USING (lang)
"""
    _compare(out, sql)


def test_c4_line_filter_driver_shape_duckdb_replay(spark):
    """C4 cleaning at the future query shape: the synthetic documents
    corpus carries no newlines, so the query builds a deterministic
    line-shaped text from each doc (content slices + terminal
    punctuation + a javascript line on doc_id % 7 and a brace poison
    on doc_id % 13) — both engines replicate the construction exactly,
    and the line/page rules all fire somewhere in the corpus."""
    from healthcare_dbt_datamart_spark.llmops.textstats import c4_line_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    nl = F.lit("\n")
    lined = docs.select(
        "doc_id",
        F.concat(
            F.concat(F.substring("text", 1, 60), F.lit(".")),
            nl,
            F.concat(
                F.substring("text", 61, 15),
                F.when(F.col("doc_id") % 13 == 0, F.lit(" {")).otherwise(
                    F.lit("")
                ),
            ),
            nl,
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("Enable javascript to view this content please."),
            ).otherwise(
                F.lit(
                    "Another proper sentence arrives with plenty of words."
                )
            ),
            nl,
            F.concat(F.substring("text", 76, 60), F.lit("?")),
        ).alias("text"),
    )
    out = c4_line_filter(lined, "text", "doc_id", min_sentences=2)

    sql = """
WITH lined AS (
  SELECT doc_id,
    substr(text, 1, 60) || '.' || chr(10)
    || substr(text, 61, 15)
    || CASE WHEN doc_id % 13 = 0 THEN ' {' ELSE '' END || chr(10)
    || CASE WHEN doc_id % 7 = 0
       THEN 'Enable javascript to view this content please.'
       ELSE 'Another proper sentence arrives with plenty of words.' END
    || chr(10)
    || substr(text, 76, 60) || '?' AS t
  FROM documents
),
split AS (
  SELECT doc_id, t, string_split(t, chr(10)) AS lns FROM lined
),
kept AS (
  SELECT doc_id, t, lns,
    list_filter(lns, x -> regexp_matches(rtrim(x), '[.!?"]$')
      AND len(list_filter(string_split_regex(trim(x), '\\s+'),
              y -> y != '')) >= 5
      AND NOT contains(lower(x), 'javascript')) AS k
  FROM split
),
base AS (
  SELECT doc_id,
    CAST(len(list_filter(lns, x -> trim(x) != '')) AS BIGINT) AS n_lines,
    CAST(len(k) AS BIGINT) AS n_kept_lines,
    CAST(length(regexp_replace(COALESCE(array_to_string(k, chr(10)), ''),
      '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences,
    contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
    contains(t, '{') AS has_brace,
    COALESCE(array_to_string(k, chr(10)), '') AS clean
  FROM kept
)
SELECT doc_id,
  n_lines, n_kept_lines,
  n_lines - n_kept_lines AS n_dropped_lines,
  n_sentences, has_lorem_ipsum, has_brace,
  (NOT has_lorem_ipsum AND NOT has_brace AND n_sentences >= 2
   AND n_kept_lines > 0) AS keep,
  CASE WHEN (NOT has_lorem_ipsum AND NOT has_brace AND n_sentences >= 2
   AND n_kept_lines > 0) THEN clean ELSE '' END AS clean_text
FROM base
"""
    _compare(out, sql)
    # the rules all fire somewhere: brace pages dropped, javascript
    # lines removed from kept pages, the rest keep
    rows = out.collect()
    assert any(r.has_brace for r in rows)
    assert any(not r.keep for r in rows)
    assert any(r.keep for r in rows)
    assert all("javascript" not in r.clean_text for r in rows)


def test_lsh_plan_driver_shape_duckdb_replay(spark):
    """The LSH planner at driver shape (pure bounded math — the oracle
    generates the factorizations and the S-curve arithmetic in SQL):
    threshold 40%, 8 hashes — the repo's own near-dup operating
    point."""
    from healthcare_dbt_datamart_spark.llmops.dedup import lsh_plan

    out = lsh_plan(spark, 40, 8)

    sql = """
WITH f AS (
  SELECT CAST(b AS INTEGER) AS bands, CAST(8 // b AS INTEGER)
    AS rows_per_band
  FROM (SELECT unnest(range(1, 9)) AS b) WHERE 8 % b = 0
),
curves AS (
  SELECT bands, rows_per_band,
    round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS curve_threshold,
    round(1 - pow(1 - pow(0.4, rows_per_band), bands), 6) AS p_at_target,
    round(1 - pow(1 - pow(0.4 - 0.1, rows_per_band), bands), 6) AS p_below,
    round(1 - pow(1 - pow(0.4 + 0.1, rows_per_band), bands), 6) AS p_above
  FROM f
),
under AS (
  SELECT *, row_number() OVER (ORDER BY curve_threshold DESC,
    rows_per_band DESC) AS rk
  FROM curves WHERE curve_threshold <= 0.4
),
over_ AS (
  SELECT *, (SELECT COUNT(*) FROM under)
    + row_number() OVER (ORDER BY curve_threshold ASC,
      rows_per_band DESC) AS rk
  FROM curves WHERE curve_threshold > 0.4
)
SELECT CAST(rk AS INTEGER) AS rank, bands, rows_per_band,
  curve_threshold, p_at_target, p_below, p_above
FROM under
UNION ALL
SELECT CAST(rk AS INTEGER), bands, rows_per_band,
  curve_threshold, p_at_target, p_below, p_above
FROM over_
"""
    _compare(out, sql)
