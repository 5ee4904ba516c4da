"""Driver-SHAPE DuckDB oracle replays + unit gates for the round-13
queue leaders (fourth file in the pre-proof convention —
test_round10/11/12_replays.py proved the elo/wilson, unimax/conformal/
vocab/ppr, and rrf/kendall/gopher/mcnemar/rbo/leakage cohorts before
their promotions): each replay builds the future ``queries()`` body AND
its ``oracle_sql()`` twin at the exact input shape the promoted query
will use, over the REAL sf0.001 parquet, and compares with the driver
gate's fingerprint. Cohort here: the round-10 new-operator wave —
``levenshtein_pairs`` (edit-distance near-dup verification over LSH
candidates — the short-text verifier beside jaccard_pairs) and
``chrf_report`` (Popović 2015 character n-gram F-score — the
tokenizer-free generation-eval rung beside bleu_corpus/rouge_l).
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


def test_levenshtein_pairs_unit_and_guards(spark):
    """Hand-computed edit distances, the identical-empty edge (sim 1),
    the integer cross-multiplied gate, and both guards (over-length
    texts raise naming offenders; bad threshold raises)."""
    from healthcare_dbt_datamart_spark.llmops.dedup import (
        levenshtein_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "kitten"),
            (2, "sitting"),   # lev(kitten, sitting) = 3, maxlen 7
            (3, "kitten"),    # exact dup of 1
            (4, ""),
            (5, ""),          # empty-empty: maxlen 0 -> sim 1, kept
            (6, "wholly different text"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (1, 6)], "id_a long, id_b long"
    )
    got = {
        (r.id_a, r.id_b): r
        for r in levenshtein_pairs(
            pairs, docs, "text", "doc_id", threshold_pct=50
        ).collect()
    }
    # (1,2): dist 3, maxlen 7 -> 100*(7-3)=400 >= 50*7=350 -> kept
    assert got[(1, 2)].dist == 3 and got[(1, 2)].maxlen == 7
    assert got[(1, 2)].sim == round(1 - 3 / 7, 6)
    # exact dup: dist 0, sim 1.0
    assert got[(1, 3)].dist == 0 and got[(1, 3)].sim == 1.0
    # empty-empty: kept with sim exactly 1
    assert got[(4, 5)].maxlen == 0 and got[(4, 5)].sim == 1.0
    # dissimilar pair filtered
    assert (1, 6) not in got

    # tighter threshold drops the typo pair but keeps the exact dup
    tight = {
        (r.id_a, r.id_b)
        for r in levenshtein_pairs(
            pairs, docs, "text", "doc_id", threshold_pct=90
        ).collect()
    }
    assert (1, 3) in tight and (1, 2) not in tight

    with pytest.raises(ValueError, match="threshold_pct"):
        levenshtein_pairs(pairs, docs, "text", "doc_id", threshold_pct=101)
    long_docs = spark.createDataFrame(
        [(1, "x" * 60), (2, "y" * 10)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_chars"):
        levenshtein_pairs(
            pairs.limit(1), long_docs, "text", "doc_id", max_chars=50
        )


def test_levenshtein_pairs_driver_shape_duckdb_replay(spark):
    """Edit-distance verification at the future query shape: the
    near_dup_jaccard LSH candidate set (8 hashes, 4 bands x 2 rows over
    3-shingles) verified by character edit similarity at 50% — the
    short-text fuzzy-dedup composition. DuckDB's levenshtein computes
    the same integer as Spark's JVM kernel, so every column replays."""
    from healthcare_dbt_datamart_spark.llmops.dedup import (
        candidate_pairs,
        levenshtein_pairs,
        lsh_band_buckets,
        minhash_signatures,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        _BANDS,
        _SIGS,
        _TOKS_3,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8, n_shingle=3)
    pairs = candidate_pairs(lsh_band_buckets(sigs, "doc_id", 8, 2), "doc_id")
    out = levenshtein_pairs(pairs, docs, "text", "doc_id", threshold_pct=50)

    sql = f"""
WITH toks AS ({_TOKS_3}),
sigs AS ({_SIGS}),
bands AS ({_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_idx, band_key)
  WHERE a.doc_id < b.doc_id
),
lev AS (
  SELECT id_a, id_b,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
         CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
           AS maxlen
  FROM cand
  JOIN documents da ON da.doc_id = id_a
  JOIN documents db ON db.doc_id = id_b
)
SELECT id_a, id_b, dist, maxlen,
       CASE WHEN maxlen = 0 THEN 1.0
            ELSE round(1.0 - dist / CAST(maxlen AS DOUBLE), 6) END AS sim
FROM lev
WHERE 100 * (maxlen - dist) >= 50 * maxlen
"""
    _compare(out, sql)


def test_chrf_report_unit_and_guards(spark):
    """Hand-computed chrF cells on a two-pair corpus: clipped counts,
    the (1+b2)m/(b2r+c) single-division identity, NULL semantics for
    gramless orders, null-pair accounting, and the empty-corpus
    guard."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import chrf_report

    df = spark.createDataFrame(
        [
            (1, "abab", "abab"),   # identical: all orders perfect
            (2, "ab", "ba"),       # 1-grams match fully, 2-grams miss
            (3, None, "x"),        # NULL pair: excluded + counted
        ],
        "id long, cand string, ref string",
    )
    got = {r.order: r for r in chrf_report(df, "cand", "ref", "id").collect()}
    assert got[1].n_pairs == 2 and got[1].n_null_pairs == 1
    # order 1: cand grams a,b,a,b + a,b = 6; identical for ref; all match
    assert (got[1].cand_ngrams, got[1].ref_ngrams) == (6, 6)
    assert got[1].match_ngrams == 6
    assert got[1].precision == 1.0 and got[1].recall == 1.0
    assert got[1].fscore == 1.0
    # order 2: pair1 has ab,ba,ab (clip 3 of 3), pair2 cand=ab ref=ba
    # (clip 0): c=4, r=4, m=3; F = 5*3/(4*4+4) = 15/20
    assert (got[2].cand_ngrams, got[2].ref_ngrams, got[2].match_ngrams) == (
        4, 4, 3,
    )
    assert got[2].fscore == round(5 * 3 / (4 * 4 + 4), 6)
    # order 4: only pair1 ('abab') has a 4-gram; clip 1
    assert (got[4].cand_ngrams, got[4].match_ngrams) == (1, 1)
    # order 5/6: no grams anywhere -> every metric NULL, counts 0
    assert got[5].cand_ngrams == 0 and got[5].fscore is None
    assert got[6].precision is None and got[6].recall is None
    # whitespace is stripped before gramming
    ws = spark.createDataFrame(
        [(1, "a b", "ab")], "id long, cand string, ref string"
    )
    w1 = {r.order: r for r in chrf_report(ws, "cand", "ref", "id").collect()}
    assert w1[2].match_ngrams == 1  # 'ab' == 'ab' after stripping

    with pytest.raises(ValueError, match="no non-NULL"):
        chrf_report(
            spark.createDataFrame(
                [(1, None, "x")], "id long, cand string, ref string"
            ),
            "cand", "ref", "id",
        )
    with pytest.raises(ValueError, match="max_n"):
        chrf_report(df, "cand", "ref", "id", max_n=11)
    with pytest.raises(ValueError, match="beta"):
        chrf_report(df, "cand", "ref", "id", beta=0)


def test_chrf_report_driver_shape_duckdb_replay(spark):
    """chrF at the future query shape: every document graded as
    candidate = its first 300 chars vs reference = chars 101-400 (the
    sliding-window construction — real overlap at every order, exact
    clipping exercised corpus-wide). Counts, both denominators, and
    the single-division F replay per order."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import chrf_report

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = docs.select(
        "doc_id",
        F.substring("text", 1, 300).alias("cand"),
        F.substring("text", 101, 300).alias("ref"),
    )
    out = chrf_report(pairs, "cand", "ref", "doc_id")

    sql = """
WITH pairs AS (
  SELECT doc_id AS pid,
    regexp_replace(lower(trim(substr(text, 1, 300))), '\\s+', '', 'g') AS c,
    regexp_replace(lower(trim(substr(text, 101, 300))), '\\s+', '', 'g') AS r
  FROM documents
),
orders AS (SELECT unnest(range(1, 7)) AS n),
cg AS (
  SELECT pid, n,
    unnest([substr(c, i, CAST(n AS INTEGER))
            for i in range(1, greatest(length(c) - n + 1, 0) + 1)]) AS g
  FROM pairs, orders
),
rg AS (
  SELECT pid, n,
    unnest([substr(r, i, CAST(n AS INTEGER))
            for i in range(1, greatest(length(r) - n + 1, 0) + 1)]) AS g
  FROM pairs, orders
),
cc AS (SELECT pid, n, g, COUNT(*) AS nc FROM cg GROUP BY ALL),
rc AS (SELECT pid, n, g, COUNT(*) AS nr FROM rg GROUP BY ALL),
j AS (
  SELECT COALESCE(cc.n, rc.n) AS n,
         COALESCE(nc, 0) AS nc, COALESCE(nr, 0) AS nr,
         LEAST(COALESCE(nc, 0), COALESCE(nr, 0)) AS clip
  FROM cc FULL OUTER JOIN rc
    ON cc.pid = rc.pid AND cc.n = rc.n AND cc.g = rc.g
),
agg AS (
  SELECT n, CAST(SUM(nc) AS BIGINT) AS cand_ngrams,
         CAST(SUM(nr) AS BIGINT) AS ref_ngrams,
         CAST(SUM(clip) AS BIGINT) AS match_ngrams
  FROM j GROUP BY n
),
spine AS (SELECT unnest(range(1, 7)) AS n),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs)
SELECT CAST(spine.n AS INTEGER) AS "order",
  np.n_pairs,
  CAST(0 AS BIGINT) AS n_null_pairs,
  COALESCE(cand_ngrams, 0) AS cand_ngrams,
  COALESCE(ref_ngrams, 0) AS ref_ngrams,
  COALESCE(match_ngrams, 0) AS match_ngrams,
  CASE WHEN COALESCE(cand_ngrams, 0) > 0 THEN
    round(COALESCE(match_ngrams, 0) / CAST(cand_ngrams AS DOUBLE), 6)
  END AS precision,
  CASE WHEN COALESCE(ref_ngrams, 0) > 0 THEN
    round(COALESCE(match_ngrams, 0) / CAST(ref_ngrams AS DOUBLE), 6)
  END AS recall,
  CASE WHEN 4 * COALESCE(ref_ngrams, 0) + COALESCE(cand_ngrams, 0) > 0 THEN
    round(5 * COALESCE(match_ngrams, 0)
          / CAST(4 * ref_ngrams + cand_ngrams AS DOUBLE), 6)
  END AS fscore
FROM spine CROSS JOIN np LEFT JOIN agg ON agg.n = spine.n
"""
    _compare(out, sql)


def test_paired_bootstrap_driver_shape_duckdb_replay(spark):
    """Koehn-style paired significance at the future query shape:
    system A = n_chars + (doc_id mod 3) vs system B = n_chars on the
    same documents — a small consistent gain under large item
    variance, the test's reason to exist. The md5(seed:rep:id) draws,
    Poisson CASE weights, replicate means, and ceil-rank walk replay
    the driver-green bootstrap_diff_ci oracle machinery."""
    from healthcare_dbt_datamart_spark.llmops.bootstrap import (
        paired_bootstrap_test,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        _P1_CASE,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = docs.select(
        "doc_id",
        (F.col("n_chars") + F.pmod(F.col("doc_id"), F.lit(3))).alias(
            "score_a"
        ),
        F.col("n_chars").alias("score_b"),
    )
    out = paired_bootstrap_test(
        scored, "score_a", "score_b", "doc_id", n_boot=40, seed="pb"
    )

    sql = f"""
WITH reps AS (SELECT unnest(range(40)) AS rep),
items AS (
  SELECT doc_id, CAST(n_chars + (doc_id % 3) AS BIGINT) AS a,
         CAST(n_chars AS BIGINT) AS b
  FROM documents
),
draws AS (
  SELECT rep, a - b AS d,
         ('0x' || substr(md5('pb:' || CAST(rep AS VARCHAR) || ':'
            || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           / CAST(1152921504606846976 AS DOUBLE) AS u
  FROM items, reps
),
wtd AS (SELECT rep, d, CASE {_P1_CASE} ELSE 7 END AS w FROM draws),
rm AS (
  SELECT rep, CAST(SUM(w * d) AS DOUBLE) / SUM(w) AS m
  FROM wtd GROUP BY 1 HAVING SUM(w) > 0
),
ranked AS (
  SELECT rep, m, row_number() OVER (ORDER BY m, rep) AS rn,
         COUNT(*) OVER () AS nb
  FROM rm
),
bounds AS (
  SELECT round(MIN(m), 6) AS ci_lo, round(MAX(m), 6) AS ci_hi
  FROM ranked
  WHERE rn = GREATEST(CAST(ceil(0.025 * nb) AS INTEGER), 1)
     OR rn = CAST(ceil(0.975 * nb) AS INTEGER)
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
    round(CAST(SUM(a) AS DOUBLE) / COUNT(*), 6) AS mean_a,
    round(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS mean_b,
    round(CAST(SUM(a - b) AS DOUBLE) / COUNT(*), 6) AS diff,
    CAST(SUM(CASE WHEN a > b THEN 1 ELSE 0 END) AS BIGINT) AS n_a_wins,
    CAST(SUM(CASE WHEN a < b THEN 1 ELSE 0 END) AS BIGINT) AS n_b_wins,
    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_ties
  FROM items
)
SELECT n_items, mean_a, mean_b, diff, ci_lo, ci_hi,
       (ci_lo > 0 OR ci_hi < 0) AS significant,
       n_a_wins, n_b_wins, n_ties
FROM base, bounds
"""
    _compare(out, sql)


def test_source_overlap_kmv_driver_shape_duckdb_replay(spark):
    """KMV source-overlap matrix at the future query shape: pairwise
    content Jaccard estimates across the documents sources at k=64
    (below per-source distinct counts, so the union-trick estimator
    path — not the exact degenerate — is what replays). The 60-bit
    md5 fingerprints, two-stage k-smallest, and union-slice arithmetic
    all reproduce in window SQL."""
    from healthcare_dbt_datamart_spark.llmops.dedup import (
        source_overlap_kmv,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = source_overlap_kmv(docs, "source", "text", k=64)

    sql = """
WITH hashes AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
  FROM documents
),
nd AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM hashes GROUP BY 1
),
sigs AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hashes
  ) WHERE rn <= 64
),
pairs AS (
  SELECT DISTINCT a.source AS sa, b.source AS sb
  FROM sigs a JOIN sigs b ON a.source < b.source
),
u AS (
  SELECT DISTINCT p.sa, p.sb, s.h
  FROM pairs p JOIN sigs s ON s.source IN (p.sa, p.sb)
),
uk AS (
  SELECT sa, sb, h FROM (
    SELECT sa, sb, h,
           row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= 64
),
agg AS (
  SELECT uk.sa, uk.sb, CAST(COUNT(*) AS INTEGER) AS k_union,
         CAST(SUM(CASE WHEN s1.h IS NOT NULL AND s2.h IS NOT NULL
                  THEN 1 ELSE 0 END) AS INTEGER) AS n_common_in_k
  FROM uk
  LEFT JOIN sigs s1 ON s1.source = uk.sa AND s1.h = uk.h
  LEFT JOIN sigs s2 ON s2.source = uk.sb AND s2.h = uk.h
  GROUP BY 1, 2
)
SELECT agg.sa AS source_a, agg.sb AS source_b,
       na.n_distinct AS n_distinct_a, nb.n_distinct AS n_distinct_b,
       k_union, n_common_in_k,
       round(n_common_in_k / CAST(k_union AS DOUBLE), 6) AS jaccard_est
FROM agg
JOIN nd na ON na.source = agg.sa
JOIN nd nb ON nb.source = agg.sb
"""
    _compare(out, sql)


def test_min_k_prob_unit_and_guards(spark):
    """Min-K% Prob against a hand-built Laplace unigram reference:
    tail selection picks exactly the ceil(n·k/100) lowest-logprob
    tokens (pos tie-break), quantized means replay bit-for-bit in
    pure Python, unseen tokens get the 1/(N+V) floor, empty docs keep
    NULL-scored rows, and the guards fire."""
    import math

    from healthcare_dbt_datamart_spark.llmops.filtering import min_k_prob

    ref = spark.createDataFrame(
        [(100, "a a a b")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "a b z a"), (2, "a a"), (3, "   ")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in min_k_prob(
            docs, "text", "doc_id", ref_df=ref, k_pct=50
        ).collect()
    }
    # reference: c(a)=3 c(b)=1, N=4, V=2 -> denom 6
    q = lambda p: math.floor(math.log(p) * 10**9 + 0.5)  # noqa: E731
    lp_a, lp_b, lp_z = q(4 / 6.0), q(2 / 6.0), q(1 / 6.0)
    # doc 1: 4 tokens, k=50% -> 2 lowest = z then b
    assert out[1].n_tokens == 4 and out[1].n_lowest == 2
    assert out[1].min_k_logprob == round((lp_z + lp_b) / (2 * 1e9), 6)
    assert out[1].mean_logprob == round(
        (2 * lp_a + lp_b + lp_z) / (4 * 1e9), 6
    )
    # doc 2: 2 tokens -> 1 lowest (ceil(2*50/100)=1), both are 'a'
    assert out[2].n_lowest == 1
    assert out[2].min_k_logprob == round(lp_a / 1e9, 6)
    # doc 3: no tokens -> NULL scores, zero counts (fail-as-data)
    assert out[3].n_tokens == 0 and out[3].n_lowest == 0
    assert out[3].min_k_logprob is None and out[3].mean_logprob is None
    # a SEEN doc's tail mean sits above an unseen-token doc's
    assert out[2].min_k_logprob > out[1].min_k_logprob

    with pytest.raises(ValueError, match="k_pct"):
        min_k_prob(docs, "text", "doc_id", ref_df=ref, k_pct=0)
    with pytest.raises(ValueError, match="no tokens"):
        min_k_prob(
            docs, "text", "doc_id",
            ref_df=spark.createDataFrame(
                [(1, " ")], "doc_id long, text string"
            ),
        )


def test_min_k_prob_driver_shape_duckdb_replay(spark):
    """Min-K% Prob at the future query shape: reference = the src0
    slice (the CCNet clean-reference convention shared with
    kn_bigram_scores), every document scored at k=20 — quantized
    per-token logprobs, per-doc rank-window tail selection, and both
    integer-sum means replay field-for-field."""
    from healthcare_dbt_datamart_spark.llmops.filtering import min_k_prob

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = min_k_prob(
        docs, "text", "doc_id",
        ref_df=docs.filter(F.col("source") == "src0"), k_pct=20,
    )

    sql = """
WITH rt AS (
  SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
    '\\s+'), x -> x != '')) AS t
  FROM documents WHERE source = 'src0'
),
freq AS (SELECT t, COUNT(*) AS c FROM rt GROUP BY t),
hd AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT)
         + CAST(COUNT(*) AS BIGINT) AS denom
  FROM freq
),
dt AS (
  SELECT doc_id, i AS pos, w[CAST(i AS INTEGER)] AS t
  FROM (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)),
          '\\s+'), x -> x != '') AS w
        FROM documents),
  unnest(range(1, len(w) + 1)) AS u(i)
),
scored AS (
  SELECT doc_id, pos,
    CAST(floor(ln((COALESCE(c, 0) + 1) / CAST(hd.denom AS DOUBLE))
      * 1000000000 + 0.5) AS BIGINT) AS lp_fp
  FROM dt LEFT JOIN freq USING (t), hd
),
ranked AS (
  SELECT doc_id, lp_fp,
    row_number() OVER (PARTITION BY doc_id ORDER BY lp_fp, pos) AS rn,
    COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM scored
),
agg AS (
  SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
    CAST(MAX(CASE WHEN rn <= GREATEST(CAST(ceil(n * 20 / 100.0) AS
      BIGINT), 1) THEN rn END) AS BIGINT) AS n_lowest,
    CAST(SUM(CASE WHEN rn <= GREATEST(CAST(ceil(n * 20 / 100.0) AS
      BIGINT), 1) THEN lp_fp END) AS BIGINT) AS tail_fp,
    CAST(SUM(lp_fp) AS BIGINT) AS all_fp
  FROM ranked GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(n_tokens, 0) AS n_tokens,
  COALESCE(n_lowest, 0) AS n_lowest,
  round(tail_fp / (n_lowest * 1000000000.0), 6) AS min_k_logprob,
  round(all_fp / (n_tokens * 1000000000.0), 6) AS mean_logprob
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN agg USING (doc_id)
"""
    _compare(out, sql)


def test_mad_scores_unit_and_guards(spark):
    """Median/MAD robust scoring on hand-built groups: exact lower
    medians at ceil ranks, the 0.6745 modified z, outlier flag at 3.5,
    NULL robust_z on a zero-MAD group (never a fabricated infinity),
    and the NULL/NaN guard."""
    from healthcare_dbt_datamart_spark.llmops.splits import mad_scores

    df = spark.createDataFrame(
        [("g1", i, v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])]
        + [("g2", i, v) for i, v in enumerate([5.0, 5.0, 5.0, 9.0])],
        "grp string, id long, v double",
    )
    got = {
        (r.grp, r.id): r
        for r in mad_scores(df, "v", "id", grp_col="grp").collect()
    }
    # g1: n=5 -> k=3 -> median 3; |dev| = [2,1,0,1,97] -> MAD 1
    g1 = got[("g1", 4)]
    assert (g1.median, g1.mad) == (3.0, 1.0)
    assert g1.robust_z == round(0.6745 * 97 / 1.0, 6) and g1.outlier
    assert got[("g1", 0)].robust_z == round(0.6745 * -2 / 1.0, 6)
    assert not got[("g1", 0)].outlier
    # g2: median 5, MAD 0 -> NULL score + flag, values intact
    g2 = got[("g2", 3)]
    assert (g2.median, g2.mad) == (5.0, 0.0)
    assert g2.robust_z is None and g2.outlier is None and g2.value == 9.0

    # global shape (grp_col=None) keeps one group, no grp column
    glob = mad_scores(df, "v", "id").columns
    assert glob == ["id", "value", "median", "mad", "robust_z", "outlier"]

    with pytest.raises(ValueError, match="z_thresh_pct"):
        mad_scores(df, "v", "id", grp_col="grp", z_thresh_pct=0)
    with pytest.raises(ValueError, match="NULL/NaN"):
        mad_scores(
            df.unionByName(
                spark.createDataFrame(
                    [("g1", 99, float("nan"))], "grp string, id long, v double"
                )
            ),
            "v", "id", grp_col="grp",
        )


def test_mad_scores_driver_shape_duckdb_replay(spark):
    """Robust z-scores at the future query shape: per-language n_chars
    over the whole documents corpus — exact cell-table medians, the
    half-up 6dp-quantized modified z (a rational input can land z on
    an exact 6dp half-way point where engine round conventions
    diverge — seen at sf0.01), and the integer-fp 3.5 outlier flag
    replay field-for-field."""
    from healthcare_dbt_datamart_spark.llmops.splits import mad_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = mad_scores(
        docs.select("lang", "doc_id", F.col("n_chars").cast("double").alias("v")),
        "v", "doc_id", grp_col="lang",
    )

    sql = """
WITH x AS (
  SELECT lang AS grp, doc_id AS id, CAST(n_chars AS DOUBLE) AS v
  FROM documents
),
vc AS (SELECT grp, v, COUNT(*) AS c FROM x GROUP BY 1, 2),
vcum AS (
  SELECT grp, v,
    SUM(c) OVER (PARTITION BY grp ORDER BY v) AS cum,
    SUM(c) OVER (PARTITION BY grp) AS n
  FROM vc
),
med AS (
  SELECT grp, MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS median
  FROM vcum GROUP BY grp
),
dev AS (
  SELECT x.grp, x.id, x.v, med.median, abs(x.v - med.median) AS d
  FROM x JOIN med USING (grp)
),
dc AS (SELECT grp, d, COUNT(*) AS c FROM dev GROUP BY 1, 2),
dcum AS (
  SELECT grp, d,
    SUM(c) OVER (PARTITION BY grp ORDER BY d) AS cum,
    SUM(c) OVER (PARTITION BY grp) AS n
  FROM dc
),
mad AS (
  SELECT grp, MIN(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS mad
  FROM dcum GROUP BY grp
)
SELECT dev.grp AS lang, dev.id, dev.v AS value, dev.median, mad.mad,
  CASE WHEN mad.mad > 0
       THEN CAST(floor((0.6745 * (dev.v - dev.median) / mad.mad)
                       * 1000000 + 0.5) AS BIGINT) / 1000000.0 END
    AS robust_z,
  CASE WHEN mad.mad > 0
       THEN abs(CAST(floor((0.6745 * (dev.v - dev.median) / mad.mad)
                           * 1000000 + 0.5) AS BIGINT)) > 3500000
  END AS outlier
FROM dev JOIN mad USING (grp)
"""
    _compare(out, sql)


def test_index_scorecard_driver_shape_duckdb_replay(spark):
    """The WHOLE ANN index-release gate DAG replayed as one DuckDB
    statement at the future query shape: 2-round Lloyd fit -> cell
    assignment -> batched IVF top-10 for the query panel [0, 7, 21]
    at nprobe=2 -> brute cosine oracle -> TREC-padded judged pool
    (misses at sentinel -2.0) -> per-query recall/MRR/NDCG -> the
    exact-integer one-row release verdict. The fourth release-gate DAG
    (curation_dag / corpus_release / leaderboard_gate are driver
    queries already); a perturbed Lloyd round, probe rule, sentinel,
    rank tie-break, metric rounding, or release floor flips the
    hash."""
    from healthcare_dbt_datamart_spark.models.index_release import (
        build_index_scorecard,
    )
    from healthcare_dbt_datamart_spark.models.testdata_queries import (
        _lloyd_ctes,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = build_index_scorecard(spark, emb, query_ids=[0, 7, 21]).build(
        "index_scorecard"
    )

    sql = f"""
WITH {_lloyd_ctes(2, 8)},
qs AS (
  SELECT vec_id AS qid,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id IN (0, 7, 21)
),
qpair AS (
  SELECT qs.qid, c.cid, unnest(c.cvec) AS x, unnest(qs.qv) AS y
  FROM cent2 c CROSS JOIN qs
),
qsims AS (
  SELECT qid, cid,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS s
  FROM qpair GROUP BY qid, cid
),
probes AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid ASC)
             AS rn
    FROM qsims
  ) WHERE rn <= 2
),
fpair AS (
  SELECT p.qid, e.vec_id,
         unnest(list_transform(e.embedding, v -> CAST(v AS DOUBLE))) AS x,
         unnest(qs.qv) AS y
  FROM embeddings e
  JOIN asgf a USING (vec_id)
  JOIN probes p ON a.cell = p.cid
  JOIN qs ON qs.qid = p.qid
  WHERE e.vec_id != p.qid
),
fsims AS (
  SELECT qid, vec_id, sum(x * y) AS dot, sum(x * x) AS nx,
         sum(y * y) AS ny
  FROM fpair GROUP BY qid, vec_id
),
ann AS (
  SELECT qid, vec_id, s AS score FROM (
    SELECT qid, vec_id, round(dot / (sqrt(nx) * sqrt(ny)), 6) AS s,
           row_number() OVER (PARTITION BY qid
             ORDER BY round(dot / (sqrt(nx) * sqrt(ny)), 6) DESC,
                      vec_id ASC) AS rn
    FROM fsims
  ) WHERE rn <= 10
),
bpair AS (
  SELECT qs.qid, e.vec_id,
         unnest(list_transform(e.embedding, v -> CAST(v AS DOUBLE))) AS x,
         unnest(qs.qv) AS y
  FROM embeddings e CROSS JOIN qs
  WHERE e.vec_id != qs.qid
),
bsims AS (
  SELECT qid, vec_id, sum(x * y) AS dot, sum(x * x) AS nx,
         sum(y * y) AS ny
  FROM bpair GROUP BY qid, vec_id
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
             ORDER BY round(dot / (sqrt(nx) * sqrt(ny)), 6) DESC,
                      vec_id ASC) AS rn
    FROM bsims
  ) WHERE rn <= 10
),
pool AS (
  SELECT a.qid, a.vec_id, a.score,
         CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM ann a LEFT JOIN brute b USING (qid, vec_id)
  UNION ALL
  SELECT b.qid, b.vec_id, -2.0 AS score, 1 AS rel
  FROM brute b LEFT JOIN ann a USING (qid, vec_id)
  WHERE a.vec_id IS NULL
),
ranked AS (
  SELECT qid, vec_id, rel,
    row_number() OVER (PARTITION BY qid
      ORDER BY score DESC, vec_id ASC) AS r_sys,
    row_number() OVER (PARTITION BY qid
      ORDER BY rel DESC, vec_id ASC) AS r_ideal
  FROM pool
),
perq AS (
  SELECT qid,
    CAST(SUM(CASE WHEN r_sys <= 10 AND rel = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS hits,
    CAST(SUM(rel) AS BIGINT) AS n_rel,
    MIN(CASE WHEN rel = 1 THEN r_sys END) AS frr,
    round(SUM(CASE WHEN r_sys <= 10
      THEN (pow(2, rel) - 1) / log2(r_sys + 1.0) ELSE 0 END), 6) AS dcg,
    round(SUM(CASE WHEN r_ideal <= 10
      THEN (pow(2, rel) - 1) / log2(r_ideal + 1.0) ELSE 0 END), 6) AS idcg
  FROM ranked GROUP BY qid
),
metrics AS (
  SELECT qid,
    round(hits / CAST(n_rel AS DOUBLE), 6) AS recall,
    round(1.0 / frr, 6) AS mrr,
    CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) END AS ndcg
  FROM perq
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
  CAST(10 AS INTEGER) AS k,
  round(SUM(CAST(floor(recall * 1000000 + 0.5) AS BIGINT))
    / CAST(COUNT(*) * 1000000 AS DOUBLE), 6) AS mean_recall,
  MIN(recall) AS min_recall,
  round(SUM(CAST(floor(mrr * 1000000 + 0.5) AS BIGINT))
    / CAST(COUNT(*) * 1000000 AS DOUBLE), 6) AS mean_mrr,
  round(SUM(CAST(floor(ndcg * 1000000 + 0.5) AS BIGINT))
    / CAST(COUNT(*) * 1000000 AS DOUBLE), 6) AS mean_ndcg,
  SUM(CAST(floor(recall * 1000000 + 0.5) AS BIGINT))
    >= 600000 * COUNT(*) AS released
FROM metrics
"""
    _compare(out, sql, tables=("embeddings",))


def test_implicit_preference_pairs_driver_shape_duckdb_replay(spark):
    """Implicit-feedback preference mining at the future query shape:
    the events table natively carries the purchase > signup > click >
    view action ladder (plus 'error', which exercises the
    unmapped-action drop on real data); item = a deterministic
    event-id bucket per user. Strongest-action collapse, the 20-item
    cap, and the strict-rank pair build replay row-for-row."""
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        implicit_preference_pairs,
    )

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.concat(
                F.lit("it"), F.pmod(F.col("event_id"), F.lit(12)).cast("string")
            ).alias("item"),
            F.col("event_type").alias("action"),
        )
    )
    out = implicit_preference_pairs(
        ev, "user_id", "item", "action",
        {"purchase": 3, "signup": 2, "click": 1, "view": 0},
    )

    sql = """
WITH ev AS (
  SELECT user_id, 'it' || CAST(event_id % 12 AS VARCHAR) AS item,
         event_type AS action
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT user_id, item, MAX(CASE action
    WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
    WHEN 'click' THEN 1 WHEN 'view' THEN 0 END) AS rank
  FROM ev
  WHERE action IN ('purchase', 'signup', 'click', 'view')
  GROUP BY 1, 2
),
capped AS MATERIALIZED (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY rank DESC, item ASC) AS rn
    FROM ranked
  ) WHERE rn <= 20
)
SELECT w.item AS winner_id, l.item AS loser_id, w.user_id,
       CAST(w.rank - l.rank AS INTEGER) AS margin
FROM capped w JOIN capped l USING (user_id)
WHERE w.rank > l.rank
"""
    _compare(out, sql, tables=("events",))


def test_weighted_consensus_driver_shape_duckdb_replay(spark):
    """Reliability-weighted consensus at the future query shape: the
    driver-green dawid_skene rater panel (item = user mod 25, rater =
    event-id mod 5, first-12 votes per item) re-voted with
    agreement-rate weights — majority table, per-rater reliability,
    decimal mass sums, and the flipped flag replay row-for-row."""
    from pyspark.sql.window import Window

    from healthcare_dbt_datamart_spark.llmops.preferences import (
        weighted_consensus,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    votes = ev.select(
        F.pmod(F.col("user_id"), F.lit(25)).cast("bigint").alias("item"),
        F.concat(
            F.lit("r"), F.pmod(F.col("event_id"), F.lit(5)).cast("string")
        ).alias("rater"),
        F.col("event_type").alias("label"),
        "event_id",
    )
    w = Window.partitionBy("item").orderBy("event_id")
    panel = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 12)
        .select("item", "rater", "label")
    )
    out = weighted_consensus(
        panel, item_col="item", annotator_col="rater", label_col="label"
    )

    sql = """
WITH raw AS MATERIALIZED (
  SELECT user_id % 25 AS item,
         'r' || CAST(event_id % 5 AS VARCHAR) AS rater,
         event_type AS label,
         row_number() OVER (PARTITION BY user_id % 25
                            ORDER BY event_id) AS rn
  FROM events
),
v AS MATERIALIZED (SELECT item, rater, label FROM raw WHERE rn <= 12),
c AS (SELECT item, label AS lab, COUNT(*) AS n FROM v GROUP BY 1, 2),
mj AS MATERIALIZED (
  SELECT item, lab AS majority_label, n_votes FROM (
    SELECT *, row_number() OVER (PARTITION BY item
                ORDER BY n DESC, lab ASC) AS rn2,
           CAST(SUM(n) OVER (PARTITION BY item) AS BIGINT) AS n_votes
    FROM c
  ) WHERE rn2 = 1
),
rel AS (
  SELECT rater,
         round(SUM(CASE WHEN v.label = mj.majority_label THEN 1 ELSE 0
                   END) / CAST(COUNT(*) AS DOUBLE), 6) AS rate
  FROM v JOIN mj USING (item) GROUP BY 1
),
wts AS (
  SELECT rater, GREATEST(CAST(rate AS DECIMAL(10,6)),
                         CAST(0.05 AS DECIMAL(10,6))) AS wt
  FROM rel
),
mass AS (
  SELECT item, label AS lab, SUM(wt) AS m
  FROM v JOIN wts USING (rater) GROUP BY 1, 2
),
win AS (
  SELECT item, lab AS weighted_label FROM (
    SELECT *, row_number() OVER (PARTITION BY item
                ORDER BY m DESC, lab ASC) AS rn3
    FROM mass
  ) WHERE rn3 = 1
)
SELECT win.item, weighted_label, majority_label, n_votes,
       weighted_label != majority_label AS flipped
FROM win JOIN mj USING (item)
"""
    _compare(out, sql, tables=("events",))


def test_annotator_agreement_driver_shape_duckdb_replay(spark):
    """Per-rater reliability screen at the future query shape: the
    same dawid_skene panel, each rater's agreement with the
    (n desc, label asc) majority — counts BIGINT, one 6dp rate."""
    from pyspark.sql.window import Window

    from healthcare_dbt_datamart_spark.llmops.preferences import (
        annotator_agreement,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    votes = ev.select(
        F.pmod(F.col("user_id"), F.lit(25)).cast("bigint").alias("item"),
        F.concat(
            F.lit("r"), F.pmod(F.col("event_id"), F.lit(5)).cast("string")
        ).alias("rater"),
        F.col("event_type").alias("label"),
        "event_id",
    )
    w = Window.partitionBy("item").orderBy("event_id")
    panel = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 12)
        .select("item", "rater", "label")
    )
    out = annotator_agreement(
        panel, item_col="item", annotator_col="rater", label_col="label"
    )

    sql = """
WITH raw AS MATERIALIZED (
  SELECT user_id % 25 AS item,
         'r' || CAST(event_id % 5 AS VARCHAR) AS rater,
         event_type AS label,
         row_number() OVER (PARTITION BY user_id % 25
                            ORDER BY event_id) AS rn
  FROM events
),
v AS MATERIALIZED (SELECT item, rater, label FROM raw WHERE rn <= 12),
c AS (SELECT item, label AS lab, COUNT(*) AS n FROM v GROUP BY 1, 2),
mj AS MATERIALIZED (
  SELECT item, lab AS majority_label FROM (
    SELECT *, row_number() OVER (PARTITION BY item
                ORDER BY n DESC, lab ASC) AS rn2
    FROM c
  ) WHERE rn2 = 1
)
SELECT rater, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN v.label = mj.majority_label THEN 1 ELSE 0 END)
         AS BIGINT) AS n_agree,
       round(SUM(CASE WHEN v.label = mj.majority_label THEN 1 ELSE 0 END)
         / CAST(COUNT(*) AS DOUBLE), 6) AS agree_rate
FROM v JOIN mj USING (item)
GROUP BY rater
"""
    _compare(out, sql, tables=("events",))


def test_rasch_fit_driver_shape_duckdb_replay(spark):
    """Rasch 1PL IRT at the future query shape: the dawid_skene panel
    as a binary outcome grid (correct = the click bit), 4 joint-ascent
    rounds fully unrolled — per-vote half-up quantized errors, integer
    gradient sums, quantized parameter updates, and the exact-integer
    sum-to-zero re-anchor per round (Python FLOOR division emulated in
    DuckDB via the mod identity, since DuckDB's // truncates). The
    tagged item+rater estimate table replays field-for-field."""
    from pyspark.sql.window import Window

    from healthcare_dbt_datamart_spark.llmops.preferences import rasch_fit

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    votes = ev.select(
        F.pmod(F.col("user_id"), F.lit(25)).cast("bigint").alias("item"),
        F.concat(
            F.lit("r"), F.pmod(F.col("event_id"), F.lit(5)).cast("string")
        ).alias("rater"),
        (F.col("event_type") == F.lit("click")).cast("int").alias("correct"),
        "event_id",
    )
    w = Window.partitionBy("item").orderBy("event_id")
    panel = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 12)
        .select("item", "rater", "correct")
    )
    out = rasch_fit(
        panel, item_col="item", annotator_col="rater",
        correct_col="correct", n_iter=4,
    )

    s = 10**6
    sql = f"""
WITH raw AS MATERIALIZED (
  SELECT user_id % 25 AS item0,
         'r' || CAST(event_id % 5 AS VARCHAR) AS rater,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y,
         row_number() OVER (PARTITION BY user_id % 25
                            ORDER BY event_id) AS rn
  FROM events
),
v AS MATERIALIZED (
  SELECT CAST(item0 AS VARCHAR) AS item, rater, y FROM raw WHERE rn <= 12
),
ni AS MATERIALIZED (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_votes FROM v GROUP BY 1),
nr AS MATERIALIZED (SELECT rater, CAST(COUNT(*) AS BIGINT) AS n_votes FROM v GROUP BY 1),
nit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ni),
b0 AS MATERIALIZED (SELECT item, CAST(0 AS BIGINT) AS b_fp FROM ni),
t0 AS MATERIALIZED (SELECT rater, CAST(0 AS BIGINT) AS t_fp FROM nr)"""
    for r in range(4):
        sql += f""",
q{r} AS MATERIALIZED (
  SELECT v.item, v.rater,
    CAST(floor((1.0 / (1.0 + exp(-(t.t_fp / {s}.0 - b.b_fp / {s}.0)))
      - v.y) * {s} + 0.5) AS BIGINT) AS q
  FROM v JOIN b{r} b USING (item) JOIN t{r} t USING (rater)
),
gi{r} AS MATERIALIZED (SELECT item, CAST(SUM(q) AS BIGINT) AS G FROM q{r} GROUP BY 1),
gr{r} AS MATERIALIZED (SELECT rater, CAST(SUM(q) AS BIGINT) AS G FROM q{r} GROUP BY 1),
nb{r} AS MATERIALIZED (
  SELECT b.item,
    CAST(floor((b.b_fp / {s}.0 + 1.0 *
      (G / CAST(n.n_votes * CAST({s} AS BIGINT) AS DOUBLE)))
      * {s} + 0.5) AS BIGINT) AS b_fp
  FROM b{r} b JOIN gi{r} USING (item) JOIN ni n USING (item)
),
nt{r} AS MATERIALIZED (
  SELECT t.rater,
    CAST(floor((t.t_fp / {s}.0 - 1.0 *
      (G / CAST(n.n_votes * CAST({s} AS BIGINT) AS DOUBLE)))
      * {s} + 0.5) AS BIGINT) AS t_fp
  FROM t{r} t JOIN gr{r} USING (rater) JOIN nr n USING (rater)
),
cr{r} AS MATERIALIZED (
  SELECT CAST((sb - ((sb % n) + n) % n) // n AS BIGINT) AS c
  FROM (SELECT CAST(COALESCE(SUM(b_fp), 0) AS BIGINT) AS sb FROM nb{r}),
       nit
),
b{r + 1} AS MATERIALIZED (SELECT item, b_fp - cr{r}.c AS b_fp FROM nb{r}, cr{r}),
t{r + 1} AS MATERIALIZED (SELECT rater, t_fp - cr{r}.c AS t_fp FROM nt{r}, cr{r})"""
    sql += f"""
SELECT 'item' AS kind, b.item AS key, ni.n_votes,
       round(b.b_fp / {s}.0, 6) AS estimate
FROM b4 b JOIN ni USING (item)
UNION ALL
SELECT 'rater', t.rater, nr.n_votes, round(t.t_fp / {s}.0, 6)
FROM t4 t JOIN nr USING (rater)
"""
    _compare(out, sql, tables=("events",))


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))
