"""The flagship pipeline as ONE raw Spark SQL statement.

dbt models are SQL; this module proves the engine's Spark-SQL surface can
host them 1:1 — the 9-CTE chain of
``models/intermediate/gaps/col/int_gap_col_status.sql`` ported to Spark's
dialect (``make_date``/``add_months``/``year``; Snowflake
``datediff('year')`` expanded to the boundary-count + birthday-correction
idiom the survey flags in §7). Catalyst compiles this to the same
physical plan family as the DataFrame version in ``gap_pipeline.py`` —
CTE pipelining, broadcast semi-join against the code set, rank-then-filter
top-1 — so either authoring surface is first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Parameterized over the same recast inputs as testdata_queries._gap_inputs:
# member spine from customer ⟕ orders, claims from lineitem ⨝ orders ⨝ part.
GAP_STATUS_SQL = """
WITH params AS (
  SELECT DATE '{period_start}' AS period_start, DATE '{period_end}' AS period_end,
         {min_age} AS min_age, {max_age} AS max_age
),
members AS (
  SELECT c.c_custkey AS member_id,
         CAST(MIN(o.o_orderdate) AS DATE) AS birth_date
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
),
codes AS (
  SELECT * FROM VALUES
    ('BRAND#13','COLONOSCOPY'), ('BRAND#20','SIGMOIDOSCOPY'),
    ('BRAND#23','CT_COLONOGRAPHY'), ('BRAND#15','STOOL_DNA_FIT'),
    ('BRAND#9','FIT_FOBT') AS t(code, evidence_type)
),
claims AS (
  SELECT l.l_orderkey * 10 + l.l_linenumber AS claim_id,
         o.o_custkey AS member_id,
         CAST(l.l_shipdate AS DATE) AS service_date,
         UPPER(p.p_brand) AS proc_code
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
spine AS (
  -- Snowflake datediff('year') age idiom: boundary count minus the
  -- not-yet-birthday correction (int_gap_col_status.sql:39-54)
  SELECT m.member_id, m.birth_date, p.period_start, p.period_end,
         (YEAR(p.period_end) - YEAR(m.birth_date))
           - CASE WHEN add_months(m.birth_date,
                                  12 * (YEAR(p.period_end) - YEAR(m.birth_date)))
                       > p.period_end
                  THEN 1 ELSE 0 END AS age,
         p.min_age, p.max_age
  FROM members m CROSS JOIN params p
),
spine2 AS (
  SELECT *, COALESCE(age BETWEEN min_age AND max_age, FALSE) AS is_age_eligible
  FROM spine
),
exclusions AS (
  -- member_exclusions stub (int_gap_col_status.sql:60-66): flags wired
  -- to 0 until real exclusion feeds exist, exactly like the reference
  SELECT member_id,
         0 AS has_crc_cancer_history,
         0 AS has_total_colectomy,
         0 AS in_hospice
  FROM members
),
qualifying AS (
  SELECT c.member_id, c.claim_id, c.service_date,
         k.evidence_type AS closure_reason,
         CASE k.evidence_type
           WHEN 'COLONOSCOPY' THEN 1 WHEN 'SIGMOIDOSCOPY' THEN 2
           WHEN 'CT_COLONOGRAPHY' THEN 2 WHEN 'STOOL_DNA_FIT' THEN 3
           WHEN 'FIT_FOBT' THEN 4 ELSE 99 END AS reason_rank
  FROM claims c
  JOIN codes k ON c.proc_code = UPPER(k.code)
  CROSS JOIN params p
  WHERE CASE
    WHEN k.evidence_type = 'FIT_FOBT'
      THEN c.service_date BETWEEN p.period_start AND p.period_end
    WHEN k.evidence_type = 'COLONOSCOPY'
      THEN c.service_date BETWEEN add_months(p.period_end, -120) AND p.period_end
    WHEN k.evidence_type IN ('SIGMOIDOSCOPY','CT_COLONOGRAPHY')
      THEN c.service_date BETWEEN add_months(p.period_end, -60) AND p.period_end
    WHEN k.evidence_type = 'STOOL_DNA_FIT'
      THEN c.service_date BETWEEN add_months(p.period_end, -36) AND p.period_end
    END
),
best AS (
  SELECT member_id, service_date AS closure_date, closure_reason,
         claim_id AS evidence_id
  FROM (
    SELECT q.*, ROW_NUMBER() OVER (
        PARTITION BY member_id
        ORDER BY reason_rank ASC, service_date DESC, claim_id DESC) AS rn
    FROM qualifying q)
  WHERE rn = 1
)
SELECT s.member_id, '{measure_id}' AS measure_id,
       YEAR(s.period_end) AS measurement_year,
       s.age, s.is_age_eligible,
       ex.has_crc_cancer_history, ex.has_total_colectomy, ex.in_hospice,
       CAST(CASE WHEN NOT s.is_age_eligible THEN NULL
                 WHEN ex.has_crc_cancer_history = 1 THEN NULL
                 WHEN ex.has_total_colectomy = 1 THEN NULL
                 WHEN ex.in_hospice = 1 THEN NULL
                 WHEN b.evidence_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS gap_flag,
       -- best_evidence columns pass through unmasked, per the reference
       -- final select (int_gap_col_status.sql:205-207)
       b.closure_date,
       b.closure_reason,
       b.evidence_id,
       s.period_start, s.period_end, '{rule_version}' AS rule_version
FROM spine2 s
LEFT JOIN exclusions ex ON s.member_id = ex.member_id
LEFT JOIN best b ON s.member_id = b.member_id
"""


def gap_status_sql(
    spark: SparkSession,
    period_start: str,
    period_end: str,
    min_age: int,
    max_age: int,
    measure_id: str = "COL",
    rule_version: str = "COL_V1",
) -> DataFrame:
    """Run the SQL-authored pipeline; expects temp views ``customer``,
    ``orders``, ``lineitem``, ``part`` to be registered.

    String params are escaped and date/int params validated before
    interpolation — these values embed in SQL text (the compile-time
    macro-expansion model), so a stray quote must not alter the query."""
    import re

    from ..functions import escape_single_quotes

    for d in (period_start, period_end):
        if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", d):
            raise ValueError(f"period bound must be YYYY-MM-DD: {d!r}")
    return spark.sql(
        GAP_STATUS_SQL.format(
            period_start=period_start,
            period_end=period_end,
            min_age=int(min_age),
            max_age=int(max_age),
            measure_id=escape_single_quotes(measure_id),
            rule_version=escape_single_quotes(rule_version),
        )
    )
