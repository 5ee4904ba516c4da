"""Unit tests for the scalar function surface (SURVEY.md §2.10)."""

from __future__ import annotations

import hashlib
from datetime import date

from pyspark.sql import functions as F

from healthcare_dbt_datamart_spark.functions import (
    age_at,
    date_spine,
    datediff,
    datediff_year,
    generate_series,
    listagg,
    null_safe_eq,
    split_part,
    surrogate_key,
)


def test_surrogate_key_matches_reference_semantics(spark):
    """md5 over pipe-joined coalesced casts (fct_gap_exceptions.sql:9-16)."""
    df = spark.createDataFrame(
        [(1, "A", None)], "id long, tag string, missing string"
    ).select(surrogate_key("id", "tag", "missing").alias("k"))
    expected = hashlib.md5(b"1|A|").hexdigest()
    assert df.collect()[0].k == expected


def test_datediff_year_is_boundary_count(spark):
    df = spark.range(1).select(
        datediff_year(F.lit("1999-12-31").cast("date"), F.lit("2000-01-01").cast("date")).alias("d")
    )
    assert df.collect()[0].d == 1  # one boundary crossed, not one year elapsed


def test_age_at_birthday_correction(spark):
    rows = [
        ("1970-01-01", "2025-12-31", 55),  # birthday passed
        ("1970-12-31", "2025-06-30", 54),  # birthday not yet
        ("2000-02-29", "2025-02-28", 25),  # leap birth: add_months clamps to feb-28
    ]
    df = spark.createDataFrame(rows, "birth string, asof string, expected int").select(
        age_at(F.col("birth").cast("date"), F.col("asof").cast("date")).alias("age"),
        "expected",
    )
    for r in df.collect():
        assert r.age == r.expected


def test_datediff_parts(spark):
    df = spark.range(1).select(
        datediff("month", F.lit("2020-01-31").cast("date"), F.lit("2020-02-01").cast("date")).alias("m"),
        datediff("day", F.lit("2020-01-01").cast("date"), F.lit("2020-01-05").cast("date")).alias("d"),
        datediff("quarter", F.lit("2020-03-31").cast("date"), F.lit("2020-04-01").cast("date")).alias("q"),
    )
    r = df.collect()[0]
    assert (r.m, r.d, r.q) == (1, 4, 1)


def test_split_part_negative_index(spark):
    df = spark.range(1).select(
        split_part(F.lit("a|b|c"), "|", 2).alias("p2"),
        split_part(F.lit("a|b|c"), "|", -1).alias("pm1"),
    )
    r = df.collect()[0]
    assert (r.p2, r.pm1) == ("b", "c")


def test_listagg_ordered_limited(spark):
    df = spark.createDataFrame(
        [("g", "b"), ("g", "c"), ("g", "a")], "g string, v string"
    ).groupBy("g").agg(
        listagg("v", ",").alias("all_"),
        listagg("v", ",", limit_num=2).alias("lim"),
    )
    r = df.collect()[0]
    assert (r.all_, r.lim) == ("a,b,c", "a,b")


def test_date_spine_end_exclusive(spark):
    df = date_spine(spark, "day", "2020-01-01", "2020-01-05")
    days = sorted(r[0] for r in df.collect())
    assert days == [date(2020, 1, d) for d in range(1, 5)]


def test_generate_series(spark):
    assert generate_series(spark, 5).count() == 5


def test_null_safe_eq(spark):
    df = spark.createDataFrame(
        [(None, None), (None, "x"), ("x", "x")], "a string, b string"
    ).select(null_safe_eq("a", "b").alias("eq"))
    assert [r.eq for r in df.collect()] == [True, False, True]
