"""Edge-semantics tests for the temporal joins (operators/asof.py) and
deterministic mixture sampling (llmops/splits.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from healthcare_dbt_datamart_spark.llmops.splits import hash_bucket256, mixture_sample
from healthcare_dbt_datamart_spark.operators.asof import asof_join, interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_inclusive_backward(spark):
    """<= boundary is inclusive; earlier rows pick the latest prior right
    row; rows before any right row get NULLs; keys never cross."""
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),  # before any error -> NULL
            (2, _ts("2024-01-01 12:00:00")),  # exactly at error ts -> inclusive
            (3, _ts("2024-01-01 15:00:00")),  # after both -> latest (14:00)
            (4, _ts("2024-01-01 13:00:00")),  # other key, own stream
        ],
        "event_id long, ts timestamp",
    ).withColumn("user_id", F.when(F.col("event_id") == 4, 9).otherwise(7))
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 12:00:00"), 1.0),
            (7, _ts("2024-01-01 14:00:00"), 2.0),
            (9, _ts("2024-01-01 12:30:00"), 3.0),
        ],
        "user_id long, ts timestamp, err_value double",
    ).withColumn("err_ts", F.col("ts"))
    out = {
        r.event_id: (r.err_ts, r.err_value)
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["err_ts", "err_value"]
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2024-01-01 12:00:00"), 1.0)
    assert out[3] == (_ts("2024-01-01 14:00:00"), 2.0)
    assert out[4] == (_ts("2024-01-01 12:30:00"), 3.0)


def test_asof_join_null_fields_carry_atomically(spark):
    """The as-of row's values carry as ONE row even when some of its
    fields are NULL: a NULL in the latest right row must NOT fall back
    to a stale older value, and fields must never stitch across
    different right rows."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 15:00:00"), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 12:00:00"), 5.0, "old"),
            (7, _ts("2024-01-01 14:00:00"), None, "new"),  # latest: v NULL
        ],
        "user_id long, ts timestamp, v double, tag string",
    ).withColumn("err_ts", F.col("ts"))
    out = asof_join(
        left, right, "user_id", "ts", "ts", ["err_ts", "v", "tag"]
    ).collect()[0]
    assert out.err_ts == _ts("2024-01-01 14:00:00")
    assert out.v is None          # NOT the stale 5.0
    assert out.tag == "new"       # no cross-row stitching


def test_interval_join_bounds_and_bucket_straddle(spark):
    """(l, l+W] bounds: strictly-after lower, inclusive upper; matches
    found across quantization-bucket boundaries; same-key only."""
    left = spark.createDataFrame(
        [(7, 100, _ts("2024-01-01 10:09:50"))],
        "user_id long, error_id long, err_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, 200, _ts("2024-01-01 10:09:50")),  # == lower bound: excluded
            (7, 201, _ts("2024-01-01 10:10:10")),  # next bucket, in window
            (7, 202, _ts("2024-01-01 10:19:50")),  # == upper bound: included
            (7, 203, _ts("2024-01-01 10:19:51")),  # past upper: excluded
            (8, 204, _ts("2024-01-01 10:10:00")),  # other key: excluded
        ],
        "user_id long, next_id long, next_ts timestamp",
    )
    got = sorted(
        r.next_id
        for r in interval_join(
            left, right, "user_id", "err_ts", "next_ts", 600
        ).collect()
    )
    assert got == [201, 202]


def test_mixture_sample_deterministic_subset(spark):
    """Same input -> identical kept set on re-run; rate 256 keeps all,
    rate 0 keeps none; kept set is bucket-consistent."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    full = mixture_sample(docs, "text", F.lit(256)).count()
    none = mixture_sample(docs, "text", F.lit(0)).count()
    assert (full, none) == (200, 0)
    half_a = {r.doc_id for r in mixture_sample(docs, "text", F.lit(128)).collect()}
    half_b = {r.doc_id for r in mixture_sample(docs, "text", F.lit(128)).collect()}
    assert half_a == half_b and 0 < len(half_a) < 200
    buckets = {
        r.doc_id: r.b
        for r in docs.select("doc_id", hash_bucket256("text").alias("b")).collect()
    }
    assert half_a == {d for d, b in buckets.items() if b < 128}


def test_pack_offsets_straddle_and_windows(spark):
    """Concat-then-chunk packing: offsets accumulate in doc_id order per
    group, straddlers flagged exactly when a doc crosses a capacity
    boundary, window count = ceil(total/capacity)."""
    from healthcare_dbt_datamart_spark.llmops.packing import pack_offsets, pack_summary

    docs = spark.createDataFrame(
        [
            ("s1", 1, "a b c"),          # 3 tokens: [0,3) in window 0
            ("s1", 2, "d e f g"),        # 4 tokens: [3,7) straddles 4-boundary
            ("s1", 3, "h i"),            # 2 tokens: [7,9) window 1
            ("s2", 4, "x y z w v"),      # 5 tokens: [0,5) straddles
        ],
        "source string, doc_id long, text string",
    )
    off = {
        r.doc_id: (r.start_offset, r.end_offset, r.first_window, r.last_window, r.straddles)
        for r in pack_offsets(docs, "text", "doc_id", "source", capacity=4).collect()
    }
    assert off[1] == (0, 3, 0, 0, 0)
    assert off[2] == (3, 7, 0, 1, 1)
    assert off[3] == (7, 9, 1, 2, 1)
    assert off[4] == (0, 5, 0, 1, 1)
    summ = {
        r.source: (r.n_docs, r.total_tokens, r.n_windows, r.n_straddlers)
        for r in pack_summary(docs, "text", "doc_id", "source", capacity=4).collect()
    }
    assert summ["s1"] == (3, 9, 3, 2)
    assert summ["s2"] == (1, 5, 2, 1)


# -- property tests: temporal joins vs brute-force reference models ---------
from hypothesis import given, settings
from hypothesis import strategies as st

_ts_s = st.integers(min_value=0, max_value=3600)  # seconds within an hour
_key_s = st.integers(min_value=0, max_value=2)


def test_asof_join_rejects_column_collision(spark):
    """A right column sharing a left column's name would silently
    overwrite the left side's values — must raise instead."""
    import pytest

    left = spark.createDataFrame([(1, 1, 10.0)], "k long, ts long, v double")
    right = spark.createDataFrame([(1, 1, 99.0)], "k long, ts long, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "ts", "ts", ["v"])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(_key_s, _ts_s), min_size=1, max_size=25, unique=True),
    st.lists(st.tuples(_key_s, _ts_s), min_size=1, max_size=25, unique=True),
)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    """asof_join == per-row max(right_ts <= left_ts) brute force, for any
    key/timestamp layout (incl. same-ts collisions across keys)."""
    base = datetime(2024, 1, 1)

    def ts(s):
        return datetime(2024, 1, 1, s // 3600, (s // 60) % 60, s % 60)

    # right unique per (key, ts) by construction (unique tuples)
    left = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(lrows)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, ts(s), float(s)) for k, s in rrows],
        "user_id long, ts timestamp, err_value double",
    ).withColumn("err_ts", F.col("ts"))
    got = {
        r.event_id: r.err_value
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["err_ts", "err_value"]
        ).collect()
    }
    for i, (k, s) in enumerate(lrows):
        prior = [rs for rk, rs in rrows if rk == k and rs <= s]
        want = float(max(prior)) if prior else None
        assert got[i] == want, (i, k, s, got[i], want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(_key_s, _ts_s), min_size=1, max_size=20, unique=True),
    st.lists(st.tuples(_key_s, _ts_s), min_size=1, max_size=20, unique=True),
    st.integers(min_value=1, max_value=900),
)
def test_interval_join_matches_bruteforce(spark, lrows, rrows, win):
    """interval_join == the raw inequality-join predicate, for any window
    width (bucket straddling included by construction)."""
    def ts(s):
        return datetime(2024, 1, 1, s // 3600, (s // 60) % 60, s % 60)

    left = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(lrows)],
        "error_id long, user_id long, err_ts timestamp",
    )
    right = spark.createDataFrame(
        [(j, k, ts(s)) for j, (k, s) in enumerate(rrows)],
        "next_id long, user_id long, next_ts timestamp",
    )
    got = sorted(
        (r.error_id, r.next_id)
        for r in interval_join(
            left, right, "user_id", "err_ts", "next_ts", win
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (lk, ls) in enumerate(lrows)
        for j, (rk, rs) in enumerate(rrows)
        if lk == rk and ls < rs <= ls + win
    )
    assert got == want


def test_asof_null_right_ts_never_matches_and_window_guard(spark):
    """Review regressions: a right row with NULL timestamp must never
    carry into left rows (nulls-first ordering would have sorted it
    before everything); interval_join(window_sec=0) raises instead of
    silently returning an empty join."""
    import pytest

    left = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00")], "k long, lt string"
    ).withColumn("lt", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, None, 99), (1, "2024-01-01 10:00:00", 1)],
        "k long, rt string, v int",
    ).withColumn("rt", F.col("rt").cast("timestamp"))
    out = asof_join(left, right, key="k", left_ts="lt", right_ts="rt",
                    right_cols=["v"]).collect()
    assert len(out) == 1 and out[0].v is None  # no prior right row

    with pytest.raises(ValueError, match="window_sec"):
        interval_join(left, right.filter("rt is not null"),
                      "k", "lt", "rt", window_sec=0)
