"""Temporal join operators: as-of join and bounded interval (range) join.

The reference has no temporal joins (SURVEY.md §2.3 notes their absence —
Snowflake's optimizer handles whatever SQL is thrown at it), but any
time-series feed joined to a slowly-changing measurement stream needs
them, and naive formulations are the classic 100 TB trap:

- An as-of join written as ``l JOIN r ON key AND r.ts <= l.ts`` +
  rank-to-1 explodes into |l|x|r| per key before the filter.
- A range join written as a raw inequality join is a BroadcastNestedLoop
  or CartesianProduct — quadratic per key.

Both operators here stay linear-with-one-shuffle:

- ``asof_join``: tag both sides, UNION them, and carry the right side's
  latest values forward with ``last(..., ignorenulls=True)`` over a
  (key, ts) window — one shuffle on key, no pair blowup, unbounded
  lookback for free. (Same plan shape Flink/Kafka-Streams use for
  temporal table joins.)
- ``interval_join``: quantize time into buckets of the window width,
  equi-join on (key, bucket) with the left side exploded to the two
  buckets its window can touch, then apply the exact predicate — an
  equi-shuffle join whose per-bucket fan-out is bounded by data density,
  never |l|x|r|. (The bucketed range-join strategy Databricks documents
  as the scalable range-join pattern.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, attach
    ``right_cols`` from the right row with the greatest ``right_ts`` <=
    ``left_ts`` for the same ``key`` (NULLs when no prior right row).

    Requires the right side to be unique per (key, right_ts) — pre-
    aggregate it if not, or ties make the carried value nondeterministic.
    Output = all left columns + right_cols (right's ts exposed by passing
    an aliased column in ``right_cols``/pre-projection).

    Plan: one hash shuffle of l+r on ``key``, one window sort — compare
    DuckDB's native ``ASOF JOIN`` (the oracle used in tests), which plans
    a merge by (key, ts) the same way.
    """
    if key in right_cols:
        raise ValueError("right_cols must not include the join key")
    clashes = sorted(set(right_cols) & set(left.columns))
    if clashes:
        # a right column sharing a left column's name would be silently
        # merged by unionByName and then overwritten by the carried-forward
        # right value — corrupting the left side's data with no error
        raise ValueError(
            f"right_cols collide with left columns: {clashes}; alias them"
            " on the right side before joining"
        )
    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__ats", F.col(left_ts))
    # a NULL right timestamp can never satisfy 'greatest right_ts <=
    # left_ts' (NULL <= ts is never true — the DuckDB ASOF rule), but
    # the window's default nulls-FIRST ordering would sort such a row
    # before everything and carry it into every left row: drop them
    r_tag = (
        right.filter(F.col(right_ts).isNotNull())
        .select(key, F.col(right_ts).alias("__ats"), *right_cols)
        .withColumn("__side", F.lit(0))
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows (__side=0) sort before left rows at the same ts → the
    # frame at a left row includes a simultaneous right row: inclusive <=
    w = (
        Window.partitionBy(key)
        .orderBy("__ats", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the right side as ONE struct: the struct is non-null exactly
    # on right rows (even when every field inside is NULL), so
    # last(ignorenulls) picks the latest right ROW atomically. Carrying
    # columns individually would skip a legitimate NULL in the as-of row
    # (returning a stale older value) and could stitch fields from
    # DIFFERENT right rows when the latest row is NULL in only some.
    r_struct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in right_cols])
    )
    out = u.withColumn("__rrow", F.last(r_struct, ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    for c in right_cols:
        out = out.withColumn(c, F.col("__rrow")[c])
    return out.drop("__side", "__ats", "__rrow")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_sec: int,
) -> DataFrame:
    """Bounded-range join: pairs where ``left_ts < right_ts <=
    left_ts + window_sec`` for the same ``key`` ("what followed within
    the window"). Returns all columns of both inputs (caller projects;
    name collisions other than ``key`` must be pre-aliased).

    Plan: bucket = floor(epoch_micros / window); every right row lands in
    one bucket, every left window spans at most two, so the left side
    explodes x2 and the join is a plain equi-shuffle on (key, bucket)
    followed by the exact range filter. No inequality-join nested loop.
    """
    if int(window_sec) < 1:
        # 0 would divide the bucket arithmetic into NULLs and silently
        # return an EMPTY join; negative inverts the buckets
        raise ValueError(f"window_sec must be >= 1, got {window_sec}")
    w_us = int(window_sec) * 1_000_000
    lb = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(w_us))
    rb = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(w_us))
    l_exp = left.withColumn("__bucket", F.explode(F.array(lb, lb + 1)))
    r_b = right.withColumn("__bucket", rb)
    cond = (
        (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.unix_micros(F.col(f"r.{right_ts}"))
            <= F.unix_micros(F.col(f"l.{left_ts}")) + F.lit(w_us)
        )
    )
    return (
        l_exp.alias("l")
        .join(
            r_b.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("l.__bucket") == F.col("r.__bucket")),
        )
        .filter(cond)
        .drop("__bucket")
        .drop(F.col(f"r.{key}"))
    )
