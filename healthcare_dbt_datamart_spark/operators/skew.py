"""Skew mitigation for large joins (100 TB discipline, SURVEY §7).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on by
default in ``session.get_spark``) handles most sort-merge skew at runtime.
This module provides the *explicit* salting shape for the cases AQE can't
re-plan — e.g. a shuffled hash join feeding a stateful stage, or a hot key
so dominant that one task would still own it after AQE splitting.

``salted_join(left, right, on)`` is result-identical to
``left.join(right, on)`` for inner/left joins: the big (skewed) side gets
a deterministic salt in [0, n); the small-but-unbroadcastable side is
replicated n times, so the shuffle key becomes (key, salt) and the hot key
spreads over n tasks. Cost: n× replication of the right side — use only
when right is far smaller than the hot key's row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Equi-join with key salting; identical results to ``left.join(right,
    on, how)`` for ``how`` in {inner, left}.

    The salt is ``xxhash64`` of every left column (deterministic — no
    ``rand()``, so retries/speculative tasks agree), mod ``n_salt``; each
    right row is exploded across all salt values so every (key, salt)
    bucket can satisfy its matches exactly once.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    keys = [on] if isinstance(on, str) else list(on)

    salted_left = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    )
    salted_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return salted_left.join(salted_right, keys + [_SALT], how).drop(_SALT)
