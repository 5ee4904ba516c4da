"""Schema-test library + harness (SURVEY §5).

Re-expresses the four builtin generic tests
(``dbt-adapters/macros/generic_test_sql/``) as violation-row DataFrames,
and the test materialization harness
(``materializations/tests/test.sql:1-66``, ``helpers.sql:7-16``):
fail_calc, warn_if / error_if thresholds, where-config pushdown
(``where_subquery.sql:1-16``), limit, and store_failures.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def unique_test(df: DataFrame, column: str) -> DataFrame:
    """``unique.sql:1-12``: group by col having count(*) > 1."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("unique_field"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > 1)
    )


def not_null_test(df: DataFrame, column: str) -> DataFrame:
    """``not_null.sql:1-9``: rows where col is null."""
    return df.filter(F.col(column).isNull())


def accepted_values_test(
    df: DataFrame, column: str, values: list, quote: bool = True
) -> DataFrame:
    """``accepted_values.sql:2-27``: value histogram filtered to values
    outside the accepted list. ``quote`` mirrors dbt's knob: quoted
    (default) compares as string literals — the column is cast to string
    so a numeric column tested against string values behaves like the
    reference SQL; ``quote=False`` compares natively typed."""
    field = F.col(column).cast("string") if quote else F.col(column)
    cmp_values = [str(v) for v in values] if quote else values
    return (
        df.groupBy(field.alias("value_field"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(~F.col("value_field").isin(cmp_values))
    )


def relationships_test(
    child: DataFrame, column: str, parent: DataFrame, to_field: str
) -> DataFrame:
    """``relationships.sql:1-23``: child ⟕ parent keep parent-null =
    LEFT ANTI join (orphaned foreign keys)."""
    return (
        child.filter(F.col(column).isNotNull())
        .select(F.col(column).alias("from_field"))
        .join(parent.select(F.col(to_field).alias("from_field")), "from_field", "left_anti")
    )


@dataclass
class TestResult:
    name: str
    failures: int
    should_warn: bool
    should_error: bool
    status: str  # pass | warn | fail


def run_test(
    violations: DataFrame,
    name: str = "test",
    limit: int | None = None,
    warn_if: str = "!= 0",
    error_if: str = "!= 0",
    store_failures_as: str | None = None,
    fail_calc: str = "count(*)",
) -> TestResult:
    """The test harness (``tests/helpers.sql:7-16``):
    ``select {fail_calc} as failures, {fail_calc} {warn_if} as should_warn,
    {fail_calc} {error_if} as should_error`` with optional limit
    wrapper and persisted failures (``test.sql:10-45``). ``fail_calc``
    is dbt's knob verbatim: any aggregate SQL expression over the
    violations relation (default ``count(*)``; e.g. ``sum(n_records)``
    to weight a histogram test by row counts).

    Note the dbt ``where`` config is NOT a harness knob: the reference
    (``where_subquery.sql:1-16``) wraps the tested MODEL in ``select *
    from relation where ...`` before the test SQL runs — filtering the
    violations relation instead would be semantically different for any
    aggregate test (e.g. duplicates spanning in- and out-of-scope rows).
    Apply ``where`` to the model input when BUILDING the violations
    relation (as ``plans/registry.py::run_schema_tests`` does)."""
    if limit is not None:
        violations = violations.limit(limit)
    if store_failures_as:
        violations.write.mode("overwrite").format("parquet").saveAsTable(
            store_failures_as
        )
        violations = violations.sparkSession.table(store_failures_as)
    if fail_calc.replace(" ", "").lower() in ("count(*)", "count(1)"):
        fail_calc = violations.count()
    else:
        val = violations.agg(F.expr(fail_calc).alias("fc")).first()[0]
        fail_calc = int(val or 0)

    def _thresh(expr: str) -> bool:
        # dbt accepts both "!= 0" and "!=0" / ">10" (no space); parse
        # operator and number independently of whitespace
        import re

        m = re.match(r"\s*(!=|==|>=|<=|=|>|<)\s*(\d+)\s*$", expr)
        if not m:
            raise ValueError(f"unsupported threshold expression: {expr!r}")
        op, v = m.group(1), int(m.group(2))
        return {
            "!=": fail_calc != v, "=": fail_calc == v, "==": fail_calc == v,
            ">": fail_calc > v, ">=": fail_calc >= v,
            "<": fail_calc < v, "<=": fail_calc <= v,
        }[op]

    should_warn, should_error = _thresh(warn_if), _thresh(error_if)
    status = "fail" if should_error else ("warn" if should_warn else "pass")
    return TestResult(name, fail_calc, should_warn, should_error, status)


def unit_test(actual: DataFrame, expected: DataFrame) -> DataFrame:
    """U3 unit-test harness (``tests/helpers.sql`` —
    ``default__get_unit_test_sql``): rows present in one relation but not
    the other, tagged 'actual'/'expected'. Multiset semantics via
    ``exceptAll`` both ways — dbt's given/expect comparison; an empty
    result means the model matches the fixture."""
    cols = actual.columns
    expected = expected.select(*cols)
    only_actual = actual.exceptAll(expected).select(
        F.lit("actual").alias("which"), *cols
    )
    only_expected = expected.exceptAll(actual).select(
        F.lit("expected").alias("which"), *cols
    )
    return only_actual.unionByName(only_expected)


def freshness_check(
    df: DataFrame,
    loaded_at_field: str,
    warn_after_seconds: float | None = None,
    error_after_seconds: float | None = None,
    filter_expr: str | None = None,
    now=None,
) -> dict:
    """S3 source freshness (``adapters/freshness.sql:7-18,26-36``):
    ``select max(loaded_at_field), current_timestamp`` + threshold compare.
    ``now`` is injectable for deterministic tests."""
    if filter_expr:
        df = df.filter(filter_expr)
    row = df.agg(
        F.max(F.col(loaded_at_field).cast("timestamp")).alias("max_loaded_at"),
        (F.lit(now).cast("timestamp") if now else F.current_timestamp()).alias("snapshotted_at"),
    ).collect()[0]
    age = (
        (row.snapshotted_at - row.max_loaded_at).total_seconds()
        if row.max_loaded_at
        else float("inf")
    )
    status = "pass"
    if error_after_seconds is not None and age > error_after_seconds:
        status = "error"
    elif warn_after_seconds is not None and age > warn_after_seconds:
        status = "warn"
    return {
        "max_loaded_at": row.max_loaded_at,
        "snapshotted_at": row.snapshotted_at,
        "age_seconds": age,
        "status": status,
    }


def enforce_contract(df: DataFrame, contract: StructType) -> DataFrame:
    """Model contract enforcement: the reference's per-model schema yml
    files (``models/stage/_claims.yml`` etc. — declared, empty) mark the
    dbt model-contract intent: a model's output schema is FIXED BY
    DECLARATION (SURVEY §1.3). Raises on missing/extra/mistyped columns
    with a full diff; on success returns ``df`` with columns reordered to
    the contract (so positional writers like ``insertInto`` are safe).

    Nullability is advisory in Spark (parquet round-trips lose it), so
    only names and types are enforced — same as dbt's contract checks.
    That includes NESTED nullability: ``array<string>`` from a literal
    (containsNull=False) must satisfy a contract declaring the default
    containsNull=True, so container types are compared with all
    nullability flags normalized away.
    """

    def _denull(dt):
        from pyspark.sql import types as T

        if isinstance(dt, T.ArrayType):
            return T.ArrayType(_denull(dt.elementType), True)
        if isinstance(dt, T.MapType):
            return T.MapType(_denull(dt.keyType), _denull(dt.valueType), True)
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, _denull(f.dataType), True) for f in dt.fields]
            )
        return dt

    have = {f.name: _denull(f.dataType) for f in df.schema.fields}
    want = {f.name: _denull(f.dataType) for f in contract.fields}
    missing = [c for c in want if c not in have]
    extra = [c for c in have if c not in want]
    mistyped = [
        f"{c}: have {have[c].simpleString()}, contract {want[c].simpleString()}"
        for c in want
        if c in have and have[c] != want[c]
    ]
    if missing or extra or mistyped:
        raise ValueError(
            "model contract violated — "
            f"missing: {missing or '[]'}; extra: {extra or '[]'}; "
            f"mistyped: {mistyped or '[]'}"
        )
    return df.select(*[F.col(f.name) for f in contract.fields])
