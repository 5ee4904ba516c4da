"""SparkSession factory.

Mirrors the runtime assumptions the reference bakes into its adapter:
UTC timestamps (dbt-snowflake normalizes ``current_timestamp`` to UTC,
reference ``dbt_internal_packages/dbt-snowflake/macros/utils/timestamps.sql:1-3``)
and an optimizer that is trusted to pick physical strategies (Snowflake
there, Catalyst + AQE here).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

_WAREHOUSE_DIR: str | None = None


def _process_warehouse() -> str:
    """One mkdtemp-unique warehouse per process, removed at exit.

    mkdtemp (not a PID-derived path) because PIDs recycle: a new process
    handed a dead one's PID would inherit its leftover table dirs and
    saveAsTable would write NEXT TO stale parquet — the exact mixed-file
    race the per-process dir exists to kill. Best-effort rmtree at exit
    keeps /tmp from accumulating a dir per run.
    """
    global _WAREHOUSE_DIR
    if _WAREHOUSE_DIR is None:
        import atexit
        import shutil
        import tempfile

        _WAREHOUSE_DIR = tempfile.mkdtemp(prefix="spark-graft-warehouse-")
        atexit.register(shutil.rmtree, _WAREHOUSE_DIR, ignore_errors=True)
    return _WAREHOUSE_DIR


def get_spark(
    app_name: str = "healthcare-dbt-datamart-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    master is taken from the environment / spark-submit. AQE is always on:
    it supplies runtime join re-planning, partition coalescing and skew-join
    splitting, which is how this engine survives skewed keys at 100 TB.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Per-PROCESS warehouse: two local sessions sharing one CWD (a pytest
    # run next to a bench run) would otherwise race on the same
    # spark-warehouse table slots — one process's table swap deletes
    # parquet files the other has already planned a scan over
    # (FAILED_READ_FILE mid-query). A process-unique default keeps every
    # session's managed tables private; callers that genuinely share a
    # catalog across processes pass an explicit dir via SPARK_WAREHOUSE /
    # extra_conf — the CLI (__main__.py) does exactly that with a stable
    # ./spark-warehouse so incremental/snapshot state and `retry`'s
    # read-back of succeeded tables survive across invocations. Harmless
    # for the driver contract: the driver builds its own session, and
    # queries resolve the warehouse via spark.sql.warehouse.dir at run
    # time, wherever it points.
    warehouse = os.environ.get("SPARK_WAREHOUSE") or _process_warehouse()
    # In local mode the executors share the driver JVM, and Spark's
    # default driver heap is 1g — tight enough that materializing a
    # multi-copy build OOMs (tools/scale_curve.py at 30x) and GCLocker
    # retries show up under allocation pressure. 4g measured as the
    # sweet spot HERE: same speed as 1g on the heavy queries, headroom
    # for builds — while 16g measured 2x SLOWER on this virtualized
    # host (large-heap page-touch cost under memory overcommit), so
    # bigger is genuinely not better. Only effective at JVM launch;
    # harmless on getOrCreate reuse.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.maxResultSize", "2g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (idempotent).

    Query functions call this defensively so date extraction from the
    timestamp-typed parquet columns is deterministic regardless of which
    session the driver hands us.
    """
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


@contextmanager
def job_group(spark: SparkSession, group_id: str, description: str = ""):
    """Workload attribution: tag every job submitted inside the block —
    the Spark analog of Snowflake query tags (reference
    ``dbt-snowflake/macros/adapters.sql:134-167``). Shows up in the Spark
    UI / event logs per group, which is how a shared 1000-executor
    cluster attributes cost back to a model."""
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description or group_id, interruptOnCancel=False)
    try:
        yield spark
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
