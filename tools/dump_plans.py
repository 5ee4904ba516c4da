"""Dump ``explain("formatted")`` for driver-facing queries to files.

Usage: python tools/dump_plans.py OUTDIR [SUFFIX] [NAME ...]

Writes OUTDIR/<query><SUFFIX>.txt for each named query (default: all
queries). SUFFIX is e.g. ``_before`` / ``_after`` (pass "" for none).
Captured at $SPARK_GRAFT_SF_DIR (default sf0.1, the bench scale) so the
join strategies and exchange shapes reflect the benched sizes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from healthcare_dbt_datamart_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from healthcare_dbt_datamart_spark.models import testdata_queries as tq

    todo = names or list(tq.QUERIES)
    for name in todo:
        fn = tq.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"EXPLAIN-ERROR {type(ex).__name__}: {ex}"
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if "EXPLAIN-ERROR" not in plan else "ERR")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
