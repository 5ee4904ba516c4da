"""Time individual queries in isolation with the noop sink (guide §1.4).

Usage: python tools/time_query.py NAME [NAME ...] [--reps N]

Builds the bench session (get_spark, $SPARK_GRAFT_CPUS / $SPARK_GRAFT_SF_DIR),
pays the bench's warmup convention once (one run of each named query is NOT
enough to separate plan cost from JVM/codegen warm-in, so each query is run
--reps times; report all reps). Job-labelled per guide §1.5.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from healthcare_dbt_datamart_spark.session import get_spark

    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    from healthcare_dbt_datamart_spark.models import testdata_queries as tq

    for name in args:
        fn = tq.QUERIES[name]
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name:28s} " + " ".join(f"{t:7.3f}" for t in times))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
