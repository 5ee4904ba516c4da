"""Measured scaling curve for SCALE.md: run representative heavy queries
at sf0.1 and on a 10x replica, and report wall-clock ratios.

The replica is DERIVED from the driver's sf0.1 parquet (never synthesized
semantics): each table unions 10 copies with deterministic id offsets,
and text/embedding payloads get a tiny per-copy perturbation (a copy-tag
token / a +copy*1e-4 on one dimension) so duplicate rates and hash
distributions stay comparable instead of collapsing into 10x exact dups
— the workload SHAPE is preserved, only the volume grows.

A linear-ish ratio (~10x on 10x rows) is the evidence that an operator's
cost is scan/shuffle-proportional with no super-linear term hiding at
small scale (quadratic pair blowups, driver collects, single-partition
sorts would all show >>10x). Ratios meaningfully BELOW 10x just mean
fixed local-mode job overhead still dominates at sf0.1.

    python tools/scale_curve.py [--copies N] [query ...]

Prints one JSON line per query: {query, base_sec, scaled_sec, ratio}.
Replica parquet lives under /tmp (process-unique, removed on exit).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# id-ish columns to offset per copy so keys stay unique across copies —
# joins keep working AND per-key group sizes stay comparable: part and
# supplier replicate with offset keys alongside lineitem's foreign keys,
# so the corpus gains 10x parts/suppliers rather than every part gaining
# 10x-deeper lineitem groups (which would hide a super-linear per-key
# term, the exact class this probe exists to expose). nation/region stay
# un-replicated (bounded dims), so nationkey FKs are NOT offset.
OFFSETS = {
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}

DEFAULT_QUERIES = [
    "substr_coverage", "near_dup_jaccard", "gap_status", "tfidf_top_terms",
    "ccnet_buckets", "bloom_prefilter", "cosine_topk", "pricing_summary",
    "event_funnel", "cluster_keep_best",
    # round-4 additions: span-level removal (text rebuild fold), the
    # one-shuffle claim-grain rollup, the composed trained-quantizer index
    "exact_substr_dedup", "claim_rollups", "ivfadc_topk",
]


def build_replica(spark, base_dir: str, out_dir: str, copies: int) -> None:
    for t in TABLES:
        src = spark.read.parquet(f"{base_dir}/{t}.parquet")
        if t in OFFSETS:
            parts = []
            for c in range(copies):
                df = src
                for col, step in OFFSETS[t].items():
                    df = df.withColumn(col, F.col(col) + F.lit(c * step))
                if t == "documents":
                    # per-copy tag token keeps exact/near-dup rates at the
                    # base corpus's level instead of 10x-ing every doc
                    df = df.withColumn(
                        "text", F.concat_ws(" ", F.col("text"), F.lit(f"c{c}"))
                    )
                if t == "embeddings":
                    df = df.withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"),
                            lambda x, i: x
                            + F.when(i == 0, F.lit(c * 1e-4)).otherwise(F.lit(0.0)),
                        ),
                    )
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = src  # dims without id use: same content at any scale
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def main() -> None:
    args = sys.argv[1:]
    copies = 10
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i : i + 2]
    names = args or DEFAULT_QUERIES

    import __spark_entry__ as e
    from healthcare_dbt_datamart_spark.session import get_spark

    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    out_dir = tempfile.mkdtemp(prefix="spark-graft-scale-")
    try:
        t0 = time.perf_counter()
        build_replica(spark, base, out_dir, copies)
        print(f"# replica x{copies} built in {time.perf_counter() - t0:.1f}s "
              f"at {out_dir}", file=sys.stderr)
        qs = e.queries()
        for name in names:
            fn = qs[name]
            # warm codegen on the base dir, then time base and replica
            fn(spark, base).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, base).write.format("noop").mode("overwrite").save()
            t_base = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, out_dir).write.format("noop").mode("overwrite").save()
            t_scaled = time.perf_counter() - t0
            print(json.dumps({
                "query": name,
                "base_sec": round(t_base, 2),
                "scaled_sec": round(t_scaled, 2),
                "ratio": round(t_scaled / t_base, 1) if t_base > 0 else None,
            }))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
