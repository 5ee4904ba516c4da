"""Measured recall@k for the ANN family vs exact brute force.

Recall is THE quality dial for approximate search — a 100 TB deployment
chooses nprobe / shortlist by reading exactly this curve. The probe runs
a query-id sample at the given sf and reports mean recall@10 and the
fraction of the corpus each method actually scans:

- ivf(nprobe=p): trained coarse quantizer, scan ~p/n_centroids of rows
- pq_adc(shortlist=s): compressed-domain shortlist (seeded vs Lloyd-
  TRAINED codebooks reported separately), re-rank s raw rows
- ivfadc: trained coarse probe + trained-ADC within probed cells +
  exact re-rank — the composed production index
- lsh buckets are pair-oriented (dedup), not top-k — not probed here

    python tools/ann_recall.py [sf_dir] [n_queries]

One JSON line per configuration; recall = |approx ∩ exact| / k averaged
over queries.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from healthcare_dbt_datamart_spark.llmops.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    ivfadc_topk,
    kmeans_lloyd,
    pq_codebooks_trained,
    pq_rerank,
    pq_topk,
)
from healthcare_dbt_datamart_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = 10
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    query_ids = [i * (n // n_queries) for i in range(n_queries)]

    trained = kmeans_lloyd(emb, k=8, n_iter=2)

    def ids(df):
        return {r[0] for r in df.select("vec_id").collect()}

    exact = {q: ids(cosine_topk(emb, q, k)) for q in query_ids}

    def report(name, fn, scanned_frac):
        rec = sum(
            len(ids(fn(q)) & exact[q]) / k for q in query_ids
        ) / len(query_ids)
        print(
            json.dumps(
                {
                    "method": name,
                    "recall_at_10": round(rec, 3),
                    "scanned_frac": scanned_frac,
                    "n_queries": n_queries,
                    "corpus": n,
                }
            )
        )

    for nprobe in (1, 2, 4):
        report(
            f"ivf(nprobe={nprobe}/8)",
            lambda q, p=nprobe: ivf_topk(
                emb, q, k, n_centroids=8, nprobe=p, centroids=trained
            ),
            round(nprobe / 8, 3),
        )
    books = pq_codebooks_trained(emb, m=8, k=16, n_iter=2)
    report("pq_adc(seeded books)", lambda q: pq_topk(emb, q, k), 0.0)
    report(
        "pq_adc(trained books)",
        lambda q: pq_topk(emb, q, k, codebooks=books),
        0.0,
    )
    for s in (20, 50):
        report(
            f"pq_adc+rerank(shortlist={s}, trained)",
            lambda q, s_=s: pq_rerank(emb, q, k, shortlist=s_, codebooks=books),
            round(s / n, 4),
        )
    for nprobe in (2, 4):
        report(
            f"ivfadc(nprobe={nprobe}/8, shortlist=50, trained)",
            lambda q, p=nprobe: ivfadc_topk(
                emb, q, k, shortlist=50, n_centroids=8, nprobe=p,
                centroids=trained, codebooks=books,
            ),
            round(nprobe / 8, 3),
        )
    # dimension truncation (the Matryoshka/MRL storage dial): cosine
    # over the first d dims only — scanned_frac here is the BYTE
    # fraction read per vector; recall shows what the truncation buys
    # back. Synthetic embeddings have no MRL training, so this is the
    # pessimistic bound — real MRL models concentrate signal up front.
    dim = len(emb.select("embedding").first()[0])
    for d in (dim // 4, dim // 2):
        demb = emb.withColumn("embedding", F.slice("embedding", 1, d))
        report(
            f"truncated_cosine(d={d}/{dim})",
            lambda q, e=demb: cosine_topk(e, q, k),
            round(d / dim, 3),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
