"""The ANN index-release pipeline assembled on the engine runtime.

The retrieval capstone, closing the loop ``corpus_release`` closes for
the data funnel: an index build is only releasable when its serving
quality is GRADED against the exact oracle — the test-harness
fail-as-data pattern (reference analog: ``dbt-adapters/macros/
materializations/tests/helpers.sql:7-16`` — a gate is a query whose
rows ARE the verdict). Registry models:

  stg_vectors       stage view: typed projection of the embedding table
  ann_index         TABLE, partitioned by cell: the trained IVF
                    assignment — the materialize-then-probe split of a
                    real deployment (probing becomes partition pruning)
  ann_results       batched IVF top-k for the release's query panel,
                    served FROM the index table (one broadcast probe
                    join, one per-query window)
  brute_topk        the exact cosine oracle for the same panel — brute
                    by design: at 100 TB you grade a SAMPLED panel, and
                    the oracle pass is one map-only scan per release
  judged_pool       system list ∪ oracle-only misses: every brute
                    top-k member the index failed to retrieve re-enters
                    at sentinel score −2.0 (below any cosine), the TREC
                    convention — unretrieved judged docs rank at the
                    bottom and can never enter the system's top-k; rel
                    = brute-membership (binary)
  index_scorecard   terminal release gate, ONE row: per-query
                    recall@k / MRR / NDCG@k fold into exact-integer
                    release arithmetic — metric means sum the 6dp
                    per-query values as half-up-quantized BIGINTs
                    (associative — layout-stable where a float mean is
                    not), and ``released`` compares Σ recall_fp against
                    floor(RECALL_FLOOR·10⁶)·n in pure integers.

Every stage except the index is a VIEW (Catalyst inlines the funnel);
the index is the one materialization, exactly like ``corpus_quality``
mid-funnel. Recall@k here is ANN recall in the literature's sense:
|IVF top-k ∩ brute top-k| / k, since the judged pool's n_relevant per
query is the brute list's k members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ModelRegistry

K_EVAL = 10
N_CELLS = 8
NPROBE = 2
N_ITER = 2
RECALL_FLOOR = 0.6  # release bar: mean ANN recall@k >= 0.6
_SENTINEL = -2.0  # below any cosine: padded misses never rank


def build_index_release(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list,
    centroids: list | None = None,
) -> ModelRegistry:
    from ..llmops.similarity import (
        _lloyd_fit,
        cosine_topk_batch,
        ivf_assign,
        ivf_topk_batch,
    )

    r = ModelRegistry(spark)
    r.add_source("raw_vectors", embeddings)
    # trained-model side channel between build steps (bounded k·d
    # floats): ann_index trains it, ann_results probes with it — the
    # registry's DAG order (ann_results refs ann_index) guarantees the
    # write happens before the read
    _state: dict = {"centroids": centroids}

    @r.model()
    def stg_vectors(ctx):
        return ctx.source("raw_vectors").select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding"),
        )

    @r.model(materialized="table", partition_by=["cell"])
    def ann_index(ctx):
        # the one materialization: train once, write the assignment
        # partitioned by cell so every later probe is partition pruning
        vecs = ctx.ref("stg_vectors")
        cents = _state["centroids"]
        if cents is None:
            from pyspark import StorageLevel

            cached = vecs.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                cents = _lloyd_fit(
                    cached, N_CELLS, N_ITER, "vec_id", "embedding"
                )
            finally:
                cached.unpersist()
            _state["centroids"] = cents
        return ivf_assign(vecs, cents, "vec_id", "embedding")

    @r.model()
    def ann_results(ctx):
        idx = ctx.ref("ann_index")
        return ivf_topk_batch(
            idx,
            query_ids,
            k=K_EVAL,
            nprobe=NPROBE,
            centroids=_state["centroids"],
            assigned=idx,
        )

    @r.model()
    def brute_topk(ctx):
        return cosine_topk_batch(
            ctx.ref("stg_vectors"), query_ids, k=K_EVAL
        )

    @r.model()
    def judged_pool(ctx):
        ann = ctx.ref("ann_results").select(
            "query_id", "vec_id", F.col("cosine").alias("score")
        )
        brute = ctx.ref("brute_topk").select("query_id", "vec_id")
        # rel = brute membership; oracle-only misses pad in at the
        # sentinel so they are judged-but-unretrieved, never top-k
        hits = ann.join(
            brute.withColumn("rel", F.lit(1)),
            ["query_id", "vec_id"],
            "left",
        ).select(
            "query_id",
            "vec_id",
            "score",
            F.coalesce("rel", F.lit(0)).alias("rel"),
        )
        misses = (
            brute.join(
                ann.select("query_id", "vec_id"),
                ["query_id", "vec_id"],
                "left_anti",
            )
            .select(
                "query_id",
                "vec_id",
                F.lit(_SENTINEL).alias("score"),
                F.lit(1).alias("rel"),
            )
        )
        return hits.unionByName(misses)

    @r.model()
    def index_scorecard(ctx):
        from ..llmops.evaluation import ndcg_at_k, retrieval_metrics

        pool = ctx.ref("judged_pool")
        rm = retrieval_metrics(
            pool, "query_id", "vec_id", "score", "rel", k=K_EVAL
        )
        nd = ndcg_at_k(pool, "query_id", "vec_id", "score", "rel", k=K_EVAL)
        per_q = rm.join(nd.select("query_id", "ndcg"), "query_id")
        fp = 10**6

        def _q(c):  # half-up 6dp quantization: associative BIGINT sums
            return F.expr(f"cast(floor({c} * {fp} + 0.5d) as bigint)")

        agg = per_q.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(_q("recall_at_k")).alias("recall_fp"),
            F.min("recall_at_k").alias("min_recall"),
            F.sum(_q("mrr")).alias("mrr_fp"),
            F.sum(_q("ndcg")).alias("ndcg_fp"),
        )
        floor_fp = int(RECALL_FLOOR * fp)
        return agg.select(
            F.col("n_queries"),
            F.lit(K_EVAL).cast("int").alias("k"),
            F.round(F.col("recall_fp") / (F.col("n_queries") * fp), 6).alias(
                "mean_recall"
            ),
            F.col("min_recall"),
            F.round(F.col("mrr_fp") / (F.col("n_queries") * fp), 6).alias(
                "mean_mrr"
            ),
            F.round(F.col("ndcg_fp") / (F.col("n_queries") * fp), 6).alias(
                "mean_ndcg"
            ),
            (
                F.col("recall_fp") >= F.lit(floor_fp) * F.col("n_queries")
            ).alias("released"),
        )

    return r
