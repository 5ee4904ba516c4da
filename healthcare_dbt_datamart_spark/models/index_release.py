"""The ANN-index release pipeline assembled on the engine runtime — the
embedding capstone beside ``corpus_release``'s text one.

A serving index is a RELEASE ARTIFACT exactly like a curated corpus:
trained model state + encoded payload + a manifest, rebuilt on a
schedule, consumed by systems that never see the raw vectors. The same
registry that runs the datamart runs this:

  stg_vectors       stage view: typed projection of the embedding feed
  index_quantizers  TABLE — the trained model state AS A RELATION
                    (``save_ann_model``'s (kind, grp, cid, cvec) shape):
                    coarse centroids + per-subspace PQ codebooks, Lloyd-
                    trained once per release; a fresh session reads this
                    table and can probe/decode the codes without any
                    Python state (llmops/similarity.py::load_ann_model)
  index_codes       TABLE PARTITIONED BY (cell) — the serving codes in
                    ``build_ivfpq_index``'s layout, declared through the
                    registry's dbt-style ``partition_by`` config, so
                    probes are partition prunes and ``ivfpq_index_upsert``
                    maintains it incrementally between releases
  index_manifest    per-cell release stats: population and code width —
                    the index data card (cell-balance check before the
                    release is accepted)

Scale: training collects only k·d + m·k·(d/m) model floats (the
_lloyd_fit carve-out); the encode is one map-only pass against the
broadcast quantizers; the manifest is one partial-agg groupBy over the
codes table. The DAG's lineage/retry/test machinery is the registry's —
nothing here is new execution machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ModelRegistry

N_CELLS = 8
PQ_M = 8
PQ_CODES = 16
LLOYD_ROUNDS = 2


def quantizers_from_relation(
    df: DataFrame,
) -> tuple[
    list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]]
]:
    """Rebuild the (centroids, codebooks) python lists from the
    ``index_quantizers`` relation — ``load_ann_model``'s logic given a
    DataFrame instead of a table name (registry models hand refs, not
    catalog names). Bounded model-state collect."""
    rows = df.orderBy("kind", "grp", "cid").collect()
    centroids = [
        (int(r.cid), [float(x) for x in r.cvec])
        for r in rows
        if r.kind == "coarse"
    ]
    books: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        if r.kind == "pq":
            books.setdefault(int(r.grp), []).append(
                (int(r.cid), [float(x) for x in r.cvec])
            )
    return centroids, [books[s] for s in sorted(books)]


def build_index_release(
    spark: SparkSession, raw_embeddings: DataFrame
) -> ModelRegistry:
    r = ModelRegistry(spark)
    r.add_source("raw_embeddings", raw_embeddings)

    @r.model()
    def stg_vectors(ctx):
        return ctx.source("raw_embeddings").select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding"),
        )

    @r.model(materialized="table")
    def index_quantizers(ctx):
        # TABLE: training is the expensive, once-per-release step; every
        # downstream consumer (encode, probe, NEXT session's upsert)
        # reads the persisted state instead of re-fitting
        from ..llmops.similarity import kmeans_lloyd, pq_codebooks_trained

        vecs = ctx.ref("stg_vectors")
        cents = kmeans_lloyd(vecs, k=N_CELLS, n_iter=LLOYD_ROUNDS)
        books = pq_codebooks_trained(
            vecs, m=PQ_M, k=PQ_CODES, n_iter=LLOYD_ROUNDS
        )
        rows = [
            ("coarse", -1, int(cid), [float(x) for x in cv])
            for cid, cv in cents
        ] + [
            ("pq", s, int(cid), [float(x) for x in cv])
            for s, book in enumerate(books)
            for cid, cv in book
        ]
        return ctx.spark.createDataFrame(
            rows, "kind string, grp int, cid int, cvec array<double>"
        )

    @r.model(materialized="table", partition_by=["cell"])
    def index_codes(ctx):
        from ..llmops.similarity import ivfpq_index_rows

        cents, books = quantizers_from_relation(ctx.ref("index_quantizers"))
        return ivfpq_index_rows(ctx.ref("stg_vectors"), cents, books)

    @r.model()
    def index_manifest(ctx):
        return (
            ctx.ref("index_codes")
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
                F.min(F.size("codes")).alias("min_code_width"),
                F.max(F.size("codes")).alias("max_code_width"),
            )
        )

    return r
