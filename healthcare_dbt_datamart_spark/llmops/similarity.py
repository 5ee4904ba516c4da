"""Similarity search over embedding columns (``array<float>``).

Two paths, both pure Catalyst expressions (``zip_with`` + ``aggregate``
fold — sequential, deterministic, whole-stage codegen; no Python UDF):

- **brute-force top-k**: cosine against a 1-row broadcast query vector —
  O(n·d) scan, the exact baseline. At 100 TB this is a map-only pass +
  TakeOrderedAndProject; it parallelizes perfectly.
- **bucketed ANN**: restrict the scan to a coarse partition — here the
  ``label`` column plays the IVF cell / LSH bucket role, and
  ``sign_lsh_bucket`` derives a random-hyperplane-style bucket from the
  vector itself. On a partitioned/bucketed table this becomes partition
  pruning: the scan reads only the candidate cells.

The fold accumulates in ``double`` left-to-right, so results are
bit-reproducible; cross-engine comparison rounds to 6 decimals to absorb
summation-order differences in the oracle engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    restrict_label: bool = False,
    label_col: str = "label",
) -> DataFrame:
    """Top-k most-similar vectors to ``query_id`` (excluded from results).

    ``restrict_label=True`` is the IVF-style path: only the query's coarse
    cell is scanned (on a label-partitioned table Catalyst prunes the
    rest).
    """
    qcols = [F.col(vec_col).alias("q_vec")]
    if restrict_label:
        qcols.append(F.col(label_col).alias("q_label"))
    q = emb.filter(F.col(id_col) == query_id).select(*qcols)
    cand = emb.filter(F.col(id_col) != query_id)
    joined = cand.join(broadcast(q))
    if restrict_label:
        joined = joined.filter(F.col(label_col) == F.col("q_label"))
    return (
        joined.select(
            id_col,
            F.round(cosine_sim(F.col(vec_col), F.col("q_vec")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sign_lsh_bucket(vec: Column, dims: tuple[int, ...] = (0, 7, 17, 31)) -> Column:
    """Random-hyperplane-style LSH bucket: concatenated signs of chosen
    coordinates (axis-aligned hyperplanes — deterministic and
    cross-engine-reproducible; a production variant would use seeded
    random projections). 2^len(dims) buckets."""
    bits = [
        F.when(F.element_at(vec, d + 1).cast("double") >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for d in dims
    ]
    return F.concat(*bits)


def near_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (0, 7, 17, 31),
) -> DataFrame:
    """Embedding near-dup detection: bucket by sign-LSH, pair within
    buckets, verify with exact cosine. The bucket join is the only
    shuffle; candidate count is Σ bucket² instead of n².

    The vector norm is precomputed per VECTOR before the join (each vector
    participates in O(bucket) pairs, so folding it per pair would triple
    the per-pair array work); per pair only the dot product folds."""
    with_bucket = emb.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("nrm"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    a = with_bucket.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = with_bucket.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col("nrm").alias("nrm_b"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
