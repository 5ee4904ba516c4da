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


def ivf_centroids(
    emb: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Coarse-quantizer centroids: the k lowest-id vectors (deterministic
    seeding; a production build would Lloyd-iterate from these). Returns
    driver-side Python values — centroids are bounded MODEL STATE (k·d
    floats), not data, so this collect is the same class as dbt's
    introspective compile-time queries (SURVEY §3), not a data-path
    collect."""
    rows = (
        emb.filter(F.col(id_col) < k)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(v) for v in vals])


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties to the
    lowest centroid id) — one map-only projection, zero shuffle: the k
    centroid similarities are literal expressions folded per row, and the
    argmax is ``array_max`` over (sim, -cid) structs.

    At scale the assignment is written once and the table is PARTITIONED
    BY (cell): probing then becomes partition pruning at the scan."""
    nrm = _norm(F.col(vec_col))
    cells = F.array(
        *[
            F.struct(
                F.round(_dot(F.col(vec_col), _lit_vec(cv)) / (nrm * F.lit(_py_norm(cv))), 6).alias("sim"),
                F.lit(-cid).alias("neg_cid"),
            )
            for cid, cv in centroids
        ]
    )
    best = F.array_max(cells)
    staged = emb.select(F.col(id_col), F.col(vec_col), best.alias("_best"))
    return staged.select(
        F.col(id_col),
        F.col(vec_col),
        (-F.col("_best.neg_cid")).cast("int").alias("cell"),
        F.col("_best.sim").alias("cell_sim"),
    )


def _py_norm(vals: list[float]) -> float:
    s = 0.0
    for v in vals:
        s += float(v) * float(v)
    return s ** 0.5


def ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: assign vectors to coarse cells, probe the ``nprobe``
    cells nearest the query, exact cosine top-k inside the probed cells
    only — the scan shrinks by ~nprobe/n_centroids vs brute force (and
    becomes partition pruning on a cell-partitioned table)."""
    centroids = ivf_centroids(emb, n_centroids, id_col, vec_col)
    # probe selection is k·d driver-side arithmetic on model state
    qvec = [
        float(x)
        for x in emb.filter(F.col(id_col) == query_id).select(vec_col).collect()[0][0]
    ]
    qn = _py_norm(qvec)

    def cos(cv: list[float]) -> float:
        return sum(a * b for a, b in zip(qvec, cv)) / (qn * _py_norm(cv))

    probes = [
        cid for cid, _ in sorted(centroids, key=lambda c: (-round(cos(c[1]), 6), c[0]))
    ][:nprobe]

    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    cand = assigned.filter(
        F.col("cell").isin(probes) & (F.col(id_col) != query_id)
    )
    return (
        cand.select(
            id_col,
            "cell",
            F.round(
                _dot(F.col(vec_col), _lit_vec(qvec)) / (_norm(F.col(vec_col)) * F.lit(qn)),
                6,
            ).alias("cosine"),
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


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd's k-means over the embedding column — the trained
    coarse quantizer ``ivf_centroids`` stubs (deterministic low-id seeds
    kept as the seeding rule, so the whole fit is reproducible).

    Each round: (1) ``ivf_assign`` — map-only nearest-centroid pass;
    (2) centroid update — posexplode to (cell, dim, value) and one
    groupBy(cell, dim) avg: a single shuffle of n·d skinny rows with full
    partial aggregation, the standard scalable mean-update (no driver
    data-path collect; only the k·d model state comes back per round).
    Empty cells keep their previous centroid. Genuinely iterative —
    driver-held model state feeds the next round's literal expressions,
    same carve-out class as the connected-components fixpoint."""
    centroids = ivf_centroids(emb, k, id_col, vec_col)
    for _ in range(n_iter):
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("centroid")
            )
            .collect()
        )
        updated = {int(r["cell"]): [float(v) for v in r["centroid"]] for r in means}
        centroids = [(cid, updated.get(cid, cv)) for cid, cv in centroids]
    return centroids


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-quality report after a Lloyd fit: per-cell population and
    mean/min similarity to the trained centroid (the IVF cell-balance
    check run before committing a partitioning)."""
    trained = kmeans_lloyd(emb, k, n_iter, id_col, vec_col)
    assigned = ivf_assign(emb, trained, id_col, vec_col)
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("cell_sim"), 6).alias("mean_sim"),
        F.round(F.min("cell_sim"), 6).alias("min_sim"),
    )
