"""Streaming eval-set contamination guard — the stream-static face of
the batch decontamination operator (llmops/filtering.py::
ngram_contamination), completing the ingest-time curation story: a
continuously-arriving document feed is scored against a FIXED eval-set
gram table before it ever lands in the training corpus.

Spark shape: per-doc distinct gram hashes (array ops in the row, explode
once) → stream-STATIC left equi-join against the deduplicated eval gram
set (static side is a plain DataFrame: Spark re-plans it per microbatch,
no state) → event-time-windowed per-doc aggregation. State discipline:
the only stateful operator is the windowed count aggregation, bounded by
the watermark — gram-join rows carry no state at all, so state size
tracks (delay window × arrival rate × grams/doc), never stream history.

At 100 TB-scale ingest the static side is a broadcast- or bucketed gram
table rebuilt whenever the eval suite changes; the stream side's shuffle
keys are fixed-width md5 hashes, same as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llmops.filtering import _distinct_grams


def streaming_contamination_guard(
    doc_stream: DataFrame,
    eval_docs: DataFrame,
    text_col: str,
    id_col: str,
    event_time: str,
    n: int = 5,
    window: str = "10 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Per-document contamination report over a document STREAM: for every
    arriving doc (with at least ``n`` tokens), how many of its distinct
    word n-grams occur anywhere in the static eval set. Emits
    ``(window, id, n_grams, n_contaminated, contamination_ratio)`` in
    append mode once the watermark closes the doc's window; the caller
    filters on the ratio to quarantine or admit.

    Batch parity: run on a batch DataFrame the same pipeline (minus
    watermark) produces exactly ``ngram_contamination``'s rows plus the
    window column — asserted in tests.
    """
    ev = (
        _distinct_grams(eval_docs, text_col, id_col, n)
        .select("gram_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    streaming = doc_stream.isStreaming
    src = (
        doc_stream.withWatermark(event_time, delay) if streaming else doc_stream
    )
    grams = _distinct_grams(src, text_col, id_col, n, carry=(event_time,))
    hits = grams.join(ev, "gram_hash", "left")
    agg = hits.groupBy(
        F.window(F.col(event_time), window).alias("win"), F.col(id_col)
    ).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col(id_col),
        "n_grams",
        "n_contaminated",
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"),
            6,
        ).alias("contamination_ratio"),
    )


def streaming_near_dup_guard(
    doc_stream: DataFrame,
    corpus_docs: DataFrame,
    text_col: str,
    id_col: str,
    event_time: str,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.7,
    window: str = "10 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Ingest-time NEAR-dup guard — the stream-static face of the batch
    MinHash+LSH family (llmops/dedup.py), beside the exact-key
    ``streaming_dedup`` and the gram-level contamination guard: every
    arriving document is banded against the FIXED corpus's LSH bucket
    table, bucket collisions are verified with exact Jaccard over the
    joined token sets, and a windowed per-doc report says whether the
    stream doc is a near-duplicate of anything already in the corpus —
    BEFORE it lands.

    Spark shape: ONE staged projection chain on the stream (tokenize →
    shared digest array → minhash slices → band explode, carrying the
    event time and the token set), stream-STATIC equi-join on
    (band_idx, band_key) — candidates ≈ colliding buckets, never
    all-pairs — then exact Jaccard as a pure array expression on the
    join row and a single watermark-bounded windowed aggregation. The
    only state is that final agg; join rows carry none. The corpus side
    is a plain DataFrame (re-planned per micro-batch); at scale it is
    the materialized band-bucket + token tables, rebuilt on corpus
    versions like the IVFPQ index.

    Emits ``(window, id, n_bucket_hits, best_jaccard, is_near_dup)`` in
    append mode once the watermark closes. ``n_bucket_hits`` counts
    band collisions (a pair sharing b bands counts b times — the
    candidate-volume cost signal the LSH tuning reads); dedup-exactness
    comes from ``best_jaccard``/``is_near_dup``, which are
    multiplicity-insensitive. Batch parity: on a batch frame the same
    pipeline (minus watermark) reproduces the batch
    minhash → band → verify composition — asserted in tests."""
    from ..llmops.dedup import lsh_band_buckets, minhash_signatures, tokens_df

    # static side: corpus band buckets + corpus token sets
    buckets = lsh_band_buckets(
        minhash_signatures(corpus_docs, text_col, id_col, num_hashes),
        id_col,
        num_hashes,
        band_size,
    ).withColumnRenamed(id_col, "_corpus_id")
    corpus_toks = tokens_df(corpus_docs, text_col, id_col, out="_toks_b")
    corpus_toks = corpus_toks.withColumnRenamed(id_col, "_corpus_id")

    streaming = doc_stream.isStreaming
    src = (
        doc_stream.withWatermark(event_time, delay) if streaming else doc_stream
    )
    # the SAME batch pipeline functions band the stream side — the
    # event time and the token set ride through as carry columns, so
    # the band-key formula exists in exactly one place and the stream
    # side can never drift from the corpus bucket table
    sigs = minhash_signatures(
        src, text_col, id_col, num_hashes,
        carry=(event_time,), keep_tokens="_t",
    )
    stream_bands = lsh_band_buckets(
        sigs, id_col, num_hashes, band_size, carry=(event_time, "_t")
    )

    cand = stream_bands.join(buckets, ["band_idx", "band_key"]).filter(
        F.col(id_col) != F.col("_corpus_id")
    )
    verified = cand.join(corpus_toks, "_corpus_id").withColumn(
        "_jaccard",
        F.round(
            F.size(F.array_intersect("_t", "_toks_b"))
            / F.size(F.array_union("_t", "_toks_b")),
            6,
        ),
    )
    return (
        verified.groupBy(F.window(F.col(event_time), window), F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bucket_hits"),
            F.max("_jaccard").alias("best_jaccard"),
            F.max((F.col("_jaccard") >= threshold).cast("int")).alias(
                "is_near_dup"
            ),
        )
    )
