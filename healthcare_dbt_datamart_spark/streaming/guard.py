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
