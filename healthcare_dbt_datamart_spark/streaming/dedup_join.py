"""Streaming dedup and stream-stream temporal join — the streaming faces
of the batch dedup (llmops/dedup.py) and interval-join (operators/asof.py)
operators. A training-data ingest that runs continuously needs both: feeds
re-deliver (at-least-once sources), and correlating two live streams is
the streaming analog of the batch "what followed within the window" join.

State discipline at scale: both operators bound their state with event-
time watermarks — dedup keys and join buffers are dropped once the
watermark passes, so state size tracks the delay window x arrival rate,
not the stream's history. Without the watermark either operator grows
state forever; the constructors here make it non-optional.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    event_time: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key output over an at-least-once stream:
    ``dropDuplicatesWithinWatermark`` keeps the first arrival of each key
    and suppresses re-deliveries that arrive within ``delay`` of the
    watermark — the streaming exact-dedup operator. State per key is
    dropped when the watermark passes, so memory is bounded."""
    return stream.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_sec: int,
    delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join with the same semantics as the batch
    ``operators.asof.interval_join``: pairs where ``left_ts < right_ts <=
    left_ts + window_sec`` on the same ``key``. The event-time range
    condition lets Spark expire both join buffers at watermark + window —
    bounded state, same answer as the batch operator (asserted in tests).

    ``right_ts``/``left_ts`` must be distinct column names (pre-alias)."""
    l_wm = left.withWatermark(left_ts, delay)
    r_wm = right.withWatermark(right_ts, delay)
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_ts] > l_wm[left_ts])
        & (
            r_wm[right_ts]
            <= l_wm[left_ts] + F.expr(f"INTERVAL {int(window_sec)} SECONDS")
        )
    )
    return l_wm.join(r_wm, cond).drop(r_wm[key])


def streaming_ann_ingest(
    stream: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index maintenance at ingest — the streaming face of the batch IVF
    assignment (llmops/similarity.py::ivf_assign): every arriving vector
    is tagged with its nearest trained-quantizer cell as a map-only
    stream transformation, so the downstream sink can write
    ``partitionBy(cell)`` and the serving side's probes stay partition
    prunes with NO reindexing step. This is how a production ANN index
    absorbs a continuous embedding feed: the quantizer is trained once
    at index build (``kmeans_lloyd``), frozen, and applied to every
    batch; retraining is a new index version, not a stream operation.

    Stateless (pure projection per micro-batch) — no watermark needed;
    the centroid table rides in as the same broadcast array-of-structs
    row the batch plan uses, so generated code is constant in k and the
    SAME function serves both engines (asserted batch-parity in tests).
    """
    from ..llmops.similarity import ivf_assign

    return ivf_assign(stream, centroids, id_col=id_col, vec_col=vec_col)


def streaming_ivfpq_ingest(
    stream: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """Streaming index WRITES for the materialized IVFADC layout
    (llmops/similarity.py::build_ivfpq_index): every arriving vector is
    assigned its coarse cell AND PQ-encoded in the same stateless
    map-only projection, emitting the index row shape
    ``(id, codes, cell)`` — the sink appends ``partitionBy(cell)`` into
    the SAME codes table the batch build wrote, so a continuous
    embedding feed grows the serving index with no reindex step and
    probes stay partition prunes. ``residual=True`` encodes
    r = x − q1(x) exactly like the batch build. Both quantizers are
    frozen broadcast data (trained at index build); retraining is a new
    index version, not a stream operation."""
    from ..llmops.similarity import ivfpq_index_rows

    return ivfpq_index_rows(
        stream, centroids, codebooks, id_col, vec_col, residual
    )
