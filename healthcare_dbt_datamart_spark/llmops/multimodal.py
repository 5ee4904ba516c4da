"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (the image/audio libraries are not in this
container): ``decode_stub='deterministic'`` produces a fake-but-stable
"decode" from the byte content so the Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` signature, partition-parallel
execution — is real and tested; ``decode_stub='raise'`` marks where a
real decoder (PIL/ffmpeg) plugs in.

Scale notes: feature extraction is ``mapInPandas`` (Arrow-batched, one
Python worker per partition — the right shape for CPU-bound decode);
binary payloads stay columnar end-to-end; metadata joins are broadcast.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("meta", StringType()),  # JSON sidecar metadata
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def text_as_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test harness: treat utf-8 text bytes as an opaque media payload so
    the binary-column path can run on the ``documents`` table."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("orig_chars"))).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: derive a stable
    "width/height" from the byte content."""
    import hashlib

    h = hashlib.md5(content).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def pil_available() -> bool:
    """Import probe for the optional real decoder. PIL is not baked into
    this container; a deployment that has it gets real decode for free
    via ``decode_stub='auto'``."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def _pil_decode(content: bytes) -> tuple[int, int] | None:
    """Real image decode via PIL when importable; None when PIL is
    missing or the payload is not a decodable image (callers fall back
    to the deterministic stub per row, keeping mixed feeds flowing)."""
    try:
        import io

        from PIL import Image
    except Exception:
        return None
    try:
        with Image.open(io.BytesIO(bytes(content))) as im:
            return im.width, im.height
    except Exception:
        return None


def _decode_dims(content: bytes, use_pil: bool) -> tuple[int, int]:
    if use_pil:
        real = _pil_decode(content)
        if real is not None:
            return real
    return _fake_decode(content)


_DECODE_MODES = ("deterministic", "raise", "auto")


def extract_features(media: DataFrame, decode_stub: str = "deterministic") -> DataFrame:
    """Decode/feature-extract over Arrow batches via ``mapInPandas``.

    ``decode_stub='auto'`` uses PIL per row when importable (real
    width/height from the image header) and falls back to the
    deterministic stub otherwise — the import probe runs inside the
    Python worker, so executors with PIL decode for real even if the
    driver lacks it. 'deterministic' keeps the oracle-stable fake dims;
    'raise' marks the plug-in point loudly. Everything else (batching,
    schema, parallelism) is the production shape in all modes.
    """
    if decode_stub not in _DECODE_MODES:
        raise ValueError(f"decode_stub must be one of {_DECODE_MODES}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        # probe ONCE per worker iterator: a failed import is not cached
        # by Python, so probing per row would pay a full sys.path scan
        # for every record on PIL-less executors
        use_pil = decode_stub == "auto" and pil_available()
        for pdf in it:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            dims = [_decode_dims(c, use_pil) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "content_md5": [
                        hashlib.md5(c).hexdigest() for c in pdf["content"]
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, max_side: int = 64, decode_stub: str = "deterministic"
) -> DataFrame:
    """Resize over Arrow batches via ``mapInPandas``: decode → scale the
    longest side to ``max_side`` preserving aspect → re-encode.
    ``decode_stub='auto'`` decodes+resizes+re-encodes (PNG) for real via
    PIL when importable, per-row falling back to the stub (dims from
    ``_fake_decode``, "re-encoded" bytes a deterministic truncation);
    batching, schema and parallelism are the production shape.
    """
    if decode_stub not in _DECODE_MODES:
        raise ValueError(f"decode_stub must be one of {_DECODE_MODES}")

    def _pil_resize(c: bytes, side: int) -> tuple[int, int, bytes] | None:
        try:
            import io

            from PIL import Image
        except Exception:
            return None
        try:
            with Image.open(io.BytesIO(bytes(c))) as im:
                scale = side / max(im.width, im.height)
                nw = max(1, int(im.width * scale))
                nh = max(1, int(im.height * scale))
                buf = io.BytesIO()
                im.resize((nw, nh)).save(buf, format="PNG")
                return nw, nh, buf.getvalue()
        except Exception:
            return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import probe once per worker iterator (see extract_features)
        use_pil = decode_stub == "auto" and pil_available()
        for pdf in it:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            out_w, out_h, out_c = [], [], []
            for c in pdf["content"]:
                real = _pil_resize(c, max_side) if use_pil else None
                if real is not None:
                    out_w.append(real[0])
                    out_h.append(real[1])
                    out_c.append(real[2])
                    continue
                w, h = _fake_decode(c)
                scale = max_side / max(w, h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out_w.append(nw)
                out_h.append(nh)
                # stub re-encode: byte budget proportional to pixel count
                out_c.append(bytes(c)[: max(1, nw * nh // 8)])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "content": out_c,
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes a frame index per media row
    (the decode of each frame is the stubbed step). Demonstrates the
    fan-out shape: one row per sampled frame, repartitionable downstream."""
    n_frames = (F.length(F.col("content")) / 1000).cast("long") + 1  # fake fps proxy
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_idx"),
    )


def audio_chunk_plan(
    media: DataFrame,
    chunk_ms: int = 30_000,
    overlap_ms: int = 5_000,
    bytes_per_ms: int = 16,
) -> DataFrame:
    """Audio segmentation *plan*: one row per overlapping chunk window
    over each media row's (stubbed) duration — the ASR/feature-extraction
    fan-out shape. Duration derives from byte length at a fixed fake
    bitrate (a real build reads the container header in the decode UDF);
    chunk boundaries are pure arithmetic, so the fan-out is an explode of
    a generated sequence — no Python until the per-chunk decode, which is
    the stubbed step. Output: (media_id, chunk_idx, start_ms, end_ms).
    """
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap must be smaller than the chunk")
    duration = (F.length(F.col("content")) / bytes_per_ms).cast("long") + 1
    step = chunk_ms - overlap_ms
    starts = F.sequence(F.lit(0), F.greatest(duration - 1, F.lit(0)), F.lit(step))
    return media.select(
        "media_id",
        F.posexplode(starts).alias("chunk_idx", "start_ms"),
        duration.alias("_dur"),
    ).select(
        "media_id",
        "chunk_idx",
        "start_ms",
        F.least(F.col("start_ms") + chunk_ms, F.col("_dur")).alias("end_ms"),
    )
