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
            # NULL payloads (MEDIA_SCHEMA allows them; PERMISSIVE corrupt
            # loads and NULL-text text_as_media produce them) yield NULL
            # features — one bad row must not fail the task, same contract
            # as _probed_durations
            dims = [
                None if c is None else _decode_dims(c, use_pil)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(
                        [None if c is None else len(c) for c in pdf["content"]],
                        dtype="Int64",
                    ),
                    "content_md5": [
                        None if c is None else hashlib.md5(c).hexdigest()
                        for c in pdf["content"]
                    ],
                    "width": pd.array(
                        [None if d is None else d[0] for d in dims], dtype="Int64"
                    ),
                    "height": pd.array(
                        [None if d is None else d[1] for d in dims], dtype="Int64"
                    ),
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
                if c is None:
                    # NULL payload -> NULL resize, same contract as
                    # extract_features / _probed_durations
                    out_w.append(None)
                    out_h.append(None)
                    out_c.append(None)
                    continue
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
                    "width": pd.array(out_w, dtype="Int64"),
                    "height": pd.array(out_h, dtype="Int64"),
                    "content": out_c,
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def wav_duration_ms(content: bytes) -> int | None:
    """REAL audio container metadata via the stdlib ``wave`` parser:
    duration in ms from the WAV header's frame count / sample rate —
    no decode of the sample data, exactly what ffprobe does for WAV.
    None when the payload is not a parseable WAV (callers fall back to
    the byte-length stub per row, keeping mixed feeds flowing)."""
    try:
        import io
        import wave

        with wave.open(io.BytesIO(bytes(content))) as w:
            rate = w.getframerate()
            if rate <= 0:
                return None
            return int(w.getnframes() * 1000 // rate)
    except Exception:
        return None


_FFPROBE_ON_PATH: bool | None = None


def ffprobe_available() -> bool:
    """Probe for an ffprobe binary on the worker's PATH — the optional
    real video-container parser (same contract as ``pil_available``:
    not in this container; a deployment that has it gets real frame
    counts for free via ``metadata='auto'``). Memoized per worker
    PROCESS: ``ffprobe_n_frames`` runs per ROW inside mapInPandas, and
    a filesystem PATH scan per row would dominate the probe itself."""
    global _FFPROBE_ON_PATH
    if _FFPROBE_ON_PATH is None:
        import shutil

        _FFPROBE_ON_PATH = shutil.which("ffprobe") is not None
    return _FFPROBE_ON_PATH


def ffprobe_n_frames(content: bytes) -> int | None:
    """Real video frame count via ffprobe reading the container from
    stdin (``-count_packets`` on the first video stream — header-level,
    no frame decode). None when ffprobe is missing or the payload is
    not a parseable container."""
    if not ffprobe_available():
        return None
    import subprocess

    try:
        out = subprocess.run(
            [
                "ffprobe", "-v", "error", "-select_streams", "v:0",
                "-count_packets", "-show_entries", "stream=nb_read_packets",
                "-of", "csv=p=0", "-i", "pipe:0",
            ],
            input=bytes(content),
            capture_output=True,
            timeout=30,
        )
        return int(out.stdout.decode().strip())
    except Exception:
        return None


_METADATA_MODES = ("stub", "auto")


def _probed_durations(
    media: DataFrame, probe, fallback, out_col: str
) -> DataFrame:
    """Shared metadata-probe stage for the plan operators: one
    ``mapInPandas`` pass emitting (media_id, <out_col>) where each row's
    value comes from the REAL container parser when it succeeds and from
    the deterministic byte-length ``fallback`` otherwise (per ROW, not
    per worker — a mixed feed of parseable and opaque payloads keeps
    flowing). Arrow-batched, projection-pruned to (media_id, content)
    at the scan, no shuffle."""
    schema = StructType(
        [StructField("media_id", LongType()), StructField(out_col, LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals = []
            for c in pdf["content"]:
                if c is None:
                    # NULL payload: emit NULL so the downstream
                    # sequence/explode drops the row exactly like the
                    # stub arithmetic does (length(NULL) -> NULL) —
                    # one bad row must not fail the task
                    vals.append(None)
                    continue
                real = probe(c)
                vals.append(int(real) if real is not None else fallback(c))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    out_col: pd.array(vals, dtype="Int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, schema)


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, metadata: str = "stub"
) -> DataFrame:
    """Video frame-sampling *plan*: explodes a frame index per media row
    (the decode of each frame is the stubbed step). Demonstrates the
    fan-out shape: one row per sampled frame, repartitionable downstream.

    ``metadata='auto'`` reads the REAL frame count from the container
    header via ffprobe when the binary is on the worker PATH (the
    ``pil_available`` import-probe pattern), per-row falling back to the
    byte-length proxy — so 'auto' on a probe-less host is value-identical
    to 'stub', and the fan-out arithmetic below the probe is the same
    zero-Python explode either way."""
    if metadata not in _METADATA_MODES:
        raise ValueError(f"metadata must be one of {_METADATA_MODES}")
    if metadata == "auto":
        base = _probed_durations(
            media,
            ffprobe_n_frames,
            lambda c: len(c) // 1000 + 1,
            "_nf",
        )
        n_frames = F.col("_nf")
    else:
        base = media
        n_frames = (F.length(F.col("content")) / 1000).cast("long") + 1
    # valid frame indices are 0..n_frames-1 and F.sequence is
    # bound-inclusive: sampling up to n_frames would emit an
    # out-of-range index whenever n_frames % every_n == 0 (the same
    # fencepost audio_chunk_plan handles via duration - 1). greatest()
    # SKIPS NULLs, so clamp only non-NULL counts: a NULL n_frames (NULL
    # payload / unprobeable container) must stay NULL so explode drops
    # the row instead of emitting a phantom frame 0
    last_idx = F.when(n_frames.isNotNull(), F.greatest(n_frames - 1, F.lit(0)))
    return base.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), last_idx, F.lit(every_n))).alias("frame_idx"),
    )


def audio_chunk_plan(
    media: DataFrame,
    chunk_ms: int = 30_000,
    overlap_ms: int = 5_000,
    bytes_per_ms: int = 16,
    metadata: str = "stub",
) -> DataFrame:
    """Audio segmentation *plan*: one row per overlapping chunk window
    over each media row's duration — the ASR/feature-extraction fan-out
    shape. Chunk boundaries are pure arithmetic, so the fan-out is an
    explode of a generated sequence — no Python below the metadata
    probe until the per-chunk decode, which is the stubbed step.

    ``metadata='stub'`` derives duration from byte length at a fixed
    fake bitrate; ``metadata='auto'`` reads the REAL duration from the
    WAV header via the stdlib ``wave`` parser (frame count / sample
    rate — header-only, no sample decode), per-row falling back to the
    byte-length arithmetic for unparseable payloads, so a mixed feed
    keeps flowing and 'auto' on opaque bytes is value-identical to
    'stub'. Output: (media_id, chunk_idx, start_ms, end_ms).
    """
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap must be smaller than the chunk")
    if metadata not in _METADATA_MODES:
        raise ValueError(f"metadata must be one of {_METADATA_MODES}")
    if metadata == "auto":
        base = _probed_durations(
            media,
            wav_duration_ms,
            lambda c: len(c) // bytes_per_ms + 1,
            "_dur",
        )
        duration = F.col("_dur")
    else:
        base = media
        duration = (F.length(F.col("content")) / bytes_per_ms).cast("long") + 1
    step = chunk_ms - overlap_ms
    # NULL duration (NULL payload) must yield NO chunks: greatest()
    # skips NULLs, so guard the bound explicitly — a NULL sequence bound
    # makes posexplode drop the row in both modes
    bound = F.when(duration.isNotNull(), F.greatest(duration - 1, F.lit(0)))
    starts = F.sequence(F.lit(0), bound, F.lit(step))
    return base.select(
        "media_id",
        F.posexplode(starts).alias("chunk_idx", "start_ms"),
        duration.alias("_dur2"),
    ).select(
        "media_id",
        "chunk_idx",
        "start_ms",
        F.least(F.col("start_ms") + chunk_ms, F.col("_dur2")).alias("end_ms"),
    )
