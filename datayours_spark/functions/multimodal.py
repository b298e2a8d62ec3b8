"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond the reference surface (BASELINE.json north star): image/audio/video
assets travel as ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas
functions over ``mapInPandas``.

The actual media decoding is STUBBED — the image/audio libraries are not in
this container — behind ``RealDecoderUnavailable`` plus a clearly-marked
deterministic fake (md5-derived features) so that the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is real and tested.

Scale notes: payloads never pass through the driver; each mapInPandas batch
holds only `spark.sql.execution.arrow.maxRecordsPerBatch` assets, bounding
executor memory; frame sampling is a generated explode (no Python loop over
rows in the JVM path).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id bigint, kind string, data binary, "
    "width int, height int, duration_ms int, codec string"
)

FEATURE_DIM = 8
FEATURE_SCHEMA = f"asset_id bigint, kind string, feature array<float>"


class RealDecoderUnavailable(NotImplementedError):
    """Raised when a real media decode is requested in this container."""


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: md5-derived floats in
    [-1, 1].  NOT a real decode — replace `extract_features(real=True)`
    with an actual image/audio library in production."""
    digest = hashlib.md5(payload).digest()
    return [(digest[i % 16] - 128) / 128.0 for i in range(dim)]


#: contract for a real decoder: (payload_bytes, kind) -> feature list.  The
#: callable ships to executors inside the mapInPandas closure, so it must be
#: picklable (a top-level function wrapping e.g. PIL/torchvision/librosa).
Decoder = "Callable[[bytes, str], list[float]]"


def pillow_decoder(payload: bytes, kind: str) -> list[float]:
    """Pillow-backed image decode + trivial embed: per-channel mean/std of
    a 16×16 RGB thumbnail plus the thumbnail aspect — FEATURE_DIM floats.
    Top-level so the mapInPandas closure pickles.  Images only: any other
    kind raises (an image library must not silently fake audio/video)."""
    if kind != "image":
        raise RealDecoderUnavailable(
            f"pillow_decoder decodes images only, got kind={kind!r}"
        )
    from io import BytesIO

    import numpy as np
    from PIL import Image

    img = Image.open(BytesIO(payload)).convert("RGB")
    img.thumbnail((16, 16))
    arr = np.asarray(img, dtype="float64") / 255.0
    means = arr.mean(axis=(0, 1))
    stds = arr.std(axis=(0, 1))
    return [
        float(x)
        for x in (*means, *stds, arr.shape[1] / 16.0, arr.shape[0] / 16.0)
    ][:FEATURE_DIM]


def default_real_decoder():
    """The opportunistic in-container default for ``real=True``: Pillow's
    image decoder when Pillow imports, else None (the honest stub path —
    no media library ships in this container)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return None
    return pillow_decoder


def extract_features(
    assets: DataFrame, real: bool = False, decoder=None
) -> DataFrame:
    """(asset_id, kind, feature[dim]) via Arrow-batched mapInPandas.

    ``decoder`` injects the real per-asset decode+embed callable — the
    production path: the SAME plumbing (schema, Arrow batching, partition
    shape) runs with a real media library plugged in.  ``real=True`` without
    a decoder first tries the opportunistic default
    (:func:`default_real_decoder` — Pillow, when importable) and raises
    :class:`RealDecoderUnavailable` otherwise; the ``real=False`` default
    is the clearly-marked deterministic fake.
    """
    if real and decoder is None:
        decoder = default_real_decoder()
        if decoder is not None:
            # Pillow decodes images ONLY: on a mixed image/audio/video
            # corpus the opportunistic default would fail mid-job inside
            # mapInPandas on executors.  Check the kinds up front (a cheap
            # distinct over the catalog's tiny kind column) and keep the
            # clear driver-side error for anything Pillow can't handle —
            # mixed corpora must inject an explicit decoder.
            kinds = {r[0] for r in assets.select("kind").distinct().collect()}
            if kinds - {"image"}:  # includes NULL kinds (bad catalog rows)
                shown = sorted(kinds, key=lambda k: (k is None, k or ""))
                raise RealDecoderUnavailable(
                    "the default Pillow decoder handles images only, but "
                    f"the corpus contains kinds {shown}; inject a "
                    "decoder= that handles every kind, or use real=False"
                )
        if decoder is None:
            raise RealDecoderUnavailable(
                "media decoders are not installed in this container; "
                "inject one via decoder=, or use real=False for the "
                "deterministic fake"
            )
    import pandas as pd

    fn = decoder if decoder is not None else (
        lambda payload, kind: _fake_features(payload)
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        fn(bytes(b), k)
                        for b, k in zip(pdf["data"], pdf["kind"])
                    ],
                }
            )

    return assets.select("asset_id", "kind", "data").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_metadata(assets: DataFrame, max_side: int) -> DataFrame:
    """Metadata-level resize plan: new dimensions preserving aspect ratio.

    The pixel transform itself is decoder work (stubbed); the column-level
    arithmetic — what a pipeline schedules and shuffles on — is real.
    """
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return assets.withColumn("new_width", F.ceil(F.col("width") * scale).cast("int")) \
        .withColumn("new_height", F.ceil(F.col("height") * scale).cast("int"))


def frame_sample_plan(videos: DataFrame, every_ms: int) -> DataFrame:
    """One row per sampled frame timestamp: (asset_id, frame_ms).

    Generated with sequence+explode — the frame list never exists driver-side.
    """
    return videos.where(F.col("kind") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )


def audio_segment_plan(
    assets: DataFrame, window_ms: int, stride_ms: int
) -> DataFrame:
    """Overlapping audio segmentation plan: one row per ``window_ms``
    segment starting every ``stride_ms`` — (asset_id, segment_no,
    start_ms, end_ms, segment_ms), the audio analogue of
    :func:`frame_sample_plan` (video) and ``text.chunk_documents``
    (text): the pre-step that schedules per-segment feature extraction
    (the DSP itself is decoder work, stubbed in this container).

    Segment identity is integer arithmetic on start_ms (segment_no =
    start_ms div stride), so externally computed segment embeddings can
    join back deterministically.  The tail segment is clipped at the
    asset's duration, never empty; a non-positive/NULL duration yields
    zero rows via the guarded sequence (no ANSI crash on one bad row).
    Zero shuffle: a generator projection streaming through the scan.
    """
    starts = F.when(
        F.col("duration_ms") >= 1,
        F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(int(stride_ms))),
    ).otherwise(F.array().cast("array<int>"))
    return (
        assets.where(F.col("kind") == "audio")
        .select("asset_id", "duration_ms", F.explode(starts).alias("start_ms"))
        .select(
            "asset_id",
            F.expr(f"start_ms div {int(stride_ms)}").cast("bigint").alias(
                "segment_no"
            ),
            F.col("start_ms").cast("bigint").alias("start_ms"),
            F.least(
                F.col("start_ms") + int(window_ms), F.col("duration_ms")
            ).cast("bigint").alias("end_ms"),
        )
        .withColumn(
            "segment_ms", (F.col("end_ms") - F.col("start_ms")).cast("bigint")
        )
    )
