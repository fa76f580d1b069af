"""Multimodal columns (SURVEY.md §2.11 X5): image/audio/video as opaque
``binary`` payloads with typed metadata, plus decode / feature-extract /
resize / frame-sample stages as Arrow-batched ``mapInPandas`` operators.

Spark-side design (all REAL and tested): schema convention, partitioning,
UDF signatures, batch shapes. The pixel/sample decode itself is STUBBED —
the container has no image/audio libraries — behind an import-try that
raises ``NotImplementedError`` for real decoding and otherwise uses a
clearly-marked deterministic fake derived from the payload bytes, so every
downstream stage (schema, batching, aggregation) is exercised for real.

Scale notes: payloads ride the scan as binary; metadata is a pruned struct
so metadata-only queries never touch bytes (columnar parquet). mapInPandas
streams Arrow batches — bound batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are MBs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- schema convention ------------------------------------------------------

MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", MEDIA_METADATA_TYPE),
    ]
)


def image_metadata(width: Column, height: Column) -> Column:
    return F.struct(
        F.lit("image").alias("modality"),
        F.lit("image/fake").alias("mime"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture: the
    text bytes stand in for an encoded image; width/height derived from
    n_chars. Gives every multimodal stage a reproducible input."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        image_metadata(
            (F.col("n_chars") % 64) + 1, (F.col("n_chars") % 48) + 1
        ).alias("metadata"),
    )


# --- decode stub ------------------------------------------------------------


def _decode_image_real(payload: bytes):  # pragma: no cover - no lib in container
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires Pillow; container has no image libs "
            "(STUB — deterministic fake path is used instead)"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def real_decoder_available() -> bool:
    """True iff an image decode library is importable in THIS interpreter.
    Checked on the driver for the fail-fast ``strict`` path; workers
    re-check inside the UDF (a cluster can have heterogeneous images)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_pixel_stats(payload: bytes) -> tuple[float, int, int]:
    """Deterministic fake 'decode': interpret payload bytes as pixels.
    (mean_byte, min_byte, max_byte) — stable stand-ins for channel stats."""
    if not payload:
        return (0.0, 0, 0)
    return (sum(payload) / len(payload), min(payload), max(payload))


# --- mapInPandas stages -----------------------------------------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def extract_features(
    media: DataFrame, use_real_decoder: bool = False, strict: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; we
    return an iterator of result frames — constant memory per batch, no
    row-at-a-time Python overhead.

    ``use_real_decoder=True`` degrades GRACEFULLY when no image library is
    importable: a single warning per worker, then the deterministic
    fake-decode path — so the operator is runnable (not just declarable) in
    any environment. Pass ``strict=True`` to fail fast on the driver
    instead (pipelines that must not silently ship fake features).
    """
    if use_real_decoder and strict and not real_decoder_available():
        raise NotImplementedError(
            "real image decode requires Pillow (strict=True); install an "
            "image library or drop strict to use the deterministic fake path"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NB: self-contained closure (numpy only) — module-level helpers
        # would be pickled by reference and require the package on the
        # workers' sys.path; the closure must survive any driver cwd.
        import numpy as np

        def fake_stats(p):
            if not p:
                return (0.0, 0, 0)
            arr = np.frombuffer(p, dtype=np.uint8)
            return (float(arr.mean()), int(arr.min()), int(arr.max()))

        real = False
        if use_real_decoder:
            try:
                import PIL.Image  # noqa: F401

                real = True
            except ImportError:
                import warnings

                warnings.warn(
                    "real image decode requested but Pillow is not "
                    "importable on this worker — degrading to the "
                    "deterministic fake-decode path",
                    RuntimeWarning,
                    stacklevel=2,
                )
        for pdf in batches:
            if real:  # pragma: no cover - no image libs in this container
                raise NotImplementedError(
                    "wire PIL.Image.open(io.BytesIO(payload)) here"
                )
            stats = [fake_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "mean_byte": [s[0] for s in stats],
                    "min_byte": [s[1] for s in stats],
                    "max_byte": [s[2] for s in stats],
                    "width": [m["width"] for m in pdf["metadata"]],
                    "height": [m["height"] for m in pdf["metadata"]],
                }
            )

    from ibis_flink_example_spark.catalog import fan_out

    # fan_out capped at 8: decode work is embarrassingly parallel and a
    # single-row-group input file otherwise feeds ONE Python worker — but
    # each extra partition forks+initializes an Arrow worker, which at small
    # row counts costs more than it buys beyond a handful of partitions
    return fan_out(media, min_partitions=8).mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_metadata(media: DataFrame, max_side: int) -> DataFrame:
    """'Resize' stage: recompute target dims preserving aspect ratio (pure
    columns — the real pixel resample would live in the mapInPandas decode
    path; the metadata contract is what downstream stages consume)."""
    w, h = F.col("metadata.width"), F.col("metadata.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.withColumn(
        "resized",
        F.struct(
            F.ceil(w * scale).cast("int").alias("width"),
            F.ceil(h * scale).cast("int").alias("height"),
        ),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stage for video payloads: emits one row per sampled
    frame index (explode of a sequence — the shuffle-free Spark shape for
    1:N expansion). Decode of the frame itself is the stubbed step."""
    n = F.coalesce(F.col("metadata.n_frames"), F.lit(1))
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n - 1, F.lit(every_n))).alias("frame_idx"),
    )
