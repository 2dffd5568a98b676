"""Multimodal (binary) column handling.

The reference's unit of data is a dense uint8 frame carried as an opaque
buffer, decoded zero-copy into ndarrays at the Python boundary
(reference gst-detection-tf.py:252-254). The Spark-native shape is a
``binary`` column + typed metadata struct, decoded inside Arrow-batched
``mapInPandas`` UDFs — rows in the plan, columnar ndarray batches in
Python, exactly the reference's layout.

Real image/audio codecs aren't in this container, so ``decode_frame``
stubs the codec behind a deterministic byte-level "decode" — the Spark
plumbing (schema, batch iteration, per-partition init, explode of
per-record outputs) is real and tested; swapping the stub for cv2/PyAV
is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_frame(payload: bytes) -> np.ndarray:
    """Codec stub: real deployments decode JPEG/H.264 here (cv2/PyAV).

    Deterministic fake: view the raw bytes as a uint8 vector. Raising
    NotImplementedError for non-bytes keeps the contract explicit.
    """
    if not isinstance(payload, (bytes, bytearray)):
        raise NotImplementedError("codec libraries not available in this env")
    return np.frombuffer(bytes(payload), dtype=np.uint8)


def payload_stats(frames: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Per-payload byte statistics via mapInPandas.

    Mirrors the reference's inference shape (O11/O12): per-partition
    lazy init (the ``state`` dict stands in for a loaded model), then
    vectorized work per Arrow batch. Output is a fresh schema — the
    UDTF-like path (mapInPandas), not a scalar UDF.
    """

    import sys

    from video_streamer_spark.functions.shipping import ship_module

    ship_module(sys.modules[__name__])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, bool] = {}
        for pdf in batches:
            if not state:  # per-partition init, once — like model load
                state["ready"] = True
            arrays = [decode_frame(b) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [int(a.size) for a in arrays],
                    "byte_sum": [int(a.sum()) for a in arrays],
                    # stub "dimensions": bytes folded into a wxh guess;
                    # real codecs read these from the container header
                    "width": [int(a.size % 640) for a in arrays],
                    "height": [int(a.size // 640) for a in arrays],
                }
            )

    return frames.select(id_col, bin_col).mapInPandas(compute, PAYLOAD_SCHEMA)


def documents_as_payloads(docs: DataFrame) -> DataFrame:
    """Adapter: documents.text → binary payload column (UTF-8 bytes).

    Stands in for real media bytes so the binary plumbing is exercised
    end-to-end on driver-provided data only.
    """
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


def sample_every_n(
    frames: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling: keep every n-th record by id (the reference
    processes every frame; a training-data pipeline subsamples). Pure
    predicate — pushes down to the scan, no UDF, no shuffle."""
    return frames.where(F.pmod(F.col(id_col), F.lit(n)) == 0)


def resize_payloads(
    frames: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Deterministic "resize" to a fixed width×height byte buffer:
    truncate or zero-pad (real deployments call cv2.resize here —
    reference gst-detection-tf.py:356). Runs as codegen'd binary
    built-ins (substring/rpad), no Python; the fixed output size is what
    matters for downstream batch shape."""
    target = width * height
    resized = F.rpad(
        F.substring(F.col(bin_col), 1, target).cast("binary"),
        target,
        bytes([0]),
    )
    return frames.select(
        F.col(id_col),
        resized.alias(bin_col),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
    )


N_HIST_BINS = 16


def byte_histogram_features(
    frames: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Feature extraction stub with real plumbing: 16-bin normalized
    byte-value histogram per payload as array<double> — a drop-in for a
    CNN embedding head. Arrow-batched mapInPandas; numpy bincount per
    record; output feeds the similarity operators unchanged."""
    import sys

    from pyspark.sql.types import ArrayType, DoubleType

    from video_streamer_spark.functions.shipping import ship_module

    ship_module(sys.modules[__name__])

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bin_col]:
                a = decode_frame(b)
                h = np.bincount(a >> 4, minlength=N_HIST_BINS).astype(np.float64)
                total = h.sum()
                feats.append((h / total if total else h).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "embedding": feats}
            )

    return frames.select(id_col, bin_col).mapInPandas(compute, out_schema)


def payload_stats_arrow(
    frames: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """mapInArrow twin of ``payload_stats``: operates directly on Arrow
    RecordBatches (no pandas materialization). For wide binary payloads
    this skips a columnar→pandas→columnar round-trip per batch — the
    lowest-overhead Python boundary Spark offers; semantics are
    identical to the pandas path (asserted in tests).
    """
    import sys

    import pyarrow as pa

    from video_streamer_spark.functions.shipping import ship_module

    ship_module(sys.modules[__name__])

    def compute(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            payloads = batch.column(1).to_pylist()
            arrays = [decode_frame(b) for b in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([int(a.size) for a in arrays], type=pa.int64()),
                    pa.array([int(a.sum()) for a in arrays], type=pa.int64()),
                    pa.array([int(a.size % 640) for a in arrays], type=pa.int32()),
                    pa.array([int(a.size // 640) for a in arrays], type=pa.int32()),
                ],
                names=["doc_id", "n_bytes", "byte_sum", "width", "height"],
            )

    return frames.select(id_col, bin_col).mapInArrow(compute, PAYLOAD_SCHEMA)
