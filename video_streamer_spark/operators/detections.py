"""Detection-metadata pipeline operators — the reference's own computation
(reference gst-detection-tf.py:288-400) re-expressed relationally:

    raw detections → threshold filter → pixel-coordinate scaling →
    label broadcast-join → aggregate / sink

Semantics preserved from the reference:
- threshold: keep boxes with ``score > threshold`` (strict >, mask at
  gst-detection-tf.py:296-297; default 0.7 from config/settings.yaml:15).
- scaling: normalized [ymin,xmin,ymax,xmax] × (height,width) cast to int
  (gst-detection-tf.py:298-306). We floor() explicitly: numpy's
  astype(int32) truncates, and floor == truncate for non-negative coords.
- label join: the 80-row dict lookup (gst-detection-tf.py:114-121,396)
  becomes a broadcast hash join — no shuffle at any scale.

Deliberate divergences (SURVEY.md §2.1 quirks): we emit true
(x_min,y_min,x_max,y_max) instead of the reference's mislabeled VDMS
rectangle (quirk 1), and key rows by real (frame_id, box_idx) instead of
the box-index-as-frame-id ``_ref`` (quirk 2).

``synthetic_detections`` derives a deterministic detections fact table
from the driver's ``events`` table with pure integer-modular arithmetic,
so the DuckDB oracle can rebuild the identical table — this replaces the
FIXTURES.md ``detections`` fixture without writing anything to disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 0.7  # config/settings.yaml:15 ("face_threshold")
FRAME_WIDTH = 1920
FRAME_HEIGHT = 1080
BOXES_PER_FRAME = 10


def synthetic_detections(events: DataFrame) -> DataFrame:
    """Deterministic pseudo-detections keyed by events.event_id.

    Stands in for model output tensors (bboxes, scores, classes —
    gst-detection-tf.py:236): every field is integer-modular over
    event_id, identically computable in any engine.
    """
    e = F.col("event_id")
    ymin = ((e * 37) % 80) / 100.0
    xmin = ((e * 53) % 80) / 100.0
    return events.select(
        F.floor(e / BOXES_PER_FRAME).cast("bigint").alias("frame_id"),
        (e % BOXES_PER_FRAME).cast("int").alias("box_idx"),
        ymin.alias("ymin"),
        xmin.alias("xmin"),
        (ymin + ((e * 11) % 20 + 1) / 100.0).alias("ymax"),
        (xmin + ((e * 29) % 20 + 1) / 100.0).alias("xmax"),
        (1 + e % 80).cast("int").alias("label_id"),
        (((e * 13) % 100) / 100.0).alias("score"),
    )


def threshold_filter(det: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Confidence predicate (strict >), pushed down to the scan by Catalyst."""
    return det.where(F.col("score") > threshold)


def scale_boxes(
    det: DataFrame, width: int = FRAME_WIDTH, height: int = FRAME_HEIGHT
) -> DataFrame:
    """Normalized [0,1] box corners → integer pixel coordinates."""
    return det.select(
        "frame_id",
        "box_idx",
        F.floor(F.col("xmin") * width).cast("int").alias("x_min"),
        F.floor(F.col("ymin") * height).cast("int").alias("y_min"),
        F.floor(F.col("xmax") * width).cast("int").alias("x_max"),
        F.floor(F.col("ymax") * height).cast("int").alias("y_max"),
        "label_id",
        "score",
    )


def with_labels(det: DataFrame, labels: DataFrame) -> DataFrame:
    """80-row dim lookup as an explicit broadcast hash join."""
    return det.join(F.broadcast(labels), "label_id")


def per_label_counts(det_labeled: DataFrame) -> DataFrame:
    return (
        det_labeled.groupBy("label_id", "label_name")
        .agg(F.count("*").alias("n_detections"))
        .orderBy("label_id")
    )


def per_frame_counts(det: DataFrame) -> DataFrame:
    return (
        det.groupBy("frame_id")
        .agg(F.count("*").alias("n_boxes"))
        .orderBy("frame_id")
    )
