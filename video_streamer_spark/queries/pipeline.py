"""Q19 — detections pipeline replay (SURVEY.md §2.3): the reference's
end-to-end semantic (filter → scale → label join → aggregate,
gst-detection-tf.py:288-400) as declared queries with a DuckDB oracle.

The detections fact table is derived deterministically from ``events``
(operators/detections.py) so both engines rebuild the identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from video_streamer_spark.catalog import table
from video_streamer_spark.operators import detections as D
from video_streamer_spark.queries import query
from video_streamer_spark.sources.labels import labels

# shared CTE rebuilding the synthetic detections table in DuckDB; keep in
# lockstep with operators/detections.synthetic_detections
_DET_CTE = f"""
  det AS (
    SELECT
      CAST(FLOOR(event_id / {D.BOXES_PER_FRAME}) AS BIGINT) AS frame_id,
      CAST(event_id % {D.BOXES_PER_FRAME} AS INT) AS box_idx,
      ((event_id * 37) % 80) / 100.0 AS ymin,
      ((event_id * 53) % 80) / 100.0 AS xmin,
      ((event_id * 37) % 80) / 100.0 + ((event_id * 11) % 20 + 1) / 100.0 AS ymax,
      ((event_id * 53) % 80) / 100.0 + ((event_id * 29) % 20 + 1) / 100.0 AS xmax,
      CAST(1 + event_id % 80 AS INT) AS label_id,
      ((event_id * 13) % 100) / 100.0 AS score
    FROM events),
  filtered AS (
    SELECT * FROM det WHERE score > {D.DEFAULT_THRESHOLD}),
  scaled AS (
    SELECT frame_id, box_idx,
      CAST(FLOOR(xmin * {D.FRAME_WIDTH}) AS INT) AS x_min,
      CAST(FLOOR(ymin * {D.FRAME_HEIGHT}) AS INT) AS y_min,
      CAST(FLOOR(xmax * {D.FRAME_WIDTH}) AS INT) AS x_max,
      CAST(FLOOR(ymax * {D.FRAME_HEIGHT}) AS INT) AS y_max,
      label_id, score
    FROM filtered),
  labels AS (
    SELECT CAST(range AS INT) AS label_id,
           'label_' || CAST(range AS VARCHAR) AS label_name
    FROM range(1, 81))
"""


def _pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    det = D.scale_boxes(
        D.threshold_filter(D.synthetic_detections(events))
    )
    return D.with_labels(det, labels(spark))


@query(
    "q19a_detections_per_label",
    oracle=f"""
    WITH {_DET_CTE}
    SELECT s.label_id, l.label_name, COUNT(*) AS n_detections
    FROM scaled s JOIN labels l ON s.label_id = l.label_id
    GROUP BY s.label_id, l.label_name
    ORDER BY s.label_id
    """,
)
def q19a_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.per_label_counts(_pipeline(spark, sf_dir))


@query(
    "q19b_detections_per_frame",
    oracle=f"""
    WITH {_DET_CTE}
    SELECT frame_id, COUNT(*) AS n_boxes
    FROM scaled
    GROUP BY frame_id
    ORDER BY frame_id
    """,
)
def q19b_per_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.per_frame_counts(_pipeline(spark, sf_dir))
