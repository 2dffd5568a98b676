"""video_streamer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``intel/video-streamer`` (a single-node GStreamer video-analytics pipeline:
decode → per-frame ML inference → threshold filter → metadata DB write,
see reference ``run.sh:53`` and ``gst-plugin/python/gst-detection-tf.py``)
as an idiomatic Spark engine:

- batch + streaming DataFrame/SQL surface over parquet tables,
- the detection-metadata pipeline as composable Catalyst-friendly operators,
- LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) designed for 100 TB scale.

No custom parser or planner: the query surface is PySpark DataFrame/SQL and
Catalyst does the optimization (predicate pushdown, column pruning, join
selection, AQE). Python touches data only through Arrow-vectorized pandas
UDFs (`mapInPandas` / `applyInPandas`) where built-ins cannot express the
semantics (model inference, binary payload decode).
"""

from video_streamer_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
