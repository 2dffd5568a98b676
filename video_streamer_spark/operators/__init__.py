"""Composable engine operators (dedup, similarity, text, multimodal,
detections). Each module exposes DataFrame → DataFrame functions; query
registration lives in video_streamer_spark.queries.*.
"""
