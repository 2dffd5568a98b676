from video_streamer_spark.functions.parity import (
    dec,
    round2,
    round4,
    ts_str,
    date_str,
)
from video_streamer_spark.functions.arrays import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "dec",
    "round2",
    "round4",
    "ts_str",
    "date_str",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
