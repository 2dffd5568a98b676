"""Shuffle-VOLUME regression guards (round 10): the quantity that
scales with plan shape, measured from the executed stages.

Wall-clock on a shared box swings ±30%; bytes shuffled do not. Each
bound below is ~4-6x the measured sf0.01 volume — generous headroom
for row-count jitter and AQE coalescing differences, but an order of
magnitude below what the guarded failure mode produces:

- q03/q19a: a LOST BROADCAST turns a dim-side broadcast join into a
  full shuffle of the fact table (measured 355 B / 1.5 KiB today; a
  shuffled lineitem/orders side is megabytes);
- x200: a lost df<=5 boilerplate guard reverts the pair join to
  corpus^2 match volume;
- x02/x03/x05/x45: the banded/blocked dedup families — losing the
  banding (all-pairs) or the block bounds explodes the self-join's
  exchange.

Measured via plans.metrics.shuffle_bytes (AppStatusStore stage diff);
caches cleared first so persist pools cannot short-circuit the
measured shuffles.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from video_streamer_spark.plans.metrics import shuffle_bytes
from video_streamer_spark.queries import QUERIES

# name -> (measured sf0.01 bytes at pin time, bound)
BOUNDS = {
    "q03_multijoin_region_counts": (355, 64 * 1024),
    "q19a_detections_per_label": (1_482, 64 * 1024),
    "x02_dedup_minhash_pairs": (138_227, 600 * 1024),
    "x03_dedup_simhash_pairs": (159_327, 700 * 1024),
    "x05_embedding_near_pairs": (903_251, 4 * 1024 * 1024),
    # re-measured r11 after fusing df into the gram exchange (564_303
    # before); bound kept — headroom still flags a lost df guard
    "x200_verbatim_span_dedup": (443_372, 2_560 * 1024),
    "x45_dedup_components": (160_444, 700 * 1024),
    # the ANN scale path shuffles embedding VECTORS through LSH
    # buckets (payload-heavy by design); losing the plane-blocking
    # reverts it to an all-pairs cogroup grid
    "x218_lsh_near_pairs": (13_941_514, 56 * 1024 * 1024),
    # banded pixel-hash pairs: losing the banding is all-pairs on
    # 8-byte hashes
    "x213_image_dhash_pairs": (471_841, 2 * 1024 * 1024),
}


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_shuffle_volume_stays_in_shape(spark, name):
    spark.catalog.clearCache()
    got = shuffle_bytes(
        spark, lambda: QUERIES[name](spark, SF_ORACLE).count()
    )
    measured, bound = BOUNDS[name]
    assert got <= bound, (
        f"{name} shuffled {got:,} bytes at sf0.01 (pinned at "
        f"{measured:,}, bound {bound:,}) — the plan SHAPE changed: "
        "look for a lost broadcast, banding, or df-guard"
    )
    # a zero can only mean the measurement broke (every guarded query
    # legitimately shuffles something) — fail loudly, not greenly
    assert got > 0, f"{name}: stage diff measured nothing"
