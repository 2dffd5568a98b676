"""Streaming near-duplicate detection — MinHash-LSH over a document
STREAM, the online form of the batch dedup family (operators/dedup.py).

Shape: per-row signatures (``minhash_signatures_rowwise`` — no
aggregation, so no watermark needed), band explode, then per-band
KEEPER state via ``applyInPandasWithState`` keyed by (band_idx,
band_val): the first batch that touches a band elects a keeper (min doc
id within that batch, so the election is deterministic under any task
ordering), and every later document hashing into the band is marked a
near-dup candidate of that keeper. One emitted mark per (doc, band);
the consumer reduces marks to a per-doc verdict (any band with an
earlier keeper ⇒ candidate pair, exactly like the batch bucket
self-join).

Scale: state is ONE small record per distinct band value, sharded by
the groupBy hash — the streaming analog of the batch band table. A
production deployment bounds state with a TTL (band values not seen for
N days expire) — config noted, not enforced here because the driver
corpus replays are finite.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from video_streamer_spark.functions.shipping import ship_module
from video_streamer_spark.operators.dedup import (
    MINHASH_BAND_ROWS,
    NUM_MINHASH,
    minhash_bands,
    minhash_signatures_rowwise,
)

ship_module(sys.modules[__name__])

MARK_SCHEMA = "band_idx int, band_val string, doc_id bigint, keeper_doc_id bigint"
_KEEPER_STATE = "keeper bigint"


def _mark_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    band_idx, band_val = key
    doc_ids = sorted(
        {int(d) for pdf in pdfs for d in pdf["doc_id"]}
    )
    if not doc_ids:
        return
    if state.exists:
        (keeper,) = state.get
    else:
        keeper = doc_ids[0]  # min doc of the first batch touching the band
        state.update((keeper,))
    yield pd.DataFrame(
        {
            "band_idx": [band_idx] * len(doc_ids),
            "band_val": [band_val] * len(doc_ids),
            "doc_id": doc_ids,
            "keeper_doc_id": [keeper] * len(doc_ids),
        }
    )


def streaming_band_marks(
    doc_stream: DataFrame,
    num_hashes: int = NUM_MINHASH,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """Document stream → (band, doc, keeper) marks. A doc with any mark
    where keeper_doc_id != doc_id is a near-dup candidate of the keeper."""
    sigs = minhash_signatures_rowwise(doc_stream, num_hashes=num_hashes)
    bands = minhash_bands(sigs, band_rows=band_rows)
    return bands.groupBy("band_idx", "band_val").applyInPandasWithState(
        _mark_group,
        outputStructType=MARK_SCHEMA,
        stateStructType=_KEEPER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
