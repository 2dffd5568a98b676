"""Executed-plan metrics: what a query ACTUALLY moved, not what its
plan promised.

``shuffle_bytes`` runs an action and returns the total shuffle-write
bytes of exactly the stages that action scheduled (AppStatusStore
stage diff). Wall-clock regressions on a shared box are noise; shuffle
VOLUME is the quantity that scales with the plan shape — a lost
broadcast hint, a dropped df-guard, or a de-fused exchange shows up as
an order-of-magnitude byte jump long before it is reliably visible in
seconds. tests/test_shuffle_volume.py pins the heavy families' bytes
at sf0.01 with wide headroom for row-count jitter; the bound trips on
shape changes only.

The AppStatusStore is driver-local (this is a metrics read, no job),
reached over py4j; stageList's full Scala signature is
(statuses, details, withSummaries, unsortedQuantiles, taskStatus).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession


class SparkInternalsChanged(RuntimeError):
    """The AppStatusStore access path (private Spark internals over
    py4j) no longer matches this Spark build. Raised with the original
    py4j error chained so an upgrade failure names its cause instead of
    surfacing as a cryptic Py4JError deep inside a regression guard."""


def _stage_rows(spark: SparkSession):
    try:
        jvm = spark._jvm
        gw = spark.sparkContext._gateway
        store = spark.sparkContext._jsc.sc().statusStore()
        lst = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
        out = {}
        it = lst.iterator()
        while it.hasNext():
            s = it.next()
            # attempts share a stageId; keep the max-bytes attempt
            prev = out.get(s.stageId(), 0)
            out[s.stageId()] = max(prev, s.shuffleWriteBytes())
        return out
    except Exception as exc:  # noqa: BLE001 — re-raise with provenance
        raise SparkInternalsChanged(
            "shuffle_bytes depends on private Spark internals "
            "(SparkContext.statusStore().stageList with the 5-arg "
            "signature (statuses, details, withSummaries, "
            "unsortedQuantiles, taskStatus) and "
            "StageData.shuffleWriteBytes); this Spark build "
            f"({spark.version}) no longer matches. Update "
            "plans/metrics.py for the new signature — the "
            "shuffle-volume guard suite is down until then."
        ) from exc


def shuffle_bytes(spark: SparkSession, action: Callable[[], object]) -> int:
    """Total shuffle-write bytes of the stages ``action()`` scheduled.

    Sessions run tests sequentially, so the before/after stage-id diff
    is exactly the action's stages; a concurrent job in the same
    session would pollute the diff (don't call this from parallel
    drivers). Cached upstreams short-circuit shuffles — clear relevant
    caches first if the measurement must include them."""
    try:
        bus = spark.sparkContext._jsc.sc().listenerBus()
    except Exception as exc:  # noqa: BLE001 — re-raise with provenance
        raise SparkInternalsChanged(
            "shuffle_bytes depends on the private "
            "SparkContext.listenerBus() accessor; this Spark build "
            f"({spark.version}) no longer exposes it. Update "
            "plans/metrics.py — the shuffle-volume guard suite is "
            "down until then."
        ) from exc
    # the AppStatusStore is fed by the ASYNC appStatus event queue —
    # an action returns before its stage-completed events are
    # processed, so both reads must drain the bus first or the diff
    # under-counts (and a regression guard that under-counts passes
    # green, defeating itself)
    bus.waitUntilEmpty(30_000)
    before = set(_stage_rows(spark))
    action()
    bus.waitUntilEmpty(30_000)
    after = _stage_rows(spark)
    return sum(v for k, v in after.items() if k not in before)
