"""LogStore: the versioned table's commit primitive, isolated.

The table format's ACID story rests entirely on
``put_if_absent(log_dir, name, payload)`` being atomic + exclusive +
complete-or-absent. These tests prove that property for BOTH shipped
stores without Spark in the loop (the protocol is pure log I/O), plus
the store-specific maintenance behaviors (stray temp sweep for the
POSIX store; nothing to sweep for the conditional-put store, whose
staging lives outside the log entirely).
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from video_streamer_spark.operators.log_store import (
    ConditionalPutLogStore,
    HardLinkLogStore,
    LogEntryExistsError,
    log_store_for,
    register_log_store,
    unregister_log_store,
)

STORES = [HardLinkLogStore, ConditionalPutLogStore]


@pytest.mark.parametrize("store_cls", STORES)
def test_put_read_list_delete_roundtrip(tmp_path, store_cls):
    store = store_cls()
    log = str(tmp_path / "_manifests")
    store.ensure_log(log)
    store.put_if_absent(log, "v000000001.json", '{"version": 1}')
    store.put_if_absent(log, "v000000002.json", '{"version": 2}')
    assert sorted(store.list_entries(log)) == [
        "v000000001.json",
        "v000000002.json",
    ]
    assert json.loads(store.read_entry(log, "v000000002.json")) == {
        "version": 2
    }
    store.delete_entry(log, "v000000001.json")
    assert store.list_entries(log) == ["v000000002.json"]


@pytest.mark.parametrize("store_cls", STORES)
def test_put_if_absent_is_exclusive(tmp_path, store_cls):
    store = store_cls()
    log = str(tmp_path / "_manifests")
    store.ensure_log(log)
    store.put_if_absent(log, "v1.json", "first")
    with pytest.raises(LogEntryExistsError):
        store.put_if_absent(log, "v1.json", "second")
    # the loser must not have clobbered the winner
    assert store.read_entry(log, "v1.json") == "first"


@pytest.mark.parametrize("store_cls", STORES)
def test_concurrent_puts_exactly_one_winner(tmp_path, store_cls):
    """N threads race the same entry name: exactly one succeeds, every
    loser raises, and the published payload is the winner's — the OCC
    guarantee the table format's version race reduces to."""
    store = store_cls()
    log = str(tmp_path / "_manifests")
    store.ensure_log(log)
    n = 16
    outcomes: list[str | None] = [None] * n
    barrier = threading.Barrier(n)

    def racer(i: int) -> None:
        barrier.wait()
        try:
            store.put_if_absent(log, "v7.json", f"writer-{i}")
            outcomes[i] = "won"
        except LogEntryExistsError:
            outcomes[i] = "lost"

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcomes.count("won") == 1
    assert outcomes.count("lost") == n - 1
    winner = outcomes.index("won")
    assert store.read_entry(log, "v7.json") == f"writer-{winner}"
    # no staging residue became a visible entry
    assert store.list_entries(log) == ["v7.json"]


@pytest.mark.parametrize("store_cls", STORES)
def test_entries_are_never_partially_visible(tmp_path, store_cls):
    """A reader polling list+read while a writer publishes must only
    ever observe the COMPLETE payload — the no-partial-manifest
    guarantee snapshot reads depend on."""
    store = store_cls()
    log = str(tmp_path / "_manifests")
    store.ensure_log(log)
    payload = "x" * 4_000_000  # big enough that a naive write tears
    seen: list[int] = []
    stop = threading.Event()

    def reader() -> None:
        while not stop.is_set():
            for name in store.list_entries(log):
                seen.append(len(store.read_entry(log, name)))

    t = threading.Thread(target=reader)
    t.start()
    time.sleep(0.02)
    store.put_if_absent(log, "v1.json", payload)
    time.sleep(0.05)
    stop.set()
    t.join()
    assert seen, "reader never observed the entry"
    assert set(seen) == {len(payload)}


def test_hardlink_sweep_reclaims_aged_strays(tmp_path):
    """A writer crashing between link and unlink strands .tmp-*.json in
    the log dir (ADVICE r7); sweep_stray reclaims aged ones but never a
    young (possibly in-flight) one, and never a published entry."""
    store = HardLinkLogStore()
    log = str(tmp_path / "_manifests")
    store.ensure_log(log)
    store.put_if_absent(log, "v1.json", "{}")
    stray = os.path.join(log, ".tmp-deadbeef.json")
    with open(stray, "w") as fh:
        fh.write("{}")
    # young stray survives (could be a live writer mid-commit)
    assert store.sweep_stray(log, min_age_sec=3600.0) == 0
    assert os.path.exists(stray)
    # aged stray is reclaimed; the published entry is untouched
    assert store.sweep_stray(log, min_age_sec=0.0) == 1
    assert not os.path.exists(stray)
    assert store.list_entries(log) == ["v1.json"]


def test_condput_strands_nothing_in_log(tmp_path):
    """The conditional-put store stages outside the log dir: after any
    mix of wins and losses the log contains exactly the published
    entries (list_entries never needs filtering) and completed puts
    leave no staging residue."""
    store = ConditionalPutLogStore()
    log = str(tmp_path / "_manifests")
    store.ensure_log(log)
    store.put_if_absent(log, "v1.json", "{}")
    with pytest.raises(LogEntryExistsError):
        store.put_if_absent(log, "v1.json", "{}")
    assert os.listdir(log) == ["v1.json"]
    assert store.sweep_stray(log, min_age_sec=0.0) == 0


def test_registry_longest_prefix_routing(tmp_path):
    a, b = ConditionalPutLogStore(), ConditionalPutLogStore()
    try:
        register_log_store("/data", a)
        register_log_store("/data/tables", b)
        assert log_store_for("/data/tables/t1") is b
        assert log_store_for("/data/other") is a
        assert isinstance(log_store_for("/elsewhere"), HardLinkLogStore)
    finally:
        unregister_log_store("/data")
        unregister_log_store("/data/tables")


def test_condput_crashed_put_strands_only_staging_and_sweeps(tmp_path):
    """A put that crashes before publishing strands bytes ONLY in the
    staging sibling (never a partial object in the log); sweep_stray
    reclaims aged ones and spares young (possibly live) ones."""
    store = ConditionalPutLogStore()
    log = str(tmp_path / "_manifests")
    store.ensure_log(log)
    store.put_if_absent(log, "v1.json", "{}")
    # simulate the crash: a staging file whose writer died pre-publish
    staging = ConditionalPutLogStore._staging(log)
    os.makedirs(staging, exist_ok=True)
    stray = os.path.join(staging, "put-deadbeef.json")
    with open(stray, "w") as fh:
        fh.write("{}")
    assert store.list_entries(log) == ["v1.json"]  # log holds no stray
    assert store.sweep_stray(log, min_age_sec=3600.0) == 0
    assert os.path.exists(stray)
    assert store.sweep_stray(log, min_age_sec=0.0) == 1
    assert not os.path.exists(stray)
    # exclusivity unaffected
    with pytest.raises(LogEntryExistsError):
        store.put_if_absent(log, "v1.json", "late")
