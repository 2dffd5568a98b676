"""Derived driver-sample ordering (round-6 VERDICT item 3): the order
the registry presents to the driver must be computed from the
correctness-artifact union + source hashes, not hand-maintained, and
must front-load exactly the queries whose evidence is missing or stale.
"""

import json

from video_streamer_spark.queries import ORACLES, QUERIES
from video_streamer_spark.queries import sample_order
from video_streamer_spark.queries.sample_order import (
    _CHANGED_CAP,
    _SAMPLE_SIZE,
    _VERIFIED,
    derived_sample_order,
    latest_driver_evidence,
    load_snapshot_round,
    load_verified_hashes,
    query_source_hash,
)


def test_registry_order_is_the_derived_order():
    """The registration order the driver samples IS the derived order —
    no hand-maintained list can drift from the evidence."""
    assert list(QUERIES) == derived_sample_order(QUERIES, ORACLES)


def test_derived_order_front_loads_missing_and_stale_evidence():
    """Every query with no driver CORRECTNESS row and every latest-red
    query appears BEFORE everything else; changed-since-green queries
    follow immediately, quota'd to _CHANGED_CAP inside the driver's
    _SAMPLE_SIZE-row sample (round-12 VERDICT item 1)."""
    ev = latest_driver_evidence()
    verified = load_verified_hashes()
    reg = list(QUERIES)
    red_never = {n for n in reg if n not in ev or not ev[n][1]}
    changed = {
        n
        for n in reg
        if n in ev
        and ev[n][1]
        and query_source_hash(n, QUERIES[n], ORACLES.get(n))
        != verified.get(n)
    }
    order = derived_sample_order(QUERIES, ORACLES)
    assert set(order) == set(reg)
    k = len(red_never)
    assert set(order[:k]) == red_never
    # the effective quota shrinks to keep _TAIL_MIN tail slots
    eff = min(
        _CHANGED_CAP,
        max(0, _SAMPLE_SIZE - k - sample_order._TAIL_MIN),
    )
    in_quota = min(eff, len(changed))
    assert all(n in changed for n in order[k : k + in_quota])
    # the quota holds inside the sample window — except that when the
    # REST band is smaller than the fill (nearly the whole registry
    # flagged changed), overflow changed rows legitimately re-enter:
    # there is nothing better to fill the sample with
    n_rest = len(reg) - k - len(changed)
    fill = max(0, _SAMPLE_SIZE - k - in_quota)
    allowed = in_quota + max(0, fill - n_rest)
    assert (
        sum(1 for n in order[:_SAMPLE_SIZE] if n in changed) <= allowed
    )


def test_never_verified_precede_changed():
    """Within the head, never-verified queries outrank changed ones:
    a first green row is worth more than a re-verification, so when the
    head exceeds the driver's 50-row sample the never-verified still
    land inside it (36 of 220 as of round 6)."""
    ev = latest_driver_evidence()
    order = derived_sample_order(QUERIES, ORACLES)
    never = [n for n in order if n not in ev]
    if not never:
        return
    last_never = max(order.index(n) for n in never)
    red = [n for n in order if n in ev and not ev[n][1]]
    # only red rows may precede; everything else comes after
    assert last_never < len(never) + len(red)


def test_verified_hashes_cover_only_green_rows():
    """verified_hashes.json records a hash for every latest-green query
    known AT SNAPSHOT TIME and nothing that is red or never-sampled —
    a red query must not carry a 'verified' hash that could mask
    staleness later. Green rows from rounds NEWER than the snapshot's
    recorded round are tolerated (round-7 VERDICT, What's wrong 4):
    they can only add evidence, never mask staleness — staleness is
    source-hash drift, which the snapshot still catches — so the suite
    stays green when a fresh CORRECTNESS artifact lands at a round
    boundary, before the round-start ritual reruns."""
    ev = latest_driver_evidence()
    verified = load_verified_hashes()
    snap_round = load_snapshot_round()
    green = {n for n, (_, g) in ev.items() if g and n in QUERIES}
    green_at_snapshot = {
        n for n, (rnd, g) in ev.items()
        if g and n in QUERIES and rnd <= snap_round
    }
    # nothing red/never-sampled carries a hash...
    assert set(verified) <= green
    # ...and every green row the snapshot COULD know about has one
    assert green_at_snapshot <= set(verified)
    # and the file is valid sorted JSON (stable diffs round to round)
    raw = json.loads(_VERIFIED.read_text())
    assert list(raw) == sorted(raw)


def test_evidence_reader_is_resilient():
    """Artifact rows with missing fields or rows-only checks (no hash)
    classify correctly: hash_match=None stays green, False goes red."""
    # contract encoded by latest_driver_evidence: exercise via a probe
    # of the real artifacts — every parsed row must classify boolean
    ev = latest_driver_evidence()
    assert ev, "no correctness artifacts found at repo root"
    for name, (rnd, green) in ev.items():
        assert isinstance(rnd, int) and isinstance(green, bool)


def test_changed_band_quota_interleaves_stale_tail(monkeypatch):
    """When the changed band exceeds _CHANGED_CAP (the table-format
    churn case from the r12 VERDICT), the sample window holds exactly
    _CHANGED_CAP changed rows and the remaining slots go to the
    OLDEST-evidence tail rows; changed overflow lands immediately after
    the sample boundary, ahead of the younger-evidence tail."""
    n_changed, n_rest = 80, 100
    queries = {f"c{i:03d}": (lambda s, d: None) for i in range(n_changed)}
    queries.update(
        {f"t{i:03d}": (lambda s, d: None) for i in range(n_rest)}
    )
    # all green; changed rows have fresh (r12) evidence, tail rows age
    # from r2 upward so oldest-first ordering is observable
    ev = {f"c{i:03d}": (12, True) for i in range(n_changed)}
    ev.update(
        {f"t{i:03d}": (2 + i % 5, True) for i in range(n_rest)}
    )
    monkeypatch.setattr(
        sample_order, "latest_driver_evidence", lambda: ev
    )
    monkeypatch.setattr(
        sample_order,
        "query_source_hash",
        lambda name, fn, oracle: f"now-{name}",
    )
    # tail rows' hashes match (verified), changed rows' don't
    monkeypatch.setattr(
        sample_order,
        "load_verified_hashes",
        lambda: {
            **{f"c{i:03d}": "stale" for i in range(n_changed)},
            **{f"t{i:03d}": f"now-t{i:03d}" for i in range(n_rest)},
        },
    )
    monkeypatch.setattr(sample_order, "_changed_modules", lambda: set())
    order = sample_order.derived_sample_order(queries, {})
    sample = order[:_SAMPLE_SIZE]
    changed_in_sample = [n for n in sample if n.startswith("c")]
    assert len(changed_in_sample) == _CHANGED_CAP
    fill = [n for n in sample if n.startswith("t")]
    assert len(fill) == _SAMPLE_SIZE - _CHANGED_CAP
    fill_rounds = [ev[n][0] for n in fill]
    assert fill_rounds == sorted(fill_rounds)
    # the sample's fill really is the OLDEST slice of the tail
    all_tail_sorted = sorted(
        (n for n in queries if n.startswith("t")),
        key=lambda n: (ev[n][0], list(queries).index(n)),
    )
    assert fill == all_tail_sorted[: len(fill)]
    # overflow changed rows come right after the sample boundary
    overflow = order[_SAMPLE_SIZE : _SAMPLE_SIZE + (n_changed - _CHANGED_CAP)]
    assert all(n.startswith("c") for n in overflow)


def test_tail_rotates_oldest_evidence_first():
    """Beyond the head (red / never-verified / changed), queries order
    by the AGE of their newest driver evidence, oldest round first —
    so the stalest slice of the registry rotates back through the
    driver's 50-row sample instead of aging indefinitely (r10 verdict
    item 5)."""
    ev = latest_driver_evidence()
    verified = load_verified_hashes()
    order = derived_sample_order(QUERIES, ORACLES)
    head = {
        n
        for n in order
        if n not in ev
        or not ev[n][1]
        or query_source_hash(n, QUERIES[n], ORACLES.get(n))
        != verified.get(n)
    }
    tail = [n for n in order if n not in head]
    rounds = [ev[n][0] for n in tail]
    assert rounds == sorted(rounds), (
        "tail band must be oldest-evidence first"
    )


def test_tail_reservation_squeezes_changed_quota(monkeypatch):
    """When a round mints never-verified queries, the changed quota —
    never the red/never band — gives up sample slots so at least
    _TAIL_MIN oldest-evidence rows still rotate through (the r12
    done-criterion: >=20 stale rows re-verified per round)."""
    from video_streamer_spark.queries.sample_order import _TAIL_MIN

    n_never, n_changed, n_rest = 8, 80, 100
    queries = {f"n{i:03d}": (lambda s, d: None) for i in range(n_never)}
    queries.update(
        {f"c{i:03d}": (lambda s, d: None) for i in range(n_changed)}
    )
    queries.update(
        {f"t{i:03d}": (lambda s, d: None) for i in range(n_rest)}
    )
    ev = {f"c{i:03d}": (12, True) for i in range(n_changed)}
    ev.update({f"t{i:03d}": (2 + i % 4, True) for i in range(n_rest)})
    monkeypatch.setattr(
        sample_order, "latest_driver_evidence", lambda: ev
    )
    monkeypatch.setattr(
        sample_order,
        "query_source_hash",
        lambda name, fn, oracle: f"now-{name}",
    )
    monkeypatch.setattr(
        sample_order,
        "load_verified_hashes",
        lambda: {
            **{f"c{i:03d}": "stale" for i in range(n_changed)},
            **{f"t{i:03d}": f"now-t{i:03d}" for i in range(n_rest)},
        },
    )
    monkeypatch.setattr(sample_order, "_changed_modules", lambda: set())
    order = sample_order.derived_sample_order(queries, {})
    sample = order[:_SAMPLE_SIZE]
    assert [n for n in sample[:n_never]] == sorted(
        n for n in queries if n.startswith("n")
    )
    tail = [n for n in sample if n.startswith("t")]
    assert len(tail) >= _TAIL_MIN
    changed_in = [n for n in sample if n.startswith("c")]
    assert len(changed_in) == _SAMPLE_SIZE - n_never - len(tail)
    assert len(changed_in) < _CHANGED_CAP, "quota must have shrunk"
