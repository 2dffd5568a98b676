"""bench.splittable_mirror integrity: the mirror must never serve rows
from a source that has since been regenerated — including after a
CRASHED build (tables completed, _READY never stamped), where resuming
around existing table dirs would stamp the new fingerprint over old
data."""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import bench


def _write_source(sf_dir: str, seed: int) -> int:
    """A >4MB single-row-group table of random int64 (incompressible
    enough to stay above the split threshold); returns the sum."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**62, 700_000)
    pq.write_table(
        pa.table({"v": vals}), os.path.join(sf_dir, "orders.parquet")
    )
    return int(vals.sum())


def test_splittable_mirror_rebuilds_after_crashed_build(tmp_path):
    sf_dir = str(tmp_path / f"sf-mirror-{uuid.uuid4().hex[:8]}")
    os.makedirs(sf_dir)
    _write_source(sf_dir, seed=1)
    mirror = bench.splittable_mirror(sf_dir)
    try:
        assert mirror != sf_dir
        split_dir = os.path.join(mirror, "orders.parquet")
        assert os.path.isdir(split_dir)  # rewritten, not symlinked
        assert len(os.listdir(split_dir)) >= 2  # actually split

        # crash scenario: the build completed this table but died before
        # stamping _READY, and the source was then regenerated
        os.remove(os.path.join(mirror, "_READY"))
        want = _write_source(sf_dir, seed=2)

        mirror2 = bench.splittable_mirror(sf_dir)
        assert mirror2 == mirror
        got = int(
            pq.read_table(os.path.join(mirror2, "orders.parquet"))
            .column("v")
            .to_numpy()
            .sum()
        )
        assert got == want  # new rows, not the seed-1 leftovers

        # idempotent fast path: same fingerprint, no rebuild needed
        assert bench.splittable_mirror(sf_dir) == mirror
    finally:
        shutil.rmtree(mirror, ignore_errors=True)
