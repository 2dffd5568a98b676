from __future__ import annotations

import os

import duckdb
import pytest

from video_streamer_spark.catalog import TABLES
from video_streamer_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Two-tier suite (VERDICT r14 item 1): the full run grew past 40 minutes
# and external CI/driver windows truncated it mid-run, making the round's
# status unverifiable from the outside. The DEFAULT tier keeps everything
# that gates correctness and plan shape — the full 273-query DuckDB
# oracle-parity sweep, the plan/shuffle-volume/scaling pins, the
# operator/source unit tests — and finishes in ~12 minutes. The SLOW
# tier holds the stress/property/lifecycle suites (table-format fault
# storms, log-store fault injection, streaming chaos, the decimal-output
# sweep, hypothesis property tests) whose coverage is depth, not gating:
#   python -m pytest tests/ --full-suite      # everything (~40 min)
#   VSS_FULL_TESTS=1 python -m pytest tests/  # same, via env
# Explicitly naming a slow file/test on the command line always runs it.
SLOW_FILES = {
    "test_table_format.py",      # 620 s: lifecycle/fault storms
    "test_log_store_faults.py",  # 390 s: commit-protocol fault injection
    "test_streaming.py",         # 173 s: micro-batch drains
    "test_no_decimal_outputs.py",  # 152 s: full-registry dtype sweep
    "test_properties.py",        # 53 s: hypothesis property tests
}
SLOW_TESTS = {
    # 222 s: runs every registered query at sf0.001; the default tier's
    # oracle-parity sweep already EXECUTES every query (registry pins
    # QUERIES == ORACLES), so this adds only the second scale point
    "test_all_queries_run_smoke",
}


def pytest_addoption(parser):
    parser.addoption(
        "--full-suite",
        action="store_true",
        default=False,
        help="run the slow tier too (see conftest.SLOW_FILES)",
    )


def pytest_collection_modifyitems(config, items):
    full = config.getoption("--full-suite") or os.environ.get(
        "VSS_FULL_TESTS"
    ) == "1"
    slow_marker = pytest.mark.slow
    # paths named explicitly on the command line stay runnable — a
    # developer asking for tests/test_table_format.py gets it
    explicit = {
        os.path.basename(a.split("::")[0].rstrip("/"))
        for a in config.invocation_params.args
        if isinstance(a, str) and not a.startswith("-")
    }
    keep, drop = [], []
    for item in items:
        fname = os.path.basename(str(item.fspath))
        is_slow = fname in SLOW_FILES or (
            item.name.split("[")[0] in SLOW_TESTS
        )
        if is_slow:
            item.add_marker(slow_marker)
        if is_slow and not full and fname not in explicit:
            drop.append(item)
        else:
            keep.append(item)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vss-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows):
    """Order-insensitive canonical form of a result set (column-name sorted),
    mirroring the driver's compare."""

    def norm_val(v):
        if isinstance(v, float):
            return round(v, 9)
        return v

    # key=repr: rows with NULLs aren't orderable as raw tuples
    return sorted((tuple(norm_val(v) for v in r) for r in rows), key=repr)


def spark_rows(df, columns):
    cols = sorted(columns)
    return [tuple(r[c] for c in cols) for r in df.collect()]


def duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return [tuple(row[i] for i in order) for row in res.fetchall()], sorted(names)
