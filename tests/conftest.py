from __future__ import annotations

import duckdb
import pytest

from video_streamer_spark.catalog import TABLES
from video_streamer_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


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
