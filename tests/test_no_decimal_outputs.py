"""Parity rule 4 (functions/parity.py): no registered query may emit a
DECIMAL-typed output column.

DECIMAL is an internal type — exact, order-independent aggregation — but
a scale-preserving Decimal in the *hashed output* diverges from a
comparator fetch path that coerces the other engine's DECIMAL to
float64: '0.980510' vs '0.98051'. That asymmetry produced the program's
only driver-red correctness rows (x92/x95, CORRECTNESS_r05) while being
invisible to Decimal-to-Decimal comparison. Final outputs must be
BIGINT / DOUBLE / STRING / DATE-string.

Schema construction only — no query is executed beyond what its
DataFrame construction requires.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from video_streamer_spark.queries import QUERIES


def _decimal_fields(schema):
    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if "decimal" in f.dataType.simpleString()
    ]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_decimal_output_columns(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    offenders = _decimal_fields(df.schema)
    assert not offenders, (
        f"{name} emits DECIMAL output column(s) {offenders}: cast the "
        "final value to DOUBLE/BIGINT/STRING (functions/parity.py rule 4)"
    )
