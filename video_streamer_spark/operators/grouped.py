"""Grouped Python-UDF operators: the applyInPandas (grouped-map) and
GROUPED_AGG pandas-UDAF rows of the capability matrix (SURVEY.md §2.2,
"UDF/UDAF/UDTF surface").

Both examples are chosen to be oracle-exact: min-max scaling and median
use no floating summation, so pandas and any SQL engine produce
bit-identical doubles — the same determinism discipline as
functions/parity.py, applied to the Python path.

Scale shape: groupBy → one shuffle on the group key; each group must fit
one executor's memory as a pandas frame (the applyInPandas contract) —
fine for per-type/per-user groups, wrong for whole-table groups; the
UDAF path streams per-group Arrow batches instead and has no such limit
on group count, only on per-group cardinality.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from video_streamer_spark.functions.shipping import ship_module

ship_module(sys.modules[__name__])

SCALED_SCHEMA = "event_id bigint, event_type string, value double, scaled double"


def _minmax_group(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["value"].min(), pdf["value"].max()
    span = hi - lo
    out = pdf[["event_id", "event_type", "value"]].copy()
    out["scaled"] = (pdf["value"] - lo) / span if span else 0.0
    return out


def minmax_scale_per_group(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Grouped-map applyInPandas: per-group min-max scaling of ``value``.

    min/max/divide are exact IEEE ops (no accumulation), so results match
    the window-function SQL formulation bit-for-bit.
    """
    return events.groupBy(group_col).applyInPandas(_minmax_group, SCALED_SCHEMA)


@F.pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: median (interpolated middle — same
    definition DuckDB/Spark percentile use, and summation-free)."""
    return float(v.median())


def median_per_group(
    events: DataFrame, group_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    return events.groupBy(group_col).agg(
        median_udaf(F.col(value_col)).alias("median_value")
    )
