"""Source readers beyond parquet — CSV, JSON(L), binary files — with
explicit schemas (schema-on-read, the engine's caps-negotiation analog:
reference do_set_caps, gst-detection-tf.py:243-247).

Schema inference is banned on the hot path: at 100 TB an inference pass
is a full extra scan, and inferred types drift between files. Callers
pass a StructType (or take a table's known schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Whole files as (path, modificationTime, length, content:binary) —
    the batch analog of the reference's filesrc (run.sh:53) for media
    payloads. Pair with operators/multimodal decode UDFs.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
