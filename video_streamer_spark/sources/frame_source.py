"""Custom Python DataSource: a directory of raw frame files as a table.

The reference ingests bytes with ``filesrc`` (run.sh:53); this is the
Spark-4-native equivalent — a registered Python ``DataSource`` exposing
``format("framedir")`` for both batch reads and Structured Streaming,
yielding ``(frame_id, stream_id, n_bytes, payload)`` rows from
``<stream_id>-<frame_id>.bin`` files.

Design for scale:
- **partition = file list slice**: the driver only LISTS the directory;
  byte reads happen task-side in ``read(partition)``, one task per
  slice, so ingest bandwidth scales with executors.
- **streaming offsets = file count watermark**: the simple stream
  reader's offset is the sorted-filename high-water mark; each
  micro-batch reads only files that arrived since the previous offset —
  the same contract as Spark's own file source, minus its per-file
  metadata log.

This is deliberately the smallest real implementation: binaryFile and
the parquet file source remain the production paths; ``framedir``
demonstrates the extension surface a VDMS-like custom store would plug
into.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from video_streamer_spark.functions.shipping import ship_module

ship_module(sys.modules[__name__])

FRAME_SCHEMA = StructType(
    [
        StructField("frame_id", LongType()),
        StructField("stream_id", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _list_frames(path: str) -> list[str]:
    return sorted(f for f in os.listdir(path) if f.endswith(".bin"))


def _parse_name(name: str) -> tuple[str, int]:
    stem = name[: -len(".bin")]
    stream_id, _, frame = stem.rpartition("-")
    return (stream_id or "default", int(frame))


def _read_files(path: str, names: list[str]) -> Iterator[tuple]:
    for name in names:
        stream_id, frame_id = _parse_name(name)
        with open(os.path.join(path, name), "rb") as fh:
            payload = fh.read()
        yield (frame_id, stream_id, len(payload), payload)


class _FramePartition(InputPartition):
    def __init__(self, names: list[str]):
        self.names = names


class _FrameBatchReader(DataSourceReader):
    def __init__(self, path: str, n_partitions: int):
        self.path = path
        self.n_partitions = n_partitions

    def partitions(self) -> list[InputPartition]:
        names = _list_frames(self.path)
        n = max(1, min(self.n_partitions, len(names) or 1))
        return [_FramePartition(names[i::n]) for i in range(n)]

    def read(self, partition: _FramePartition) -> Iterator[tuple]:
        return _read_files(self.path, partition.names)


class _FrameStreamReader(SimpleDataSourceStreamReader):
    """Offset = count of files already delivered (filenames sorted);
    each batch returns the files between two offsets."""

    def __init__(self, path: str):
        self.path = path

    def initialOffset(self) -> dict:  # noqa: N802
        return {"n": 0}

    # NB: these return LISTS, not generators — the simple stream reader
    # prefetches driver-side and ships the batch to executors via
    # pickle, and generators aren't picklable.
    def read(self, start: dict) -> tuple[list[tuple], dict]:
        names = _list_frames(self.path)
        new = names[start["n"]:]
        return list(_read_files(self.path, new)), {"n": len(names)}

    def readBetweenOffsets(  # noqa: N802
        self, start: dict, end: dict
    ) -> list[tuple]:
        names = _list_frames(self.path)
        return list(_read_files(self.path, names[start["n"]:end["n"]]))


class FrameDirDataSource(DataSource):
    """``spark.read.format("framedir").option("path", dir)`` after
    ``register_frame_source(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "framedir"

    def schema(self) -> StructType:
        return FRAME_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _FrameBatchReader(
            self.options["path"], int(self.options.get("numPartitions", 8))
        )

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:  # noqa: N802
        return _FrameStreamReader(self.options["path"])


def register_frame_source(spark) -> None:
    spark.dataSource.register(FrameDirDataSource)
