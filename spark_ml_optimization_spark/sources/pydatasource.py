"""Custom data source in pure Python (Spark 4 DataSource API).

A deterministic synthetic "sensor" source: each InputPartition generates
its own id range executor-side (partition-parallel, zero driver data),
with values derived from a Knuth multiplicative hash so any engine can
reproduce the stream arithmetically — which is what makes the registered
query SQL-oracle-verifiable rather than rows-only.

This is the extension point for sources Spark has no built-in reader
for (internal APIs, proprietary formats, synthetic load): implement
partitions() for split planning and read() as a row generator; Spark
handles distribution, schema enforcement, and Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: Knuth's multiplicative hash constant — the whole "dataset".
_MULT = 2654435761
_MOD = 2**32


class _SensorReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("rows", "10000"))
        self.parts = int(options.get("partitions", "8"))

    def partitions(self):
        per = self.n // self.parts
        return [
            InputPartition((i * per, (i + 1) * per if i < self.parts - 1 else self.n))
            for i in range(self.parts)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            h = (i * _MULT) % _MOD
            yield (i, h % 97, round((h % 1000) / 10.0, 1))


class SensorSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sensor"

    def schema(self) -> str:
        return "reading_id BIGINT, sensor_id INT, temp DOUBLE"

    def reader(self, schema):
        return _SensorReader(self.options)


def register_sensor_source(spark: SparkSession) -> None:
    """spark.dataSource.register REPLACES an existing registration of the
    same name, so plain re-registration is already idempotent — no
    memoization (an id(spark) cache can go stale after GC id reuse)."""
    spark.dataSource.register(SensorSource)


def _build_sensor_stream_source():
    """The streaming classes are defined DYNAMICALLY (function scope) so
    cloudpickle serializes them BY VALUE: Spark runs the streaming
    source's offset/prefetch logic in a separate
    python_streaming_source_runner process that does not share the
    driver's sys.path, so a module-level class (pickled by reference)
    raises ModuleNotFoundError there.  Batch sources (SensorSource
    above) deserialize in executors that inherit the driver's path, so
    they can stay module-level."""

    class _SensorStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked streaming reader over the deterministic
        generator: each micro-batch emits the next CHUNK ids until
        TOTAL, then reports no new data (so processAllAvailable
        terminates).  Offsets are plain dicts — Spark checkpoints
        them, and readBetweenOffsets replays any range exactly (the
        contract that makes the source exactly-once compatible)."""

        CHUNK = 2000
        TOTAL = 6000

        def initialOffset(self) -> dict:
            return {"next": 0}

        def read(self, start: dict):
            lo = int(start["next"])
            hi = min(lo + self.CHUNK, self.TOTAL)
            return self._rows(lo, hi), {"next": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return self._rows(int(start["next"]), int(end["next"]))

        @staticmethod
        def _rows(lo: int, hi: int):
            # iter(list), not a generator: the prefetch wrapper needs a
            # real iterator (it calls next() on no-progress batches)
            # that is ALSO picklable (cached batches ship to the JVM
            # planner) — a generator fails the pickle, a bare list
            # fails the next().  Hash constants inlined so the dynamic
            # class captures no module globals.
            return iter(
                [
                    (
                        i,
                        (i * 2654435761) % 2**32 % 97,
                        round(((i * 2654435761) % 2**32 % 1000) / 10.0, 1),
                    )
                    for i in range(lo, hi)
                ]
            )

    class SensorStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sensor_stream"

        def schema(self) -> str:
            return "reading_id BIGINT, sensor_id INT, temp DOUBLE"

        def simpleStreamReader(self, schema):
            return _SensorStreamReader()

    return SensorStreamSource


def register_sensor_stream_source(spark: SparkSession) -> None:
    spark.dataSource.register(_build_sensor_stream_source())


class _SinkCommit(WriterCommitMessage):
    """Per-task commit message: (file, rows).  Module-level so executors
    pickle it by reference (batch write tasks inherit the driver's
    sys.path — the src18 by-value rule applies only to the streaming
    source runner process)."""

    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class _RowSinkWriter(DataSourceWriter):
    """Executor-side JSON-lines writer + driver-side manifest commit —
    the two-phase contract (write per task -> commit once) that gives a
    custom sink task-retry safety: uncommitted part files are invisible
    until _manifest.json lists them."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.json")
        rows = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                rows += 1
        if rows == 0:
            os.remove(fname)
            return _SinkCommit("", 0)
        return _SinkCommit(fname, rows)

    def commit(self, messages):
        import json
        import os

        files = sorted(os.path.basename(m.file) for m in messages if m.rows)
        rows = sum(m.rows for m in messages)
        with open(os.path.join(self.path, "_manifest.json"), "w") as f:
            json.dump({"files": files, "n_files": len(files), "rows": rows}, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m.rows and os.path.exists(m.file):
                os.remove(m.file)


class RowSinkSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rowsink"

    def writer(self, schema, overwrite):
        return _RowSinkWriter(self.options)


def register_rowsink_source(spark: SparkSession) -> None:
    spark.dataSource.register(RowSinkSource)
