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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
