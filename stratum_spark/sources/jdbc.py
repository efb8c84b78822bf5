"""JDBC batch-snapshot reader (keyset-partitioned).

The reference's MySQL/PostgreSQL snapshot source pages with keyset cursors
(crates/connectors/src/sql/query/generator.rs:53-111, offset strategies
crates/query-builder/src/offsets.rs). On Spark the same access pattern is
spark.read.jdbc with column-range partitioning: each partition is an
independent keyset slice `WHERE key BETWEEN lo AND hi`, executed by
executors in parallel -- the distributed generalization of stratum's
sequential page loop.

No database exists in this sandbox, so this module only builds the reader
(untested against a live DB; the option plumbing is standard Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_keyset_reader(
    spark: SparkSession,
    url: str,
    table: str,
    key_col: str,
    lower: int,
    upper: int,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", key_col)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
