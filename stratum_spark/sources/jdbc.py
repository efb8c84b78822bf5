"""JDBC batch-snapshot reader (keyset-partitioned).

The reference's MySQL/PostgreSQL snapshot source pages with keyset cursors
(crates/connectors/src/sql/query/generator.rs:53-111, offset strategies
crates/query-builder/src/offsets.rs). On Spark the same access pattern is
spark.read.jdbc with column-range partitioning: each partition is an
independent keyset slice `WHERE key BETWEEN lo AND hi`, executed by
executors in parallel -- the distributed generalization of stratum's
sequential page loop.

Tested against a REAL database in-suite: Apache Derby (embedded, ships
with Spark's jars) stands in for MySQL/PG --
tests/test_sources_retry.py::test_jdbc_keyset_reader_against_embedded_derby
asserts disjoint contiguous keyset slices per partition and exact
snapshot round-trip. MySQL/PG differ only in URL + driver class.
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
