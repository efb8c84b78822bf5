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


def jdbc_staged_upsert(
    spark: SparkSession,
    url: str,
    df: DataFrame,
    table: str,
    key: str,
    op_col: str | None = None,
    staging: str | None = None,
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> int:
    """Staging-table + MERGE transaction sink -- the reference's upsert
    write path (crates/engine-processing/src/io/sink/postgres.rs:130-198;
    MERGE SQL shape crates/connectors/src/sql/query/generator.rs:187-229):

      1. the batch bulk-loads into a STAGING table via spark.write.jdbc
         (executor-parallel -- the COPY fast-path analog),
      2. ONE driver-side MERGE INTO applies it to the target: op 'D'
         deletes, matched rows update, unmatched non-deletes insert
         (op_col=None treats every row as upsert),
      3. the staging table drops.

    The MERGE statement is atomic on the database side, so a crash
    between stages leaves only an orphan staging table, never a
    half-applied batch -- the same failure contract as the reference's
    staged transaction. The batch must carry at most one row per key
    (LWW-dedup upstream). Returns the number of batch rows shipped.

    Tested in-suite against embedded Apache Derby; MySQL/PG differ only
    in URL + driver (their MERGE/ON CONFLICT spellings are dialect
    variations of the same statement)."""
    staging = staging or f"{table}_stg"
    props = dict(properties or {})
    data_cols = [c for c in df.columns if c != op_col]
    n = df.count()

    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("batchsize", str(batch_size))
        .mode("overwrite")
    )
    for k, v in props.items():
        writer = writer.option(k, v)
    writer.save()

    # identifier rules match Spark's JDBC writer: COLUMN names are created
    # quoted with the DataFrame's exact case, TABLE names pass through
    # unquoted (the database applies its own case folding) -- so the
    # caller names tables exactly as the database resolves them, and the
    # target's columns must match the DataFrame's names case-exactly
    def q(ident: str) -> str:
        return '"' + ident + '"'

    set_clause = ", ".join(
        f"{q(c)} = s.{q(c)}" for c in data_cols if c.lower() != key.lower()
    )
    insert_cols = ", ".join(q(c) for c in data_cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in data_cols)
    arms = []
    # Spark's JDBC writer maps StringType to the dialect's unbounded text
    # type (CLOB on Derby), which some databases refuse to compare with a
    # char literal -- cast the op column for the comparison
    op_ref = f"CAST(s.{q(op_col)} AS VARCHAR(8))" if op_col is not None else None
    if op_col is not None:
        arms.append(f"WHEN MATCHED AND {op_ref} = 'D' THEN DELETE")
    if set_clause:
        arms.append(f"WHEN MATCHED THEN UPDATE SET {set_clause}")
    not_matched_guard = f" AND {op_ref} <> 'D'" if op_col is not None else ""
    arms.append(
        f"WHEN NOT MATCHED{not_matched_guard} THEN INSERT ({insert_cols}) "
        f"VALUES ({insert_vals})"
    )
    merge_sql = (
        f"MERGE INTO {table} t USING {staging} s "
        f"ON t.{q(key)} = s.{q(key)} " + " ".join(arms)
    )

    jvm = spark._jvm
    conn_props = jvm.java.util.Properties()
    for k, v in props.items():
        if k.lower() != "driver":
            conn_props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, conn_props)
    try:
        st = conn.createStatement()
        st.executeUpdate(merge_sql)
        st.executeUpdate(f"DROP TABLE {staging}")
    finally:
        conn.close()
    return n
