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


def detect_dialect(url: str) -> str:
    """Dialect from the JDBC URL scheme. 'ansi' (MERGE INTO) covers
    Derby, PostgreSQL 15+, SQL Server, Oracle, DB2; 'postgres' uses
    INSERT .. ON CONFLICT (works on every supported PG, including <15
    which has no MERGE); 'mysql' uses INSERT .. ON DUPLICATE KEY UPDATE
    (MySQL has no MERGE at all). The reference makes the same capability
    branch: MERGE when the server supports it, else the dialect upsert
    (crates/engine-processing/src/io/sink/postgres.rs:92-99)."""
    u = url.lower()
    if u.startswith("jdbc:mysql:") or u.startswith("jdbc:mariadb:"):
        return "mysql"
    if u.startswith("jdbc:postgresql:"):
        return "postgres"
    return "ansi"


def upsert_statements(
    dialect: str,
    table: str,
    staging: str,
    data_cols: list[str],
    key: str,
    op_col: str | None,
) -> list[str]:
    """Render the dialect-specific upsert transaction as SQL text
    (statement shapes: crates/connectors/src/sql/query/generator.rs:187-267;
    golden-string-tested like the reference's generator tests,
    generator.rs:701-1209).

    Identifier rules match Spark's JDBC writer: COLUMN names are created
    quoted with the DataFrame's exact case ("c" on ANSI/PG, `c` on MySQL),
    TABLE names pass through unquoted (the database applies its own case
    folding). Statement lists with >1 entry must run inside one
    transaction (jdbc_staged_upsert does)."""
    if dialect not in ("ansi", "postgres", "mysql"):
        raise ValueError(f"unknown dialect: {dialect}")
    quote = "`" if dialect == "mysql" else '"'

    def q(ident: str) -> str:
        return quote + ident + quote

    non_key = [c for c in data_cols if c.lower() != key.lower()]
    insert_cols = ", ".join(q(c) for c in data_cols)

    if dialect == "ansi":
        set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_key)
        insert_vals = ", ".join(f"s.{q(c)}" for c in data_cols)
        arms = []
        # Spark's JDBC writer maps StringType to the dialect's unbounded
        # text type (CLOB on Derby), which some databases refuse to compare
        # with a char literal -- cast the op column for the comparison
        op_ref = f"CAST(s.{q(op_col)} AS VARCHAR(8))" if op_col is not None else None
        if op_col is not None:
            arms.append(f"WHEN MATCHED AND {op_ref} = 'D' THEN DELETE")
        if set_clause:
            arms.append(f"WHEN MATCHED THEN UPDATE SET {set_clause}")
        # null-safe: a NULL op means "plain upsert" on every dialect -- the
        # bare `op <> 'D'` is NULL-false and would silently drop the row
        not_matched_guard = (
            f" AND ({op_ref} <> 'D' OR {op_ref} IS NULL)" if op_col is not None else ""
        )
        arms.append(
            f"WHEN NOT MATCHED{not_matched_guard} THEN INSERT ({insert_cols}) "
            f"VALUES ({insert_vals})"
        )
        return [
            f"MERGE INTO {table} t USING {staging} s "
            f"ON t.{q(key)} = s.{q(key)} " + " ".join(arms)
        ]

    stmts: list[str] = []
    if dialect == "postgres":
        if op_col is not None:
            stmts.append(
                f"DELETE FROM {table} t USING {staging} s "
                f"WHERE t.{q(key)} = s.{q(key)} AND s.{q(op_col)} = 'D'"
            )
        set_clause = ", ".join(f"{q(c)} = EXCLUDED.{q(c)}" for c in non_key)
        do_arm = f"DO UPDATE SET {set_clause}" if set_clause else "DO NOTHING"
        # null-safe (see ansi arm): NULL op rows must still upsert
        where = (
            f" WHERE (s.{q(op_col)} <> 'D' OR s.{q(op_col)} IS NULL)"
            if op_col is not None
            else ""
        )
        stmts.append(
            f"INSERT INTO {table} ({insert_cols}) "
            f"SELECT {insert_cols} FROM {staging} s{where} "
            f"ON CONFLICT ({q(key)}) {do_arm}"
        )
        return stmts

    # mysql: multi-table DELETE join, then the derived-table alias form of
    # ON DUPLICATE KEY UPDATE (`AS new`, the non-deprecated 8.0.19+ spelling
    # of VALUES(col))
    if op_col is not None:
        stmts.append(
            f"DELETE t FROM {table} t JOIN {staging} s "
            f"ON t.{q(key)} = s.{q(key)} WHERE s.{q(op_col)} = 'D'"
        )
    where = (
        f" WHERE (s.{q(op_col)} <> 'D' OR s.{q(op_col)} IS NULL)"
        if op_col is not None
        else ""
    )
    select_cols = ", ".join(f"s.{q(c)}" for c in data_cols)
    if non_key:
        set_clause = ", ".join(f"{q(c)} = new.{q(c)}" for c in non_key)
    else:
        # pure-key table: a matched row has nothing to update; the no-op
        # key=key assignment keeps the statement valid
        set_clause = f"{q(key)} = new.{q(key)}"
    stmts.append(
        f"INSERT INTO {table} ({insert_cols}) "
        f"SELECT * FROM (SELECT {select_cols} FROM {staging} s{where}) AS new "
        f"ON DUPLICATE KEY UPDATE {set_clause}"
    )
    return stmts


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
    dialect: str | None = None,
    extra_txn_sql: list[str] | None = None,
) -> int:
    """Staging-table + dialect-branched upsert transaction sink -- the
    reference's upsert write path
    (crates/engine-processing/src/io/sink/postgres.rs:130-198; capability
    branch postgres.rs:92-99; SQL shapes
    crates/connectors/src/sql/query/generator.rs:187-267):

      1. the batch bulk-loads into a STAGING table via spark.write.jdbc
         (executor-parallel -- the COPY fast-path analog),
      2. the dialect's upsert statements apply it to the target in ONE
         driver-side transaction: op 'D' deletes, matched rows update,
         unmatched non-deletes insert (op_col=None treats every row as
         upsert). ANSI dialects get a single MERGE INTO; PostgreSQL gets
         DELETE + INSERT .. ON CONFLICT (PG<15 has no MERGE); MySQL gets
         DELETE + INSERT .. ON DUPLICATE KEY UPDATE (no MERGE at all).
      3. the staging table drops.

    The transaction commits atomically on the database side, so a crash
    between stages leaves only an orphan staging table, never a
    half-applied batch -- the same failure contract as the reference's
    staged transaction. The staging name carries a unique suffix so
    concurrent upserts into the same target cannot clobber each other's
    staged rows. The batch must carry at most one row per key (LWW-dedup
    upstream). Returns the number of staged rows (counted on the staging
    table inside the same connection -- no second Spark action over the
    batch).

    Dialect requirements the ANSI MERGE path does NOT have: PostgreSQL's
    `ON CONFLICT (key)` requires a UNIQUE constraint or unique index on
    `key` in the target table (PG raises "no unique or exclusion
    constraint matching the ON CONFLICT specification" otherwise), and
    MySQL's `ON DUPLICATE KEY UPDATE` likewise only fires on a
    PRIMARY/UNIQUE key violation -- without one every row blind-inserts.
    Create the target with `key` as PRIMARY KEY (or a unique index) on
    those dialects. PG >= 15 deployments that prefer MERGE can pass
    dialect='ansi' explicitly as the escape hatch. A NULL in `op_col`
    means "plain upsert" uniformly across all three dialects (the guards
    are null-safe).

    Tested in-suite against embedded Apache Derby (ansi branch); the
    postgres branch additionally EXECUTES against in-memory DuckDB --
    whose ON CONFLICT grammar and unique-constraint requirement match
    PG's -- and the mysql statement text is golden-string-tested
    (tests/test_sources_retry.py) in the reference's own style
    (generator.rs:701-1209)."""
    import uuid as _uuid

    staging = staging or f"{table}_stg_{_uuid.uuid4().hex[:8]}"
    dialect = dialect or detect_dialect(url)
    props = dict(properties or {})
    data_cols = [c for c in df.columns if c != op_col]

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

    stmts = upsert_statements(dialect, table, staging, data_cols, key, op_col)
    # extra_txn_sql rides the SAME database transaction as the upsert --
    # callers (cdc/sync_out.py) use it to commit their sync bookmark
    # atomically with the applied batch, the exactly-once composition the
    # lake side gets from (job_id, epoch) bookmarks in snapshot commits.
    if extra_txn_sql:
        stmts = stmts + list(extra_txn_sql)

    jvm = spark._jvm
    conn_props = jvm.java.util.Properties()
    for k, v in props.items():
        if k.lower() != "driver":
            conn_props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, conn_props)
    try:
        st = conn.createStatement()
        rs = st.executeQuery(f"SELECT COUNT(*) FROM {staging}")
        rs.next()
        n = int(rs.getLong(1))
        rs.close()
        if len(stmts) > 1:
            conn.setAutoCommit(False)
        try:
            for s in stmts:
                st.executeUpdate(s)
            if len(stmts) > 1:
                conn.commit()
                conn.setAutoCommit(True)
        except Exception:
            # leave the connection closable (Derby refuses to close with
            # an open transaction) and the target untouched
            if len(stmts) > 1:
                conn.rollback()
                conn.setAutoCommit(True)
            raise
        try:
            st.executeUpdate(f"DROP TABLE {staging}")
        except Exception:
            pass  # orphan staging table: harmless, uniquely named
    finally:
        conn.close()
    return n
