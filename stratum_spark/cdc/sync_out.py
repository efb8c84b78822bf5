"""Incremental sync-out: propagate a lake table's changes to a JDBC
database -- the reference's core identity (stratum migrates INTO
relational databases, crates/engine-processing/src/io/sink/postgres.rs)
run INCREMENTALLY off this engine's lake tables: `read_changes` supplies
the net row diff between the last-synced snapshot and now, and the
dialect-branched staged upsert (sources/jdbc.py) applies it -- 'D'
deletes, the rest upsert -- in ONE target-side transaction that ALSO
commits the sync bookmark, so the lake->database direction carries the
same exactly-once contract the database->lake direction gets from
(job_id, epoch) bookmarks in snapshot commits: a crash anywhere leaves
either (old bookmark, old target) or (new bookmark, new target), and
replaying converges.

Scale path: the diff itself is bucket-pruned on the lake side
(changed_buckets -- one changed bucket of a 100 TB table reads one
bucket), the staging load is executor-parallel spark.write.jdbc, and the
target-side apply is one set-based MERGE/upsert statement -- no per-row
driver round trips anywhere.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from stratum_spark.lake.table import LakeTable
from stratum_spark.sources.jdbc import detect_dialect, jdbc_staged_upsert


def _connect(spark: SparkSession, url: str, props: dict):
    jvm = spark._jvm
    conn_props = jvm.java.util.Properties()
    for k, v in props.items():
        if k.lower() != "driver":
            conn_props.setProperty(k, v)
    return jvm.java.sql.DriverManager.getConnection(url, conn_props)


def _read_bookmark(spark, url: str, props: dict, bk_table: str, job_id: str):
    """Fetch the target-side sync bookmark; create the bookmark table on
    first contact. Driver-side JDBC -- a one-row read, no Spark job."""
    conn = _connect(spark, url, props)
    try:
        st = conn.createStatement()
        try:
            st.executeUpdate(
                f"CREATE TABLE {bk_table} "
                "(job_id VARCHAR(64), synced_version BIGINT)"
            )
        except Exception:
            pass  # already exists
        rs = st.executeQuery(
            f"SELECT synced_version FROM {bk_table} WHERE job_id = '{job_id}'"
        )
        v = int(rs.getLong(1)) if rs.next() else None
        rs.close()
        return v
    finally:
        conn.close()


def _sql_type(dt, stage_string_len: int) -> str:
    """Spark type -> portable SQL column type for outward schema adds.
    Arrays were already stringified upstream, so only scalar lake types
    arrive here."""
    s = dt.simpleString()
    if s.startswith("decimal"):
        return s.upper()
    return {
        "string": f"VARCHAR({stage_string_len})",
        "int": "INT", "bigint": "BIGINT", "smallint": "SMALLINT",
        "double": "DOUBLE", "float": "REAL", "boolean": "BOOLEAN",
        "timestamp": "TIMESTAMP", "date": "DATE", "binary": "BLOB",
    }.get(s, f"VARCHAR({stage_string_len})")


def _ensure_target_columns(
    spark, url: str, props: dict, target_table: str, df: DataFrame,
    dialect: str, stage_string_len: int,
) -> list[str]:
    """Outward schema evolution (the reference's three-phase schema
    execution pointed at the DESTINATION database): lake columns the
    target lacks are added as nullable ALTER TABLE ADD COLUMN before the
    upsert, matching the lake side's metadata-only add_column. Renames
    and widens are NOT propagated (destructive on a shared target); a
    lake rename surfaces as an add of the new name. Driver-side JDBC
    metadata probe + DDL, no Spark jobs."""
    conn = _connect(spark, url, props)
    try:
        md = conn.getMetaData()
        have: set[str] = set()
        # schema-qualified targets (sc.tgt): the JDBC metadata API takes
        # schema and table separately -- a dotted table-name pattern
        # matches nothing
        *schema_parts, base = target_table.split(".")
        schema = schema_parts[-1] if schema_parts else None
        for sc, name in (
            (schema, base),
            (schema.upper() if schema else None, base.upper()),
        ):
            rs = md.getColumns(None, sc, name, None)
            while rs.next():
                have.add(rs.getString("COLUMN_NAME"))
            rs.close()
            if have:
                break
        if not have:
            raise ValueError(
                f"target table {target_table!r} does not exist at {url}; "
                "create it with the merge key as PRIMARY KEY/unique first"
            )
        have_l = {c.lower() for c in have}
        q = "`" if dialect == "mysql" else '"'
        st = conn.createStatement()
        added = []
        for f in df.schema.fields:
            if f.name == "_op" or f.name.lower() in have_l:
                continue
            st.executeUpdate(
                f"ALTER TABLE {target_table} ADD COLUMN "
                f"{q}{f.name}{q} {_sql_type(f.dataType, stage_string_len)}"
            )
            added.append(f.name)
        return added
    finally:
        conn.close()


def sync_to_jdbc(
    spark: SparkSession,
    table: LakeTable,
    url: str,
    target_table: str,
    job_id: str = "sync",
    properties: dict | None = None,
    dialect: str | None = None,
    allow_full_resync: bool = True,
    batch_size: int = 10_000,
    stage_string_len: int = 4096,
    evolve_target: bool = True,
    transform=None,
) -> dict:
    """Propagate `table`'s state to `target_table` in the database at
    `url`, incrementally from the target's own bookmark.

    Modes (reported in the result dict):
      * 'noop'         -- bookmark already at the current snapshot.
      * 'incremental'  -- read_changes(bookmark, now): net diff applied
                          as deletes + upserts.
      * 'full'         -- first contact (no bookmark): the full image
                          upserts, and target rows absent from it are
                          deleted, so the sync converges from ANY
                          pre-existing target state.
      * 'full_resync'  -- the bookmark's snapshot has been expired from
                          lake history; same convergent full pass
                          (refused when allow_full_resync=False).

    Array columns are stringified with to_json at the boundary (JDBC has
    no portable array type); everything else ships as-is. The target
    table must exist with `key` unique/PK per jdbc_staged_upsert's
    dialect notes. The bookmark commits in the SAME transaction as the
    applied rows."""
    # job_id and target_table are interpolated into SQL text (bookmark
    # upserts, DDL); constrain them to identifier-ish charsets so a
    # config typo cannot smuggle statement syntax into the target
    if not re.fullmatch(r"[A-Za-z0-9_.:\-]+", job_id):
        raise ValueError(f"job_id {job_id!r} must be [A-Za-z0-9_.:-]+")
    if not re.fullmatch(r"[A-Za-z0-9_.]+", target_table):
        raise ValueError(f"target_table {target_table!r} must be [A-Za-z0-9_.]+")
    snap = table.snapshot()
    key = snap.key
    if key is None:
        raise ValueError("sync_to_jdbc requires a keyed lake table")
    dialect = dialect or detect_dialect(url)
    props = dict(properties or {})
    bk_table = f"{target_table}_sync"
    from_v = _read_bookmark(spark, url, props, bk_table, job_id)
    to_v = snap.version
    if from_v == to_v:
        return {"mode": "noop", "applied": 0,
                "from_version": from_v, "to_version": to_v}

    df: DataFrame | None = None
    mode = "incremental"
    if from_v is not None:
        try:
            ch = table.read_changes(from_v, to_v)
            df = ch.withColumn(
                "_op",
                F.when(F.col("_change_type") == "delete", F.lit("D"))
                .otherwise(F.lit("U")),
            ).drop("_change_type")
        except FileNotFoundError:
            if not allow_full_resync:
                raise ValueError(
                    f"bookmark v{from_v} expired from {table.root} history; "
                    "pass allow_full_resync=True for a convergent full pass"
                )
            df = None
    if df is None:
        mode = "full" if from_v is None else "full_resync"
        df = table.read(version=to_v).withColumn("_op", F.lit("U"))

    if transform is not None:
        # caller-supplied egress mapping (e.g. CdcApplier unpacks its
        # internal packed-binary token format back to arrays so the
        # database receives the user-facing representation). Must be a
        # column-wise projection: the diff/bookmark semantics are
        # computed BEFORE it runs.
        df = transform(df)
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            df = df.withColumn(f.name, F.to_json(f.name))

    from pyspark.sql.types import StringType

    if not any(k.lower() == "createtablecolumntypes" for k in props):
        # Spark's JDBC writer maps StringType to the dialect's unbounded
        # text type (CLOB on Derby), which Derby refuses to compare in
        # the MERGE ON clause and chokes on (XSDA8) when assigning into a
        # VARCHAR target column -- pin every staged string column to
        # VARCHAR (key tight at 255 for the join; the rest at
        # stage_string_len, sized for stringified token arrays). Callers
        # with wider values pass their own createTableColumnTypes.
        parts = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StringType):
                n = 255 if f.name == key else stage_string_len
                parts.append(f"{f.name} VARCHAR({n})")
        if parts:
            props["createTableColumnTypes"] = ", ".join(parts)

    added_cols = _ensure_target_columns(
        spark, url, props, target_table, df, dialect, stage_string_len
    ) if evolve_target else []

    q = "`" if dialect == "mysql" else '"'
    staging = f"{target_table}_stg_{uuid.uuid4().hex[:8]}"
    extra = [
        f"DELETE FROM {bk_table} WHERE job_id = '{job_id}'",
        f"INSERT INTO {bk_table} VALUES ('{job_id}', {int(to_v)})",
    ]
    if mode != "incremental":
        # converge deletions on full passes: target rows whose key is
        # absent from the staged full image go away in the same txn.
        # NOT EXISTS, not NOT IN: NOT IN evaluates to UNKNOWN (deleting
        # nothing) if the staging subquery ever yields a NULL key, and
        # databases plan the correlated anti-join form better on large
        # targets (lake merge keys are non-null today, so this is
        # hardening + planning, not a behavior change). The staging side
        # gets an explicit alias (aliasing a plain FROM entry is
        # universal; Derby does NOT expose the bare name of a
        # schema-qualified entry as its correlation name, and aliasing
        # the DELETE target is MySQL>=8.0.16-only -- so the target
        # column is qualified by the table name exactly as written,
        # which every supported dialect accepts for its legal name
        # shapes including sc.tgt).
        extra.insert(0, (
            f"DELETE FROM {target_table} WHERE NOT EXISTS "
            f"(SELECT 1 FROM {staging} stg_anti WHERE "
            f"stg_anti.{q}{key}{q} = {target_table}.{q}{key}{q})"
        ))
    n = jdbc_staged_upsert(
        spark, url, df, target_table, key, op_col="_op", staging=staging,
        properties=props, batch_size=batch_size, dialect=dialect,
        extra_txn_sql=extra,
    )
    return {"mode": mode, "applied": n, "added_columns": added_cols,
            "from_version": from_v, "to_version": to_v}


def target_status(
    spark: SparkSession,
    table: LakeTable,
    url: str,
    target_table: str,
    properties: dict | None = None,
    transform=None,
) -> DataFrame:
    """Per-key verification frame for a sync-out target: columns
    (k, status) where status is ok | missing_in_target | extra_in_target
    | differs. Both sides are canonicalized identically (the sync's own
    egress mapping: optional transform, arrays stringified, values cast
    to the lake schema) and compared by the canonical row hash via a
    full outer join on the merge key -- one shuffle, no driver-side row
    loops, scales to the table."""
    from stratum_spark.verify.hashing import canonical_hash_col

    snap = table.snapshot()
    key = snap.key
    if key is None:
        raise ValueError("target_status requires a keyed lake table")
    props = dict(properties or {})

    lake = table.read(version=snap.version)
    if transform is not None:
        lake = transform(lake)
    for f in lake.schema.fields:
        if isinstance(f.dataType, ArrayType):
            lake = lake.withColumn(f.name, F.to_json(f.name))
    cols = lake.columns

    tgt = spark.read.jdbc(url, target_table, properties=props).select(*cols)
    for f in lake.schema.fields:
        tgt = tgt.withColumn(f.name, F.col(f.name).cast(f.dataType))

    lh = lake.select(F.col(key).alias("k"),
                     canonical_hash_col(lake, cols).alias("lh"))
    th = tgt.select(F.col(key).alias("k"),
                    canonical_hash_col(tgt, cols).alias("th"))
    return lh.join(th, "k", "full_outer").select(
        "k",
        F.when(F.col("lh").isNull(), "extra_in_target")
        .when(F.col("th").isNull(), "missing_in_target")
        .when(F.col("lh") != F.col("th"), "differs")
        .otherwise("ok").alias("status"),
    )


def verify_target(
    spark: SparkSession,
    table: LakeTable,
    url: str,
    target_table: str,
    properties: dict | None = None,
    transform=None,
    sample: int = 10,
) -> dict:
    """Verify the JDBC target against the lake table, per key -- the
    reference's source-vs-destination verification
    (crates/engine-processing/src/validation) pointed at the sync-out
    direction. Returns match/missing/extra/differing counts plus a
    bounded sample of divergent keys; the per-key frame itself comes
    from target_status."""
    j = target_status(spark, table, url, target_table,
                      properties=properties, transform=transform)
    # persist: the counts aggregate and the divergent sample are two
    # actions over the same frame -- left lazy, the second one re-reads
    # the entire JDBC target and re-scans/re-hashes the lake table
    # (doubling cost on exactly the large tables this is built for)
    j = j.persist()
    try:
        agg = {r["status"]: r["n"] for r in
               j.groupBy("status").agg(F.count("*").alias("n")).collect()}
        bad = j.where(F.col("status") != "ok")
        out = {
            "match": not agg.keys() - {"ok"},
            "ok": agg.get("ok", 0),
            "missing_in_target": agg.get("missing_in_target", 0),
            "extra_in_target": agg.get("extra_in_target", 0),
            "differs": agg.get("differs", 0),
            "divergent_sample": [
                (r["k"], r["status"]) for r in bad.limit(sample).collect()
            ],
        }
    finally:
        j.unpersist()
    return out
