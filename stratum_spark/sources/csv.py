"""CSV source with header mapping + typed coercion.

Reimplements the reference's CSV connector semantics
(crates/connectors/src/drivers/csv/source.rs:23-60, types csv/types.rs):
header -> column mapping (case-insensitive), explicit schema coercion,
malformed rows routed to a DLQ column instead of failing the read
(PERMISSIVE + columnNameOfCorruptRecord), and filter pushdown via ordinary
DataFrame predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
    delimiter: str = ",",
    null_value: str = "",
    keep_corrupt: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (good_rows, corrupt_rows). good_rows has the typed schema;
    corrupt_rows carries the raw line for DLQ routing (the reference's
    failed-row path, transform/failed_row_writer.rs)."""
    schema = T.StructType.fromDDL(schema_ddl)
    if keep_corrupt:
        schema = schema.add("_corrupt_record", T.StringType(), True)
    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("nullValue", null_value)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    if not keep_corrupt:
        return df, spark.createDataFrame([], "line string")
    # caching required by Spark before referencing _corrupt_record filters
    df = df.cache()
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("line")
    )
    return good, bad
