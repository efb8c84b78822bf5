from stratum_spark.sources.csv import read_csv_typed
from stratum_spark.sources.jdbc import jdbc_keyset_reader
from stratum_spark.sources.typemap import mysql_type_to_spark, pg_type_to_spark

__all__ = [
    "read_csv_typed",
    "jdbc_keyset_reader",
    "mysql_type_to_spark",
    "pg_type_to_spark",
]
