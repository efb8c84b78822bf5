"""Relational + training-data-pipeline operators.

Everything is DataFrame-native (Catalyst-optimizable, whole-stage codegen);
Python only appears in Arrow-batched form (mapInPandas) for the multimodal
decode stubs. Each operator has a (spark, sf_dir) query form wired into
__spark_entry__.queries() with a DuckDB oracle where SQL-expressible.
"""

from stratum_spark.operators import dedup, multimodal, similarity, textops  # noqa: F401
