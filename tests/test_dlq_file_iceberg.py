"""DLQ file target + Iceberg-binding availability behavior."""

from __future__ import annotations

import glob
import json

import pytest

from stratum_spark.cdc.dlq_file import write_dlq_file
from stratum_spark.lake.iceberg_binding import IcebergTable, IcebergUnavailable, iceberg_available


def test_dlq_jsonl_roundtrip(spark, tmp_path):
    bad = spark.createDataFrame(
        [(5, "doc-1", "n_tok_mismatch", "boom")],
        "lsn bigint, doc_id string, rule string, message string",
    )
    n = write_dlq_file(bad, str(tmp_path / "dlq"), fmt="jsonl")
    assert n == 1
    lines = []
    for f in glob.glob(str(tmp_path / "dlq" / "*" / "part-*")):
        lines += [json.loads(line) for line in open(f) if line.strip()]
    assert lines[0]["doc_id"] == "doc-1" and lines[0]["rule"] == "n_tok_mismatch"
    # empty append writes nothing
    assert write_dlq_file(bad.limit(0), str(tmp_path / "dlq"), fmt="jsonl") == 0


def test_dlq_csv(spark, tmp_path):
    bad = spark.createDataFrame([(1, "x")], "lsn bigint, doc_id string")
    assert write_dlq_file(bad, str(tmp_path / "dlqc"), fmt="csv") == 1
    with pytest.raises(ValueError):
        write_dlq_file(bad, str(tmp_path / "dlqx"), fmt="xml")


def test_iceberg_binding_unavailable_in_sandbox(spark):
    """No Iceberg jars ship here: the binding must refuse cleanly and point
    at the self-contained lake format."""
    assert iceberg_available(spark) is False
    with pytest.raises(IcebergUnavailable, match="LakeTable"):
        IcebergTable(spark, "lake.tokens", key="doc_id")
