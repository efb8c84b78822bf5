"""Sources (CSV typed read, type mapping) + retry/circuit-breaker tests."""

from __future__ import annotations

import pytest

from stratum_spark.cdc.dedup import lww_dedup, lww_dedup_salted
from stratum_spark.cdc.retry import CircuitBreaker, CircuitOpen, with_retry
from stratum_spark.sources import mysql_type_to_spark, pg_type_to_spark, read_csv_typed


def test_csv_typed_with_corrupt_rows(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text(
        "id,name,balance\n"
        "1,alice,10.5\n"
        "2,bob,20.25\n"
        "oops,charlie,not_a_number\n"
        "4,dora,\n"
    )
    good, bad = read_csv_typed(spark, str(p), "id int, name string, balance double")
    rows = {r["id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["balance"] == 10.5 and rows[4]["balance"] is None
    assert bad.count() == 1 and "charlie" in bad.first()["line"]


def test_mysql_type_mapping():
    assert mysql_type_to_spark("TINYINT(1)") == ("boolean", [])
    assert mysql_type_to_spark("tinyint(4)")[0] == "tinyint"
    assert mysql_type_to_spark("INT UNSIGNED")[0] == "bigint"
    t, w = mysql_type_to_spark("BIGINT UNSIGNED")
    assert t == "decimal(20,0)" and w
    assert mysql_type_to_spark("enum('a','b')")[0] == "string"
    assert mysql_type_to_spark("set('x','y')")[0] == "array<string>"
    assert mysql_type_to_spark("DECIMAL(12,3)")[0] == "decimal(12,3)"
    assert mysql_type_to_spark("datetime")[0] == "timestamp"
    t, w = mysql_type_to_spark("frobnicator")
    assert t == "string" and w


def test_pg_type_mapping():
    assert pg_type_to_spark("integer")[0] == "int"
    assert pg_type_to_spark("numeric(10,2)")[0] == "decimal(10,2)"
    assert pg_type_to_spark("text[]")[0] == "array<string>"
    assert pg_type_to_spark("timestamptz")[0] == "timestamp"
    assert pg_type_to_spark("uuid")[0] == "string"
    assert pg_type_to_spark("bigserial")[0] == "bigint"


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_retry(flaky, attempts=4, base_backoff_s=0.0) == "ok"
    assert calls["n"] == 3


def test_circuit_breaker_opens_and_recovers():
    sleeps: list[float] = []
    cb = CircuitBreaker(failure_threshold=2, base_backoff_s=0.01, sleep=sleeps.append)

    def always_fail():
        raise RuntimeError("down")

    with pytest.raises(RuntimeError):
        with_retry(always_fail, attempts=2, base_backoff_s=0.0, breaker=cb)
    # threshold reached -> circuit open
    with pytest.raises(CircuitOpen):
        with_retry(always_fail, attempts=1, breaker=cb)
    # after the window passes, the breaker admits traffic again
    cb.open_until = 0.0
    assert with_retry(lambda: "up", attempts=1, breaker=cb) == "up"
    assert cb.consecutive_failures == 0


def test_salted_dedup_equivalent(spark):
    from stratum_spark.cdc import generate_binlog

    df = generate_binlog(spark, n_docs=30, n_events=600, seed=3, with_evolution=False)
    a = {r["doc_id"]: r["lsn"] for r in lww_dedup(df, "doc_id", "lsn").collect()}
    b = {r["doc_id"]: r["lsn"] for r in lww_dedup_salted(df, "doc_id", "lsn", n_salts=8).collect()}
    assert a == b
