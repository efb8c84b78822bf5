"""smql config-text parser: parses the REFERENCE's own example configs and
executes an adapted config end-to-end on the testdata."""

from __future__ import annotations

import os

import pytest

from stratum_spark.functions.expr import When
from stratum_spark.lake import LakeTable
from stratum_spark.plans import Catalog, run_dag
from stratum_spark.plans.smql import parse_smql

REF = "/root/reference/examples/configs"


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("MYSQL_URL", "mysql://example")
    monkeypatch.setenv("POSTGRES_URL", "postgres://example")


def _read(name: str) -> str:
    return open(os.path.join(REF, name)).read()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference examples not present")
def test_parse_reference_when_config():
    doc = parse_smql(_read("when.smql"))
    assert doc.defines["mysql_url"] == "mysql://example"
    assert doc.connections["src"]["driver"] == "mysql"
    [p] = doc.pipelines
    assert p.name == "classify_films" and p.source == "film" and p.destination == "film_catalog"
    m = dict(p.mappings)
    assert isinstance(m["price_tier"], When) and len(m["price_tier"].branches) == 2
    assert isinstance(m["length_label"], When)
    assert doc.settings["classify_films"]["batch_size"] == 1000


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference examples not present")
def test_parse_reference_validation_config():
    doc = parse_smql(_read("validation.smql"))
    names = {p.name for p in doc.pipelines}
    assert "migrate_payments_clean" in names
    clean = next(p for p in doc.pipelines if p.name == "migrate_payments_clean")
    assert [v.action for v in clean.validations] == ["skip", "skip"]
    assert {v.name for v in clean.validations} == {"positive_amount", "reasonable_amount"}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference examples not present")
def test_parse_reference_dag_config():
    doc = parse_smql(_read("dag.smql"))
    by_name = {p.name: p for p in doc.pipelines}
    assert by_name["migrate_film"].after == ("migrate_language",)
    roots = [p for p in doc.pipelines if not p.after]
    assert len(roots) >= 2  # parallel level 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference examples not present")
def test_parse_reference_dlq_config():
    doc = parse_smql(_read("dlq.smql"))
    assert any(t for t in doc.dlq_tables.values())


def test_execute_adapted_smql_on_testdata(spark, sf_dir, tmp_path):
    text = """
    define { tier_cut = env("SMQL_TIER_CUT") }

    connection "src" { driver = "parquet" url = "testdata" }
    connection "dst" { driver = "lake"    url = "warehouse" }

    pipeline "orders_flat" {
        from { connection = connection.src  table = "orders" }
        to   { connection = connection.dst  table = "orders_flat" }

        with {
            c from customer where c.c_custkey == orders.o_custkey
        }

        where "paid_enough" {
            orders.o_totalprice > 100000.0
        }

        select {
            order_id   = orders.o_orderkey
            customer   = c.c_name
            total      = orders.o_totalprice
            tier       = when {
                orders.o_totalprice >= 300000.0 then "premium"
                orders.o_totalprice >= 200000.0 then "standard"
                else "budget"
            }
        }

        validate {
            assert "has_customer" {
                check   = customer is not null
                message = "order without customer"
                action  = skip
            }
        }

        settings {
            copy_columns = "MAP_ONLY"
            write_mode   = "upsert"
            key          = "order_id"
        }
    }
    """
    os.environ["SMQL_TIER_CUT"] = "300000"
    doc = parse_smql(text)
    [spec] = doc.pipelines
    assert spec.copy_columns == "MAP_ONLY" and spec.write_mode == "upsert"

    cat = Catalog(spark, {n: f"{sf_dir}/{n}.parquet" for n in ["orders", "customer"]})
    wh = {
        "orders_flat": LakeTable.create(
            spark, str(tmp_path / "of"),
            "order_id bigint, customer string, total double, tier string",
            key="order_id", n_buckets=4,
        )
    }
    res = run_dag([spec], cat, wh)["orders_flat"]
    assert res.error is None and res.rows_written > 0
    out = wh["orders_flat"].read()
    assert out.where("total <= 100000.0").count() == 0
    tiers = {r["tier"] for r in out.select("tier").distinct().collect()}
    assert "premium" in tiers and "budget" in tiers


def test_lifecycle_hooks_execute_around_pipeline(spark, sf_dir, tmp_path):
    """Ports the reference's before/after-hook scenario (migrate_staff_with_
    hooks, examples/configs/plan-generation.smql:556-586; executed by
    orchestrator.rs:76-93): before-hook SQL runs ahead of the data phase,
    after-hook SQL runs once the write committed and sees the destination's
    post-write state."""
    from stratum_spark.plans.smql import run_document

    text = """
    pipeline "orders_hooked" {
        from { connection = connection.src  table = "orders" }
        to   { connection = connection.dst  table = "orders_out" }

        before {
            sql = [
                "CREATE OR REPLACE TEMP VIEW hook_before AS SELECT count(*) AS n FROM orders"
            ]
        }

        after {
            sql = [
                "CREATE OR REPLACE TEMP VIEW hook_after AS SELECT count(*) AS n FROM orders_out",
                "CREATE OR REPLACE TEMP VIEW hook_after2 AS SELECT 42 AS marker"
            ]
        }

        where "big" { orders.o_totalprice > 100000.0 }

        select {
            order_id = orders.o_orderkey
            total    = orders.o_totalprice
        }

        settings { copy_columns = "MAP_ONLY" }
    }
    """
    doc = parse_smql(text)
    assert doc.hooks["orders_hooked"]["before"]
    assert len(doc.hooks["orders_hooked"]["after"]) == 2
    cat = Catalog(spark, {"orders": f"{sf_dir}/orders.parquet"})
    wh = {
        "orders_out": LakeTable.create(
            spark, str(tmp_path / "oo"), "order_id bigint, total double"
        )
    }
    res = run_document(doc, cat, wh)["orders_hooked"]
    assert res.error is None
    assert len(res.hooks_run) == 3 and res.hooks_run[0].startswith("before:")
    n_src = spark.sql("SELECT n FROM hook_before").first()["n"]
    n_dst = spark.sql("SELECT n FROM hook_after").first()["n"]
    assert n_src == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert n_dst == res.rows_written > 0  # after-hook saw the post-write state
    assert spark.sql("SELECT marker FROM hook_after2").first()["marker"] == 42


def test_failing_before_hook_blocks_data_phase(spark, sf_dir, tmp_path):
    from stratum_spark.plans.smql import run_document

    text = """
    pipeline "orders_badhook" {
        from { connection = connection.src  table = "orders" }
        to   { connection = connection.dst  table = "orders_out2" }
        before { sql = ["SELECT * FROM this_table_does_not_exist"] }
        select { order_id = orders.o_orderkey }
        settings { copy_columns = "MAP_ONLY" }
    }
    """
    doc = parse_smql(text)
    cat = Catalog(spark, {"orders": f"{sf_dir}/orders.parquet"})
    wh = {
        "orders_out2": LakeTable.create(spark, str(tmp_path / "oo2"), "order_id bigint")
    }
    res = run_document(doc, cat, wh)["orders_badhook"]
    assert res.error is not None
    assert wh["orders_out2"].row_count() == 0  # data phase never ran


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference examples not present")
def test_parse_all_reference_example_configs():
    """Every .smql config the reference ships must parse into runnable
    pipeline specs -- the 'switch engines and run your configs' bar."""
    import glob

    files = sorted(glob.glob(os.path.join(REF, "*.smql")))
    assert len(files) >= 9
    total = 0
    for f in files:
        doc = parse_smql(open(f).read())
        assert doc.pipelines, f
        total += len(doc.pipelines)
    assert total >= 20


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference examples not present")
def test_reference_plan_generation_details():
    doc = parse_smql(_read("plan-generation.smql"))
    assert doc.execution.get("strategy") == "parallel"
    by_name = {p.name: p for p in doc.pipelines}
    joined = next(p for p in doc.pipelines if p.joins)
    assert joined.joins[0].kind == "inner"
    hooks = [h for h in doc.hooks.values() if h.get("before") or h.get("after")]
    assert hooks and any(isinstance(h.get("before", []), list) for h in hooks)
    # defines referenced inside where-clauses substituted as constants
    from stratum_spark.functions.expr import DotPath

    def has_define_ref(e):
        if isinstance(e, DotPath) and e.qualifier == "define":
            return True
        return any(
            has_define_ref(x)
            for x in getattr(e, "__dict__", {}).values()
            if hasattr(x, "__dict__") or isinstance(x, tuple)
        )

    for p in doc.pipelines:
        if p.filter is not None:
            assert not has_define_ref(p.filter), p.name
