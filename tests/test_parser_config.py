"""Expression text parser + config front-end tests (the smql-syntax analog:
grammar precedence, literals, when-blocks, dot-paths, function calls)."""

from __future__ import annotations

import pytest

from stratum_spark.functions import Bin, Call, DotPath, Ident, IsNull, Lit, Un, When, compile_expr
from stratum_spark.functions.parser import ParseError, parse_expr
from stratum_spark.lake import LakeTable
from stratum_spark.plans import Catalog, run_pipeline
from stratum_spark.plans.config import pipeline_from_dict


def test_precedence():
    e = parse_expr("a + b * c == d and e or not f")
    # ((((a + (b*c)) == d) and e) or (not f))
    assert isinstance(e, Bin) and e.op == "or"
    assert isinstance(e.right, Un) and e.right.op == "not"
    left = e.left
    assert isinstance(left, Bin) and left.op == "and"
    eq = left.left
    assert isinstance(eq, Bin) and eq.op == "=="
    add = eq.left
    assert isinstance(add, Bin) and add.op == "+" and isinstance(add.right, Bin)
    assert add.right.op == "*"


def test_literals_and_calls():
    assert parse_expr("42") == Lit(42)
    assert parse_expr("4.5") == Lit(4.5)
    assert parse_expr("'it\\'s'") == Lit("it's")
    assert parse_expr("true") == Lit(True)
    assert parse_expr("null") == Lit(None)
    e = parse_expr("concat(upper(name), '-', t.col)")
    assert e == Call("concat", (Call("upper", (Ident("name"),)), Lit("-"), DotPath("t", "col")))


def test_when_block_and_is_null():
    e = parse_expr("when { x > 2 then 'big' x > 1 then 'mid' else 'small' }")
    assert isinstance(e, When) and len(e.branches) == 2 and e.default == Lit("small")
    assert parse_expr("x is null") == IsNull(Ident("x"))
    assert parse_expr("x is not null").__class__.__name__ == "IsNotNull"


def test_matches_operator():
    e = parse_expr("name matches '^a.*'")
    assert isinstance(e, Bin) and e.op == "matches"


def test_parse_errors():
    with pytest.raises(ParseError):
        parse_expr("a +")
    with pytest.raises(ParseError):
        parse_expr("when { }")
    with pytest.raises(ParseError):
        parse_expr("a ; b")


def test_parsed_expr_compiles_and_runs(spark):
    df = spark.createDataFrame([(1, "x", None), (5, "y", "z")], "a int, s string, t string")
    e = parse_expr("when { a > 2 and t is not null then upper(s) else 'nope' }")
    got = [r[0] for r in df.select(compile_expr(e, df)).collect()]
    assert got == ["nope", "Y"]


def test_config_pipeline_end_to_end(spark, sf_dir, tmp_path):
    cfg = {
        "name": "flat",
        "source": "orders",
        "destination": "dst",
        "filter": "o_totalprice > 100000.0 and o_orderstatus == 'F'",
        "joins": [
            {"alias": "c", "table": "customer", "on": [["o_custkey", "c_custkey"]]}
        ],
        "mappings": [
            ["order_id", "o_orderkey"],
            ["customer_name", "c.c_name"],
            ["tier", "when { o_totalprice > 200000.0 then 'high' else 'low' }"],
        ],
        "copy_columns": "MAP_ONLY",
        "validations": [{"name": "has_name", "check": "customer_name is not null", "action": "skip"}],
        "write_mode": "upsert",
        "key": "order_id",
    }
    spec = pipeline_from_dict(cfg)
    cat = Catalog(
        spark,
        {n: f"{sf_dir}/{n}.parquet" for n in ["orders", "customer"]},
    )
    wh = {
        "dst": LakeTable.create(
            spark, str(tmp_path / "dst"),
            "order_id bigint, customer_name string, tier string",
            key="order_id", n_buckets=4,
        )
    }
    res = run_pipeline(spec, cat, wh)
    assert res.error is None and res.rows_written > 0
    out = wh["dst"].read()
    assert set(out.columns) == {"order_id", "customer_name", "tier"}
    assert out.where("tier = 'high'").count() > 0
