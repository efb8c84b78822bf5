"""Expression-language semantics (reference eval/binary.rs + runtime.rs)."""

from __future__ import annotations

import pytest

from stratum_spark.functions import Bin, Call, Ident, IsNull, Lit, Un, When, compile_expr


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, 7, 2, "a", None),
            (2, -7, 2, "b", "x"),
            (3, 7, -2, None, "y"),
            (4, None, 2, "a", None),
        ],
        "id int, a int, b int, s string, t string",
    )


def evl(df, e):
    return [r["r"] for r in df.select(compile_expr(e, df).alias("r")).orderBy("id").collect()]


def test_int_division_truncates(spark, df):
    # Rust i64 semantics: 7/2=3, -7/2=-3, 7/-2=-3 (eval/binary.rs:88-96)
    assert evl(df, Bin("/", Ident("a"), Ident("b"))) == [3, -3, -3, None]


def test_float_division_stays_fractional(spark, df):
    got = evl(df, Bin("/", Bin("*", Ident("a"), Lit(1.0)), Ident("b")))
    assert got[0] == 3.5


def test_null_safe_equality(spark, df):
    # NULL == NULL -> TRUE, NULL == x -> FALSE (eval/binary.rs:225-239)
    assert evl(df, Bin("==", Ident("s"), Ident("t"))) == [False, False, False, False]
    got = evl(df, Bin("==", Ident("a"), Ident("a")))
    assert got == [True, True, True, True]  # row 4: NULL == NULL -> TRUE
    got_ne = evl(df, Bin("!=", Ident("s"), Ident("t")))
    assert got_ne == [True, True, True, True]


def test_string_plus_concatenates(spark, df):
    got = evl(df, Bin("+", Ident("s"), Lit("!")))
    assert got[0] == "a!" and got[2] is None


def test_when_first_match_wins(spark, df):
    e = When(
        branches=(
            (Bin(">", Ident("a"), Lit(0)), Lit("pos")),
            (Bin("<", Ident("a"), Lit(0)), Lit("neg")),
        ),
        default=Lit("other"),
    )
    assert evl(df, e) == ["pos", "neg", "pos", "other"]


def test_unary_not_negate_work(spark, df):
    # the reference stubs these (runtime.rs:101-105); we implement them
    assert evl(df, Un("not", Bin(">", Ident("a"), Lit(0)))) == [False, True, False, None]
    assert evl(df, Un("-", Ident("b"))) == [-2, -2, 2, -2]


def test_functions_documented_set(spark, df):
    assert evl(df, Call("concat", (Ident("s"), Lit("-"), Ident("t")))) == [
        "a-",
        "b-x",
        "-y",
        "a-",
    ]
    assert evl(df, Call("upper", (Ident("s"),)))[0] == "A"
    assert evl(df, Call("coalesce", (Ident("t"), Lit("z"))))[0] == "z"
    assert evl(df, Call("trim", (Lit("  pad  "),)))[0] == "pad"
    assert evl(df, Bin("matches", Ident("s"), Lit("^[ab]$"))) == [True, True, None, True]


def test_env_function(spark, df, monkeypatch):
    monkeypatch.setenv("STRATUM_TEST_ENV", "hello")
    assert evl(df, Call("env", (Lit("STRATUM_TEST_ENV"),)))[0] == "hello"
    assert evl(df, Call("env", (Lit("STRATUM_MISSING"), Lit("dflt"))))[0] == "dflt"
    with pytest.raises(KeyError):
        compile_expr(Call("env", (Lit("STRATUM_MISSING"),)), df)


def test_is_null(spark, df):
    assert evl(df, IsNull(Ident("t"))) == [True, False, False, True]


def test_modulo_sign(spark, df):
    assert evl(df, Bin("%", Ident("a"), Ident("b"))) == [1, -1, 1, None]


def test_decimal_arithmetic_exact(spark):
    """Exact decimal semantics through the expression layer (the reference
    evaluates money math in BigDecimal, eval/binary.rs:160-194): 0.1 + 0.2
    equals 0.3 EXACTLY in DecimalType where IEEE doubles would not, and
    products keep exact scale."""
    from pyspark.sql import functions as F

    from stratum_spark.functions.expr import Bin, Ident, Lit, compile_expr

    df = spark.createDataFrame(
        [("0.1", "0.2", "19.99", "3")], "a string, b string, price string, qty string"
    ).select(
        F.col("a").cast("decimal(10,4)").alias("a"),
        F.col("b").cast("decimal(10,4)").alias("b"),
        F.col("price").cast("decimal(10,2)").alias("price"),
        F.col("qty").cast("decimal(10,0)").alias("qty"),
    )
    out = df.select(
        compile_expr(Bin("+", Ident("a"), Ident("b")), df).alias("s"),
        compile_expr(Bin("*", Ident("price"), Ident("qty")), df).alias("p"),
        compile_expr(Bin("==", Bin("+", Ident("a"), Ident("b")), Lit(0.3)), df).alias("eq"),
    ).first()
    from decimal import Decimal

    assert out["s"] == Decimal("0.3000")
    assert out["p"] == Decimal("59.97")
    assert out["eq"] is True
    # the float contrast: the same sum in doubles is NOT 0.3
    assert 0.1 + 0.2 != 0.3


def test_float_eq_epsilon_opt_in(spark, monkeypatch):
    """Reference float comparison (eval/binary.rs:147-148) as opt-in:
    |a-b| < eps, null-safe contract preserved; default stays plain IEEE."""
    from stratum_spark.functions import Bin, Ident
    from stratum_spark.functions.expr import compile_expr

    df = spark.createDataFrame(
        [(0.1 + 0.2, 0.3), (1.0, 2.0), (None, None), (None, 1.0)],
        "a double, b double",
    )
    e = Bin("==", Ident("a"), Ident("b"))
    plain = [r["x"] for r in df.select(compile_expr(e, df).alias("x")).collect()]
    assert plain == [False, False, True, False]  # IEEE: 0.1+0.2 != 0.3
    monkeypatch.setenv("STRATUM_FLOAT_EQ_EPSILON", "1e-9")
    eps = [r["x"] for r in df.select(compile_expr(e, df).alias("x")).collect()]
    assert eps == [True, False, True, False]
    ne = Bin("!=", Ident("a"), Ident("b"))
    got_ne = [r["x"] for r in df.select(compile_expr(ne, df).alias("x")).collect()]
    assert got_ne == [False, True, False, True]
    # non-float operands keep exact null-safe equality under the env var
    sdf = spark.createDataFrame([("x", "x"), ("x", "y")], "a string, b string")
    got_s = [r["x"] for r in sdf.select(compile_expr(Bin("==", Ident("a"), Ident("b")), sdf).alias("x")).collect()]
    assert got_s == [True, False]
