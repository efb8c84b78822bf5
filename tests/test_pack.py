"""Packed token columns (functions/pack.py) + the tokens_packed applier
mode: the internal binary storage format must be invisible at every
user-facing boundary (state(), oracle replay equality, resume)."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog
from stratum_spark.functions.pack import (
    pack_array,
    pack_tokens,
    unpack_array,
    unpack_tokens,
)


def test_pack_array_roundtrip_arrow():
    vals = [[1, 2, 3], None, [], [7], [100000, -5], None, [0]]
    la = pa.array(vals, type=pa.list_(pa.int32()))
    b = pack_array(la)
    assert b.type == pa.binary()
    assert b.to_pylist()[0] == b"\x01\x00\x00\x00\x02\x00\x00\x00\x03\x00\x00\x00"
    assert b.to_pylist()[1] is None and b.to_pylist()[2] == b""
    assert unpack_array(b).to_pylist() == vals
    # sliced input (nonzero offset) takes the normalization path
    s = la.slice(1, 4)
    assert unpack_array(pack_array(s)).to_pylist() == s.to_pylist()


def test_pack_array_type_errors():
    with pytest.raises(TypeError):
        pack_array(pa.array([1, 2], type=pa.int32()))
    with pytest.raises(TypeError):
        unpack_array(pa.array([[1]], type=pa.list_(pa.int32())))
    # non-4-byte-aligned binary is not token-packed
    with pytest.raises(ValueError):
        unpack_array(pa.array([b"abc"], type=pa.binary()))


def test_pack_tokens_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3], 3), ("b", None, 0), ("c", [], 0), ("d", [7, -5], 2)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    p = pack_tokens(df)
    assert dict(p.dtypes)["tokens"] == "binary"
    # n_tok is recoverable JVM-side from the blob length
    n = {r["doc_id"]: r["n"] for r in
         p.select("doc_id", (F.length("tokens") / 4).cast("int").alias("n")).collect()}
    assert n == {"a": 3, "b": None, "c": 0, "d": 2}
    u = unpack_tokens(p)
    assert dict(u.dtypes)["tokens"] == "array<int>"
    assert sorted(map(tuple, u.collect())) == sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("write_mode", ["mor", "cow"])
def test_packed_applier_state_matches_unpacked(spark, tmp_path, write_mode):
    """tokens_packed=True must be end-to-end invisible: same binlog, same
    final state (per-row token arrays), through schema evolution and (mor)
    compaction -- only the physical column type differs."""
    n_docs, n_events, epoch = 150, 1200, 300
    feed = generate_binlog(spark, n_docs=n_docs, n_events=n_events, seed=9,
                           max_tokens=24)
    write_binlog(feed, str(tmp_path / "b"), n_chunks=3)

    def run(packed: bool):
        wh = str(tmp_path / f"wh_{write_mode}_{int(packed)}")
        ap = CdcApplier(spark, wh, job_id="t", n_buckets=8,
                        n_events_hint=n_events, write_mode=write_mode,
                        tokens_packed=packed)
        ap.run_backfill(str(tmp_path / "b"), epoch_size=epoch)
        if write_mode == "mor":
            ap.compact_deltas()
        return ap

    ap_u, ap_p = run(False), run(True)
    assert ap_p.tokens.snapshot().schema.field_by_name("tokens").type == "binary"
    assert ap_u.tokens.snapshot().schema.field_by_name("tokens").type == "array<int>"
    want = {r["doc_id"]: r.asDict() for r in ap_u.state().collect()}
    got = {r["doc_id"]: r.asDict() for r in ap_p.state().collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


def test_packed_applier_resume_adopts_table_format(spark, tmp_path):
    """An existing table's physical schema wins over env/param: a resume
    with the opposite tokens_packed setting must keep the stored format
    and still converge."""
    feed = generate_binlog(spark, n_docs=80, n_events=600, seed=4,
                           max_tokens=16, with_evolution=False)
    write_binlog(feed, str(tmp_path / "b"), n_chunks=2)
    wh = str(tmp_path / "wh")
    ap1 = CdcApplier(spark, wh, job_id="t", n_buckets=4, evolution=[],
                     write_mode="mor", tokens_packed=True)
    ap1.run_backfill(str(tmp_path / "b"), epoch_size=200, stop_after=1)
    # resume asks for unpacked; the table is packed -> adopted
    ap2 = CdcApplier(spark, wh, job_id="t", n_buckets=4, evolution=[],
                     write_mode="mor", tokens_packed=False)
    assert ap2.tokens_packed is True
    ap2.run_backfill(str(tmp_path / "b"), epoch_size=200)

    ref = CdcApplier(spark, str(tmp_path / "ref"), job_id="t", n_buckets=4,
                     evolution=[], write_mode="mor", tokens_packed=False)
    ref.run_backfill(str(tmp_path / "b"), epoch_size=200)
    want = {r["doc_id"]: r["tokens"] for r in ref.state().collect()}
    got = {r["doc_id"]: r["tokens"] for r in ap2.state().collect()}
    assert got == want


def test_pack_roundtrip_property():
    """Property: pack(unpack-able input) round-trips to identity for
    arbitrary list<int32> shapes -- nulls, empties, negative/extreme
    values, and SLICED arrays (nonzero Arrow offset, the path
    _normalized pays a copy for)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stratum_spark.functions.pack import pack_array, unpack_array

    rows = st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=-(2**31), max_value=2**31 - 1),
                max_size=40,
            ),
        ),
        max_size=60,
    )

    @settings(max_examples=200, deadline=None)
    @given(rows=rows, cut=st.integers(min_value=0, max_value=10))
    def prop(rows, cut):
        import pyarrow as pa

        arr = pa.array(rows, type=pa.list_(pa.int32()))
        if cut and cut < len(arr):
            arr = arr.slice(cut)  # nonzero offset path
        back = unpack_array(pack_array(arr))
        assert back.to_pylist() == arr.to_pylist()

    prop()
