"""Seeded randomized merge semantics fuzz: arbitrary I/U/D sequences applied
epoch-wise through LakeTable.merge must equal a trivial dict replay.
(Deterministic seeds rather than hypothesis shrinking -- each example costs
Spark jobs, and failures replay exactly by seed.)"""

from __future__ import annotations

import random

import pytest

from stratum_spark.cdc.dedup import lww_dedup
from stratum_spark.lake import LakeTable

DDL = "k string, v int, lsn bigint"


def model_replay(events):
    state = {}
    for lsn, op, k, v in sorted(events):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (v, lsn)
    return state


@pytest.mark.parametrize("seed", [11, 23, 59])
def test_merge_fuzz_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(12)]
    events = []
    lsn = 0
    for _ in range(300):
        lsn += 1
        op = rng.choices(["I", "U", "D"], weights=[2, 5, 2])[0]
        events.append((lsn, op, rng.choice(keys), rng.randrange(1000)))

    t = LakeTable.create(spark, str(tmp_path / f"t{seed}"), DDL, key="k", n_buckets=4)
    # apply in 5 epochs of 60 events, LWW dedup within each epoch
    for ep in range(5):
        chunk = events[ep * 60 : (ep + 1) * 60]
        df = spark.createDataFrame(
            [(k, v, lsn_) for (lsn_, op, k, v) in chunk],
            DDL,
        ).join(
            spark.createDataFrame(
                [(lsn_, op) for (lsn_, op, _, _) in chunk], "lsn bigint, op string"
            ),
            "lsn",
        )
        deduped = lww_dedup(df, key="k", order_col="lsn")
        t.merge(deduped, op_col="op", job_id="fuzz", epoch=ep, precedence_col="lsn")

    want = model_replay(events)
    got = {r["k"]: (r["v"], r["lsn"]) for r in t.read().collect()}
    assert got == want, f"seed={seed}"
    # replaying every epoch again changes nothing (exactly-once)
    for ep in range(5):
        st = t.merge(
            spark.createDataFrame([("k0", 1, 9999)], DDL),
            op_col=None,
            job_id="fuzz",
            epoch=ep,
        )
        assert st.epoch_skipped
    assert {r["k"]: (r["v"], r["lsn"]) for r in t.read().collect()} == want
