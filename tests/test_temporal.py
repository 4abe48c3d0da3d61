"""Temporal operators: as-of join, bucketed range join, sessionize —
each verified against a brute-force reference on randomized small
inputs, plus plan assertions (no nested-loop join in the scale
paths)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyontutils_spark.operators.temporal import (
    asof_join, bucketed_range_join, sessionize)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=int(minutes))


@pytest.fixture(scope="module")
def facts_dims(spark):
    rng = np.random.RandomState(11)
    facts = [(int(i), int(rng.randint(0, 8)), _ts(rng.randint(0, 500)))
             for i in range(120)]
    # dims unique per (key, ts) — asof tie-break contract
    seen = set()
    dims = []
    for i in range(80):
        k, m = int(rng.randint(0, 8)), int(rng.randint(0, 500))
        if (k, m) in seen:
            continue
        seen.add((k, m))
        dims.append((k, _ts(m), f"v{k}-{m}"))
    f = spark.createDataFrame(facts, "fact_id long, key long, ts timestamp")
    d = spark.createDataFrame(dims, "key long, ts timestamp, attr string")
    return f, d, facts, dims


def _brute_asof(facts, dims, tolerance_s=None):
    out = {}
    for fid, k, fts in facts:
        best = None
        for dk, dts, attr in dims:
            if dk == k and dts <= fts:
                if tolerance_s is not None and \
                        (fts - dts).total_seconds() > tolerance_s:
                    continue
                if best is None or dts > best[0]:
                    best = (dts, attr)
        out[fid] = best[1] if best else None
    return out


def test_asof_join_matches_bruteforce(spark, facts_dims):
    f, d, facts, dims = facts_dims
    got = {r.fact_id: r.attr_r
           for r in asof_join(f, d, on="key", ts="ts").collect()}
    assert got == _brute_asof(facts, dims)
    assert any(v is None for v in got.values())   # some keys unmatched
    assert any(v is not None for v in got.values())


def test_asof_join_tolerance_and_equal_ts(spark, facts_dims):
    f, d, facts, dims = facts_dims
    got = {r.fact_id: r.attr_r
           for r in asof_join(f, d, on="key", ts="ts",
                              tolerance_s=3600).collect()}
    assert got == _brute_asof(facts, dims, tolerance_s=3600)
    # a dim row at exactly the fact ts IS visible
    f1 = spark.createDataFrame([(1, 5, _ts(100))],
                               "fact_id long, key long, ts timestamp")
    d1 = spark.createDataFrame([(5, _ts(100), "simultaneous")],
                               "key long, ts timestamp, attr string")
    assert asof_join(f1, d1, "key", "ts").collect()[0].attr_r \
        == "simultaneous"


def test_asof_join_plan_single_key_shuffle_no_nlj(spark, facts_dims):
    f, d, _, _ = facts_dims
    plan = (asof_join(f, d, on="key", ts="ts")
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_bucketed_range_join_matches_theta(spark):
    rng = np.random.RandomState(5)
    pts = [(int(i), float(rng.randint(0, 1000))) for i in range(300)]
    ivs = []
    for i in range(40):
        lo = float(rng.randint(0, 950))
        ivs.append((int(i), lo, lo + float(rng.randint(1, 120))))
    p = spark.createDataFrame(pts, "pid long, v double")
    iv = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    want = {(pid, iid) for pid, v in pts for iid, lo, hi in ivs
            if lo <= v < hi}
    for w in (32, 64, 517):
        got = {(r.pid, r.iid) for r in bucketed_range_join(
            p, iv, "v", "lo", "hi", bucket_width=w,
            point_keys=["pid"], interval_keys=["iid"]).collect()}
        assert got == want, w
    plan = (bucketed_range_join(p, iv, "v", "lo", "hi", 64,
                                ["pid"], ["iid"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_sessionize_matches_bruteforce(spark):
    rng = np.random.RandomState(9)
    rows = [(int(i), int(rng.randint(0, 5)), _ts(rng.randint(0, 2000)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "ts timestamp")
    got = {(r.event_id): r.session_id
           for r in sessionize(df, gap_s=1800).collect()}
    by_user: dict = {}
    for eid, uid, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sid += 1
            want[eid] = sid
            prev = ts
    assert got == want
    assert max(want.values()) > 1   # gaps actually split sessions
