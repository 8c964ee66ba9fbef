"""Semantic invariants for the allocation / decision analytics wave
(allocation_ops): guarantees the oracle hash check can't express —
per-order conservation for proration, brute-force dominance parity for
the skyline, the Lindley closed form vs a literal sequential fold, and
exact 10000-bp conservation per attribution path."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gostream_spark.queries.allocation_ops import (
    attribution_position_weights,
    inventory_lindley_balance,
    proration_largest_remainder,
    skyline_pareto_parts,
)


def test_proration_conserves_order_totals(spark, sf_dir):
    alloc = proration_largest_remainder(spark, sf_dir).toPandas()
    totals = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderkey",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents",
        )
        .toPandas()
        .set_index("o_orderkey")["total_cents"]
    )
    got = alloc.groupby("l_orderkey")["alloc_cents"].sum()
    assert (got == totals.loc[got.index]).all()
    # largest-remainder never moves a line more than 1 cent off floor share
    assert (alloc["alloc_cents"] >= 0).all()


def test_skyline_matches_bruteforce(spark, sf_dir):
    got = skyline_pareto_parts(spark, sf_dir).toPandas()
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .selectExpr(
            "p_partkey",
            "p_size",
            "CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents",
        )
        .toPandas()
    )
    keys = set()
    rows = list(p.itertuples(index=False))
    for a in rows:
        dominated = any(
            b.price_cents <= a.price_cents
            and b.p_size >= a.p_size
            and (b.price_cents < a.price_cents or b.p_size > a.p_size)
            for b in rows
        )
        if not dominated:
            keys.add(a.p_partkey)
    assert set(got["p_partkey"]) == keys


def _naive_lindley(deltas: list[int]) -> tuple[int, int, int]:
    bal, mx, clamps = 0, 0, 0
    for d in deltas:
        nxt = bal + d
        if nxt < 0:
            nxt, clamps = 0, clamps + 1
        bal = nxt
        mx = max(mx, bal)
    return bal, mx, clamps


def test_lindley_closed_form_matches_fold(spark, sf_dir):
    got = (
        inventory_lindley_balance(spark, sf_dir)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("value IS NOT NULL")
        .selectExpr(
            "user_id",
            "ts",
            "event_id",
            "CASE WHEN event_type IN ('purchase','signup')"
            " THEN CAST(round(value*100) AS BIGINT)"
            " ELSE -CAST(round(value*100) AS BIGINT) END AS delta",
        )
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        bal, mx, clamps = _naive_lindley(grp["delta"].tolist())
        row = got.loc[uid]
        assert row["final_balance"] == bal, uid
        assert row["max_balance"] == mx, uid
        assert row["n_clamped"] == clamps, uid


@given(
    deltas=st.lists(st.integers(min_value=-1000, max_value=1000), max_size=60)
)
@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lindley_identity_property(deltas):
    # pure-arithmetic identity check: b_t = S_t - min(0, min_{s<=t} S_s)
    bal, mx, clamps = _naive_lindley(deltas)
    cums = pd.Series(deltas).cumsum() if deltas else pd.Series(dtype="int64")
    total = int(cums.iloc[-1]) if len(cums) else 0
    runmin = int(cums.min()) if len(cums) else 0
    assert bal == total - min(0, runmin)
    if len(cums):
        bals = cums - cums.cummin().clip(upper=0)
        assert mx == max(0, int(bals.max()))
        prev_min = cums.cummin().shift(1).fillna(0).clip(upper=0)
        assert clamps == int((cums < prev_min).sum())


def test_attribution_paths_sum_to_10000(spark, sf_dir):
    per_channel = attribution_position_weights(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    p_ts = (
        ev[ev.event_type == "purchase"].groupby("user_id")["ts"].min()
    )
    touches = ev[
        ev.event_type.isin(["view", "click", "signup"])
        & ev.user_id.isin(p_ts.index)
    ]
    touches = touches[
        touches.ts < touches.user_id.map(p_ts)
    ]
    n_paths = touches.user_id.nunique()
    assert per_channel["total_bp"].sum() == 10000 * n_paths
    assert per_channel["n_touches"].sum() == len(touches)
