"""Unit semantics of the as-of join operator (`operators/asof.py`):
inclusive ties, NULL-on-no-match (left) vs drop (inner), and the no-join
plan shape (one Exchange + Window, zero join operators)."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_flink_spark.operators.asof import asof_join_backward


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "p1"), (1, _t(10), "p2"), (2, _t(3), "p3")],
        "k long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _t(5), "c-tie"), (1, _t(7), "c-mid"), (3, _t(1), "c-other")],
        "k long, rts timestamp, cid string",
    )
    return left, right


def test_backward_left_matches_and_ties(spark, frames):
    left, right = frames
    out = asof_join_backward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload_cols=("cid", "rts"),
    )
    rows = {r["pid"]: (r["cid"], r["rts"]) for r in out.collect()}
    assert rows["p1"] == ("c-tie", _t(5))  # tie (rts == ts) matches
    assert rows["p2"] == ("c-mid", _t(7))  # latest prior, not first
    assert rows["p3"] == (None, None)  # key with no right rows -> NULL


def test_backward_inner_drops_unmatched(spark, frames):
    left, right = frames
    out = asof_join_backward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload_cols=("cid",), how="inner",
    )
    assert {r["pid"] for r in out.collect()} == {"p1", "p2"}


def test_rejects_unknown_how(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="how"):
        asof_join_backward(
            left, right, on="k", left_ts="ts", right_ts="rts",
            payload_cols=("cid",), how="full",
        )


def test_plan_has_no_join(spark, frames):
    left, right = frames
    out = asof_join_backward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload_cols=("cid",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
