"""Plan-shape tests: the scale properties the operators claim must be
visible in the physical plan. These guard against regressions that stay
correct at test scale but die at 100 TB (a filter that stops pushing down,
a broadcast that silently becomes a cartesian product, a rank filter that
loses its WindowGroupLimit)."""

from __future__ import annotations

import re

import pytest

from twitter_flink_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_pushdown(spark):
    """Predicates and projection must reach the parquet scan."""
    plan = plan_of(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(event_type,purchase\)", plan)
    assert re.search(r"PushedFilters: \[.*GreaterThan\(value,100", plan)
    # column pruning: props/ts must not be read
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "props" not in m.group(1) and "ts" not in m.group(1)


def test_semi_join_is_broadcast(spark):
    """The top-K semi-join must broadcast its tiny build side — never
    shuffle the probe, never fall into a cartesian product."""
    for name in ("semi_join_topk_exploded", "flagship_topn_semijoin"):
        plan = plan_of(spark, name)
        assert "BroadcastExchange" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, name


def test_topn_uses_window_group_limit(spark):
    """rank<=N must run as WindowGroupLimit (partial top-N before the
    shuffle), not a full window sort."""
    plan = plan_of(spark, "topn_tokens_per_window")
    assert "WindowGroupLimit" in plan


def test_global_topk_is_take_ordered(spark):
    """orderBy().limit(k) must be TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, "global_topk_tokens")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [cnt" not in plan  # no full sort of the counts


def test_star_join_broadcasts_dims(spark):
    """Q5: all dimension joins broadcast; the only shuffle joins are
    fact-fact."""
    plan = plan_of(spark, "q5_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_agg_is_partial_final(spark):
    """Grouped counts must show two HashAggregate phases (map-side partial
    combine) — the property that bounds shuffle volume by group cardinality."""
    plan = plan_of(spark, "token_counts_global")
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_no_cartesian_anywhere():
    """Every registered query must avoid CartesianProduct (the one
    intentional cross join — the scalar-subquery broadcast — compiles to
    BroadcastNestedLoopJoin over a 1-row side, which is fine)."""
    # checked lazily in test_all_plans_no_cartesian below (needs spark)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_all_plans_no_cartesian(spark, name):
    if name.startswith("streaming_"):
        pytest.skip("streaming queries execute eagerly; covered elsewhere")
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
