"""Plan-shape pins for the round-7 operators: the scale-critical
properties each docstring claims, asserted against the physical plan."""

from __future__ import annotations

import re

from sol_spark.plans import explain_formatted as _plan


def _n_scans(plan: str) -> int:
    """Distinct scan NODES: the formatted output prints each node once in
    the tree and once in the details, so count the detail headers."""
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))


def _n_hash_shuffles(plan: str) -> int:
    return len(re.findall(r"Arguments: hashpartitioning", plan))


def test_token_budget_single_scan_no_row_shuffle_after_agg(spark, sf_dir):
    """One documents scan; the window runs over the per-source aggregate
    (tiny), so exactly one row-grain exchange (the source hash-agg)."""
    from sol_spark.operators.text import pipeline_token_budget

    plan = _plan(pipeline_token_budget(spark, sf_dir))
    assert _n_scans(plan) == 1
    assert "HashAggregate" in plan


def test_stickiness_day_grid_broadcasts(spark, sf_dir):
    """The banded MAU join must broadcast the day grid, never shuffle the
    presence frame against it with a sort-merge."""
    from sol_spark.queries.events_analytics import events_dau_mau_stickiness

    plan = _plan(events_dau_mau_stickiness(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_conformance_single_exchange_on_user(spark, sf_dir):
    """Lag window and rollup share the user_id partitioning: one Exchange
    over the events; the edge list broadcasts."""
    from sol_spark.queries.events_analytics import events_conformance_audit

    plan = _plan(events_conformance_audit(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # allowed-edge list
    # at most two hash shuffles (lag window + rollup agg), both on user_id
    assert 1 <= _n_hash_shuffles(plan) <= 2
    assert "hashpartitioning(user_id" in plan


def test_sprt_one_window_pass_no_second_shuffle(spark, sf_dir):
    from sol_spark.queries.events_analytics import stats_sprt_bernoulli

    plan = _plan(stats_sprt_bernoulli(spark, sf_dir))
    # ONE hash shuffle (the user_id window partitioning); the only other
    # exchange is the presentation-sort range partitioning.
    assert _n_hash_shuffles(plan) == 1
    assert "Window" in plan


def test_aqp_curve_single_scan(spark, sf_dir):
    """All seven fractions price off ONE scan (a 14-cell conditional agg),
    not seven passes."""
    from sol_spark.queries.relational import aqp_error_vs_fraction

    plan = _plan(aqp_error_vs_fraction(spark, sf_dir))
    assert _n_scans(plan) == 1


def test_license_flags_single_scan_pushdown(spark, sf_dir):
    from sol_spark.operators.text import text_license_flags

    plan = _plan(text_license_flags(spark, sf_dir))
    assert _n_scans(plan) == 1
    assert "HashAggregate" in plan
