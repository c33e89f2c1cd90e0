"""Plan-shape pins for the round-8 operators: the scale-critical
properties each docstring (and the r7 verdict's "Done" criteria) claim,
asserted against the physical plan."""

from __future__ import annotations

import re

from sol_spark.plans import explain_formatted as _plan


def test_rouge2_tokenizes_only_candidate_documents(spark, sf_dir):
    """r7 verdict ask #3's Done criterion: the bigram explode must sit
    DOWNSTREAM of a left-semi join of documents against the candidate doc
    ids — at corpus scale candidates << corpus and tokenizing everything
    was the dominant wasted scan. The frames are checkpointed during
    construction, so probe the live builder: reproduce the toks subplan
    exactly as dedup_rouge2_pairs builds it and pin the semi-join below
    the generator."""
    from pyspark.sql import functions as F

    from sol_spark.operators.dedup import _NORM, dedup_simhash, local_checkpoint, release_result
    from sol_spark.tables import load_tables

    ph = local_checkpoint(dedup_simhash(spark, sf_dir).select("doc_a", "doc_b"))
    cand = (
        ph.select(F.col("doc_a").alias("doc_id"))
        .union(ph.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    toks = (
        load_tables(spark, sf_dir)["documents"]
        .join(cand, "doc_id", "left_semi")
        .select("doc_id", F.explode(F.expr(f"split({_NORM}, ' ')")).alias("tok"))
    )
    plan = _plan(toks)
    release_result(ph)
    gen = plan.index("Generate")
    semi = plan.index("LeftSemi")
    # formatted plans print downstream operators FIRST: the generator's
    # node must appear above (before) the semi join that feeds it
    assert gen < semi, "explode must consume the semi-joined documents"
    # and the source implementation does build this shape
    import inspect

    from sol_spark.operators import dedup

    src = inspect.getsource(dedup.dedup_rouge2_pairs)
    assert 'join(cand_docs, "doc_id", "left_semi")' in src


def test_incident_stats_no_unpartitioned_window(spark, sf_dir):
    """r7 verdict ask #4's Done criterion: day-partitioned islands plus a
    bounded boundary stitch, with NO accidental global window — every
    windowspecdefinition in the plan must carry at least one partition
    key (the stitch declares its bounded single partition explicitly via
    a non-foldable constant)."""
    from sol_spark.queries.events_analytics import events_incident_stats

    plan = _plan(events_incident_stats(spark, sf_dir))
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.group(1).split(",")[0]
        # an unpartitioned spec starts directly with an ORDER BY column
        # carrying its sort direction; partitioned specs lead with bare
        # partition expressions (day#N for the islands, the projected
        # pmod(day, 1) alias for the stitch)
        assert " ASC" not in first and " DESC" not in first, (
            f"unpartitioned window: {m.group(1)}"
        )
    # both window layers present: day-partitioned islands + the stitch
    assert "pmod" in plan


def test_chain_ladder_fact_scanned_once_metadata_after_agg(spark, sf_dir):
    """One lineitem + one orders scan; after the (cohort, age) hash-agg
    everything is metadata-sized (cumulative window + adjacent-age join)."""
    from sol_spark.queries.relational import orders_chain_ladder

    plan = _plan(orders_chain_ladder(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 2
    assert "HashAggregate" in plan


def test_bandit_replay_broadcasts_model_frames(spark, sf_dir):
    """The total-count scalar must broadcast onto the per-action frame;
    no sort-merge join of the bounded side."""
    from sol_spark.queries.events_analytics import events_bandit_replay

    plan = _plan(events_bandit_replay(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q67a_base_vs_expand_strategy(spark, sf_dir):
    """q67 keeps the single-Expand rollup; q67a's returned frame is the
    checkpointed union-of-levels result (no Expand anywhere in its
    lineage by construction). Pin q67's Expand so the A/B comparison the
    bench runs stays a real strategy difference."""
    from sol_spark.queries.tpcds import tpcds_q67

    plan = _plan(tpcds_q67(spark, sf_dir))
    assert "Expand" in plan


def test_synthetic_allocation_total_is_exact(spark, sf_dir):
    """Largest-remainder guarantee: synthetic counts sum to the budget
    EXACTLY and every cell is within one row of its floor quota."""
    from sol_spark.operators.governance import SYNTH_BUDGET, privacy_synthetic_allocation

    rows = privacy_synthetic_allocation(spark, sf_dir).collect()
    assert sum(r["synth_count"] for r in rows) == SYNTH_BUDGET
    assert all(r["synth_count"] - r["floor_quota"] in (0, 1) for r in rows)


def test_schema_drift_single_scan(spark, sf_dir):
    """dq_schema_drift's docstring claims ONE scan: the epoch pivot must be
    a conditional agg, not an a/b self-join that re-plans the upstream
    aggregate (and its scan) once per side."""
    from sol_spark.operators.governance import dq_schema_drift

    plan = _plan(dq_schema_drift(spark, sf_dir))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, f"expected one parquet scan, saw {len(scans)}"
    assert "Expand" in plan  # exact multi-column distincts rewrite


def test_range_search_has_no_window(spark, sf_dir):
    """sim_range_search's scale claim: the threshold is a plain filter —
    no per-query rank window anywhere in the plan (that's what makes it
    strictly cheaper than top-k), and the query block broadcasts."""
    from sol_spark.operators.similarity import sim_range_search

    plan = _plan(sim_range_search(spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_watermark_lateness_windows_partitioned(spark, sf_dir):
    """events_watermark_lateness's scale claim: the global running max is
    day-bucketed + a bounded declared prefix scan — every windowspec
    either carries the day partition key or the non-foldable constant,
    never an accidental unpartitioned ORDER BY over the fact."""
    from sol_spark.queries.events_analytics import events_watermark_lateness

    plan = _plan(events_watermark_lateness(spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the plan"
    for s in specs:
        first = s.split(",")[0]
        assert " ASC" not in first and " DESC" not in first, f"unpartitioned window: {s}"
