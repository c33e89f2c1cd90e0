"""Plan-shape pins for the round-9 additions: the scale-critical claims
each docstring makes, asserted against the physical plan."""

from __future__ import annotations


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_modified_corpus_band_prunes_fact_scan(spark, sf_dir):
    """The tpcds-modifiedQueries corpus's entire point: the literal
    partition-key band must reach the FACT side's parquet scan (orders —
    ss_sold_date_sk IS o_orderdate in the derived star), so the scan
    prunes before any dim join. Pin q3m's December bands and q98m's
    single band on the orders FileScan."""
    from sol_spark.queries.tpcds_modified import tpcds_q3m, tpcds_q98m

    for fn, needle in ((tpcds_q3m, "1995-12-01"), (tpcds_q98m, "1997-02-22")):
        plan = _executed(fn(spark, sf_dir))
        scan_lines = [
            ln for ln in plan.split("\n")
            if "FileScan parquet" in ln and "o_orderdate" in ln and needle in ln
        ]
        assert scan_lines, f"{fn.__name__}: band literal {needle} not pushed to the orders scan"


def test_q46m_day_inlist_prunes_fact_scan(spark, sf_dir):
    """q46m's literal weekend-day IN-list must also sit in the orders
    scan's data filters — the extreme form of the corpus's pruning test
    (individual partition days, no dim join needed to prune)."""
    from sol_spark.queries.tpcds_modified import tpcds_q46m

    # The default 100-char metadata truncation hides the IN-list inside
    # the FileScan line; widen it for the probe.
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    try:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
        plan = _executed(tpcds_q46m(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    scan_lines = [
        ln for ln in plan.split("\n")
        if "FileScan parquet" in ln and "o_orderdate" in ln and "1997-01-04" in ln
    ]
    assert scan_lines, "weekend-day IN-list not pushed to the orders scan"


def test_ivm_merge_is_groups_sized_outer_join(spark, sf_dir):
    """warehouse_ivm_agg's claim: the base agg and delta agg merge with a
    full-outer join AFTER both aggregations — the join runs on
    groups-sized frames, never row grain. Pin the outer join present and
    positioned above two aggregates."""
    from sol_spark.operators.governance import warehouse_ivm_agg

    plan = _executed(warehouse_ivm_agg(spark, sf_dir))
    assert "FullOuter" in plan
    # Both inputs to the plan aggregate before joining: the merge join
    # keys are the group keys, so HashAggregate must appear below the
    # outer join in the tree (string order: the join node prints before
    # its children's aggregates in Spark's tree rendering).
    join_pos = plan.find("FullOuter")
    assert "HashAggregate" in plan[join_pos:], "merge join is not above the aggregates"


def test_mis_round_never_reshuffles_the_edge_set(spark, sf_dir):
    """The MIS edge-cut claim: with the edge set CACHED pre-partitioned on
    the join key (persist — a localCheckpoint drops outputPartitioning on
    this build), a round's message join must not insert an
    ENSURE_REQUIREMENTS exchange over the edge side — only the tiny live
    frame may exchange. Probed with broadcast disabled so the shuffle path
    (the 100 TB shape, where the live frontier is NOT broadcastable) is
    what's planned."""
    from pyspark.sql import functions as F

    from sol_spark.operators.dedup import (
        _MIS_PRIO,
        dedup_simhash,
        local_checkpoint,
        release_result,
    )

    ph = dedup_simhash(spark, sf_dir)
    pairs = local_checkpoint(ph.select("doc_a", "doc_b"))
    release_result(ph)
    sym = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).unionAll(
        pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_by_b = sym.repartition(width, "b").persist()
    edges_by_b.count()
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        live = (
            edges_by_b.select(F.col("a").alias("v")).distinct()
            .select("v", F.expr(_MIS_PRIO.format(r=1, v="v")).alias("p"))
        )
        lb = live.select(F.col("v").alias("b"), F.col("p").alias("pb"))
        nbr = edges_by_b.join(lb, "b")
        plan = _executed(nbr)
        # The edge side's only exchange is its cached REPARTITION_BY_NUM
        # (inside the InMemoryRelation); no planner-inserted
        # ENSURE_REQUIREMENTS exchange re-shuffles the a/b edge columns
        # feeding the join's streamed side.
        # Exactly one ENSURE_REQUIREMENTS exchange may appear: the lb side.
        all_ensure = [ln for ln in plan.split("\n") if "ENSURE_REQUIREMENTS" in ln]
        assert len(all_ensure) == 1, f"expected only the live-side exchange, got: {all_ensure}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        edges_by_b.unpersist()
        release_result(pairs)
