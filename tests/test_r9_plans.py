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


def test_mis_fused_gather_has_single_aggregate(spark, sf_dir):
    """The shipped Luby gather shape: own (priority, id) pairs ride the
    neighbor-message union into ONE groupBy-min — no second aggregate and
    no post-aggregation left join in the kept-set subplan. (The r9
    persist()ed pre-partitioned edge-cut variant was tried and reverted:
    cached partitioning forced a per-round SortMergeJoin edge sort that
    measured ~2x slower than AQE's broadcast of the shrinking live frame —
    see the operator comment.)"""
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
    edges = local_checkpoint(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).unionAll(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
    )
    release_result(pairs)
    live = (
        edges.select(F.col("a").alias("v")).distinct()
        .select("v", F.expr(_MIS_PRIO.format(r=1, v="v")).alias("p"))
    )
    lb = live.select(F.col("v").alias("b"), F.col("p").alias("pb"))
    own = live.select(F.col("v"), F.col("p").alias("mp"), F.col("v").alias("mv"))
    nbr = edges.join(lb, "b").select(
        F.col("a").alias("v"), F.col("pb").alias("mp"), F.col("b").alias("mv")
    )
    kept = (
        own.unionAll(nbr)
        .groupBy("v")
        .agg(F.min(F.struct(F.col("mp"), F.col("mv"))).alias("mn"))
        .filter(F.col("mn.mv") == F.col("v"))
        .select("v")
    )
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    # The pre-fusion shape left-joined live against the neighbor-min
    # aggregate; the fused shape has no outer join anywhere — the own-pair
    # union subsumes the null case.
    assert "LeftOuter" not in plan, "fused gather must not need a left join"
    assert "min(" in plan
    release_result(edges)
