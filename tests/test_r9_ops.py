"""Behavioral pins for the round-9 operator additions (oracle parity is
covered by the registry; these pin the invariants a hash compare can't
see)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bloom_incremental_no_false_negatives(spark, sf_dir):
    """A Bloom filter admits false positives but NEVER false negatives:
    every exact duplicate must be a bloom_hit, at every SF. (The converse
    — false positives — is exercised by the sf0.1 strict sweep, where the
    deliberately tight filter width fires them.)"""
    from sol_spark.operators.dedup import dedup_bloom_incremental

    out = dedup_bloom_incremental(spark, sf_dir)
    assert out.filter((F.col("exact_dup") == 1) & (F.col("bloom_hit") == 0)).count() == 0
    # Flag algebra: false_positive is exactly bloom_hit minus exact truth.
    bad = out.filter(
        F.col("false_positive")
        != F.when((F.col("bloom_hit") == 1) & (F.col("exact_dup") == 0), 1).otherwise(0)
    )
    assert bad.count() == 0


def test_bloom_incremental_sketch_is_bounded(spark, sf_dir):
    """The broadcast word table is bounded by the filter width (m/64
    words), NOT by corpus size — the property that makes the operator the
    100 TB replacement for the hash keep-list join."""
    from sol_spark.operators.dedup import BLOOM_M_BITS

    assert BLOOM_M_BITS % 64 == 0
    # The plan must broadcast the sketch side, never shuffle-join it.
    from sol_spark.operators.dedup import dedup_bloom_incremental

    plan = (
        dedup_bloom_incremental(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_attribution_conserves_revenue_exactly(spark, sf_dir):
    """Every attribution model must conserve total purchase revenue to
    the cent — the integer identity the largest-remainder linear split
    exists for (a float split leaks cents)."""
    from pyspark.sql import functions as F

    from sol_spark.queries.events_analytics import events_attribution
    from sol_spark.tables import load_tables

    out = events_attribution(spark, sf_dir).agg(
        F.sum("first_touch_cents").alias("f"),
        F.sum("last_touch_cents").alias("l"),
        F.sum("linear_cents").alias("lin"),
        F.sum("conversions").alias("n"),
    ).first()
    total = (
        load_tables(spark, sf_dir)["events"]
        .where(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    assert out["f"] == out["l"] == out["lin"] == total["c"]
    assert out["n"] == total["n"]
