"""Behavioral invariants for the round-6 thirteenth-wave operators:
time-decay attribution (credit conservation per journey), geo hotspots
(scatter-sum law vs a Python neighborhood recompute), WoE/IV (smoothing
identities), and tokenization consistency (histogram equality + an injected
collision detected)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def test_time_decay_credit_conservation(spark, sf_dir):
    """Per-journey credits never exceed 10000 bp (integer truncation only
    loses), weights follow the dyadic ladder, and channel totals reconcile
    with a Python recompute over the raw events."""
    from sol_spark.queries.events_analytics import (
        DECAY_HALF_MIN,
        events_attribution_time_decay,
    )
    from sol_spark.tables import load_tables

    evs = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    purchases = [e for e in evs if e["event_type"] == "purchase"]
    touches = [e for e in evs if e["event_type"] in ("view", "click")]
    by_user = defaultdict(list)
    for t_ in touches:
        by_user[t_["user_id"]].append(t_)
    half_us = DECAY_HALF_MIN * 60000000
    totals = Counter()
    counts = Counter()
    for p in purchases:
        journey = []
        for t_ in by_user.get(p["user_id"], ()):
            d_us = int((p["ts"] - t_["ts"]).total_seconds() * 1e6)
            # reconstruct exact micros from the timedelta (fixture is us-grain)
            if 0 < d_us <= 24 * 3600 * 1000000:
                journey.append((t_["event_type"], 8 >> min(d_us // half_us, 63)))
        sw = sum(w for _, w in journey)
        for ch, w in journey:
            counts[ch] += 1
            totals[ch] += (10000 * w) // max(sw, 1)
    got = {r["channel"]: r for r in events_attribution_time_decay(spark, sf_dir).collect()}
    assert set(got) == set(totals)
    for ch, r in got.items():
        assert r["n_credited_touches"] == counts[ch]
        assert r["total_credit_bp"] == totals[ch]


def test_geo_hotspots_neighborhood_recompute(spark, sf_dir):
    """nbr_sum equals a Python 3x3 wrapped-neighborhood sum over the cell
    counts, and z reproduces the closed form from the cell moments."""
    from sol_spark.operators.geo import geo_hotspots

    rows = geo_hotspots(spark, sf_dir).collect()
    counts = {(r["cy"], r["cx"]): r["n"] for r in rows}
    n_cells = len(counts)
    mu = sum(counts.values()) / n_cells
    sd = math.sqrt(sum(v * v for v in counts.values()) / n_cells - mu * mu)
    for r in rows:
        nbr = sum(
            counts.get((r["cy"] + dy, (r["cx"] + dx) % 36), 0)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        )
        assert r["nbr_sum"] == nbr
        z = (nbr - 9.0 * mu) / (3.0 * max(sd, 1e-12))
        assert abs(r["z_gi"] - z) < 2e-6


def test_woe_iv_smoothing_identities(spark, sf_dir):
    """Per-bin WoE reproduces the smoothed closed form from the integer
    counts; iv_term signs agree with woe signs; bins partition the corpus."""
    from sol_spark.queries.relational import stats_woe_iv
    from sol_spark.tables import load_tables

    rows = stats_woe_iv(spark, sf_dir).collect()
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    assert sum(r["n_pos"] + r["n_neg"] for r in rows) == n_docs
    p = sum(r["n_pos"] for r in rows)
    q = sum(r["n_neg"] for r in rows)
    for r in rows:
        woe = math.log(
            ((2 * r["n_pos"] + 1) * (2 * q + 1)) / ((2 * r["n_neg"] + 1) * (2 * p + 1))
        )
        assert abs(r["woe"] - woe) < 2e-6
        gap = (2 * r["n_pos"] + 1) / (2 * p + 1) - (2 * r["n_neg"] + 1) / (2 * q + 1)
        assert abs(r["iv_term"] - gap * woe) < 2e-6
        assert r["iv_term"] >= -1e-6  # gap and woe share sign, so IV terms are >= 0


def test_tokenize_consistency_and_injected_collision(spark, sf_dir):
    """The md5 tokenization is collision-free on the fixture (every
    histogram row consistent); a deliberately colliding token map shifts
    the histogram and the same comparison catches it."""
    from pyspark.sql import functions as F

    from sol_spark.operators.governance import privacy_tokenize_consistency
    from sol_spark.tables import load_tables

    rows = privacy_tokenize_consistency(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["consistent"] == 1
        assert r["n_raw_entities"] == r["n_token_entities"]
    # injected collision: token = user_id div 2 merges neighbor users
    e = load_tables(spark, sf_dir)["events"]
    raw_hist = (
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .groupBy("n").count().withColumnRenamed("count", "cr")
    )
    bad_hist = (
        e.groupBy(F.expr("user_id div 2").alias("tok"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("n").count().withColumnRenamed("count", "ct")
    )
    joined = raw_hist.join(bad_hist, "n", "full_outer").select(
        F.coalesce("cr", F.lit(0)).alias("cr"), F.coalesce("ct", F.lit(0)).alias("ct")
    )
    mismatches = joined.filter(F.col("cr") != F.col("ct")).count()
    assert mismatches > 0
