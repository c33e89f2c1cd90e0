"""Behavioral invariants for the round-6 eighth-wave operators: the Luby
MIS keep-list (independence + maximality, the properties the hash-compare
can't see) and the cross-source duplication matrix (mass accounting vs the
raw candidate relation).
"""

from __future__ import annotations


def _simhash_edges(spark, sf_dir):
    from sol_spark.operators.dedup import dedup_simhash

    pairs = dedup_simhash(spark, sf_dir).select("doc_a", "doc_b").collect()
    edges = set()
    for p in pairs:
        edges.add((p["doc_a"], p["doc_b"]))
        edges.add((p["doc_b"], p["doc_a"]))
    return edges


def test_mis_independence_maximality_and_rounds(spark, sf_dir):
    """Kept set is an independent set of the near-dup graph; every dropped
    doc has a kept neighbor (maximality); docs outside the graph are kept
    at round 0; every graph vertex is decided within the round budget."""
    from sol_spark.operators.dedup import MIS_MAX_ROUNDS, dedup_mis_keepset
    from sol_spark.tables import load_tables

    edges = _simhash_edges(spark, sf_dir)
    rows = dedup_mis_keepset(spark, sf_dir).collect()
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    assert len(rows) == n_docs
    kept = {r["doc_id"] for r in rows if r["kept"] == 1}
    dropped = {r["doc_id"] for r in rows if r["kept"] == 0}
    graph_vertices = {a for a, _ in edges}
    # independence: no edge inside the keep set
    for a, b in edges:
        assert not (a in kept and b in kept), f"adjacent kept pair {a},{b}"
    # maximality: every dropped doc has a kept near-dup witness
    for d in dropped:
        assert any((d, k) in edges for k in kept), f"dropped {d} has no kept neighbor"
    # only graph vertices can be dropped; non-graph docs decided at round 0
    assert dropped <= graph_vertices
    for r in rows:
        if r["doc_id"] not in graph_vertices:
            assert r["kept"] == 1 and r["decided_round"] == 0
        else:
            assert 1 <= r["decided_round"] <= MIS_MAX_ROUNDS
    assert dropped, "fixture graph must make the MIS drop something"


def test_cross_source_matrix_mass_accounting(spark, sf_dir):
    """Matrix rows are unordered source pairs; total n_pairs equals the
    candidate-pair count from the band relation; within_source flags the
    diagonal."""
    from sol_spark.operators.dedup import (
        dedup_cross_source_matrix,
        hashed_shingle_rows_df,
        minhash_signature_df,
        _band_df,
    )
    from pyspark.sql import functions as F

    rows = dedup_cross_source_matrix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert r["n_pairs"] >= 1
        assert r["within_source"] == (1 if r["source_a"] == r["source_b"] else 0)
    bands = _band_df(minhash_signature_df(hashed_shingle_rows_df(spark, sf_dir)))
    n_cand = (
        bands.join(bands.withColumnsRenamed({"doc_id": "doc_b"}), ["band", "band_key"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select("doc_id", "doc_b")
        .distinct()
        .count()
    )
    assert sum(r["n_pairs"] for r in rows) == n_cand


def test_aqp_estimates_cover_truth(spark, sf_dir):
    """10% Bernoulli HT estimator: sampled counts are plausible (3-sigma
    binomial band), every group's CI is non-degenerate and (at fixture
    scale, qty in [1,50] with thousands of lines per group) covers the
    true sum; the relative error is within 5 estimated sigmas."""
    from sol_spark.queries.relational import aqp_groupby_ci

    rows = aqp_groupby_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_sampled"] >= 1
        assert r["est_rows"] == 10 * r["n_sampled"]
        # binomial 3-sigma sanity on the coin
        import math
        sd = math.sqrt(r["true_rows"] * 0.1 * 0.9)
        assert abs(r["n_sampled"] - 0.1 * r["true_rows"]) <= max(5 * sd, 10)
        assert r["ci_low"] < r["est_sum_qty"] < r["ci_high"]
        assert r["ci_covers"] in (0, 1)
        halfwidth = (r["ci_high"] - r["ci_low"]) / 2
        assert abs(r["est_sum_qty"] - r["true_sum_qty"]) <= 5 / 1.96 * halfwidth
    # 95% nominal coverage: on a handful of groups, demand none-missed is
    # too strict only in theory — at qty-bounded fixture scale all cover.
    assert sum(r["ci_covers"] for r in rows) >= len(rows) - 1


def test_robust_agg_band_laws(spark, sf_dir):
    """Trimmed and winsorized means must land inside the [p10, p90] band
    (they average values from/clamped to it); the band is ordered; the
    winsorized mean moves toward the band center relative to the mean."""
    from sol_spark.queries.events_analytics import stats_robust_agg

    rows = stats_robust_agg(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n"] > 0
        assert r["p10"] <= r["p90"]
        assert r["p10"] <= r["trimmed_mean"] <= r["p90"]
        assert r["p10"] <= r["winsor_mean"] <= r["p90"]


def test_bradley_terry_conservation_and_signal(spark, sf_dir):
    """BT gradient steps conserve total strength (sum of gradients is
    identically zero), every source plays, wins <= games, and the fitted
    ordering agrees with win rate at the extremes."""
    from sol_spark.queries.relational import stats_bradley_terry

    rows = stats_bradley_terry(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r["strength"] for r in rows)) < 1e-4
    played = [r for r in rows if r["games"] > 0]
    assert len(played) >= 2
    for r in rows:
        assert 0 <= r["wins"] <= r["games"]
    by_rate = sorted(played, key=lambda r: r["wins"] / r["games"])
    assert by_rate[-1]["strength"] >= by_rate[0]["strength"]
    assert any(abs(r["strength"]) > 1e-6 for r in rows), "fit never moved"


def test_dp_topk_selects_heavy_users_without_global_sort(spark, sf_dir):
    """Ranks are 1..k; selection is noise-perturbed but with scale 2k/eps
    << fixture counts it must pick genuinely heavy users (true count >=
    corpus median); the plan takes a top-k heap (TakeOrderedAndProject),
    never a global sort of the user frame."""
    from sol_spark.operators.governance import DP_TOPK_K, privacy_dp_topk
    from sol_spark.tables import load_tables
    from sol_spark.plans import explain_formatted
    from pyspark.sql import functions as F
    import statistics

    df = privacy_dp_topk(spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_formatted(df)
    rows = df.collect()
    assert [r["rank"] for r in rows] == list(range(1, DP_TOPK_K + 1))
    true = {
        r["user_id"]: r["n"]
        for r in load_tables(spark, sf_dir)["events"]
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    from sol_spark.operators.governance import DP_TOPK_EPS, DP_TOPK_SCALE

    med = statistics.median(true.values())
    # Gumbel(scale) noise can reorder users whose counts are within a few
    # noise scales of each other (that IS the privacy), but it cannot
    # promote a user arbitrarily: assert the deterministic utility band
    # rather than strict heaviness, plus the Laplace bound on the count.
    lap_max = (DP_TOPK_K / DP_TOPK_EPS) * 14.0  # |ln(1e-6)| ~ 13.8
    for r in rows:
        assert true[r["user_id"]] >= med - 4 * DP_TOPK_SCALE
        assert abs(r["noisy_count"] - true[r["user_id"]]) <= lap_max


def test_cramers_v_bounds(spark, sf_dir):
    """V in [0, 1], chi2 >= 0, dof/dimension bookkeeping consistent, n
    equals the table row count."""
    from sol_spark.queries.relational import stats_cramers_v
    from sol_spark.tables import load_tables

    r = stats_cramers_v(spark, sf_dir).collect()[0]
    assert r["n"] == load_tables(spark, sf_dir)["documents"].count()
    assert r["chi2"] >= 0
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["dof"] == (r["r"] - 1) * (r["c"] - 1)
    assert r["r"] >= 2 and r["c"] >= 2


def test_mann_kendall_integer_exactness_and_bounds(spark, sf_dir):
    """S is bounded by the pair count, 18*Var matches the closed form
    recomputed in Python from the daily grid, and z/trending agree."""
    from sol_spark.queries.events_analytics import events_mann_kendall
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F
    import math
    from collections import Counter

    rows = events_mann_kendall(spark, sf_dir).collect()
    assert rows
    daily = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("event_type", F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series = {}
    for d in daily:
        series.setdefault(d["event_type"], []).append((d["day"], d["n"]))
    for r in rows:
        pts = sorted(series[r["event_type"]])
        n = len(pts)
        assert r["n_days"] == n
        s = sum(
            (1 if pts[j][1] > pts[i][1] else -1 if pts[j][1] < pts[i][1] else 0)
            for i in range(n) for j in range(i + 1, n)
        )
        assert r["s_stat"] == s
        ties = Counter(v for _, v in pts)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        assert r["var18"] == n * (n - 1) * (2 * n + 5) - tie_term
        cc = 1 if s > 0 else -1 if s < 0 else 0
        z = (s - cc) / math.sqrt(r["var18"] / 18.0)
        assert abs(r["z"] - round(z, 6)) < 1e-9
        assert r["trending"] == (1 if abs(z) > 1.96 else 0)


def test_bot_score_signal_consistency(spark, sf_dir):
    """Flags require BOTH low cadence CV and low behavior entropy; every
    scored user meets the minimum event count; entropy is within
    [0, log2(#event types)] millibits."""
    from sol_spark.queries.events_analytics import (
        BOT_CV_PPM,
        BOT_ENTROPY_MILLI,
        BOT_MIN_EVENTS,
        events_bot_score,
    )
    from sol_spark.tables import load_tables
    import math

    rows = events_bot_score(spark, sf_dir).collect()
    assert rows
    n_types = load_tables(spark, sf_dir)["events"].select("event_type").distinct().count()
    cap = int(round(math.log2(n_types) * 1000)) + 1
    for r in rows:
        assert r["n_events"] >= BOT_MIN_EVENTS
        assert 0 <= r["entropy_milli"] <= cap
        assert r["cadence_cv_ppm"] >= 0
        expect = 1 if (r["cadence_cv_ppm"] < BOT_CV_PPM and r["entropy_milli"] < BOT_ENTROPY_MILLI) else 0
        assert r["bot_flag"] == expect


def test_ndv_estimators_bracket_truth(spark, sf_dir):
    """Chao1 is a lower-bound-style estimator (>= d_sample, and <= truth
    plus slack); GEE must land within its sqrt(N/n) guarantee band of the
    truth; sample bookkeeping is internally consistent."""
    import math

    from sol_spark.queries.relational import profile_ndv_estimate

    rows = profile_ndv_estimate(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 < r["n_sampled"] < r["n_rows"]
        assert r["f1"] + r["f2"] <= r["d_sample"] <= r["n_sampled"]
        assert r["d_sample"] <= r["true_ndv"]
        assert r["chao1"] >= r["d_sample"]
        # GEE's guarantee: within sqrt(N/n) multiplicative of truth
        ratio = math.sqrt(r["n_rows"] / r["n_sampled"]) + 0.5
        assert r["true_ndv"] / ratio <= max(r["gee"], 1.0) <= r["true_ndv"] * ratio
        assert r["chao1_err_bp"] == round(10000.0 * (r["chao1"] - r["true_ndv"]) / r["true_ndv"])


def test_hash_collision_audit_accounting(spark, sf_dir):
    """Counting identities hold (merged = shingles - hashes, collided
    hashes <= merged), and the ppm rate matches the integer division."""
    from sol_spark.operators.dedup import dedup_hash_collision_audit

    r = dedup_hash_collision_audit(spark, sf_dir).collect()[0]
    assert r["n_shingles"] >= r["n_hashes"] > 0
    assert r["n_merged"] == r["n_shingles"] - r["n_hashes"]
    assert 0 <= r["n_collided_hashes"] <= r["n_merged"] or (
        r["n_merged"] == 0 and r["n_collided_hashes"] == 0
    )
    assert r["collision_ppm"] == 1000000 * r["n_merged"] // r["n_shingles"]
