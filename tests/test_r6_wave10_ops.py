"""Behavioral invariants for the round-6 tenth-wave operators: interval
coverage (sweep-line laws vs a Python recompute), FK orphan accounting
(zeros measured + a synthetic orphan detected), join-size estimation (exact
side equals a real join count), cluster-size histogram (mass accounting vs
the CC labels), and calibration (partition + Brier bounds).
"""

from __future__ import annotations

from collections import defaultdict


def test_interval_coverage_matches_python_sweep(spark, sf_dir):
    """Exact Python sweep-line recompute over the raw events: identical
    per-user (n_intervals, covered_s, n_events, longest_s)."""
    from sol_spark.queries.events_analytics import (
        COVERAGE_WIDTH_S,
        events_interval_coverage,
    )
    from sol_spark.tables import load_tables

    evs = (
        load_tables(spark, sf_dir)["events"]
        .selectExpr(
            "user_id",
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS s",
        )
        .collect()
    )
    by_user = defaultdict(list)
    for e in evs:
        by_user[e["user_id"]].append(e["s"])
    expected = {}
    for u, starts in by_user.items():
        starts.sort()
        islands = []
        for s in starts:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], s + COVERAGE_WIDTH_S)
                islands[-1][2] += 1
            else:
                islands.append([s, s + COVERAGE_WIDTH_S, 1])
        expected[u] = (
            len(islands),
            sum(hi - lo for lo, hi, _ in islands),
            sum(n for _, _, n in islands),
            max(hi - lo for lo, hi, _ in islands),
        )
    got = {
        r["user_id"]: (r["n_intervals"], r["covered_s"], r["n_events"], r["longest_s"])
        for r in events_interval_coverage(spark, sf_dir).collect()
    }
    assert got == expected


def test_fk_orphans_intact_fixture_and_synthetic_orphan(spark, sf_dir):
    """The TPC-H fixture is referentially intact (all edges zero orphans,
    full row accounting); a hand-built frame with a dangling key shows the
    same counting logic catches it (guards against a vacuously-green
    audit)."""
    from sol_spark.operators.governance import _FK_EDGES, dq_fk_orphans
    from sol_spark.tables import load_tables

    rows = dq_fk_orphans(spark, sf_dir).collect()
    assert len(rows) == len(_FK_EDGES)
    t = load_tables(spark, sf_dir)
    counts = {name: t[name].count() for name in ("lineitem", "orders", "customer", "nation", "supplier")}
    for r in rows:
        assert r["orphan_rows"] == 0 and r["orphan_keys"] == 0 and r["orphan_ppm"] == 0
        child = r["fk"].split(".")[0]
        assert r["n_rows"] == counts[child]
        assert 0 < r["n_keys"] <= r["n_rows"]
    # synthetic orphan: the audit's join-shape finds a dangling child key
    child = spark.createDataFrame([(1, 10), (2, 10), (3, 99)], "id int, fk int")
    parent = spark.createDataFrame([(10,)], "pk int")
    from pyspark.sql import functions as F

    ck = child.groupBy(F.col("fk").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    joined = ck.join(parent, ck["k"] == parent["pk"], "left")
    got = joined.agg(
        F.sum(F.when(F.col("pk").isNull(), F.col("n"))).alias("orphan_rows")
    ).collect()[0]
    assert got["orphan_rows"] == 1


def test_join_size_exact_matches_real_join(spark, sf_dir):
    """The histogram-product 'exact_rows' equals a literally executed join
    count for every audited edge, and the estimate is the scaled sample."""
    from sol_spark.queries.relational import _JSE_SCALE, stats_join_size_estimate
    from sol_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    a = t["lineitem"].select("l_partkey")
    b = t["lineitem"].select(t["lineitem"]["l_partkey"].alias("pk2"))
    real = {
        "customer x supplier ON nationkey": t["customer"]
        .join(t["supplier"], t["customer"]["c_nationkey"] == t["supplier"]["s_nationkey"])
        .count(),
        "lineitem x lineitem ON partkey": a.join(b, a["l_partkey"] == b["pk2"]).count(),
        "orders x customer ON custkey": t["orders"]
        .join(t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .count(),
    }
    rows = stats_join_size_estimate(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["exact_rows"] == real[r["join_name"]]
        assert r["est_rows"] == r["sampled_pairs"] * _JSE_SCALE
        assert r["err_sign"] in (1, -1)


def test_cluster_size_hist_mass_accounting(spark, sf_dir):
    """Histogram masses reconcile with the raw CC labels: sum(n_docs) ==
    labeled docs, sum(n_clusters) == distinct clusters, dup_excess ==
    docs - clusters, and no size-1 'clusters' (every CC label set has >=2
    members by construction of the pair graph)."""
    from sol_spark.operators.dedup import dedup_cluster_size_hist, dedup_clusters

    cc = dedup_clusters(spark, sf_dir).collect()
    n_docs = len(cc)
    n_clusters = len({r["cluster"] for r in cc})
    rows = dedup_cluster_size_hist(spark, sf_dir).collect()
    assert all(r["size"] >= 2 for r in rows)
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_clusters"] for r in rows) == n_clusters
    assert sum(r["dup_excess"] for r in rows) == n_docs - n_clusters
    for r in rows:
        assert r["n_docs"] == r["size"] * r["n_clusters"]
        assert r["dup_excess"] == (r["size"] - 1) * r["n_clusters"]


def test_calibration_partition_and_bounds(spark, sf_dir):
    """Bins partition the corpus; per-bin means and rates sit in [0, 1e6];
    the Brier term is bounded by 1e12 and consistent with the gap (a bin's
    Brier is at least the squared calibration gap, Jensen)."""
    from sol_spark.queries.relational import stats_calibration_brier
    from sol_spark.tables import load_tables

    rows = stats_calibration_brier(spark, sf_dir).collect()
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["mean_pred_ppm"] <= 1000000
        assert 0 <= r["frac_pos_ppm"] <= 1000000
        assert r["gap_ppm"] == abs(r["mean_pred_ppm"] - r["frac_pos_ppm"])
        assert 0 <= r["brier_e12"] <= 10**12
        # integer-division slack: each mean carries < 1 ppm truncation
        assert r["brier_e12"] >= r["gap_ppm"] * r["gap_ppm"] - 4 * 10**6
