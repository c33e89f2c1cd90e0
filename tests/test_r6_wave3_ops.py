"""Behavioral invariants for the round-6 third-wave operators: balanced
shard assignment, histogram quantile sketch, Jaccard link prediction, STL
decomposition, Holt-Winters, class-balanced sampling, survivorship,
personalized PageRank, and cross-table reconciliation. Oracle parity is
covered by the registry sweep; these pin the semantics the hash-compare
can't see (imbalance bounds, sketch error bounds, decomposition identities,
probability-mass conservation, exact-keep of the minority class).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shard_balance_bounds(spark, sf_dir):
    """Serpentine-LPT sharding must (a) cover every doc exactly once and
    (b) keep shard totals tight: with the fixture's doc-length spread the
    max/min total-chars ratio stays within a few percent — far tighter
    than the +-1-largest-doc worst case."""
    from sol_spark.operators.layout import BALANCE_SHARDS, layout_shard_balance

    rows = layout_shard_balance(spark, sf_dir).collect()
    assert len(rows) == BALANCE_SHARDS
    n_docs_total = sum(r["n_docs"] for r in rows)
    exact = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_docs_total == exact
    totals = [r["total_chars"] for r in rows]
    assert min(totals) > 0
    assert max(totals) / min(totals) < 1.05
    # share_bp sums to ~10000 (floor slack only)
    assert abs(sum(r["share_bp"] for r in rows) - 10000) <= BALANCE_SHARDS


def test_quantile_hist_error_bound(spark, sf_dir):
    """The histogram estimate must land within one bin width of the exact
    quantile (the construction guarantees it: the true quantile lives in
    the picked bin), and inside the [lo, hi] data range."""
    from sol_spark.queries.relational import QHIST_BINS, sketch_quantile_hist

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mm = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).collect()[0]
    bin_width = (mm["hi"] - mm["lo"]) / QHIST_BINS
    rows = sketch_quantile_hist(spark, sf_dir).collect()
    assert {r["q"] for r in rows} == {0.5, 0.9, 0.99}
    for r in rows:
        assert mm["lo"] <= r["est"] <= mm["hi"] + 1e-9
        assert r["abs_err"] <= bin_width + 1e-9


def test_jaccard_links_are_nonadjacent_and_bounded(spark, sf_dir):
    """Every scored pair must be absent from the underlying SimHash edge
    set, have >= 2 common neighbors, and score in (0, 1]."""
    from sol_spark.operators.dedup import (
        dedup_simhash,
        graph_jaccard_links,
        release_result,
    )

    links = graph_jaccard_links(spark, sf_dir)
    rows = links.collect()
    assert len(rows) > 0  # non-vacuous on the fixture
    edges = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_simhash(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    for r in rows:
        assert (r["doc_a"], r["doc_b"]) not in edges
        assert r["common_neighbors"] >= 2
        assert 0.0 < r["jaccard"] <= 1.0
    release_result(links)


def test_stl_identity_and_centered_seasonal(spark, sf_dir):
    """x = trend + seasonal + residual wherever the trend is defined (to
    output rounding), and the 24 seasonal slots sum to ~0 per series."""
    from sol_spark.queries.events_analytics import events_stl_decompose

    rows = events_stl_decompose(spark, sf_dir).collect()
    assert any(r["trend"] is not None for r in rows)
    by_type: dict[str, dict[int, float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["hour"].hour] = r["seasonal"]
        if r["trend"] is not None:
            recon = r["trend"] + r["seasonal"] + r["residual"]
            assert abs(recon - r["avg_value"]) < 5e-6
        else:
            assert r["residual"] is None
    for et, slots in by_type.items():
        assert len(slots) == 24, et
        assert abs(sum(slots.values())) < 24 * 1e-6


def test_holt_winters_recurrence_reference(spark, sf_dir):
    """Re-run the deseasonalized Holt recurrence sequentially in Python for
    one series and require (rounded) equality; forecast must equal
    level + trend + next slot's seasonal."""
    from sol_spark.queries.events_analytics import events_holt_winters

    rows = [
        r
        for r in events_holt_winters(spark, sf_dir).collect()
        if r["event_type"] == "view"
    ]
    rows.sort(key=lambda r: r["hour"])
    assert len(rows) > 24
    seas = {r["hour"].hour: r["seasonal"] for r in rows}
    l = b = 0.0
    for i, r in enumerate(rows):
        d = r["avg_value"] - r["seasonal"]
        if i == 0:
            l, b = d, 0.0
        else:
            l_new = 0.5 * d + 0.5 * (l + b)
            b = 0.5 * ((0.5 * d + 0.5 * (l + b)) - l) + 0.5 * b
            l = l_new
        # avg_value is rounded output, so the replay drifts by output
        # rounding only
        assert abs(l - r["level"]) < 1e-4
        nxt = seas[(r["hour"].hour + 1) % 24]
        assert abs((r["level"] + r["trend"] + nxt) - r["forecast_next"]) < 5e-6


def test_balanced_classes_minority_kept_exactly(spark, sf_dir):
    """The minority class's keep rate is 1e6 ppm, so it survives INTACT
    (coin < 1e6 always); every other class lands near the minority count
    (binomial concentration); nothing ever grows."""
    import math

    from sol_spark.queries.relational import sample_balanced_classes

    rows = sample_balanced_classes(spark, sf_dir).collect()
    assert len(rows) >= 2
    min_before = min(r["n_before"] for r in rows)
    for r in rows:
        assert r["n_after"] <= r["n_before"]
        if r["n_before"] == min_before:
            assert r["n_after"] == r["n_before"]  # minority intact
        else:
            sigma = math.sqrt(min_before)
            assert abs(r["n_after"] - min_before) <= 5 * sigma + 2


def test_survivorship_rules(spark, sf_dir):
    """One golden row per entity; survived_name must be the max-acctbal
    member's name (ties on custkey), survived_segment the min-custkey
    member's segment."""
    from sol_spark.operators.governance import er_clusters, er_survivorship

    cc = {r["custkey"]: r["entity_id"] for r in er_clusters(spark, sf_dir).collect()}
    cust = {
        r["c_custkey"]: r
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    golden = {r["entity_id"]: r for r in er_survivorship(spark, sf_dir).collect()}
    members: dict[int, list[int]] = {}
    for ck, eid in cc.items():
        members.setdefault(eid, []).append(ck)
    assert set(golden) == set(members)
    for eid, mlist in members.items():
        g = golden[eid]
        assert g["n_members"] == len(mlist) >= 2
        best = sorted(mlist, key=lambda ck: (-cust[ck]["c_acctbal"], ck))[0]
        assert g["survived_name"] == cust[best]["c_name"]
        assert g["survived_segment"] == cust[min(mlist)]["c_mktsegment"]


def test_ppr_mass_and_seed_locality(spark, sf_dir):
    """The undirected dup graph has no dangling nodes, so each PPR
    iteration conserves probability mass: ranks sum to ~1. Seeds carry
    strictly positive rank; nodes outside the seeds' components stay 0."""
    from sol_spark.operators.dedup import PPR_SEEDS, graph_ppr, release_result

    ranks = graph_ppr(spark, sf_dir)
    rows = ranks.collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-3  # rounding of |V| six-decimal values
    by_doc = {r["doc"]: r["rank"] for r in rows}
    seeds = sorted(by_doc)[:PPR_SEEDS]
    for s in seeds:
        assert by_doc[s] > 0
    assert any(v == 0.0 for v in by_doc.values()) or len(rows) <= PPR_SEEDS * 3
    release_result(ranks)


def test_reconciliation_totals(spark, sf_dir):
    """Bucketed counts must re-sum to the table-level counts; every bucket
    is present; count equality per bucket reflects the true orderkey sets."""
    from sol_spark.operators.governance import RECON_BUCKETS, dq_reconciliation

    rows = dq_reconciliation(spark, sf_dir).collect()
    assert len(rows) == RECON_BUCKETS
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r["n_src"] for r in rows) == orders.count()
    assert sum(r["n_tgt"] for r in rows) == li.select("l_orderkey").distinct().count()
    for r in rows:
        assert r["counts_match"] == (r["n_src"] == r["n_tgt"])


def test_token_bucket_python_replay(spark, sf_dir):
    """Replay the integer token-bucket state machine sequentially in Python
    over every user and require exact equality; the fixture must exercise
    BOTH branches of the gate."""
    from sol_spark.queries.events_analytics import (
        BUCKET_CAP,
        BUCKET_REFILL_S,
        events_token_bucket,
    )

    got = {
        r["event_id"]: (r["allowed"], r["tokens_after"])
        for r in events_token_bucket(spark, sf_dir).collect()
    }
    assert any(a for a, _ in got.values()) and not all(a for a, _ in got.values())
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts")
        .collect()
    )
    per_user: dict[int, list] = {}
    for r in events:
        per_user.setdefault(r["user_id"], []).append(r)
    import calendar

    for rows in per_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        tokens, last_t = 0, 0
        for i, r in enumerate(rows):
            t = calendar.timegm(r["ts"].timetuple())
            if i == 0:
                tokens, allowed = BUCKET_CAP - 1, True
            else:
                tokens = min(BUCKET_CAP, tokens + (t - last_t) // BUCKET_REFILL_S)
                allowed = tokens >= 1
                if allowed:
                    tokens -= 1
            last_t = t
            assert got[r["event_id"]] == (allowed, tokens), r["event_id"]


def test_cc_incremental_equals_full(spark, sf_dir):
    """The quotient-graph incremental fold must reproduce the full CC
    labeling EXACTLY (doc -> cluster), and the late split must actually
    exercise cross-cluster merges (quotient edges between distinct base
    labels exist on the fixture)."""
    from sol_spark.operators.dedup import (
        dedup_cc_incremental,
        dedup_clusters,
        release_result,
    )

    inc = dedup_cc_incremental(spark, sf_dir)
    full = dedup_clusters(spark, sf_dir)
    got = {(r["doc"], r["cluster"]) for r in inc.collect()}
    want = {(r["doc"], r["cluster"]) for r in full.collect()}
    assert got == want
    release_result(inc)
    release_result(full)


def test_rand_index_bounds_and_selfcheck(spark, sf_dir):
    """Rand in [0, 1], ARI <= 1; the two methods genuinely disagree on the
    fixture (ari < 1), and pair counts obey the contingency identities."""
    from sol_spark.operators.dedup import dedup_rand_index

    r = dedup_rand_index(spark, sf_dir).collect()[0]
    assert 0.0 <= r["rand_index"] <= 1.0
    assert r["ari"] <= 1.0
    assert r["ari"] < 1.0  # methods differ on the fixture
    assert r["agree_pairs"] <= min(r["pairs_a"], r["pairs_b"])
    assert r["n_docs"] >= 2
