"""Behavioral invariants for the round-6 fifth-wave operators: the Bloom
semi-join prefilter audit, hashing-trick featurization, incremental
agg-state merge, and the daily backlog series. Oracle parity is covered by
the registry sweep; these pin the semantics the hash-compare can't see
(zero false negatives, sign-sum parity, merge-equals-direct, flow
conservation).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bloom_prefilter_no_false_negatives_and_nonvacuous_fp(spark, sf_dir):
    """Every build-side member must pass the filter (structural Bloom
    guarantee), false positives are non-vacuous at fixture scale, and the
    audit scalars are internally consistent."""
    from sol_spark.queries.relational import (
        BLOOM_BITS_PER_ELEM,
        sketch_bloom_prefilter,
    )

    r = sketch_bloom_prefilter(spark, sf_dir).collect()[0]
    assert r["m_bits"] == max(BLOOM_BITS_PER_ELEM * r["n_members"], 64)
    # no false negatives: every true member passes
    assert r["n_true"] == r["n_members"]
    assert r["n_pass"] >= r["n_true"]
    assert r["false_pos"] == r["n_pass"] - r["n_true"]
    assert r["false_pos"] > 0, "bloom FP path must be exercised on the fixture"
    assert 0 < r["bits_set"] <= min(3 * r["n_members"], r["m_bits"])
    tn = r["n_probes"] - r["n_true"]
    assert abs(r["fpr_measured"] - r["false_pos"] / tn) < 1e-6
    assert 0.0 < r["fpr_load_est"] < 1.0


def test_feature_hashing_parity_and_ranges(spark, sf_dir):
    """Signed-sum features obey |feat| <= n_tok with matching parity
    (each token occurrence contributes exactly +-1), buckets are in
    range, and only the sampled docs appear."""
    from sol_spark.operators.text import (
        FHASH_BUCKETS,
        FHASH_DOC_MOD,
        text_feature_hashing,
    )

    rows = text_feature_hashing(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % FHASH_DOC_MOD == 0
        assert 0 <= r["bucket"] < FHASH_BUCKETS
        assert r["feat"] != 0
        assert abs(r["feat"]) <= r["n_tok"]
        assert (r["n_tok"] - abs(r["feat"])) % 2 == 0


def test_agg_state_merge_equals_direct(spark, sf_dir):
    """The merged base+delta state must equal a direct single-pass
    aggregation of the full fact table (the lossless-merge property),
    re-derived here in Spark independently of the DuckDB oracle."""
    from sol_spark.operators.governance import warehouse_agg_state_merge
    from sol_spark.tables import load_tables

    merged = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in warehouse_agg_state_merge(spark, sf_dir).collect()
    }
    li = load_tables(spark, sf_dir)["lineitem"]
    cents_p = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    direct = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents_p).alias("sum_price_cents"),
        F.min(cents_p).alias("min_price_cents"),
        F.max(cents_p).alias("max_price_cents"),
    )
    for d in direct.collect():
        m = merged[(d["l_returnflag"], d["l_linestatus"])]
        for c in ("n_rows", "sum_price_cents", "min_price_cents", "max_price_cents"):
            assert m[c] == d[c], (c, m[c], d[c])
    assert len(merged) == direct.count()


def test_backlog_flow_conservation(spark, sf_dir):
    """backlog(d) = backlog(d-1) + opened(d) - closed(d), never negative
    (an order ships only after it is opened), and the final backlog is
    exactly the number of orders that never fully ship (no lineitems)."""
    from sol_spark.queries.relational import orders_backlog_snapshot
    from sol_spark.tables import load_tables

    rows = orders_backlog_snapshot(spark, sf_dir).collect()
    assert rows
    prev = 0
    for r in rows:
        assert r["backlog"] == prev + r["opened"] - r["closed"]
        assert r["backlog"] >= 0
        prev = r["backlog"]
    t = load_tables(spark, sf_dir)
    n_orders = t["orders"].count()
    n_shipped = t["lineitem"].select("l_orderkey").distinct().count()
    assert prev == n_orders - n_shipped
