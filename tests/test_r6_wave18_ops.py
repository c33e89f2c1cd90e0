"""Behavioral invariants for the round-6 eighteenth-wave operators:
k-means purity (partition + majority laws) and bridge allocation
(exact conservation per order, recomputed from raw lineitem)."""

from __future__ import annotations

from collections import Counter, defaultdict


def test_centroid_purity_laws(spark, sf_dir):
    """Cells partition the corpus; majority counts are maximal per cell;
    weighted purity is at least 1/n_labels (the uninformed floor)."""
    from sol_spark.operators.similarity import sim_centroid_purity
    from sol_spark.tables import load_tables

    rows = sim_centroid_purity(spark, sf_dir).collect()
    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "label").collect()
    n_vecs = len(emb)
    n_labels = len({r["label"] for r in emb})
    assert sum(r["n_members"] for r in rows) == n_vecs
    weighted = 0
    for r in rows:
        assert 0 < r["n_majority"] <= r["n_members"]
        assert r["purity_ppm"] == (1000000 * r["n_majority"]) // r["n_members"]
        weighted += r["n_majority"]
    assert weighted * n_labels >= n_vecs  # >= the 1/n_labels floor


def test_bridge_allocation_conservation(spark, sf_dir):
    """Per-priority factor totals equal 10000*orders (the conserved flag
    is 1 everywhere); allocated cents-bp equals 10000x the revenue cents;
    Python recompute of line counts matches."""
    from sol_spark.operators.governance import warehouse_bridge_allocation
    from sol_spark.tables import load_tables

    rows = warehouse_bridge_allocation(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    lines_per_order = Counter(
        r["l_orderkey"] for r in t["lineitem"].select("l_orderkey").collect()
    )
    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], int(round(r["o_totalprice"] * 100)))
        for r in t["orders"].select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
    }
    exp = defaultdict(lambda: [0, 0, 0])  # n_orders, n_lines, cents
    for ok_, n in lines_per_order.items():
        pr, cents = orders[ok_]
        exp[pr][0] += 1
        exp[pr][1] += n
        exp[pr][2] += cents
    for r in rows:
        e = exp[r["priority"]]
        assert r["conserved"] == 1
        assert (r["n_orders"], r["n_lines"]) == (e[0], e[1])
        assert r["factor_bp_total"] == 10000 * e[0]
        assert r["alloc_centsbp"] == 10000 * e[2]
