"""Behavioral invariants for the round-6 nineteenth-wave operators:
two-stage retrieval (candidate-set containment + rerank consistency) and
the revenue bridge (exact decomposition identity, Python recompute)."""

from __future__ import annotations

from collections import defaultdict


def test_two_stage_contained_in_stage1_and_ordered(spark, sf_dir):
    """Every final hit is a stage-1 Hamming candidate; final ranks are
    cosine-ordered; a result identical to brute-force exact top-k whenever
    the exact winners survive stage 1."""
    from sol_spark.operators.similarity import (
        TOP_K,
        sim_topk_exact,
        sim_two_stage_retrieval,
    )

    final = sim_two_stage_retrieval(spark, sf_dir).collect()
    exact = sim_topk_exact(spark, sf_dir).collect()
    by_q = defaultdict(list)
    for r in final:
        by_q[r["qid"]].append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, TOP_K + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["cosine"] >= b["cosine"]
    # consistency: if the two-stage result contains an exact winner at the
    # same rank position, its cosine must equal the exact run's.
    exact_map = {(r["qid"], r["cid"]): r["cosine"] for r in exact}
    for r in final:
        if (r["qid"], r["cid"]) in exact_map:
            assert r["cosine"] == exact_map[(r["qid"], r["cid"])]


def test_revenue_bridge_decomposition_identity(spark, sf_dir):
    """volume + price/mix == delta EXACTLY per group, and the pivoted
    sums reconcile with a Python recompute over raw joined rows."""
    from sol_spark.queries.relational import orders_revenue_bridge
    from sol_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], r["o_orderdate"].year)
        for r in t["orders"].select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
    }
    acc = defaultdict(lambda: [0, 0, 0, 0])  # rev_e, rev_l, qty_e, qty_l
    for li in t["lineitem"].select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    ).collect():
        grp, yr = orders[li["l_orderkey"]]
        # Spark round() is HALF-UP on the shortest decimal string; Python's
        # built-in round is half-even — replicate Spark's rule exactly.
        from decimal import ROUND_HALF_UP, Decimal

        raw = li["l_extendedprice"] * (1 - li["l_discount"]) * 100
        cents = int(Decimal(repr(raw)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
        qty = int(li["l_quantity"])
        a = acc[grp]
        if yr < 1997:
            a[0] += cents
            a[2] += qty
        else:
            a[1] += cents
            a[3] += qty
    rows = {r["grp"]: r for r in orders_revenue_bridge(spark, sf_dir).collect()}
    assert set(rows) == set(acc)
    for grp, r in rows.items():
        rev_e, rev_l, qty_e, qty_l = acc[grp]
        assert (r["rev_e"], r["rev_l"]) == (rev_e, rev_l)
        assert r["delta_cents"] == rev_l - rev_e
        # exact decomposition identity
        assert r["volume_effect_cents"] + r["price_mix_effect_cents"] == r["delta_cents"]
        # floor-division volume term (Python // floors like DuckDB)
        assert r["volume_effect_cents"] == (qty_l - qty_e) * rev_e // qty_e
