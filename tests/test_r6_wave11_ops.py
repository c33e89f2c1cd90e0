"""Behavioral invariants for the round-6 eleventh-wave operators: int8
scalar-quantized retrieval (range/ordering laws), retrieval rank metrics
(internal identities + relevant-population recompute), and the DP quantile
release (exact true-bin recompute + accounting)."""

from __future__ import annotations

from collections import Counter, defaultdict


def test_int8_topk_bounds_and_ordering(spark, sf_dir):
    from sol_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        TOP_K,
        sim_topk_int8,
    )

    rows = sim_topk_int8(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES * TOP_K
    cap = EMB_DIM * 127 * 127
    by_q = defaultdict(list)
    for r in rows:
        assert -cap <= r["dot_int"] <= cap
        assert r["cid"] != r["qid"]
        by_q[r["qid"]].append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, TOP_K + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["dot_int"] >= b["dot_int"]


def test_rank_metrics_identities_and_rel_population(spark, sf_dir):
    """p@k is exactly the ppm of hits; ndcg is 0 iff nothing relevant was
    retrieved and never exceeds 1; n_rel_all matches a direct label count
    over the raw embeddings table."""
    from sol_spark.operators.similarity import N_QUERIES, RANK_K, sim_rank_metrics
    from sol_spark.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "label").collect()
    label_of = {r["vec_id"]: r["label"] for r in emb}
    label_counts = Counter(r["label"] for r in emb)
    rows = sim_rank_metrics(spark, sf_dir).collect()
    assert sorted(r["qid"] for r in rows) == list(range(N_QUERIES))
    for r in rows:
        assert r["n_rel_all"] == label_counts[label_of[r["qid"]]] - 1
        assert r["p_at_k_ppm"] == (1000000 * r["n_rel_top"]) // RANK_K
        assert 0 <= r["n_rel_top"] <= RANK_K
        assert 0.0 <= r["ndcg"] <= 1.0
        if r["n_rel_top"] == 0:
            assert r["ndcg"] == 0.0 and r["mrr_ppm"] == 0
        else:
            assert r["ndcg"] > 0.0
            assert 1000000 // RANK_K <= r["mrr_ppm"] <= 1000000


def test_dp_quantile_truth_and_accounting(spark, sf_dir):
    """true_bin matches an exact Python quantile over the binned orders;
    rank_err is the released-vs-target distance; the released bin is a
    real histogram bin."""
    from sol_spark.operators.governance import (
        DP_QUANT_BINW,
        _DP_QUANT_QS,
        privacy_dp_quantile,
    )
    from sol_spark.tables import load_tables

    orders = load_tables(spark, sf_dir)["orders"].select("o_totalprice").collect()
    bins = sorted(int(r["o_totalprice"]) // DP_QUANT_BINW for r in orders)
    n = len(bins)
    rows = privacy_dp_quantile(spark, sf_dir).collect()
    assert sorted(r["q"] for r in rows) == sorted(_DP_QUANT_QS)
    bin_set = set(bins)
    for r in rows:
        target = (r["q"] * n) // 100
        assert r["target"] == target
        # true bin: smallest bin whose cumulative count reaches the target
        assert r["true_bin"] == bins[max(target - 1, 0)]
        assert r["released_bin"] in bin_set
        assert r["rank_err"] == abs(r["released_rank_mid"] - r["target"])
