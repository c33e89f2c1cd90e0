"""Behavioral invariants for the round-6 ninth-wave operators: sign-bit
Hamming retrieval (recomputed exactly in Python), Mann-Whitney AUC
(recomputed from the raw table with the average-rank formula), hard-negative
mining (label constraint + ordering), FD discovery (key FDs hold, metric
consistency), and the curriculum schedule (partition + stage-monotonicity
laws the hash-compare can't see).
"""

from __future__ import annotations

from collections import defaultdict


def _emb_rows(spark, sf_dir):
    from sol_spark.tables import load_tables

    return load_tables(spark, sf_dir)["embeddings"].collect()


def test_hamming_topk_matches_python_recompute(spark, sf_dir):
    """Exact Python recompute of the sign-bit Hamming top-k: identical
    (qid, rk) -> (cid, hamming) table, including the cid tie order."""
    from sol_spark.operators.similarity import (
        HAM_TOP_K,
        N_QUERIES,
        sim_topk_hamming,
    )

    rows = _emb_rows(spark, sf_dir)
    words = {}
    for r in rows:
        bits = 0
        for i, v in enumerate(r["embedding"]):
            if float(v) >= 0.0:
                bits |= 1 << i
        words[r["vec_id"]] = bits
    expected = {}
    for qid in range(N_QUERIES):
        scored = sorted(
            (bin(words[qid] ^ w).count("1"), cid)
            for cid, w in words.items()
            if cid != qid
        )
        for rk, (ham, cid) in enumerate(scored[:HAM_TOP_K], start=1):
            expected[(qid, rk)] = (cid, ham)
    got = {
        (r["qid"], r["rk"]): (r["cid"], r["hamming"])
        for r in sim_topk_hamming(spark, sf_dir).collect()
    }
    assert got == expected


def test_hamming_recall_accounting(spark, sf_dir):
    """recall_ppm is exactly the integer-ppm of n_overlap / k, one row per
    query, overlap bounded by k."""
    from sol_spark.operators.similarity import (
        HAM_TOP_K,
        N_QUERIES,
        sim_hamming_recall,
    )

    rows = sim_hamming_recall(spark, sf_dir).collect()
    assert sorted(r["qid"] for r in rows) == list(range(N_QUERIES))
    for r in rows:
        assert 0 <= r["n_overlap"] <= HAM_TOP_K
        assert r["recall_ppm"] == (1000000 * r["n_overlap"]) // HAM_TOP_K


def test_hard_negatives_label_constraint_and_order(spark, sf_dir):
    """Every mined negative has a label different from its query's; within
    a query, cosine is non-increasing in rk and the negative is never the
    query itself."""
    from sol_spark.operators.similarity import TOP_K, sim_hard_negatives

    rows = sim_hard_negatives(spark, sf_dir).collect()
    by_q = defaultdict(list)
    for r in rows:
        assert r["clabel"] != r["qlabel"]
        assert r["cid"] != r["qid"]
        by_q[r["qid"]].append(r)
    for _, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, TOP_K + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["cosine"] >= b["cosine"]


def test_auc_matches_average_rank_recompute(spark, sf_dir):
    """Recompute per-source AUC from the raw documents table with the
    textbook average-rank Mann-Whitney formula (floats) and require the
    operator's exact-integer u2 to match 2*U exactly."""
    from sol_spark.queries.relational import stats_auc_mannwhitney
    from sol_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("source", "n_chars", "lang").collect()
    by_src = defaultdict(list)
    for d in docs:
        by_src[d["source"]].append((d["n_chars"], 1 if d["lang"] == "en" else 0))
    expected = {}
    for src, vals in by_src.items():
        n1 = sum(p for _, p in vals)
        n0 = len(vals) - n1
        if n1 == 0 or n0 == 0:
            continue
        vals.sort()
        # average ranks over ties, twice-the-rank-sum stays integral
        r2 = 0
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j][0] == vals[i][0]:
                j += 1
            # ranks i+1..j, average rank doubled = (i+1) + j
            tie_pos = sum(p for _, p in vals[i:j])
            r2 += tie_pos * ((i + 1) + j)
            i = j
        u2 = r2 - n1 * (n1 + 1)
        expected[src] = (n1, n0, u2, (1000000 * u2) // (2 * n1 * n0))
    got = {
        r["source"]: (r["n_pos"], r["n_neg"], r["u2"], r["auc_ppm"])
        for r in stats_auc_mannwhitney(spark, sf_dir).collect()
    }
    assert got == expected
    for n1, n0, u2, ppm in got.values():
        assert 0 <= u2 <= 2 * n1 * n0
        assert 0 <= ppm <= 1000000


def test_fd_discovery_keys_hold_and_metrics_consistent(spark, sf_dir):
    """Primary-key FDs report zero violations; holds == (n_violations == 0)
    == (err_ppm == 0); distinct-LHS count never exceeds the row count."""
    from sol_spark.operators.governance import warehouse_fd_discovery

    rows = {r["fd"]: r for r in warehouse_fd_discovery(spark, sf_dir).collect()}
    assert rows["nation: n_nationkey -> n_regionkey"]["holds"] == 1
    assert rows["orders: o_orderkey -> o_orderstatus"]["holds"] == 1
    for r in rows.values():
        assert (r["holds"] == 1) == (r["n_violations"] == 0) == (r["err_ppm"] == 0)
        assert 0 < r["n_lhs"] <= r["n_rows"]
        assert 0 <= r["n_violations"] < r["n_rows"]


def test_curriculum_partition_and_stage_monotonicity(spark, sf_dir):
    """The schedule is a partition of the corpus (doc and char totals
    conserved); stage sizes are an equal-count cut (differ by < shard
    granularity only through the +-1 rank remainder); difficulty envelopes
    never interleave: max_chars of stage i <= min_chars of stage i+1."""
    from sol_spark.operators.text import CURRICULUM_STAGES, sample_curriculum
    from sol_spark.tables import load_tables

    rows = sample_curriculum(spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir)["documents"]
    n_docs = docs.count()
    total_chars = docs.groupBy().sum("n_chars").collect()[0][0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_chars"] for r in rows) == total_chars
    stage_n = defaultdict(int)
    stage_lo, stage_hi = {}, {}
    for r in rows:
        assert 0 <= r["stage"] < CURRICULUM_STAGES
        stage_n[r["stage"]] += r["n_docs"]
        stage_lo[r["stage"]] = min(stage_lo.get(r["stage"], 10**18), r["min_chars"])
        stage_hi[r["stage"]] = max(stage_hi.get(r["stage"], -1), r["max_chars"])
    sizes = [stage_n[s] for s in range(CURRICULUM_STAGES)]
    assert max(sizes) - min(sizes) <= 1  # equal-count cut
    for s in range(CURRICULUM_STAGES - 1):
        assert stage_hi[s] <= stage_lo[s + 1]
