"""Behavioral invariants for the round-6 twelfth-wave operators: Spearman
(exact Python average-rank recompute), KMV union/difference (exact-side
recount + sketch-law bounds), Wilson intervals (formula recompute + bound
laws), and the composed multimodal pipeline (flow-conservation accounting
against mm_integrity_audit)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def test_spearman_matches_python_recompute(spark, sf_dir):
    from sol_spark.queries.relational import stats_spearman_corr
    from sol_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    lines = Counter(r["l_orderkey"] for r in t["lineitem"].select("l_orderkey").collect())
    pairs = [
        (int(round(r["o_totalprice"] * 100)), lines.get(r["o_orderkey"], 0))
        for r in t["orders"].select("o_orderkey", "o_totalprice").collect()
    ]

    def ranks2(vals):
        cnt = Counter(vals)
        r2, cum = {}, 0
        for v in sorted(cnt):
            r2[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return r2

    ra = ranks2([a for a, _ in pairs])
    rb = ranks2([b for _, b in pairs])
    n = len(pairs)
    s1 = sum(ra[a] for a, _ in pairs)
    s2 = sum(rb[b] for _, b in pairs)
    s11 = sum(ra[a] ** 2 for a, _ in pairs)
    s22 = sum(rb[b] ** 2 for _, b in pairs)
    s12 = sum(ra[a] * rb[b] for a, b in pairs)
    rho = (n * s12 - s1 * s2) / (
        math.sqrt(n * s11 - s1 * s1) * math.sqrt(n * s22 - s2 * s2)
    )
    row = stats_spearman_corr(spark, sf_dir).collect()[0]
    assert row["n"] == n and row["s1"] == s1 and row["s2"] == s2
    assert abs(row["rho"] - rho) < 2e-6
    assert -1.0 <= row["rho"] <= 1.0


def test_kmv_union_diff_exact_sides_and_bounds(spark, sf_dir):
    from sol_spark.queries.relational import KMV_K, sketch_kmv_union_diff
    from sol_spark.tables import load_tables

    orders = load_tables(spark, sf_dir)["orders"].select("o_custkey", "o_orderdate").collect()
    a = {r["o_custkey"] for r in orders if r["o_orderdate"].year <= 1997}
    b = {r["o_custkey"] for r in orders if r["o_orderdate"].year >= 1997}
    row = sketch_kmv_union_diff(spark, sf_dir).collect()[0]
    assert row["exact_union"] == len(a | b)
    assert row["exact_diff"] == len(a - b)
    assert 0 <= row["diff_below_theta"] <= KMV_K
    assert row["kmv_union_est"] > 0
    assert row["union_rel_err"] >= 0 and row["diff_rel_err"] >= 0
    # the union estimate can't be below either side's sketch size - 1
    assert row["kmv_union_est"] >= KMV_K - 1 or row["exact_union"] < KMV_K


def test_wilson_bounds_laws_and_recompute(spark, sf_dir):
    from sol_spark.queries.relational import _WILSON_Z, stats_wilson_ci

    rows = stats_wilson_ci(spark, sf_dir).collect()
    assert rows
    z = _WILSON_Z
    for r in rows:
        n, pos = r["n"], r["pos"]
        p = pos / n
        center = p + z * z / (2.0 * n)
        half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        denom = 1.0 + z * z / n
        assert 0.0 <= r["wilson_lo"] <= p <= r["wilson_hi"] <= 1.0
        assert abs(r["wilson_lo"] - (center - half) / denom) < 2e-6
        assert abs(r["wilson_hi"] - (center + half) / denom) < 2e-6
        assert r["rate_ppm"] == (1000000 * pos) // n


def test_multimodal_pipeline_flow_conservation(spark, sf_dir):
    from sol_spark.operators.multimodal import (
        CHUNK_BYTES,
        MEDIA_BYTES,
        mm_integrity_audit,
        pipeline_multimodal_corpus,
    )
    from sol_spark.tables import load_tables

    rows = pipeline_multimodal_corpus(spark, sf_dir).collect()
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    audit = mm_integrity_audit(spark, sf_dir).collect()
    fails = defaultdict(int)
    for a in audit:
        if a["ok_magic"] == 0:
            fails[a["modality"]] += 1
    chunks_per = -(-MEDIA_BYTES // CHUNK_BYTES)
    assert sum(r["n_in"] for r in rows) == n_docs
    for r in rows:
        assert r["n_in"] - r["n_failed"] == r["n_passed"]
        assert r["n_failed"] == fails[r["modality"]]
        assert 0 < r["n_kept"] <= r["n_passed"]
        assert r["n_dup_dropped"] == r["n_passed"] - r["n_kept"]
        assert r["n_chunks"] == r["n_kept"] * chunks_per
        assert r["kept_bytes"] == r["n_kept"] * MEDIA_BYTES
