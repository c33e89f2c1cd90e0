"""Behavioral invariants for the round-6 twenty-second-wave operators: the
adaptive length gate (fence order statistics recomputed in Python) and the
lifecycle-state table (growth-accounting identities)."""

from __future__ import annotations

from collections import defaultdict


def test_length_gate_fences_match_order_statistics(spark, sf_dir):
    from sol_spark.operators.text import _LG_HI_BP, _LG_LO_BP, text_length_gate_adaptive
    from sol_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("source", "n_chars").collect()
    by_src = defaultdict(list)
    for d in docs:
        by_src[d["source"]].append(d["n_chars"])
    rows = {r["source"]: r for r in text_length_gate_adaptive(spark, sf_dir).collect()}
    assert set(rows) == set(by_src)
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        # smallest value whose cumulative count reaches the bp threshold
        lo = next(v for i, v in enumerate(vals) if 10000 * (i + 1) >= _LG_LO_BP * n)
        hi = next(v for i, v in enumerate(vals) if 10000 * (i + 1) >= _LG_HI_BP * n)
        r = rows[src]
        assert (r["lo"], r["hi"]) == (lo, hi)
        kept = sum(1 for v in vals if lo <= v <= hi)
        assert r["n_docs"] == n and r["n_kept"] == kept
        assert r["keep_ppm"] == (1000000 * kept) // n
        assert kept >= (9000 * n) // 10000  # the fences keep >= ~90%


def test_lifecycle_growth_accounting_identities(spark, sf_dir):
    """active(t) = new + retained + resurrected matches the distinct
    weekly active count; delta active = new + resurrected - dormant for
    every interior week; states recompute from a Python replay."""
    from sol_spark.queries.events_analytics import events_lifecycle_states
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    weeks = (
        load_tables(spark, sf_dir)["events"]
        .select(
            "user_id",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 604800"
            ).alias("wk"),
        )
        .distinct()
        .collect()
    )
    user_weeks = defaultdict(set)
    for r in weeks:
        user_weeks[r["user_id"]].add(r["wk"])
    max_wk = max(w for ws in user_weeks.values() for w in ws)
    expected = defaultdict(int)
    for _, ws in user_weeks.items():
        first = min(ws)
        for w in ws:
            if w == first:
                expected[(w, "new")] += 1
            elif w - 1 in ws:
                expected[(w, "retained")] += 1
            else:
                expected[(w, "resurrected")] += 1
            if w + 1 not in ws and w + 1 <= max_wk:
                expected[(w + 1, "dormant")] += 1
    got = {
        (r["wk"], r["state"]): r["n_users"]
        for r in events_lifecycle_states(spark, sf_dir).collect()
    }
    assert got == dict(expected)
    # identities per week
    actives = defaultdict(int)
    for r in weeks:
        actives[r["wk"]] += 1
    wks = sorted(actives)
    for w in wks:
        assert actives[w] == (
            got.get((w, "new"), 0) + got.get((w, "retained"), 0) + got.get((w, "resurrected"), 0)
        )
    for a, b in zip(wks, wks[1:]):
        if b == a + 1:
            assert actives[b] - actives[a] == (
                got.get((b, "new"), 0) + got.get((b, "resurrected"), 0) - got.get((b, "dormant"), 0)
            )


def test_hash_uniformity_recompute_and_flag(spark, sf_dir):
    """chi2 recomputes exactly from Python bucket counts; the md5 buckets
    on the fixture must pass (flag 0) — the assumption every hash-mod
    sampler in the repo rests on."""
    import hashlib
    from collections import Counter

    from sol_spark.operators.governance import (
        _HU_BUCKETS,
        _HU_CRIT_E6,
        dq_hash_uniformity,
    )
    from sol_spark.tables import load_tables

    keys = [r["o_orderkey"] for r in load_tables(spark, sf_dir)["orders"].select("o_orderkey").collect()]
    counts = Counter(
        int(hashlib.md5(f"hu{k}".encode()).hexdigest()[:8], 16) % _HU_BUCKETS for k in keys
    )
    t = len(keys)
    k = _HU_BUCKETS
    chi2 = (1000000 * k * sum((n * k - t) ** 2 for n in counts.values())) // (k * k * t)
    row = dq_hash_uniformity(spark, sf_dir).collect()[0]
    assert row["n_buckets"] == len(counts) and row["n_rows"] == t
    assert row["min_bucket"] == min(counts.values())
    assert row["max_bucket"] == max(counts.values())
    assert row["chi2_e6"] == chi2
    assert row["nonuniform_flag"] == (1 if chi2 > _HU_CRIT_E6 else 0)
    assert row["nonuniform_flag"] == 0, "md5 buckets must look uniform on the fixture"


def test_prefilter_vs_postfilter_laws(spark, sf_dir):
    """Pre-filter always fills k; post-filter hits never exceed the pool
    or the pre-filter count at equal k; the deficit is non-vacuous on the
    fixture (the audit's whole point)."""
    from sol_spark.operators.similarity import (
        N_QUERIES,
        POSTFILTER_POOL,
        TOP_K,
        sim_prefilter_vs_postfilter,
    )

    rows = sim_prefilter_vs_postfilter(spark, sf_dir).collect()
    assert sorted(r["qid"] for r in rows) == list(range(N_QUERIES))
    for r in rows:
        assert r["prefilter_hits"] == TOP_K
        assert 0 <= r["postfilter_hits"] <= POSTFILTER_POOL
        assert r["lost_by_postfilter"] == r["prefilter_hits"] - r["postfilter_hits"]
    assert any(r["lost_by_postfilter"] > 0 for r in rows)


def test_dup_rate_by_source_accounting(spark, sf_dir):
    """Per-source totals cover the corpus; drops reconcile with the raw
    CC labels and the min-id keep rule; clustered >= dropped."""
    from collections import defaultdict

    from sol_spark.operators.dedup import dedup_clusters, dedup_rate_by_source
    from sol_spark.tables import load_tables

    cc = {r["doc"]: r["cluster"] for r in dedup_clusters(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "source").collect()
    exp = defaultdict(lambda: [0, 0, 0])
    for d in docs:
        e = exp[d["source"]]
        e[0] += 1
        if d["doc_id"] in cc:
            e[1] += 1
            if cc[d["doc_id"]] != d["doc_id"]:
                e[2] += 1
    rows = dedup_rate_by_source(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    for r in rows:
        e = exp[r["source"]]
        assert (r["n_docs"], r["n_clustered"], r["n_dropped"]) == tuple(e)
        assert r["n_dropped"] <= r["n_clustered"] <= r["n_docs"]
        assert r["drop_ppm"] == (1000000 * r["n_dropped"]) // r["n_docs"]
    assert any(r["n_dropped"] > 0 for r in rows)
