"""Behavioral invariants for the round-6 seventh-wave operators: stupid-
backoff trigram LM scoring, DoReMi domain reweighting, and soft-dedup
inverse-multiplicity weights. Oracle parity is covered by the registry
sweep; these pin the semantics the hash-compare can't see (backoff-tier
accounting, EG-weight simplex/monotonicity laws, cross-operator
consistency with exact dedup).
"""

from __future__ import annotations


def test_trigram_backoff_tier_accounting(spark, sf_dir):
    """Tier counts partition the trigram positions; the training slice is
    fully in-model (tier 3 only); held-out slices actually exercise the
    backoff chain; stupid-backoff scores are log-probability-like (<= 0)."""
    from sol_spark.operators.text import LM_TRIGRAM_LANG, text_lm_trigram_backoff

    rows = text_lm_trigram_backoff(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_hit3"] + r["n_hit2"] + r["n_back1"] == r["n_trigrams"]
        assert r["n_trigrams"] >= 1
        assert r["avg_logprob"] <= 0.0
        if r["lang"] == LM_TRIGRAM_LANG:
            # model trained on this slice: every trigram is in-model
            assert r["n_hit3"] == r["n_trigrams"]
            assert r["n_hit2"] == 0 and r["n_back1"] == 0
    held_out = [r for r in rows if r["lang"] != LM_TRIGRAM_LANG]
    assert held_out, "fixture must contain held-out languages"
    assert sum(r["n_hit2"] for r in held_out) > 0, "bigram backoff never fired"
    assert sum(r["n_back1"] for r in held_out) > 0, "unigram backoff never fired"


def test_doremi_weights_simplex_and_monotone(spark, sf_dir):
    """EG weights live on the simplex, respect the uniform-smoothing floor
    c/K, and are monotone in the (quantized) excess-loss signal — the
    defining property of multiplicative-weights updates from a uniform
    start with a fixed gradient."""
    from sol_spark.operators.text import DOREMI_SMOOTH, text_doremi_mix

    rows = text_doremi_mix(spark, sf_dir).collect()
    k = len(rows)
    assert k >= 2
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < 1e-4  # rounded to 6 digits per row
    floor = DOREMI_SMOOTH / k
    for r in rows:
        assert floor - 1e-9 <= r["weight"] < 1.0
        assert r["excess"] >= 0.0
        assert r["n_docs"] > 0 and r["n_tokens"] > 0
    by_excess = sorted(rows, key=lambda r: r["excess"])
    for lo, hi in zip(by_excess, by_excess[1:]):
        if hi["excess"] > lo["excess"]:
            assert hi["weight"] >= lo["weight"] - 1e-9
    # the reweighting must actually move mass off uniform on the fixture
    assert max(r["weight"] for r in rows) > 1.0 / k + 1e-6


def test_soft_weights_cover_corpus_and_bound_exact_dups(spark, sf_dir):
    """Every document gets exactly one weight = 1/(1 + n_near_dups); exact
    duplicates (same normalized text => identical signature => identical
    bands) must be counted in each other's multiplicity, so a doc in an
    exact-dup group of size c has n_near_dups >= c - 1."""
    from sol_spark.operators.dedup import (
        dedup_exact,
        dedup_minhash_lsh,
        dedup_soft_weights,
    )
    from sol_spark.tables import load_tables

    sw = {r["doc_id"]: r for r in dedup_soft_weights(spark, sf_dir).collect()}
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    assert len(sw) == n_docs
    for r in sw.values():
        assert r["n_near_dups"] >= 0
        assert abs(r["weight"] - round(1.0 / (1 + r["n_near_dups"]), 6)) < 1e-9
    groups = dedup_exact(spark, sf_dir).collect()
    dup_groups = [g for g in groups if g["n_copies"] >= 2]
    for g in dup_groups:
        assert sw[g["keeper_doc_id"]]["n_near_dups"] >= g["n_copies"] - 1
    # every verified near-dup pair shares a band by construction, so both
    # endpoints must carry positive multiplicity (sf0.001 has no exact
    # dups, so this is the non-vacuous leg there)
    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    assert dup_groups or pairs, "fixture must contain some duplication signal"
    for p in pairs:
        assert sw[p["doc_a"]]["n_near_dups"] >= 1
        assert sw[p["doc_b"]]["n_near_dups"] >= 1
    assert any(r["n_near_dups"] > 0 for r in sw.values())
