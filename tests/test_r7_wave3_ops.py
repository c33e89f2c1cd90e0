"""Behavioral invariants for the round-7 third-wave operators: ROUGE-2 pair
scoring (Python bigram recompute over the candidate pairs) and the
character-class gibberish screen (regex feature recompute + flag law)."""

from __future__ import annotations

import re


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def test_rouge2_matches_python_bigrams(spark, sf_dir):
    from sol_spark.operators.dedup import dedup_rouge2_pairs, dedup_simhash
    from sol_spark.tables import load_tables

    docs = {
        r["doc_id"]: _norm(r["text"])
        for r in load_tables(spark, sf_dir)["documents"].select("doc_id", "text").collect()
    }

    def bigrams(did):
        tk = docs[did].split(" ")
        return {f"{a} {b}" for a, b in zip(tk, tk[1:])} if len(tk) >= 2 else set()

    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup_simhash(spark, sf_dir).collect()}
    rows = dedup_rouge2_pairs(spark, sf_dir).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == pairs
    n_pos = 0
    for r in rows:
        a, b = bigrams(r["doc_a"]), bigrams(r["doc_b"])
        m = len(a & b)
        assert r["n_shared_bigrams"] == m
        assert r["rouge2_recall_ppm"] == (1000000 * m) // len(b)
        assert r["rouge2_precision_ppm"] == (1000000 * m) // len(a)
        assert r["rouge2_f1_ppm"] == (2000000 * m) // (len(a) + len(b))
        # F1 is bounded by both directional scores
        assert r["rouge2_f1_ppm"] <= max(r["rouge2_recall_ppm"], r["rouge2_precision_ppm"])
        n_pos += m > 0
    assert n_pos > 0  # near-dup candidates share bigrams — non-vacuous


def test_gibberish_features_recompute(spark, sf_dir):
    from sol_spark.operators.text import (
        _GIB_CONS_RUN,
        _GIB_SYMBOL_MAX_PPM,
        _GIB_VOWEL_MIN_PPM,
        text_gibberish_score,
    )
    from sol_spark.tables import load_tables

    docs = {
        r["doc_id"]: r["text"]
        for r in load_tables(spark, sf_dir)["documents"].select("doc_id", "text").collect()
    }
    rows = {r["doc_id"]: r for r in text_gibberish_score(spark, sf_dir).collect()}
    assert set(rows) == set(docs)
    flags = set()
    for did, text in docs.items():
        low = text.lower()
        runs = re.findall(r"[bcdfghjklmnpqrstvwxyz]{2,}", low)
        max_run = max((len(x) for x in runs), default=1)
        n_letters = len(re.sub(r"[^a-z]", "", low))
        n_vowels = len(re.sub(r"[^aeiou]", "", low))
        n_symbols = len(re.sub(r"[a-z0-9 ]", "", low))
        n_digits = len(re.sub(r"[^0-9]", "", text))
        n = len(text)
        r = rows[did]
        assert r["max_cons_run"] == max_run
        vowel_ppm = (1000000 * n_vowels) // n_letters if n_letters else 0
        symbol_ppm = (1000000 * n_symbols) // n
        assert r["vowel_ppm"] == vowel_ppm
        assert r["symbol_ppm"] == symbol_ppm
        assert r["digit_ppm"] == (1000000 * n_digits) // n
        want = (
            max_run >= _GIB_CONS_RUN
            or (n_letters > 0 and vowel_ppm < _GIB_VOWEL_MIN_PPM)
            or symbol_ppm > _GIB_SYMBOL_MAX_PPM
        )
        assert r["gibberish"] == want
        flags.add(want)
    # The synthetic corpus is clean (max consonant run 3, zero symbols), so
    # the honest screen flags NOTHING — the per-row law above is the real
    # invariant; assert the features themselves vary so the expressions
    # aren't silently dead.
    assert flags == {False}
    assert len({r["vowel_ppm"] for r in rows.values()}) > 50
    assert {r["max_cons_run"] for r in rows.values()} >= {2, 3}
