"""Behavioral invariants for the round-6 sixteenth-wave operators:
boilerplate screen (threshold law vs a Python recompute), code-switching
(marker-hit recompute), and the junk dimension (determinism + fact
coverage)."""

from __future__ import annotations

from collections import Counter, defaultdict


def _segments(text: str, chunk: int = 8):
    tk = " ".join(text.lower().split()).split(" ")
    return [" ".join(tk[i : i + chunk]) for i in range(0, len(tk), chunk)]


def test_boilerplate_threshold_law(spark, sf_dir):
    """Python recompute of the per-source document-frequency screen:
    flagged-segment and instance counts must match; share ppm is the exact
    integer division."""
    from sol_spark.operators.text import (
        BOILER_MIN_DOCS,
        BOILER_SHARE_BP,
        text_boilerplate_lines,
    )
    from sol_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "source", "text").collect()
    inst = defaultdict(Counter)
    with_doc = defaultdict(lambda: defaultdict(set))
    n_docs = Counter()
    for d in docs:
        n_docs[d["source"]] += 1
        for seg in _segments(d["text"]):
            inst[d["source"]][seg] += 1
            with_doc[d["source"]][seg].add(d["doc_id"])
    rows = {r["source"]: r for r in text_boilerplate_lines(spark, sf_dir).collect()}
    assert set(rows) == set(n_docs)
    for src, r in rows.items():
        boiler_segs = {
            seg
            for seg, ids in with_doc[src].items()
            if len(ids) >= BOILER_MIN_DOCS and 10000 * len(ids) >= BOILER_SHARE_BP * n_docs[src]
        }
        assert r["n_segments_distinct"] == len(inst[src])
        assert r["n_boiler_segments"] == len(boiler_segs)
        boiler_inst = sum(inst[src][s] for s in boiler_segs)
        assert r["boiler_instances"] == boiler_inst
        assert r["boiler_share_ppm"] == (1000000 * boiler_inst) // sum(inst[src].values())


def test_code_switching_recompute(spark, sf_dir):
    from sol_spark.operators.text import CS_MIN_HITS, text_code_switching
    from sol_spark.tables import load_tables

    en = {"the", "a", "of", "and", "is", "to", "in", "it", "you", "that"}
    de = {"der", "die", "das", "und", "ist", "zu", "den", "nicht", "ich", "ein"}
    docs = load_tables(spark, sf_dir)["documents"].select("source", "text").collect()
    n = Counter()
    mixed = Counter()
    for d in docs:
        toks = " ".join(d["text"].lower().split()).split(" ")
        n[d["source"]] += 1
        eh = sum(1 for t_ in toks if t_ in en)
        dh = sum(1 for t_ in toks if t_ in de)
        if eh >= CS_MIN_HITS and dh >= CS_MIN_HITS:
            mixed[d["source"]] += 1
    rows = {r["source"]: r for r in text_code_switching(spark, sf_dir).collect()}
    for src, r in rows.items():
        assert r["n_docs"] == n[src]
        assert r["n_mixed"] == mixed[src]
        assert r["mixed_ppm"] == (1000000 * mixed[src]) // n[src]


def test_junk_dimension_determinism_and_coverage(spark, sf_dir):
    """Surrogate keys are dense 1..K in (status, priority) order; two
    builds assign identical keys; n_facts covers the fact table exactly."""
    from sol_spark.operators.governance import warehouse_junk_dimension
    from sol_spark.tables import load_tables

    rows1 = warehouse_junk_dimension(spark, sf_dir).collect()
    rows2 = warehouse_junk_dimension(spark, sf_dir).collect()
    assert rows1 == rows2
    keys = [r["junk_key"] for r in rows1]
    assert keys == list(range(1, len(rows1) + 1))
    combos = [(r["status"], r["priority"]) for r in rows1]
    assert combos == sorted(combos)
    n_orders = load_tables(spark, sf_dir)["orders"].count()
    assert sum(r["n_facts"] for r in rows1) == n_orders
