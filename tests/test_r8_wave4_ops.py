"""Behavioral pins for the round-8 wave-4 operators."""

from __future__ import annotations

import hashlib
import re


def _norm_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _kgrams(tk: list[str], k: int, cap: int) -> list[tuple[int, int]]:
    """(position, 60-bit hash) anchors with the per-doc frequency cap."""
    raw = [
        (p + 1, int(hashlib.md5(" ".join(tk[p : p + k]).encode()).hexdigest()[:15], 16))
        for p in range(len(tk) - k + 1)
    ]
    from collections import Counter

    freq = Counter(h for _, h in raw)
    return [(p, h) for p, h in raw if freq[h] <= 8]


def _longest_shared_run(a: list[tuple[int, int]], b: list[tuple[int, int]], k: int):
    """Replay the diagonal gaps-and-islands in pure Python."""
    from collections import defaultdict

    by_hash = defaultdict(list)
    for p, h in b:
        by_hash[h].append(p)
    diags = defaultdict(list)
    for pa, h in a:
        for pb in by_hash.get(h, ()):
            diags[pa - pb].append(pa)
    runs = []
    for pas in diags.values():
        pas = sorted(set(pas))
        start = prev = pas[0]
        for p in pas[1:]:
            if p == prev + 1:
                prev = p
                continue
            runs.append(prev - start + 1)
            start = prev = p
        runs.append(prev - start + 1)
    if not runs:
        return None
    return max(runs) + k - 1, len(runs), sum(runs)


def test_shared_spans_matches_python_replay(spark, sf_dir):
    """Every reported pair's statistics must equal a pure-Python replay of
    the positional k-gram islands over the raw fixture texts, and the run
    lengths must be non-vacuous (the fixture's near-dup pairs share real
    verbatim passages, not just the k-gram minimum)."""
    from sol_spark.operators.dedup import SPAN_K, dedup_shared_spans

    rows = dedup_shared_spans(spark, sf_dir).collect()
    assert rows, "fixture must yield at least one shared-span pair"

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        a = _kgrams(_norm_tokens(docs[r["doc_a"]]), SPAN_K, 8)
        b = _kgrams(_norm_tokens(docs[r["doc_b"]]), SPAN_K, 8)
        got = _longest_shared_run(a, b, SPAN_K)
        assert got is not None
        assert got == (
            r["longest_run_tokens"],
            r["n_spans"],
            r["n_matched_kgrams"],
        ), f"pair ({r['doc_a']},{r['doc_b']})"
    assert max(r["longest_run_tokens"] for r in rows) > SPAN_K, (
        "at least one pair must share a run strictly longer than the anchor"
    )
