"""Behavioral invariants for the round-6 fourteenth-wave operators: split
leakage (Python shingle recompute on a sample + split-law), OOV rate
(keep-list laws), shard manifest (partition + fingerprint commutativity),
and peak concurrency (Python sweep recompute + coverage consistency)."""

from __future__ import annotations

from collections import defaultdict


def test_split_leakage_accounting_and_split_law(spark, sf_dir):
    """Val-doc counts per source match the hash split; leaked docs are a
    subset of val docs; a val doc that is an EXACT duplicate of a train
    doc must be flagged leaked (exact dup => shared shingles)."""
    from sol_spark.operators.text import text_split_leakage
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_dir)["documents"]
    bucket = F.expr(
        "CAST(conv(substring(md5(cast(doc_id AS string)), 1, 6), 16, 10) AS BIGINT) % 100"
    )
    split = docs.select(
        "doc_id", "source", "text", F.when(bucket < 10, "val").otherwise("train").alias("split")
    ).collect()
    val_by_src = defaultdict(int)
    train_texts = set()
    for r in split:
        if r["split"] == "train":
            train_texts.add(" ".join(r["text"].lower().split()))
    exact_dup_val = set()
    for r in split:
        if r["split"] == "val":
            val_by_src[r["source"]] += 1
            if " ".join(r["text"].lower().split()) in train_texts:
                exact_dup_val.add(r["source"])
    rows = {r["source"]: r for r in text_split_leakage(spark, sf_dir).collect()}
    assert {s for s, n in val_by_src.items() if n} == set(rows)
    total_leaked = 0
    for src, r in rows.items():
        assert r["n_val_docs"] == val_by_src[src]
        assert 0 <= r["n_leaked_docs"] <= r["n_val_docs"]
        assert r["leak_ppm"] == (1000000 * r["n_leaked_docs"]) // r["n_val_docs"]
        total_leaked += r["n_leaked_docs"]
        if src in exact_dup_val:
            assert r["n_leaked_docs"] > 0
    assert total_leaked > 0, "fixture dups must produce a non-vacuous leak"


def test_oov_rate_keep_list_laws(spark, sf_dir):
    """Token totals reconcile with a direct token count; OOV never exceeds
    the total; a corpus-wide weighted OOV rate below 1 (the vocab top-200
    must cover something)."""
    from sol_spark.operators.text import text_oov_rate
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    rows = text_oov_rate(spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir)["documents"]
    n_tokens = docs.select(
        F.size(F.split(F.expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), " ")).alias("n")
    ).groupBy().sum("n").collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == n_tokens
    tot_oov = sum(r["n_oov"] for r in rows)
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_ppm"] == (1000000 * r["n_oov"]) // r["n_tokens"]
    assert tot_oov < n_tokens


def test_shard_manifest_partition_and_commutativity(spark, sf_dir):
    """Shards partition the corpus (docs and chars conserved); the
    fingerprint equals the Python-recomputed commutative sum per shard."""
    import hashlib

    from sol_spark.operators.layout import (
        MANIFEST_SHARDS,
        _MANIFEST_FP_MOD,
        layout_shard_manifest,
    )
    from sol_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "n_chars").collect()
    exp = defaultdict(lambda: [0, 0, 0])
    for d in docs:
        sid = str(d["doc_id"])
        shard = int(hashlib.md5(("sh" + sid).encode()).hexdigest()[:8], 16) % MANIFEST_SHARDS
        fp = int(hashlib.md5(("fp" + sid).encode()).hexdigest()[:12], 16) % _MANIFEST_FP_MOD
        exp[shard][0] += 1
        exp[shard][1] += d["n_chars"]
        exp[shard][2] += fp
    rows = layout_shard_manifest(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    for r in rows:
        e = exp[r["shard"]]
        assert (r["n_docs"], r["total_chars"], r["content_fingerprint"]) == tuple(e)


def test_peak_concurrency_matches_python_sweep(spark, sf_dir):
    """Exact Python boundary-sweep recompute per day; peak is consistent
    with interval coverage (peak >= 1 wherever events exist, and a day's
    peak never exceeds its interval count)."""
    from sol_spark.queries.events_analytics import (
        COVERAGE_WIDTH_S,
        events_peak_concurrency,
    )
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    evs = (
        load_tables(spark, sf_dir)["events"]
        .select(
            F.expr("date_format(CAST(ts AS DATE), 'yyyy-MM-dd')").alias("day"),
            F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").alias("s"),
            "event_id",
        )
        .collect()
    )
    by_day = defaultdict(list)
    for e in evs:
        by_day[e["day"]].append((e["s"], e["event_id"]))
    expected = {}
    for day, items in by_day.items():
        bounds = []
        for s, eid in items:
            bounds.append((s, 1, eid))
            bounds.append((s + COVERAGE_WIDTH_S, -1, eid))
        bounds.sort()
        live = peak = 0
        for _, delta, _ in bounds:
            live += delta
            peak = max(peak, live)
        expected[day] = (peak, len(items))
    got = {
        r["day"]: (r["peak_concurrent"], r["n_intervals"])
        for r in events_peak_concurrency(spark, sf_dir).collect()
    }
    assert got == expected
    for peak, n in got.values():
        assert 1 <= peak <= n
