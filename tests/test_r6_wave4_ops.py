"""Behavioral invariants for the round-6 fourth-wave operators: the
retrieval family (BM25, RRF hybrid fusion, MMR re-rank) and edit-distance
near-dup detection. Oracle parity is covered by the registry sweep; these
pin the semantics the hash-compare can't see (metric bounds, fusion score
range, the MMR first-pick identity, Levenshtein lower bounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_edit_distance_pairs_bounds(spark, sf_dir):
    """Levenshtein is bounded below by the length difference and above by
    the longer length; the relative gate holds; pairs are canonical
    (doc_a < doc_b) and unique."""
    from sol_spark.operators.dedup import EDIT_MAX_REL_BP, dedup_edit_distance

    rows = dedup_edit_distance(spark, sf_dir).collect()
    assert rows, "edit-distance blocking must be non-vacuous on the fixture"
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["lev"] >= abs(r["len_a"] - r["len_b"])
        assert r["lev"] <= max(r["len_a"], r["len_b"])
        assert r["lev"] * 10000 <= max(r["len_a"], r["len_b"]) * EDIT_MAX_REL_BP


def test_edit_distance_zero_means_exact_dup(spark, sf_dir):
    """lev == 0 pairs must have identical normalized text (the exact-dedup
    content hash agrees) — ties the new metric back to dedup_exact."""
    from sol_spark.operators.dedup import _NORM, dedup_edit_distance

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.expr(f"md5({_NORM})").alias("h"))
    )
    zero = dedup_edit_distance(spark, sf_dir).filter(F.col("lev") == 0)
    joined = (
        zero.join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("h", "ha"), "doc_a")
        .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("h", "hb"), "doc_b")
    )
    assert joined.filter(F.col("ha") != F.col("hb")).count() == 0


def test_bm25_ranking_monotone_and_positive(spark, sf_dir):
    """BM25 scores are positive (every ranked doc matched >=1 query term),
    non-increasing in rank, and every ranked doc really contains a query
    term."""
    from sol_spark.operators.text import BM25_TERMS, BM25_TOP, text_bm25_topk

    rows = text_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    ranked_ids = [r["doc_id"] for r in rows]
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isin(ranked_ids)).collect()
    }
    for did in ranked_ids:
        toks = set(texts[did].lower().split())
        assert toks & set(BM25_TERMS)


def test_rrf_score_bounds_and_membership(spark, sf_dir):
    """RRF scores live in (0, 2/(c+1)]; every fused doc came from at least
    one ranker's depth list, and per-query ranks are 1..top with no
    duplicate cid."""
    from sol_spark.operators.similarity import RRF_C, RRF_DEPTH, RRF_TOP, sim_rrf_hybrid

    rows = sim_rrf_hybrid(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
        assert 0 < r["rrf"] <= 2.0 / (RRF_C + 1)
        # smallest possible single-ranker contribution
        assert r["rrf"] >= round(1.0 / (RRF_C + RRF_DEPTH), 6)
    for q, rs in by_q.items():
        assert [r["rk"] for r in sorted(rs, key=lambda x: x["rk"])] == list(
            range(1, min(RRF_TOP, len(rs)) + 1)
        )
        cids = [r["cid"] for r in rs]
        assert len(cids) == len(set(cids))


def test_mmr_first_pick_is_top_relevance(spark, sf_dir):
    """With an empty selected set the MMR objective reduces to
    lambda*rel, so selection 1 must equal the plain cosine argmax of the
    candidate set; all selections are distinct and never the query
    itself."""
    from sol_spark.operators.similarity import (
        MMR_K,
        MMR_QUERIES,
        sim_mmr_rerank,
        sim_topk_exact,
    )

    sel = sim_mmr_rerank(spark, sf_dir).collect()
    assert len(sel) == MMR_QUERIES * MMR_K
    top1 = {
        r["qid"]: r["cid"]
        for r in sim_topk_exact(spark, sf_dir).filter(F.col("rk") == 1).collect()
        if r["qid"] < MMR_QUERIES
    }
    for r in sel:
        assert r["cid"] != r["qid"]
        if r["sel_rk"] == 1:
            assert r["cid"] == top1[r["qid"]]
    for q in range(MMR_QUERIES):
        cids = [r["cid"] for r in sel if r["qid"] == q]
        assert len(cids) == len(set(cids)) == MMR_K


def test_mmr_diversity_not_pure_relevance(spark, sf_dir):
    """The re-rank must actually diversify on the fixture: the MMR
    selection order diverges from the pure-relevance order for at least
    one query (otherwise the dup-heavy candidate neighborhoods would be
    invisible and the operator would be an expensive top-k)."""
    from pyspark.sql import Window as W

    from sol_spark.operators.similarity import MMR_K, sim_mmr_rerank
    from sol_spark.operators.similarity import MMR_QUERIES, sim_topk_exact  # noqa: F401

    sel = sim_mmr_rerank(spark, sf_dir)
    mmr_order = {
        (r["qid"], r["sel_rk"]): r["cid"] for r in sel.collect()
    }
    # pure-relevance order: re-rank by mmr of sel_rk==1... instead use
    # sim_topk_exact's rank over the same candidates (TOP_K=3 < MMR_K, so
    # compare only the first 3 positions).
    rel_order = {
        (r["qid"], r["rk"]): r["cid"]
        for r in sim_topk_exact(spark, sf_dir).collect()
        if r["qid"] < MMR_QUERIES
    }
    diverged = any(
        mmr_order.get(k) != cid for k, cid in rel_order.items() if k[1] <= min(3, MMR_K)
    )
    assert diverged, "MMR selection equals pure relevance order everywhere"
