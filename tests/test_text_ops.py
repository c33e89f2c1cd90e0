"""Behavioral tests for text operators whose fixture-corpus result is
degenerate (the synthetic documents contain no split-document seams, so the
oracle check for text_split_doc_pairs verifies only the 0-row case — the
positive path is proven here with constructed data)."""

from __future__ import annotations


def test_split_doc_pairs_finds_seams(spark):
    from sol_spark.operators.text import EDGE_K, split_doc_pairs

    words = [f"w{i}" for i in range(40)]
    part_a = " ".join(words[:24])            # ends with words[16:24]
    part_b = " ".join(words[16:40])          # starts with words[16:24]
    unrelated = " ".join(f"x{i}" for i in range(30))
    short = "tiny doc"                       # < EDGE_K tokens: excluded
    docs = spark.createDataFrame(
        [(1, part_a), (2, part_b), (3, unrelated), (4, short)],
        "doc_id bigint, text string",
    )
    got = {(r.doc_a, r.doc_b) for r in split_doc_pairs(docs).collect()}
    assert (1, 2) in got                     # the seam
    assert all(4 not in pair for pair in got)  # short doc excluded
    assert (3, 1) not in got and (1, 3) not in got
    assert len(words[16:24]) == EDGE_K  # test data matches the key width
