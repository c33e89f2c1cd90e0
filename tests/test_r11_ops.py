"""Round-11 additions: the MinHash-LSH ingest streaming twin (#10 — the
last flagship dedup family without one) and its behavioral pins."""

from __future__ import annotations

import os
import shutil
import tempfile

from sol_spark.streaming import pipelines as P


def test_minhash_ingest_stream_equals_batch_across_restart(spark, sf_dir):
    """The MinHash-LSH ingest twin (r10 verdict ask #5): the ingest split
    replayed as a 3-file document stream, each micro-batch's band keys
    probed against the SAME snapshot bucket keep-list via foreachBatch,
    stopped after the first file and RESTARTED from the same checkpoint —
    the union of micro-batch outputs must equal dedup_minhash_incremental
    EXACTLY (near_dup, exact_dup, verdict per doc: the probe is stateless
    against a static snapshot, so batch boundaries cannot change a
    verdict). Exactly-once: every ingest doc appears exactly once in the
    sink despite the restart."""
    from sol_spark.operators.dedup import dedup_minhash_incremental

    root = tempfile.mkdtemp(prefix="solspark_mhtw_")
    src = os.path.join(root, "src")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    staged, schema = P.bloom_ingest_files(spark, sf_dir, n_files=3)
    try:
        parts = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
        assert len(parts) == 3
        # Run 1: first file only, then stop (availableNow drains what's there).
        shutil.copy2(os.path.join(staged, parts[0]), os.path.join(src, parts[0]))
        P.run_minhash_ingest_stream(spark, sf_dir, src, schema, out, ckpt)
        n1 = spark.read.parquet(out).count()
        assert n1 > 0
        # Run 2: deliver the rest, restart from the SAME checkpoint.
        for f in parts[1:]:
            shutil.copy2(os.path.join(staged, f), os.path.join(src, f))
        P.run_minhash_ingest_stream(spark, sf_dir, src, schema, out, ckpt)
        got_rows = spark.read.parquet(out).collect()
        got = {r["doc_id"]: (r["near_dup"], r["exact_dup"], r["verdict"]) for r in got_rows}
        assert len(got) == len(got_rows), "a doc was probed twice (restart replay)"
        want = {
            r["doc_id"]: (r["near_dup"], r["exact_dup"], r["verdict"])
            for r in dedup_minhash_incremental(spark, sf_dir).collect()
        }
        assert got == want
        assert len(want) > 0
        # No false negatives by construction: an exact dup shares every
        # band with its twin, so exact_dup == 1 implies near_dup == 1.
        assert all(v[0] == 1 for v in want.values() if v[1] == 1)
        # The verdict ladder is consistent everywhere.
        for near, exact, verdict in want.values():
            if exact == 1:
                assert verdict == "dup_exact"
            elif near == 1:
                assert verdict == "near_dup"
            else:
                assert verdict == "unique"
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)


def test_simhash_pairwise_quadratic_vs_clusters_linear(spark):
    """The r1 carried watch, pinned as a demonstrated trade-off: on an
    adversarial duplicate CLIQUE (k near-identical docs), dedup_simhash's
    pair output is exactly k(k-1)/2 — quadratic in cluster size, the
    honest semantics of a pairwise operator — while the PRODUCTION path
    dedup_simhash_clusters reduces the same graph to one row per
    clustered doc (linear, one cluster label). A 100 TB pipeline runs the
    clusters form; the pairwise query stays registered for the oracle."""
    import os
    import shutil
    import tempfile

    from sol_spark.operators.dedup import (
        dedup_simhash,
        dedup_simhash_clusters,
        release_result,
    )

    k = 40
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [(i, base) for i in range(k)]
    # distinct fillers far from the clique in hamming space
    rows += [
        (100 + j, f"completely unrelated document number {j} with its own "
                  f"unique vocabulary item{j} token{j} word{j}")
        for j in range(5)
    ]
    root = tempfile.mkdtemp(prefix="solspark_clique_")
    try:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(root, "documents.parquet")
        )
        pairs = dedup_simhash(spark, root)
        clique_pairs = pairs.filter("doc_a < 100 AND doc_b < 100").count()
        assert clique_pairs == k * (k - 1) // 2  # quadratic, demonstrated
        clusters = dedup_simhash_clusters(spark, root)
        got = clusters.filter("doc < 100").collect()
        release_result(clusters)
        assert len(got) == k  # linear: one row per clustered doc
        assert {r["cluster"] for r in got} == {0}  # a single min-id label
    finally:
        shutil.rmtree(root, ignore_errors=True)
