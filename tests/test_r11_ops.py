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
