"""Round-10 additions: the IVM streaming twin (changelog stream +
foreachBatch merge == batch full recompute, surviving a mid-stream
restart) and its idempotence unit pin."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from sol_spark.streaming import pipelines as P


def _snapshot_dict(spark, snap_root):
    return {
        (r["ym"], r["o_orderpriority"]): (r["n"], r["rev"])
        for r in P.ivm_read_snapshot(spark, snap_root).collect()
    }


def test_ivm_stream_equals_batch_across_restart(spark, sf_dir):
    """The IVM streaming twin (r9 verdict ask #5): the CDC changelog
    replayed as a 4-file stream, each micro-batch foreachBatch-MERGEd into
    the versioned parquet snapshot, must end EXACTLY equal to the batch
    warehouse_ivm_agg (whose oracle is the full recompute — so
    stream == batch == rescan, the chain that makes IVM trustworthy).
    The stream is stopped after the first half and RESTARTED from the same
    checkpoint with the second half delivered, so the offset WAL + the
    pointer's last_batch idempotence are both on the proven path. All
    values are exact BIGINT cents — dict equality, no tolerance."""
    from sol_spark.operators.governance import warehouse_ivm_agg

    root = tempfile.mkdtemp(prefix="solspark_ivmtw_")
    src = os.path.join(root, "src")
    snap = os.path.join(root, "snap")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    staged, schema = P.ivm_changelog_files(spark, sf_dir, n_files=4)
    try:
        parts = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
        assert len(parts) == 4
        P.ivm_snapshot_init(spark, sf_dir, snap)
        base = _snapshot_dict(spark, snap)

        # Run 1: first half of the changelog only.
        for f in parts[:2]:
            shutil.copy2(os.path.join(staged, f), os.path.join(src, f))
        P.run_ivm_stream(spark, src, schema, snap, ckpt)
        mid = _snapshot_dict(spark, snap)
        with open(os.path.join(snap, "CURRENT")) as fh:
            ptr_mid = json.load(fh)
        assert ptr_mid["last_batch"] >= 1, "run 1 must merge two micro-batches"
        assert mid != base, "half the changelog must move the snapshot"

        # Run 2: deliver the rest, restart from the SAME checkpoint.
        for f in parts[2:]:
            shutil.copy2(os.path.join(staged, f), os.path.join(src, f))
        P.run_ivm_stream(spark, src, schema, snap, ckpt)
        got = _snapshot_dict(spark, snap)

        want = {
            (r["ym"], r["o_orderpriority"]): (r["n_orders"], r["revenue_cents"])
            for r in warehouse_ivm_agg(spark, sf_dir).collect()
        }
        assert got == want
        # Non-vacuous: the changelog must exercise all three delta kinds
        # enough to change some groups and drop or add at least one.
        assert want != base
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)


def test_ivm_foreach_batch_idempotent_by_batch_id(spark, sf_dir):
    """A replayed micro-batch (same batchId after a restart that committed
    the sink but lost the stream commit) must be SKIPPED: applying the
    same batch twice advances the snapshot pointer once and leaves the
    snapshot unchanged — double-applying deltas would double-count."""
    root = tempfile.mkdtemp(prefix="solspark_ivmid_")
    snap = os.path.join(root, "snap")
    staged, _schema = P.ivm_changelog_files(spark, sf_dir, n_files=2)
    try:
        P.ivm_snapshot_init(spark, sf_dir, snap)
        part = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))[0]
        batch_df = spark.read.parquet(os.path.join(staged, part))
        apply_batch = P.ivm_foreach_batch(snap)
        apply_batch(batch_df, 0)
        after_first = _snapshot_dict(spark, snap)
        with open(os.path.join(snap, "CURRENT")) as fh:
            v1 = json.load(fh)["version"]
        apply_batch(batch_df, 0)  # replay — must be a no-op
        with open(os.path.join(snap, "CURRENT")) as fh:
            v2 = json.load(fh)["version"]
        assert v2 == v1
        assert _snapshot_dict(spark, snap) == after_first
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)


def test_bloom_ingest_stream_equals_batch(spark, sf_dir):
    """The Bloom-ingest streaming twin: the ingest split replayed as a
    3-file document stream, each micro-batch probed against the SAME
    broadcast snapshot sketch via foreachBatch, stopped after the first
    file and restarted from the same checkpoint — the union of all
    micro-batch outputs must equal dedup_bloom_incremental EXACTLY
    (bloom_hit, exact_dup, false_positive per doc: the probe is stateless
    against a static sketch, so batch boundaries cannot change a single
    bit). Exactly-once: every ingest doc appears exactly once in the
    sink despite the restart."""
    import os
    import shutil
    import tempfile

    from sol_spark.operators.dedup import dedup_bloom_incremental

    root = tempfile.mkdtemp(prefix="solspark_bloomtw_t_")
    src = os.path.join(root, "src")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    staged, schema = P.bloom_ingest_files(spark, sf_dir, n_files=3)
    try:
        parts = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
        assert len(parts) == 3
        shutil.copy2(os.path.join(staged, parts[0]), os.path.join(src, parts[0]))
        P.run_bloom_ingest_stream(spark, sf_dir, src, schema, out, ckpt)
        n1 = spark.read.parquet(out).count()
        assert n1 > 0
        for f in parts[1:]:
            shutil.copy2(os.path.join(staged, f), os.path.join(src, f))
        P.run_bloom_ingest_stream(spark, sf_dir, src, schema, out, ckpt)
        got_rows = spark.read.parquet(out).collect()
        got = {
            r["doc_id"]: (r["bloom_hit"], r["exact_dup"], r["false_positive"])
            for r in got_rows
        }
        assert len(got) == len(got_rows), "a doc was probed twice (restart replay)"
        want = {
            r["doc_id"]: (r["bloom_hit"], r["exact_dup"], r["false_positive"])
            for r in dedup_bloom_incremental(spark, sf_dir).collect()
        }
        assert got == want
        assert len(want) > 0
        # No false negatives anywhere (exact_dup implies bloom_hit); the
        # positive-outcome classes (hits/FPs) only materialize at sf0.1 —
        # the filter is deliberately undersized for THAT fixture
        # (operator docstring) — and are asserted by the batch operator's
        # own behavioral pins (tests/test_r9_ops.py), not re-asserted on
        # the sf0.001 twin where the ingest split collides with nothing.
        assert all(v[0] == 1 for v in want.values() if v[1] == 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
