"""Structured Streaming tests: stream result == batch result on the same
data (the Structured Streaming contract; reference harness analog is
sql/core/src/test/scala/org/apache/spark/sql/streaming/StreamTest.scala's
AddData/CheckAnswer DSL). The batch side of each pipeline is itself
oracle-verified in queries/event_windows.py, so passing here closes
oracle == batch == stream.
"""

from __future__ import annotations

import shutil

import pytest

from sol_spark.streaming import pipelines as P
from sol_spark.tables import load_tables


@pytest.fixture()
def batch_events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"]


def _run(spark, sf_dir, transform, output_mode, n_files=1):
    stream, tmp = P.events_stream(spark, sf_dir, n_files=n_files)
    try:
        return P.run_stream_to_memory(transform(stream), output_mode=output_mode).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _sorted_rows(rows, round_cols=()):
    def norm(r):
        d = r.asDict()
        for c in round_cols:
            d[c] = round(d[c], 1) if d[c] is not None else None
        return tuple(sorted(d.items()))

    return sorted(norm(r) for r in rows)


def test_tumbling_agg_stream_equals_batch(spark, sf_dir, batch_events):
    got = _run(spark, sf_dir, P.tumbling_counts, "complete")
    want = P.tumbling_counts(batch_events).collect()
    # round to 1dp: double summation order differs between the incremental
    # and batch plans, so 2dp rounding can flip on .005 boundaries
    assert _sorted_rows(got, ("sum_value",)) == _sorted_rows(want, ("sum_value",))


def test_tumbling_agg_multi_batch(spark, sf_dir, batch_events):
    """Same agg across 4 micro-batches — state restored/saved per batch
    (reference StateStoreRestoreExec/StateStoreSaveExec,
    streaming/statefulOperators.scala:206,257)."""
    got = _run(spark, sf_dir, P.tumbling_counts, "complete", n_files=4)
    want = P.tumbling_counts(batch_events).collect()
    assert _sorted_rows(got, ("sum_value",)) == _sorted_rows(want, ("sum_value",))


def test_session_window_stream_equals_batch(spark, sf_dir, batch_events):
    got = _run(spark, sf_dir, P.session_stats, "complete")
    want = P.session_stats(batch_events).collect()
    assert _sorted_rows(got, ("session_value",)) == _sorted_rows(want, ("session_value",))


def test_window_unique_users_stream(spark, sf_dir, batch_events):
    """HLL++ sketch state across micro-batches: the streaming estimate must
    EQUAL the batch estimate (sketch merge is batch-boundary-insensitive),
    not just approximate it."""
    got = _run(spark, sf_dir, P.window_unique_users, "complete", n_files=3)
    want = P.window_unique_users(batch_events).collect()
    assert _sorted_rows(got) == _sorted_rows(want)


def test_streaming_dedup_keys(spark, sf_dir, batch_events):
    """dropDuplicates keeps ONE row per key (which row is arrival-order
    dependent within a batch), so compare the key sets, not full rows."""
    got = _run(spark, sf_dir, lambda s: P.first_event_per_key(s, streaming=True), "append")
    want = P.first_event_per_key(batch_events).collect()
    assert sorted((r.user_id, r.event_type) for r in got) == sorted(
        (r.user_id, r.event_type) for r in want
    )


def test_stream_stream_join_equals_batch(spark, sf_dir, batch_events):
    """Watermarked stream-stream inner join (reference
    StreamingSymmetricHashJoinExec.scala:126) — append output must equal the
    batch theta-join row set."""
    got = _run(spark, sf_dir, P.purchases_with_recent_view, "append")
    want = P.purchases_with_recent_view(batch_events).collect()
    assert _sorted_rows(got) == _sorted_rows(want)


def test_apply_in_pandas_with_state(spark, sf_dir, batch_events):
    """applyInPandasWithState running totals: after the stream drains, the
    latest emission per user equals the batch per-user aggregate."""
    from pyspark.sql import functions as F

    got = _run(spark, sf_dir, P.running_user_totals, "update", n_files=3)
    # update mode re-emits per batch; memory sink appends, keep the max-n row
    latest: dict[int, tuple] = {}
    for r in got:
        if r.user_id not in latest or r.n > latest[r.user_id][0]:
            latest[r.user_id] = (r.n, r.total)
    want = {
        r.user_id: (r.n, r.total)
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert set(latest) == set(want)
    for uid, (n, total) in latest.items():
        assert n == want[uid][0]
        assert abs(total - want[uid][1]) < 0.05


def test_watermark_drops_late_rows(spark, sf_dir):
    """Late-data semantics: a row older than watermark-delay behind the max
    event time must be dropped pre-state (reference watermarkPredicateForData,
    statefulOperators.scala:309). Two micro-batches: batch 1 sets the
    watermark high via a recent event; batch 2's stale row is dropped."""
    import os
    import tempfile
    import time as _t

    tmp = tempfile.mkdtemp(prefix="solspark_wm_")
    try:
        base = "2024-01-01 00:00:00"
        rows1 = [(1, base), (2, "2024-01-01 12:00:00")]
        rows2 = [(3, "2024-01-01 00:30:00")]  # 11.5h late > 2h watermark
        schema = "id bigint, ts_s string"
        df1 = spark.createDataFrame(rows1, schema)
        df2 = spark.createDataFrame(rows2, schema)
        df1.coalesce(1).write.parquet(os.path.join(tmp, "in"), mode="overwrite")

        from pyspark.sql import functions as F

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(tmp, "in"))
            .withColumn("ts", F.to_timestamp("ts_s"))
        )
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        name = "wm_sink"
        q = agg.writeStream.format("memory").queryName(name).outputMode("update").start()
        try:
            q.processAllAvailable()
            # second file arrives after the watermark advanced past its ts
            df2.coalesce(1).write.parquet(os.path.join(tmp, "in"), mode="append")
            _t.sleep(0.5)
            q.processAllAvailable()
        finally:
            q.stop()
        out = {r.ws.hour: r.n for r in spark.table(name).collect()}
        assert out.get(0) == 1  # late row NOT added to the 00:00 window
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_foreach_batch_sink(spark, sf_dir):
    """foreachBatch (reference ForeachWriterProvider.scala): per-batch
    batch-DF writes with the batchId the sink uses for idempotent commits.
    Batch ids must be consecutive and the union of batches must equal the
    source exactly once."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sol_spark.tables import load_tables

    out = tempfile.mkdtemp(prefix="solspark_feb_")
    stream, src_tmp = P.events_stream(spark, sf_dir, n_files=3)
    seen_batches = []

    def sink(batch_df, batch_id):
        # idempotent pattern: one deterministic output dir per batch id
        batch_df.select("event_id", "value").write.mode("overwrite").parquet(
            os.path.join(out, f"batch={batch_id}")
        )
        seen_batches.append(batch_id)

    try:
        q = stream.writeStream.foreachBatch(sink).outputMode("append").start()
        q.processAllAvailable()
        q.stop()
        assert seen_batches == sorted(set(seen_batches))  # consecutive, no dups
        back = spark.read.parquet(os.path.join(out, "batch=*"))
        src = load_tables(spark, sf_dir)["events"]
        assert back.count() == src.count()
        assert (
            back.agg(F.sum("event_id")).first()[0] == src.agg(F.sum("event_id")).first()[0]
        )
    finally:
        shutil.rmtree(src_tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_stream_stream_left_outer_join(spark, sf_dir, batch_events):
    """Left-outer stream-stream join: unmatched purchases get null-extended
    rows once the watermark passes their match window. A far-future sentinel
    view (different user; joins nothing) pushes the final watermark beyond
    every purchase so the stream emits ALL outer rows and equals batch."""
    import os

    from pyspark.sql import functions as F

    # n_files=1: multi-file phases can replay range-split files out of ts
    # order (the file source does not guarantee mtime ordering), advancing
    # the watermark early and dropping earlier files' rows as late. One
    # data batch + one sentinel batch is deterministic and still exercises
    # cross-batch state + watermark-driven eviction.
    stream, tmp = P.events_stream(spark, sf_dir, n_files=1)
    try:
        import datetime as _dt

        far = batch_events.agg(F.max("ts").alias("m")).collect()[0]["m"] + _dt.timedelta(
            days=30
        )
        # One sentinel per side: the global watermark is the MIN across all
        # watermarked inputs, so both streams must see a far-future event.
        # Sentinel schema MUST match the stream files' schema (= the batch
        # schema, ts timestamp_ntz — see events_stream).
        sentinel = spark.createDataFrame(
            [
                (10**9, far, -1, "view", 0.0, "{}"),
                (10**9 + 1, far, -2, "purchase", 0.0, "{}"),
            ],
            "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double, props string",
        )
        import time as _t2
        import uuid as _uuid

        want = P.purchases_with_recent_view_outer(batch_events).collect()
        name = f"sink_{_uuid.uuid4().hex[:8]}"
        q = (
            P.purchases_with_recent_view_outer(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            # Phase 1: drain ALL real data first — the file source does not
            # guarantee mtime ordering, so writing the sentinel up front can
            # land it in an early batch, jumping the watermark and dropping
            # every later real row as late.
            q.processAllAvailable()
            # Phase 2: NOW the sentinel is necessarily in a later batch.
            sentinel.coalesce(1).write.mode("append").parquet(tmp)
            q.processAllAvailable()
            # Phase 3: outer-row eviction lands in an asynchronous no-data
            # batch after the watermark advance; poll until it commits.
            deadline = _t2.time() + 60
            while _t2.time() < deadline:
                got = [r for r in spark.table(name).collect() if r.user_id >= 0]
                if len(got) >= len(want):
                    break
                _t2.sleep(0.5)
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert _sorted_rows(got) == _sorted_rows(want)
    assert any(r.v_ts is None for r in got)  # outer rows actually exercised


def test_checkpoint_recovery_exactly_once(spark, sf_dir):
    """Restart-from-checkpoint: run 1 (Trigger.AvailableNow) drains file A
    to a parquet sink and stops; file B arrives; run 2 restarts the SAME
    query from the SAME checkpoint and must process ONLY B (offset WAL,
    reference OffsetSeqLog/CommitLog) — the sink ends up with A ∪ B exactly
    once despite the restart."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="solspark_ckpt_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    schema = "id bigint, v string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.withColumn("tag", F.concat(F.lit("r"), F.col("id") % 3))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        spark.createDataFrame([(i, f"a{i}") for i in range(50)], schema).coalesce(1).write.parquet(
            src, mode="append"
        )
        run_once()
        n_after_a = spark.read.parquet(out).count()
        assert n_after_a == 50
        spark.createDataFrame([(i, f"b{i}") for i in range(100, 130)], schema).coalesce(
            1
        ).write.parquet(src, mode="append")
        run_once()
        got = spark.read.parquet(out)
        assert got.count() == 80  # 50 + 30, nothing reprocessed
        assert got.select("id").distinct().count() == 80
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_rocksdb_state_store_provider(spark, sf_dir, batch_events):
    """State store provider swap (reference HDFSBackedStateStoreProvider,
    state/HDFSBackedStateStoreProvider.scala:73 -> RocksDB in modern Spark):
    the same windowed aggregation must produce identical results with
    RocksDB-backed keyed state — the provider that bounds executor memory
    when state outgrows the heap at 100 TB."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        got = _run(spark, sf_dir, P.tumbling_counts, "complete", n_files=3)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    want = P.tumbling_counts(batch_events).collect()
    assert _sorted_rows(got, ("sum_value",)) == _sorted_rows(want, ("sum_value",))


def test_streaming_unsupported_ops_rejected(spark, sf_dir):
    """The output-mode x operator constraint matrix (reference
    UnsupportedOperationChecker.scala:44): invalid plans must fail at
    ANALYSIS time, not mid-stream. Three canonical rejections."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    stream, tmp = P.events_stream(spark, sf_dir)
    try:
        # 1. complete mode without aggregation
        with _pt.raises(Exception) as e1:
            q = stream.writeStream.format("memory").queryName("bad1").outputMode("complete").start()
            q.stop()
        assert "Complete" in str(e1.value) or "complete" in str(e1.value)
        # 2. plain orderBy on an unaggregated stream
        with _pt.raises(AnalysisException):
            q = (
                stream.orderBy("ts")
                .writeStream.format("memory")
                .queryName("bad2")
                .outputMode("append")
                .start()
            )
            q.stop()
        # 3. append-mode aggregation without watermark (no way to finalize)
        with _pt.raises(AnalysisException):
            q = (
                stream.groupBy("user_id")
                .agg(F.count(F.lit(1)))
                .writeStream.format("memory")
                .queryName("bad3")
                .outputMode("append")
                .start()
            )
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_static_join(spark, sf_dir, batch_events):
    """Stream-static join == batch join row-for-row; the static side is
    re-read per micro-batch, not staged in the state store."""
    from pyspark.sql import functions as F

    user_dim = (
        batch_events.select("user_id")
        .distinct()
        .withColumn("cohort", F.col("user_id") % 5)
    )
    stream, tmp = P.events_stream(spark, sf_dir, n_files=3)
    try:
        got = P.run_stream_to_memory(
            P.events_with_user_dim(stream, user_dim), output_mode="append"
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = P.events_with_user_dim(batch_events, user_dim).collect()
    assert _sorted_rows(got) == _sorted_rows(want)


def test_drop_duplicates_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark (modern refinement of the reference's
    StreamingDeduplicateExec): duplicates arriving within the watermark
    window collapse to one row, and state for old keys is evictable. Exact
    duplicate rows split across micro-batches must emit once."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="solspark_ddww_")
    try:
        schema = "k bigint, ts_s string"
        rows = [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:30:00")]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(tmp, "in"), mode="overwrite"
        )
        # batch 2: exact duplicate of key 1 within the watermark + a new key
        spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (3, "2024-01-01 11:00:00")], schema
        ).coalesce(1).write.parquet(os.path.join(tmp, "in"), mode="append")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(tmp, "in"))
            .withColumn("ts", F.to_timestamp("ts_s"))
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["k"])
        )
        got = P.run_stream_to_memory(stream, output_mode="append").collect()
        assert sorted(r.k for r in got) == [1, 2, 3]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_transform_with_state_in_pandas(spark, sf_dir, batch_events):
    """transformWithStateInPandas (the Spark-4 successor of
    applyInPandasWithState / the reference's FlatMapGroupsWithStateExec):
    per-user running totals via a StatefulProcessor with a typed ValueState.
    After the stream drains, the latest emission per user equals the batch
    aggregate — same contract as test_apply_in_pandas_with_state, on the
    new state API."""
    import pandas as pd
    import pytest as _pt

    # The TWS state protocol needs the protobuf package; not shipped here.
    _pt.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas requires the protobuf package",
    )
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [round(total, 2)]})

        def close(self) -> None:
            pass

    def transform(stream):
        return stream.groupBy("user_id").transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id bigint, n bigint, total double",
            outputMode="Update",
            timeMode="None",
        )

    # transformWithState requires the RocksDB state store provider
    key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        got = _run(spark, sf_dir, transform, "update", n_files=3)
    finally:
        if old_provider is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old_provider)
    latest: dict[int, tuple] = {}
    for r in got:
        if r.user_id not in latest or r.n > latest[r.user_id][0]:
            latest[r.user_id] = (r.n, r.total)
    want = {
        r.user_id: (r.n, r.total)
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert set(latest) == set(want)
    for uid, (n, total) in latest.items():
        assert n == want[uid][0]
        assert abs(total - want[uid][1]) < 0.05


def test_stream_stream_full_outer_join(spark, sf_dir, batch_events):
    """Full-outer stream-stream join (Spark 3.1+; the reference supports
    inner/left/right only): outer rows from BOTH sides are emitted on
    watermark-driven eviction. Same sentinel/phase protocol as the
    left-outer test; sentinels are filtered by their negative user ids on
    whichever side survives the null-extension."""
    import time as _t
    import uuid as _uuid

    from pyspark.sql import functions as F

    stream, tmp = P.events_stream(spark, sf_dir, n_files=1)
    try:
        import datetime as _dt

        far = batch_events.agg(F.max("ts").alias("m")).collect()[0]["m"] + _dt.timedelta(
            days=30
        )
        sentinel = spark.createDataFrame(
            [
                (10**9, far, -1, "view", 0.0, "{}"),
                (10**9 + 1, far, -2, "purchase", 0.0, "{}"),
            ],
            "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double, props string",
        )

        def _real(rows):
            return [
                r
                for r in rows
                if (r.user_id is None or r.user_id >= 0)
                and (r.v_user is None or r.v_user >= 0)
            ]

        want = _real(P.purchases_with_recent_view_full(batch_events).collect())
        name = f"sink_{_uuid.uuid4().hex[:8]}"
        q = (
            P.purchases_with_recent_view_full(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            sentinel.coalesce(1).write.mode("append").parquet(tmp)
            q.processAllAvailable()
            deadline = _t.time() + 60
            while _t.time() < deadline:
                got = _real(spark.table(name).collect())
                if len(got) >= len(want):
                    break
                _t.sleep(0.5)
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # _sorted_rows can't order rows whose keys are null (full outer
    # null-extends BOTH sides), so order by a total repr key instead.
    def _norm(rows):
        return sorted(repr(tuple(sorted(r.asDict().items()))) for r in rows)

    assert _norm(got) == _norm(want)
    assert any(r.v_ts is None for r in got)  # unmatched purchases
    assert any(r.event_id is None for r in got)  # unmatched views


def test_stream_union_two_sources(spark, sf_dir, batch_events):
    """Union of two independent streams (multi-source ingestion — e.g. two
    landing directories feeding one pipeline): stream_a(purchases) UNION
    stream_b(views) aggregated together must equal the batch union. Union
    of streaming DataFrames is planned per-source with a shared downstream
    stage (reference UnionExec over streaming relations)."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    stream, tmp = P.events_stream(spark, sf_dir, n_files=1)
    try:
        a = stream.filter(F.col("event_type") == "purchase")
        b = stream.filter(F.col("event_type") == "view")
        unioned = (
            a.unionByName(b)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        )
        name = f"sink_{_uuid.uuid4().hex[:8]}"
        q = (
            unioned.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {r.event_type: (r.n, r.sv) for r in spark.table(name).collect()}
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = {
        r.event_type: (r.n, r.sv)
        for r in batch_events.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .collect()
    }
    assert got == want


def test_drift_bins_stream_equals_batch(spark, sf_dir, batch_events):
    """The mergeable drift-bin table is identical computed incrementally
    (micro-batches folding late rows into window state) and in one batch."""
    got = _run(spark, sf_dir, P.windowed_drift_bins, "complete", n_files=3)
    want = P.windowed_drift_bins(batch_events).collect()
    assert _sorted_rows(got, ()) == _sorted_rows(want, ())


def test_cdc_state_stream_equals_batch(spark, sf_dir, batch_events):
    """Streaming CDC apply (applyInPandasWithState latest-writer-wins with
    tombstone flags): after the multi-batch stream drains, the final
    emission per key must equal the batch window plan — including NULLed
    values on tombstoned keys and the full per-key change count."""
    from sol_spark.queries.event_windows import stream_cdc_state

    got = _run(spark, sf_dir, P.cdc_latest_state, "update", n_files=4)
    latest: dict[int, tuple] = {}
    for r in got:
        if r.user_id not in latest or r.n_changes > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_changes, r.current_value, r.last_ts, r.deleted)
    want = {
        r["user_id"]: (r["n_changes"], r["current_value"], r["last_ts"], r["deleted"])
        for r in stream_cdc_state(spark, sf_dir).collect()
    }
    assert set(latest) == set(want)
    for uid, row in latest.items():
        assert row == want[uid], f"user {uid}: stream {row} != batch {want[uid]}"
    assert any(r[3] for r in want.values())  # tombstones present in fixture


def test_ewma_state_stream_equals_batch(spark, sf_dir):
    """Streaming EWMA with open-bucket state: after a multi-batch replay,
    the emitted (closed) hours must equal the batch recurrence for every
    hour except each series' final one (still open, never emitted) — same
    values within fp tolerance, exactly-once per hour."""
    from sol_spark.queries.events_analytics import events_ewma

    got = _run(spark, sf_dir, P.ewma_hourly_state, "append", n_files=4)
    stream = {(r.event_type, r.hour): (r.avg_value, r.ewma) for r in got}
    assert len(stream) == len(got), "an hour was emitted more than once"
    batch_rows = events_ewma(spark, sf_dir).collect()
    last_hour = {}
    for r in batch_rows:
        if r.event_type not in last_hour or r.hour > last_hour[r.event_type]:
            last_hour[r.event_type] = r.hour
    want = {
        (r.event_type, r.hour): (r.avg_value, r.ewma)
        for r in batch_rows
        if r.hour != last_hour[r.event_type]
    }
    assert set(stream) == set(want)
    for k, (avg_b, ewma_b) in want.items():
        avg_s, ewma_s = stream[k]
        assert abs(avg_s - avg_b) < 1e-4 and abs(ewma_s - ewma_b) < 1e-4, k


def test_foreach_writer_per_row_sink(spark, sf_dir):
    """Per-row ForeachWriter sink (reference
    sql/core/.../streaming/sources/ForeachWriterProvider.scala:34), the
    companion to foreachBatch above: an open/process/close object is
    pickled to each executor task, open(partition_id, epoch_id) gates the
    partition, process(row) sees every row exactly once, close(error) runs
    with error=None on success. The writer persists its rows from close()
    into one file per (epoch, partition), so file existence proves the
    full lifecycle ran; the union of files must equal the source rows."""
    import json
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sol_spark.tables import load_tables

    out = tempfile.mkdtemp(prefix="solspark_few_")
    stream, src_tmp = P.events_stream(spark, sf_dir, n_files=2)

    class RowWriter:
        def open(self, partition_id, epoch_id):
            self.rows = []
            self.pid, self.eid = partition_id, epoch_id
            self.opened = True
            return True  # accept the partition

        def process(self, row):
            assert self.opened  # open() must precede every process()
            self.rows.append([row["event_id"], row["value"]])

        def close(self, error):
            payload = {"rows": self.rows, "error": repr(error) if error else None}
            path = os.path.join(out, f"e{self.eid}_p{self.pid}.json")
            with open(path, "w") as f:
                json.dump(payload, f)

    try:
        q = (
            stream.select("event_id", "value")
            .writeStream.foreach(RowWriter())
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        files = sorted(os.listdir(out))
        assert files, "close() never persisted anything"
        seen, errors = [], []
        for fn in files:
            with open(os.path.join(out, fn)) as f:
                payload = json.load(f)
            seen.extend(payload["rows"])
            if payload["error"]:
                errors.append((fn, payload["error"]))
        assert not errors  # close(error=None) on the success path
        src = load_tables(spark, sf_dir)["events"]
        assert len(seen) == src.count()  # every row exactly once
        assert sum(r[0] for r in seen) == src.agg(F.sum("event_id")).first()[0]
    finally:
        shutil.rmtree(src_tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_heavy_users_stream_equals_batch(spark, sf_dir, batch_events):
    """The windowed heavy-user gate is identical computed incrementally
    (counts folding across micro-batches before the threshold filter on
    emission) and in one batch; the fixture must actually flag someone."""
    got = _run(spark, sf_dir, P.windowed_heavy_users, "complete", n_files=3)
    want = P.windowed_heavy_users(batch_events).collect()
    assert len(want) > 0  # non-vacuous: the gate fires on the fixture
    assert _sorted_rows(got, ("sum_value",)) == _sorted_rows(want, ("sum_value",))


def test_token_bucket_stream_equals_batch(spark, sf_dir):
    """Streaming token-bucket (keyed two-BIGINT state) must equal the
    batch replay EXACTLY — same integer transitions, every event emitted
    exactly once, both gate branches exercised."""
    from sol_spark.queries.events_analytics import events_token_bucket

    got = _run(spark, sf_dir, P.token_bucket_state, "append", n_files=4)
    stream = {r.event_id: (r.allowed, r.tokens_after) for r in got}
    assert len(stream) == len(got), "an event was emitted more than once"
    want = {
        r.event_id: (r.allowed, r.tokens_after)
        for r in events_token_bucket(spark, sf_dir).collect()
    }
    assert stream == want
    assert any(a for a, _ in want.values()) and not all(a for a, _ in want.values())


def test_incident_islands_stream_equals_batch(spark, sf_dir):
    """Streaming gaps-and-islands sessionization (day-bucket keyed state,
    per-event island assignment) + the bounded boundary-merge finisher
    must reproduce the batch events_incident_stats rollup EXACTLY — the
    first stream twin for a GLOBAL-timeline operator. Six-file ts-range
    replay forces days to span micro-batches, so open islands must
    continue from the keyed state."""
    from pyspark.sql import functions as F

    from sol_spark.queries.events_analytics import events_incident_stats

    stream, tmp = P.events_stream(spark, sf_dir, n_files=6)
    try:
        drained = P.run_stream_to_memory(
            P.incident_islands_state(stream), output_mode="append"
        )
        # Every error event assigned exactly once before any rollup.
        n_err = (
            load_tables(spark, sf_dir)["events"]
            .where(F.col("event_type") == "error")
            .count()
        )
        assert drained.count() == n_err
        assert drained.select("event_id").distinct().count() == n_err
        got = P.incident_rollup_from_islands(drained).collect()[0].asDict()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = events_incident_stats(spark, sf_dir).collect()[0].asDict()
    assert got == want
    # Non-vacuous: the fixture must contain real multi-error incidents and
    # at least one blip, or the twin proves nothing.
    assert want["n_incidents"] > 1
    assert want["worst_incident_errors"] > 1
