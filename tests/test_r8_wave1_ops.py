"""Behavioral invariants for the round-8 first wave: the bitmap bucket
arithmetic pinned on literal NEGATIVE keys (the fixture's o_orderkey
domain is >= 0, so FN_BITMAP_ORACLE's else-branch for negatives was
asserted but never exercised — r7 ADVICE item 3), and the iterate()
fused-probe path (one job per round must behave exactly like the
checkpoint-then-probe path it replaces)."""

from __future__ import annotations


def _oracle_bucket(x: int) -> int:
    # FN_BITMAP_ORACLE's formula (functions_coverage.py): positives shard
    # into 32768-bit buckets 1..N; non-positives follow Spark's TRUNCATING
    # div — bucket trunc(x/32768), i.e. -((-x) // 32768).
    return (x - 1) // 32768 + 1 if x >= 1 else -((-x) // 32768)


def _oracle_pos(x: int) -> int:
    return (x - 1) % 32768 if x >= 1 else (-x) % 32768


def test_bitmap_bucket_formula_on_negative_and_edge_keys(spark):
    """Evaluate Spark's bitmap_bucket_number / bitmap_bit_position on
    literal keys spanning negatives, zero, and bucket boundaries, and pin
    each against the oracle's claimed formula — closing the domain gap
    where the else-branch was oracle-asserted but fixture-unexercised."""
    keys = [-70000, -32769, -32768, -5, -1, 0, 1, 2, 32767, 32768, 32769, 65536, 65537]
    rows = (
        spark.range(1)
        .selectExpr(
            *[
                e
                for i, k in enumerate(keys)
                for e in (
                    f"bitmap_bucket_number({k}L) AS b_{i}",
                    f"bitmap_bit_position({k}L) AS p_{i}",
                )
            ]
        )
        .collect()[0]
    )
    for i, k in enumerate(keys):
        assert rows[f"b_{i}"] == _oracle_bucket(k), f"bucket({k})"
        assert rows[f"p_{i}"] == _oracle_pos(k), f"position({k})"


def test_bitmap_construct_agg_counts_negative_positions(spark):
    """bitmap_count(bitmap_construct_agg(...)) over a mixed positive/
    negative key set must equal COUNT DISTINCT of the oracle positions per
    oracle bucket — the fixture-independent form of fn_bitmap's contract."""
    keys = [-5, -5, -1, 0, 1, 1, 2, 32768, 32769, -32768]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(k,) for k in keys], "k long").selectExpr(
        "bitmap_bucket_number(k) AS bucket", "bitmap_bit_position(k) AS pos"
    )
    got = {
        r["bucket"]: r["n"]
        for r in df.groupBy("bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("n"))
        .collect()
    }
    want: dict[int, set[int]] = {}
    for k in keys:
        want.setdefault(_oracle_bucket(k), set()).add(_oracle_pos(k))
    assert got == {b: len(ps) for b, ps in want.items()}


def test_iterate_fused_probe_matches_converged_path(spark):
    """The fused probe (lazy checkpoint + one aggregate job) must converge
    on the same round and leave no persisted blocks behind, exactly like
    the converged(prev, cur) path: run a shrink-by-half toy loop both ways
    and compare results and storage."""
    from pyspark.sql import functions as F

    from sol_spark.operators.dedup import iterate, release_result

    # id-set delta, not a global zero assertion: the shared session can
    # legitimately hold other tests' persisted blocks (the r6 MST-flake
    # lesson)
    before = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }

    def mk_state():
        return spark.range(100).select(F.col("id").alias("v"), F.lit("live").alias("status"))

    def step(state, i):
        # halve the live set each round; keep the rest
        live = state.filter(F.col("status") == "live")
        kept = state.filter(F.col("status") == "kept")
        promoted = live.filter(F.col("v") % 2 == 0).select(
            "v", F.lit("kept").alias("status")
        )
        survivors = live.filter(F.col("v") % 2 == 1).select(
            (F.col("v") / 2).cast("long").alias("v"), "status"
        )
        return kept.unionAll(promoted).unionAll(survivors)

    def finalize(state):
        return state.groupBy("status").count()

    probe = F.coalesce(F.sum(F.when(F.col("status") == "live", 1)), F.lit(0))

    r1 = iterate(
        mk_state(),
        step,
        finalize,
        max_rounds=10,
        converged=lambda prev, cur: cur.filter(F.col("status") == "live").limit(1).isEmpty(),
    )
    rows1 = {r["status"]: r["count"] for r in r1.collect()}
    release_result(r1)
    r2 = iterate(
        mk_state(),
        step,
        finalize,
        max_rounds=10,
        probe=probe,
        probe_converged=lambda prev, cur: cur == 0,
    )
    rows2 = {r["status"]: r["count"] for r in r2.collect()}
    release_result(r2)
    assert rows1 == rows2
    # storage contract: no NEW persisted blocks survive after release_result
    after = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert after - before == set(), f"leaked blocks: {after - before}"


def test_iterate_fused_probe_raises_on_budget_exhaustion(spark):
    from pyspark.sql import functions as F
    import pytest

    from sol_spark.operators.dedup import iterate

    state = spark.range(4).select(F.col("id").alias("v"), F.lit("live").alias("status"))
    with pytest.raises(RuntimeError, match="no convergence|live"):
        iterate(
            state,
            lambda s, i: s,  # never converges
            lambda s: s,
            max_rounds=2,
            probe=F.coalesce(F.sum(F.when(F.col("status") == "live", 1)), F.lit(0)),
            probe_converged=lambda prev, cur: cur == 0,
        )


def test_slo_budget_stream_equals_batch(spark, sf_dir):
    """The SLO error-budget streaming twin: drain the day-keyed stateful
    aggregation across 4 micro-batches (complete mode), push the drained
    silver table through the SHARED gold readout, and require exact
    equality with the batch operator — every fence decision is integer
    cross-multiplication, so equality is bitwise, not approximate."""
    from sol_spark.queries.events_analytics import (
        events_slo_error_budget,
        slo_budget_readout,
    )
    from sol_spark.streaming import pipelines as P
    from tests.test_streaming import _run

    got = _run(spark, sf_dir, P.slo_daily_counts, "complete", n_files=4)
    silver = spark.createDataFrame(got, "day timestamp_ntz, n bigint, errs bigint")
    stream_rows = [tuple(r) for r in slo_budget_readout(silver).collect()]
    batch_rows = [tuple(r) for r in events_slo_error_budget(spark, sf_dir).collect()]
    assert len(stream_rows) == len(batch_rows) > 0
    assert stream_rows == batch_rows
    names = [f.name for f in events_slo_error_budget(spark, sf_dir).schema.fields]
    assert names == [
        "day", "n_events", "n_errors", "error_ppm", "cum_error_ppm",
        "budget_used_ppm", "fast_burn_alert", "budget_exhausted",
    ]


def test_statestore_reader_exposes_agg_state(spark, tmp_path):
    """Spark 4 state-store data source: after an availableNow streaming
    aggregation drains into a checkpoint, `spark.read.format("statestore")`
    must expose the operator's keyed state (key.k -> value.count) equal to
    the batch groupBy, and `state-metadata` must list the stateful
    operator — the offline state-introspection surface an operator
    debugging a 1000-executor streaming job relies on."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ckpt")
    spark.range(100).select((F.col("id") % 7).alias("k"), F.col("id").alias("v")).write.parquet(src)
    stream = spark.readStream.schema("k long, v long").parquet(src)
    agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("ss_reader_probe")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = {
        r["k"]: r["n"]
        for r in spark.read.format("statestore")
        .load(ck)
        .select(F.col("key.k").alias("k"), F.col("value.count").alias("n"))
        .collect()
    }
    want = {k: 100 // 7 + (1 if k < 100 % 7 else 0) for k in range(7)}
    assert state == want
    meta = spark.read.format("state-metadata").load(ck).collect()
    assert len(meta) == 1 and "stateStoreSave" in meta[0]["operatorName"]


def test_parameterized_sql_and_execute_immediate(spark):
    """Spark 4 SQL-scripting surface: named-parameter spark.sql(args=...),
    EXECUTE IMMEDIATE over a DECLAREd session variable with USING binds,
    and IDENTIFIER() resolving a table name from a parameter — pinned
    behaviorally (DuckDB has no twin surface, so this is pytest-only)."""
    from pyspark.sql import functions as F

    spark.range(50).select(F.col("id").alias("k")).createOrReplaceTempView("v_param_probe")
    # named + positional parameter binds
    assert spark.sql(
        "SELECT count(*) AS n FROM v_param_probe WHERE k < :lim", args={"lim": 10}
    ).collect()[0]["n"] == 10
    assert spark.sql(
        "SELECT count(*) AS n FROM v_param_probe WHERE k < ?", args=[7]
    ).collect()[0]["n"] == 7
    # IDENTIFIER() from a parameter
    assert spark.sql(
        "SELECT max(k) AS m FROM IDENTIFIER(:t)", args={"t": "v_param_probe"}
    ).collect()[0]["m"] == 49
    # EXECUTE IMMEDIATE with a session variable holding the statement text
    spark.sql("DECLARE OR REPLACE ei_stmt STRING")
    spark.sql("SET VAR ei_stmt = 'SELECT sum(k) AS s FROM IDENTIFIER(:t) WHERE k < :lim'")
    r = spark.sql("EXECUTE IMMEDIATE ei_stmt USING 'v_param_probe' AS t, 5 AS lim").collect()
    assert r[0]["s"] == 10  # 0+1+2+3+4


def test_fasttext_quality_model_discriminates(spark, sf_dir):
    """The integer-GD hashed-feature classifier must actually LEARN: score
    each document with the trained weights and require a median-split
    accuracy well above chance against the n_chars >= 300 label (the
    oracle proves bit-exactness; this proves non-vacuity)."""
    from pyspark.sql import functions as F

    from sol_spark.operators.text import _NORM, FT_BUCKETS, text_fasttext_quality
    from sol_spark.operators.dedup import release_result
    from sol_spark.tables import load_tables

    w = text_fasttext_quality(spark, sf_dir)
    docs = load_tables(spark, sf_dir)["documents"]
    toks = (
        docs.select("doc_id", F.explode(F.expr(f"split({_NORM}, ' ')")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            F.expr(
                f"CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % {FT_BUCKETS}"
            ).alias("bucket"),
        )
        .distinct()
    )
    scores = (
        toks.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("weight_micro").alias("s"))
        .join(docs.select("doc_id", (F.col("n_chars") >= 300).alias("y")), "doc_id")
    )
    rows = scores.collect()
    release_result(w)
    med = sorted(r["s"] for r in rows)[len(rows) // 2]
    acc = sum((r["s"] > med) == r["y"] for r in rows) / len(rows)
    assert acc > 0.75, f"median-split accuracy {acc}"


def test_graph_search_storage_contract(spark, sf_dir):
    """sim_graph_search checkpoints per-round frontiers, the nav graph,
    and the embedding frame during construction: only its OWN output may
    survive the call, and release_result returns storage to baseline
    (id-set delta, shared-session-safe)."""
    from sol_spark.operators.dedup import release_result
    from sol_spark.operators.similarity import GS_BEAM, N_QUERIES, sim_graph_search

    before = {
        int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    out = sim_graph_search(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= N_QUERIES * GS_BEAM
    # beam ranks are dense per query and cosines non-increasing
    byq = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rk"])):
        byq.setdefault(r["qid"], []).append(r)
    for q, rs in byq.items():
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(a["cosine"] >= b["cosine"] for a, b in zip(rs, rs[1:]))
    release_result(out)
    after = {
        int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert after - before == set(), f"leaked blocks: {after - before}"


def test_arrow_udf_scalar_surface(spark):
    """Spark 4.1 @arrow_udf: a scalar UDF receiving pyarrow Arrays (one
    step lower-level than pandas_udf — no pandas conversion at all). Pin
    that it computes vectorized-exact integers and plans as the sanctioned
    ArrowEvalPython node, never row-at-a-time BatchEvalPython."""
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("long")
    def cents_mod(a):  # a: pyarrow.Array
        return pc.add(pc.multiply(a, 31), 7)

    df = spark.range(1000).select(cents_mod("id").alias("v"), "id")
    rows = df.collect()
    assert all(r["v"] == r["id"] * 31 + 7 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython\n" not in plan
