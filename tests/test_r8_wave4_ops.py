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


def test_fdr_bh_step_up_invariants(spark, sf_dir):
    """Replay the BH step-up in pure Python from the per-test exceedance
    counts and pin the rejection frontier, the rational p-values, and the
    monotonicity law (anything with a smaller p than a rejected test is
    rejected too)."""
    from sol_spark.queries.events_analytics import (
        FDR_PERM_N,
        FDR_Q_PPM,
        stats_fdr_bh,
    )

    rows = stats_fdr_bh(spark, sf_dir).collect()
    m = len(rows)
    assert m >= 2
    # ranks are a total order aligned with (n_ge, event_type)
    assert [r["rk"] for r in rows] == list(range(1, m + 1))
    assert [(r["n_ge"], r["event_type"]) for r in rows] == sorted(
        (r["n_ge"], r["event_type"]) for r in rows
    )
    k = 0
    for r in rows:
        assert r["p_ppm"] == (1_000_000 * (1 + r["n_ge"])) // (FDR_PERM_N + 1)
        assert r["bh_cutoff_ppm"] == (r["rk"] * FDR_Q_PPM) // m
        if 1_000_000 * m * (1 + r["n_ge"]) <= r["rk"] * FDR_Q_PPM * (FDR_PERM_N + 1):
            k = r["rk"]
    for r in rows:
        assert r["rejected"] == (r["rk"] <= k)
    # monotonicity: the rejected set is a prefix of the p-sorted family
    rejected_ranks = [r["rk"] for r in rows if r["rejected"]]
    assert rejected_ranks == list(range(1, len(rejected_ranks) + 1))


def test_watermark_lateness_matches_naive_global_scan(spark, sf_dir):
    """The day-bucketed two-level running max must equal the naive global
    scan: replay arrival order in pure Python, recompute every grid row,
    and pin monotonicity (a longer watermark never drops more)."""
    import hashlib

    from pyspark.sql import functions as F

    from sol_spark.queries.events_analytics import (
        WM_DELAY_GRID_S,
        WM_MAX_NET_DELAY_S,
        events_watermark_lateness,
    )

    rows = {r["wm_delay_s"]: r for r in events_watermark_lateness(spark, sf_dir).collect()}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', cast(ts as timestamp_ntz))"
            ).alias("sec"),
        )
        .collect()
    )
    recs = []
    for r in ev:
        delay = (
            int(hashlib.md5(f"wl{r['event_id']}".encode()).hexdigest()[:8], 16)
            % WM_MAX_NET_DELAY_S
        )
        recs.append((r["sec"] + delay, r["event_id"], r["sec"]))
    recs.sort()
    runmax, lates = -(10**18), []
    for _, _, sec in recs:
        runmax = max(runmax, sec)
        lates.append(runmax - sec)
    for d in WM_DELAY_GRID_S:
        got = rows[d]
        want_dropped = sum(1 for x in lates if x > d)
        assert got["n_events"] == len(lates)
        assert got["n_dropped"] == want_dropped, f"wm={d}"
        assert got["drop_ppm"] == (1_000_000 * want_dropped) // len(lates)
    grid = [rows[d]["n_dropped"] for d in sorted(rows)]
    assert grid == sorted(grid, reverse=True), "drops must shrink as the delay grows"
    assert grid[0] > 0, "the zero-delay row must drop events (disorder is real)"

def test_watermark_drop_stream_twin_matches_replay(spark, sf_dir):
    """Run a REAL withWatermark windowed aggregation over arrival-ordered
    micro-batches (backfill-scale lateness) and require the engine's
    emitted windows to equal an exact replay of the TWO-watermark
    semantics: late input rows are filtered against the PREVIOUS batch's
    watermark, state eviction/emission uses the CURRENT one. The replay
    reads back the ACTUAL materialized part files (range-split boundaries
    are sampled, so batch composition must come from disk)."""
    import datetime
    import os
    import shutil
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from sol_spark.streaming import pipelines as P

    stream, tmp = P.events_arrival_stream(spark, sf_dir, n_files=6)
    try:
        sink = P.run_stream_to_memory(
            P.watermarked_hourly_counts(stream), output_mode="append"
        )
        rows = sink.collect()
        # no window ever emits twice: very-late rows are DROPPED by the
        # lagged filter, never re-create evicted state
        assert not [k for k, v in Counter(r["window_start"] for r in rows).items() if v > 1]
        got = {r["window_start"]: r["n"] for r in rows}

        parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        assert len(parts) == 6
        win_us = P.WM_TWIN_WINDOW_S * 1_000_000
        batches = [
            [
                r["us"]
                for r in spark.read.parquet(os.path.join(tmp, p))
                .select(
                    F.expr(
                        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                    ).alias("us")
                )
                .collect()
            ]
            for p in parts
        ]
        state = defaultdict(int)
        emitted = {}
        wm_late, wm_evict, dropped = None, None, 0
        for us in batches + [[]]:  # trailing no-data batch advances eviction once more
            for u in us:
                k = u // win_us * win_us
                if wm_late is not None and k + win_us <= wm_late:
                    dropped += 1
                    continue
                state[k] += 1
            if wm_evict is not None:
                for k in [k for k in state if k + win_us <= wm_evict]:
                    emitted[k] = state.pop(k)
            wm_late = wm_evict
            if us:
                bwm = (max(us) // 1000) * 1000 - P.WM_TWIN_WATERMARK_S * 1_000_000
                wm_evict = bwm if wm_evict is None else max(wm_evict, bwm)
        want = {
            datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=k): v
            for k, v in emitted.items()
        }
        assert dropped > 0, "the twin must exercise the real drop path"
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_hilbert_fold_is_the_canonical_curve(spark, sf_dir):
    """The unrolled div/mod fold must BE the classic Hilbert mapping:
    compare against the textbook xy2d on the fixture keys, and pin the
    continuity property (consecutive curve values are Manhattan-adjacent)
    via the inverse walk."""
    from sol_spark.operators.layout import H_SIDE, layout_hilbert

    def wiki_xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    def wiki_d2xy(n, d):
        x = y = 0
        t, s = d, 1
        while s < n:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            x, y = x + s * rx, y + s * ry
            t //= 4
            s *= 2
        return x, y

    from collections import Counter

    # (l_orderkey, l_linenumber) is NOT unique in the fixture, so pin the
    # full multiset: every row's hval must be the textbook mapping of its
    # own (partkey, suppkey).
    want = Counter(
        (
            r["l_orderkey"],
            r["l_linenumber"],
            wiki_xy2d(H_SIDE, r["l_partkey"] % H_SIDE, r["l_suppkey"] % H_SIDE),
        )
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .collect()
    )
    got = Counter(
        (r["l_orderkey"], r["l_linenumber"], r["hval"])
        for r in layout_hilbert(spark, sf_dir).collect()
    )
    assert got == want
    # continuity: each curve step moves to a Manhattan-adjacent cell
    prev = wiki_d2xy(H_SIDE, 10_000)
    for d in range(10_001, 11_001):
        cur = wiki_d2xy(H_SIDE, d)
        assert abs(cur[0] - prev[0]) + abs(cur[1] - prev[1]) == 1
        prev = cur


def test_maximal_matching_invariants(spark, sf_dir):
    """A matching must be VALID (no vertex matched twice) and MAXIMAL
    (every capped edge has at least one matched endpoint) — the two laws
    that make it usable as a review-pairing assignment."""
    from sol_spark.operators.dedup import dedup_pairs_capped, graph_maximal_matching

    matched = [
        (r["doc_a"], r["doc_b"]) for r in graph_maximal_matching(spark, sf_dir).collect()
    ]
    assert matched, "fixture must produce a non-empty matching"
    seen = set()
    for a, b in matched:
        assert a not in seen and b not in seen, f"vertex matched twice: {(a, b)}"
        seen.update((a, b))
    for r in dedup_pairs_capped(spark, sf_dir).collect():
        assert r["doc_a"] in seen or r["doc_b"] in seen, (
            f"unmatched edge with both endpoints free: {(r['doc_a'], r['doc_b'])}"
        )


def test_rate_limit_sliding_stream_equals_batch(spark, sf_dir):
    """Streaming sliding-window limiter (keyed K-timestamp state) must
    equal the batch replay EXACTLY — same integer transitions and
    Retry-After values, every event exactly once, both branches hit."""
    from sol_spark.queries.events_analytics import events_rate_limit_sliding
    from sol_spark.streaming import pipelines as P
    from tests.test_streaming import _run

    got = _run(spark, sf_dir, P.rate_limit_sliding_state, "append", n_files=4)
    stream = {r.event_id: (r.allowed, r.wait_s) for r in got}
    assert len(stream) == len(got), "an event was emitted more than once"
    want = {
        r.event_id: (r.allowed, r.wait_s)
        for r in events_rate_limit_sliding(spark, sf_dir).collect()
    }
    assert stream == want
    flags = [a for a, _ in want.values()]
    assert any(flags) and not all(flags)


def test_sql_scripting_control_flow(spark, sf_dir):
    """Spark 4 SQL scripting surface pin: a BEGIN..END block with DECLARE /
    SET / WHILE / IF runs under spark.sql.scripting.enabled and its final
    statement's result comes back as the script's DataFrame — including a
    data statement over a real table."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        got = spark.sql(
            """
            BEGIN
              DECLARE i BIGINT DEFAULT 0;
              DECLARE acc BIGINT DEFAULT 0;
              WHILE i < 5 DO
                SET i = i + 1;
                IF i % 2 = 1 THEN
                  SET acc = acc + i;
                END IF;
              END WHILE;
              SELECT acc AS odd_sum, i AS iterations;
            END
            """
        ).collect()
        assert [tuple(r) for r in got] == [(9, 5)]  # 1 + 3 + 5

        spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
            "script_nation"
        )
        got2 = spark.sql(
            """
            BEGIN
              DECLARE lim BIGINT DEFAULT 10;
              SELECT count(*) AS n FROM script_nation WHERE n_nationkey < lim;
            END
            """
        ).collect()
        assert got2[0]["n"] == 10
    finally:
        spark.conf.unset("spark.sql.scripting.enabled")
        spark.catalog.dropTempView("script_nation")


def test_minhash_lsh_cross_validates_against_mllib(spark, sf_dir):
    """Independent-implementation cross-check of the dedup family: our
    12-perm/4-band MinHash pipeline, pyspark.ml's MinHashLSH (seeded), and
    an exhaustive pure-Python Jaccard all computed over the SAME shingle
    sets must agree on the J >= 0.5 pair set; MLlib's reported distance is
    exactly 1 - J (it verifies candidates exactly), and our jaccard_bp
    matches the string-space Jaccard to within hash-collision noise."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.sql import functions as F

    from sol_spark.operators.dedup import dedup_minhash_lsh, shingle_df

    sh = shingle_df(spark, sf_dir).select("doc_id", "shingles")
    docs = {r["doc_id"]: set(r["shingles"]) for r in sh.collect()}
    ids = sorted(docs)
    truth = {}
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            j = len(docs[x] & docs[y]) / len(docs[x] | docs[y])
            if j >= 0.5:
                truth[(x, y)] = j
    assert truth, "fixture must contain true near-dup pairs"

    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True, vocabSize=1 << 18)
    vec = cv.fit(sh).transform(sh).select("doc_id", "features")
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=12, seed=42).fit(vec)
    mllib = {
        (r["a"], r["b"]): r["d"]
        for r in mh.approxSimilarityJoin(vec, vec, 0.5, distCol="d")
        .filter("datasetA.doc_id < datasetB.doc_id")
        .select(F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b"), "d")
        .collect()
    }
    assert set(mllib) == set(truth)
    for p, d in mllib.items():
        assert abs((1 - truth[p]) - d) < 1e-9

    ours = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert set(ours) == set(truth)
    for p, bp in ours.items():
        # ours scores Jaccard over the 32-bit hashed shingle space; a
        # collision can only nudge the ratio, never move it past 100 bp
        assert abs(bp - round(10000 * truth[p])) <= 100, (p, bp, truth[p])


def test_basket_rules_cross_validates_against_fpgrowth(spark, sf_dir):
    """Independent-implementation cross-check of the association-rule
    family: pyspark.ml.fpm.FPGrowth over the same order baskets, filtered
    to single-item antecedent/consequent, must produce the IDENTICAL rule
    set as basket_rules; its exact confidence floors to our integer bp
    and its lift agrees within float-expression-order noise."""
    from pyspark.ml.fpm import FPGrowth
    from pyspark.sql import functions as F

    from sol_spark.queries.relational import (
        BASKET_MIN_SUPPORT,
        RULE_MIN_CONF_BP,
        basket_rules,
    )

    items = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = items.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
    n = baskets.count()
    # strictly between (support-1) and support so float threshold jitter
    # can never flip an integer count across the boundary
    fp = FPGrowth(
        itemsCol="items",
        minSupport=(BASKET_MIN_SUPPORT - 0.5) / n,
        minConfidence=RULE_MIN_CONF_BP / 10000,
    ).fit(baskets)
    mllib = {
        (r["antecedent"][0], r["consequent"][0]): (r["confidence"], r["lift"])
        for r in fp.associationRules.collect()
        if len(r["antecedent"]) == 1 and len(r["consequent"]) == 1
    }
    ours = {
        (r["antecedent"], r["consequent"]): (r["confidence_bp"], r["lift"])
        for r in basket_rules(spark, sf_dir).collect()
    }
    assert ours, "fixture must produce rules"
    assert set(mllib) == set(ours)
    for k, (conf, lift) in mllib.items():
        bp, our_lift = ours[k]
        assert int(conf * 10000) == bp or abs(conf * 10000 - bp) < 1 + 1e-9
        assert abs(lift - our_lift) <= 5e-4  # ours rounds at 4


def test_spearman_cross_validates_against_mllib(spark, sf_dir):
    """stats_spearman_corr's tie-corrected integer-rank rho must equal
    pyspark.ml.stat.Correlation('spearman') on the same (order value,
    order width) pairs to within the operator's round-6 display grain."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation
    from pyspark.sql import functions as F

    from sol_spark.queries.relational import stats_spearman_corr

    ours = stats_spearman_corr(spark, sf_dir).collect()[0]
    rho_col = [c for c in ours.asDict() if "rho" in c or "spearman" in c]
    assert rho_col, f"no rho column in {list(ours.asDict())}"
    our_rho = ours[rho_col[0]]

    lc = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    pairs = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(lc, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").cast("double").alias("va"),
            F.coalesce(F.col("c"), F.lit(0.0)).alias("vb"),
        )
    )
    vec = VectorAssembler(inputCols=["va", "vb"], outputCol="f").transform(pairs)
    m = Correlation.corr(vec, "f", "spearman").collect()[0][0]
    assert abs(m[0, 1] - our_rho) <= 2e-6


def test_regr_family_cross_validates_against_mllib_ols(spark, sf_dir):
    """stats_regression's regr_* aggregates must equal MLlib
    LinearRegression's exact normal-equation solve per group (same
    closed-form least squares, independently implemented) within the
    operator's display rounding."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression
    from pyspark.sql import functions as F

    from sol_spark.queries.relational import stats_regression

    ours = {r["l_returnflag"]: r for r in stats_regression(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
    )
    for flag, r in ours.items():
        grp = VectorAssembler(inputCols=["x"], outputCol="f").transform(
            li.filter(F.col("l_returnflag") == flag)
        )
        m = LinearRegression(featuresCol="f", labelCol="y", solver="normal", regParam=0.0).fit(grp)
        assert abs(m.coefficients[0] - r["slope"]) <= 5e-4, flag
        assert abs(m.intercept - r["intercept"]) <= 5e-2, flag
        assert abs(m.summary.r2 - r["r2"]) <= 5e-4, flag


def test_hdr_quantiles_containment_law(spark, sf_dir):
    """The HDR sketch's guarantee: the exact rank-r value lies in
    [est, est + width), and the published error bound holds — verified
    against a full Python sort of the cents."""
    from pyspark.sql import functions as F

    from sol_spark.queries.relational import sketch_hdr_quantiles

    cents = sorted(
        r["v"]
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("v"))
        .collect()
    )
    n = len(cents)
    for r in sketch_hdr_quantiles(spark, sf_dir).collect():
        assert r["n"] == n
        rank = (r["q_pct"] * n + 99) // 100
        assert r["rnk"] == rank
        exact = cents[rank - 1]
        assert r["est_cents"] <= exact < r["est_cents"] + r["width_cents"], (
            r["q_pct"], exact, r["est_cents"], r["width_cents"]
        )
        assert r["err_bound_bp"] == (10000 * r["width_cents"]) // r["est_cents"]
        assert r["err_bound_bp"] <= 10000 // (1 << 5) + 1  # ~2^-5 relative


def test_rate_limit_keyed_state_survives_restart(spark, sf_dir):
    """Keyed-state RECOVERY: drain the first half of the log (availableNow)
    into a parquet sink, stop, deliver the second half, restart from the
    SAME checkpoint — the K-deep allowed-history must come back from the
    state store, so the union of both runs' decisions equals the batch
    replay EXACTLY (a restart that lost state would re-allow early events
    in half 2)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sol_spark.queries.events_analytics import events_rate_limit_sliding
    from sol_spark.streaming import pipelines as P
    from sol_spark.tables import _read

    batch = _read(spark, f"{sf_dir}/events.parquet")
    mid = batch.approxQuantile("event_id", [0.5], 0.0)[0]
    root = tempfile.mkdtemp(prefix="solspark_rlckpt_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def run_once():
        stream = (
            spark.readStream.schema(batch.schema)
            .parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        q = (
            P.rate_limit_sliding_state(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    try:
        # halves split by ts order (event_id is ts-ordered in the fixture)
        batch.filter(F.col("event_id") <= mid).coalesce(1).write.mode("append").parquet(src)
        run_once()
        n1 = spark.read.parquet(out).count()
        batch.filter(F.col("event_id") > mid).coalesce(1).write.mode("append").parquet(src)
        run_once()
        got = {
            r["event_id"]: (r["allowed"], r["wait_s"])
            for r in spark.read.parquet(out).collect()
        }
        assert len(got) > n1, "second run must process the delivered half"
        want = {
            r["event_id"]: (r["allowed"], r["wait_s"])
            for r in events_rate_limit_sliding(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_kmeans_objective_cross_validates_against_mllib(spark, sf_dir):
    """Objective-level cross-check of the in-engine Lloyd trainer: its
    WCSS on the embedding corpus must land in the same cost regime as a
    fully-converged MLlib KMeans with the same K — a broken assignment
    or update step would blow the ratio far past the band, while two
    correct k-means runs on (structureless) random embeddings land within
    a few percent of each other."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    from sol_spark.operators.similarity import KM_K, sim_kmeans_train

    ours = sim_kmeans_train(spark, sf_dir).collect()
    assert len(ours) == KM_K
    n_total = sum(r["n_members"] for r in ours)
    our_wcss = sum(r["n_members"] * r["avg_sqdist"] for r in ours)

    vec = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.expr("transform(embedding, x -> cast(x as double))").alias("arr"))
        .selectExpr(*[f"arr[{i}] AS f{i}" for i in range(64)])
    )
    assembled = VectorAssembler(inputCols=[f"f{i}" for i in range(64)], outputCol="f").transform(vec)
    model = KMeans(k=KM_K, seed=7, maxIter=20, featuresCol="f").fit(assembled)
    mllib_wcss = model.summary.trainingCost
    assert n_total == assembled.count()
    ratio = our_wcss / mllib_wcss
    assert 1 / 1.5 <= ratio <= 1.5, f"WCSS regime mismatch: ours={our_wcss} mllib={mllib_wcss}"
