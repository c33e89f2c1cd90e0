"""Behavioral invariants for the round-7 second-wave operators: the
compaction plan (bin-fill laws), the retention policy (tier rules replayed
in Python), and the streaming SPRT twin (stream == batch, frozen verdicts)."""

from __future__ import annotations

from collections import defaultdict


def test_compaction_plan_fill_laws(spark, sf_dir):
    """Groups are contiguous in (month, flag) order, every group except
    possibly the last is filled to >= target (underfill 0), totals are
    conserved, and the group id recomputes from the running sum."""
    from sol_spark.operators.layout import COMPACT_TARGET_ROWS, layout_compaction_plan
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    files = (
        load_tables(spark, sf_dir)["lineitem"]
        .groupBy(
            F.date_trunc("month", "l_shipdate").alias("part_month"),
            F.col("l_returnflag").alias("flag"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    )
    files.sort(key=lambda r: (r["part_month"], r["flag"]))
    cum = 0
    want = defaultdict(lambda: [0, 0, None, None])  # n_files, n_rows, first, last
    for f in files:
        cum += f["n_rows"]
        g = (cum - 1) // COMPACT_TARGET_ROWS
        w = want[g]
        w[0] += 1
        w[1] += f["n_rows"]
        w[2] = f["part_month"] if w[2] is None else min(w[2], f["part_month"])
        w[3] = f["part_month"] if w[3] is None else max(w[3], f["part_month"])
    rows = layout_compaction_plan(spark, sf_dir).collect()
    got = {r["grp"]: r for r in rows}
    assert set(got) == set(want)
    assert sum(r["n_rows"] for r in rows) == sum(f["n_rows"] for f in files)
    max_file = max(f["n_rows"] for f in files)
    for g, (nf, nr, first, last) in want.items():
        r = got[g]
        assert (r["n_files"], r["n_rows"]) == (nf, nr)
        assert (r["first_month"], r["last_month"]) == (first, last)
        expect = 0 if nr >= COMPACT_TARGET_ROWS else (10000 * (COMPACT_TARGET_ROWS - nr)) // COMPACT_TARGET_ROWS
        assert r["underfill_bp"] == expect
        # an interior group underfills only by the straddle of the next
        # group's first file: shortfall < max input file size
        if g < max(got):
            assert COMPACT_TARGET_ROWS - nr < max_file
    # month ranges of consecutive groups never interleave (order-preserving
    # fill keeps partition pruning on the compacted layout)
    ordered = [got[g] for g in sorted(got)]
    for a, b in zip(ordered, ordered[1:]):
        assert a["last_month"] <= b["first_month"]


def test_retention_policy_tier_replay(spark, sf_dir):
    """Replay the GFS schedule in Python over the distinct day list: last 7
    days daily, week-end representative for the last 4 epoch-weeks, expire
    otherwise; every day appears exactly once and all three tiers fire."""
    import datetime

    from sol_spark.operators.governance import RETAIN_DAILY, RETAIN_WEEKS, warehouse_retention_policy
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    days = sorted(
        r["d"]
        for r in load_tables(spark, sf_dir)["events"]
        .select(F.expr("cast(date_trunc('day', ts) as timestamp_ntz)").alias("d"))
        .distinct()
        .collect()
    )
    rows = {r["part_day"]: r for r in warehouse_retention_policy(spark, sf_dir).collect()}
    assert set(rows) == set(days)
    recent = set(days[-RETAIN_DAILY:])
    epoch = datetime.datetime(1970, 1, 1)
    by_week = defaultdict(list)
    for d in days:
        by_week[int((d - epoch).total_seconds()) // 604800].append(d)
    max_widx = max(by_week)
    week_end = {max(ds) for w, ds in by_week.items() if w > max_widx - RETAIN_WEEKS}
    for d in days:
        want = "daily" if d in recent else ("weekly" if d in week_end else "expire")
        assert rows[d]["policy"] == want, f"{d}: {rows[d]['policy']} != {want}"
        assert rows[d]["recency_rank"] == len(days) - days.index(d)
    # the plan actually tiers at this corpus span: all three labels present
    assert {r["policy"] for r in rows.values()} == {"daily", "weekly", "expire"}


def test_sprt_stream_equals_batch(spark, sf_dir):
    """Streaming SPRT (keyed integer state) must equal the batch window
    plan exactly after the multi-batch replay drains: same decision, same
    sample size at decision, and verdicts freeze at first crossing."""
    from sol_spark.queries.events_analytics import stats_sprt_bernoulli
    from sol_spark.streaming import pipelines as P
    from tests.test_streaming import _run

    got = _run(spark, sf_dir, P.sprt_state, "update", n_files=4)
    latest: dict[int, tuple] = {}
    for r in got:
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.decision, r.n_at_decision, r.w_at_decision)
    want = {
        r["user_id"]: (r["n_events"], r["decision"], r["n_at_decision"], r["w_at_decision"])
        for r in stats_sprt_bernoulli(spark, sf_dir).collect()
    }
    assert set(latest) == set(want)
    for uid in want:
        assert latest[uid] == want[uid], f"user {uid}: stream {latest[uid]} != batch {want[uid]}"
    # frozen verdicts: within the drained emissions, once a user decides,
    # every later emission carries the identical (decision, n_at_decision)
    seen: dict[int, tuple] = {}
    for r in sorted(got, key=lambda r: (r.user_id, r.n_events)):
        if r.user_id in seen and seen[r.user_id][0] != "undecided":
            assert (r.decision, r.n_at_decision) == seen[r.user_id]
        if r.decision != "undecided":
            seen[r.user_id] = (r.decision, r.n_at_decision)
    assert any(v[1] != "undecided" for v in want.values())
