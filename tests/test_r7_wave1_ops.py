"""Behavioral invariants for the round-7 first-wave operators: the
token-budget allocator (greedy fill replayed in Python), Cohen's kappa and
McNemar (confusion-matrix identities), the integer SPRT (walk replay), and
the AQP error curve (monotone nesting + exact recompute)."""

from __future__ import annotations

from collections import defaultdict


def test_token_budget_greedy_fill_replay(spark, sf_dir):
    """Replay the quality-ordered greedy fill in Python from the operator's
    own per-source (tokens, quality) readout: allocations must match the
    closed-form window expression, conserve the budget exactly, and respect
    the epoch cap."""
    from sol_spark.operators.text import _TB_BUDGET_DEN, _TB_BUDGET_NUM, _TB_MAX_EPOCHS, pipeline_token_budget

    rows = pipeline_token_budget(spark, sf_dir).collect()
    assert rows, "empty allocation"
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    # rank order is (quality desc, source asc) — a total order
    keys = [(-r["quality_ppm"], r["source"]) for r in rows]
    assert keys == sorted(keys)
    total = sum(r["tokens"] for r in rows)
    budget = (_TB_BUDGET_NUM * total) // _TB_BUDGET_DEN
    remaining = budget
    for r in rows:
        cap = _TB_MAX_EPOCHS * r["tokens"]
        want = max(0, min(cap, remaining))
        assert r["alloc_tokens"] == want
        assert r["epochs_ppm"] == (1000000 * want) // r["tokens"]
        assert r["alloc_tokens"] <= cap
        remaining -= want if want > 0 else 0
    # the budget is exactly exhausted (total capacity exceeds it: cap = 2x)
    assert sum(r["alloc_tokens"] for r in rows) == budget
    # at least one source is fully capped and at least one gets nothing or
    # a partial fill — otherwise the op degenerates to "keep everything"
    assert any(r["epochs_ppm"] == _TB_MAX_EPOCHS * 1000000 for r in rows)
    assert any(r["epochs_ppm"] < _TB_MAX_EPOCHS * 1000000 for r in rows)


def test_cohens_kappa_matches_confusion_matrix(spark, sf_dir):
    """Recompute kappa from the lang-id confusion matrix the sibling query
    emits: po, pe, and the floored-magnitude ppm division."""
    from sol_spark.operators.text import stats_cohens_kappa, text_lang_id

    preds = text_lang_id(spark, sf_dir).collect()
    n = len(preds)
    conf = defaultdict(int)
    for r in preds:
        conf[(r["lang"], r["pred_lang"])] += 1
    diag = sum(v for (a, b), v in conf.items() if a == b)
    row_n = defaultdict(int)
    col_n = defaultdict(int)
    for (a, b), v in conf.items():
        row_n[a] += v
        col_n[b] += v
    sum_rc = sum(row_n[k] * col_n.get(k, 0) for k in row_n)
    out = stats_cohens_kappa(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == n and r["n_agree"] == diag
    assert r["agree_ppm"] == (1000000 * diag) // n
    assert r["expected_agree_ppm"] == (1000000 * sum_rc) // (n * n)
    num = n * diag - sum_rc
    den = n * n - sum_rc
    want = (1000000 * num) // den if num >= 0 else -((1000000 * -num) // den)
    assert r["kappa_ppm"] == want
    # kappa is a chance-corrected rate: bounded and non-vacuous (the fixture
    # heuristic sits near chance — the exact value is the oracle's job; the
    # identity chain above is the invariant)
    assert -1000000 <= r["kappa_ppm"] <= 1000000
    assert 0 < r["expected_agree_ppm"] < 1000000


def test_mcnemar_cells_partition_the_corpus(spark, sf_dir):
    from sol_spark.operators.text import stats_mcnemar

    r = stats_mcnemar(spark, sf_dir).collect()[0]
    assert (
        r["both_keep"] + r["only_global"] + r["only_adaptive"] + r["neither"]
        == r["n_docs"]
    )
    b, c = r["only_global"], r["only_adaptive"]
    if b + c == 0:
        assert r["mcnemar_stat_ppm"] == 0
    else:
        assert r["mcnemar_stat_ppm"] == (1000000 * (b - c) * (b - c)) // (b + c)


def test_sprt_walk_replay(spark, sf_dir):
    """Replay every user's evidence walk in Python: first boundary crossing,
    decision sign, and sample size must match; undecided users report their
    final state."""
    from sol_spark.queries.events_analytics import SPRT_BOUNDARY, stats_sprt_bernoulli
    from sol_spark.tables import load_tables

    ev = (
        load_tables(spark, sf_dir)["events"]
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    out = {r["user_id"]: r for r in stats_sprt_bernoulli(spark, sf_dir).collect()}
    assert set(out) == set(by_user)
    n_decided = 0
    for uid, es in by_user.items():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        w = 0
        dec_rn, dec_w = None, None
        for i, e in enumerate(es, start=1):
            w += 1 if e["event_type"] in ("click", "purchase") else -1
            if dec_rn is None and abs(w) >= SPRT_BOUNDARY:
                dec_rn, dec_w = i, w
        r = out[uid]
        assert r["n_events"] == len(es)
        if dec_rn is None:
            assert r["decision"] == "undecided"
            assert r["n_at_decision"] == 0 and r["w_at_decision"] == w
        else:
            n_decided += 1
            assert r["decision"] == ("accept_p1" if dec_w > 0 else "accept_p0")
            assert r["n_at_decision"] == dec_rn and r["w_at_decision"] == dec_w
            # the walk must sit exactly ON the boundary at the first crossing
            assert abs(dec_w) == SPRT_BOUNDARY
    assert n_decided > 0  # the test is vacuous if nobody ever decides


def test_aqp_error_curve_nesting_and_recompute(spark, sf_dir):
    """The hash-bucket samples are nested (each fraction extends the last),
    the 100% row is exact (err_ppm = 0), and every estimate recomputes from
    a Python pass over the tagged rows."""
    import hashlib

    from sol_spark.queries.relational import _AQP_FRACS, aqp_error_vs_fraction
    from sol_spark.tables import load_tables

    orders = load_tables(spark, sf_dir)["orders"].select("o_orderkey", "o_totalprice").collect()
    sums = {f: 0 for f in _AQP_FRACS}
    counts = {f: 0 for f in _AQP_FRACS}
    for o in orders:
        cents = round(o["o_totalprice"] * 100)
        b = int(hashlib.md5(f"aqp{o['o_orderkey']}".encode()).hexdigest()[:8], 16) % 100
        for f in _AQP_FRACS:
            if b < f:
                sums[f] += cents
                counts[f] += 1
    rows = {r["pct"]: r for r in aqp_error_vs_fraction(spark, sf_dir).collect()}
    assert set(rows) == set(_AQP_FRACS)
    true_avg = (2 * sums[100] + counts[100]) // (2 * counts[100])
    prev_n = 0
    for f in _AQP_FRACS:
        r = rows[f]
        assert r["n_rows"] == counts[f]
        assert r["n_rows"] >= prev_n  # nested samples grow monotonically
        prev_n = r["n_rows"]
        est = (2 * sums[f] + counts[f]) // (2 * counts[f])
        assert r["est_avg_cents"] == est
        assert r["true_avg_cents"] == true_avg
        assert r["err_ppm"] == (1000000 * abs(est - true_avg)) // true_avg
    assert rows[100]["err_ppm"] == 0
