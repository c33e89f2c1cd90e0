"""Behavioral invariants for the round-7 sixth-wave operators: the audit
hash chain (Python fold replay + tamper detection) and the ROUGE cluster
cohesion scorecard (label/pair accounting)."""

from __future__ import annotations

import hashlib
from collections import defaultdict


def test_audit_chain_fold_replay_and_tamper_sensitivity(spark, sf_dir):
    from sol_spark.operators.governance import warehouse_audit_chain
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    ev = (
        load_tables(spark, sf_dir)["events"]
        .select(
            F.expr("cast(date_trunc('day', ts) as timestamp_ntz)").alias("day"),
            "ts", "event_id", "user_id", "event_type",
        )
        .collect()
    )
    by_day = defaultdict(list)
    for e in ev:
        by_day[e["day"]].append(e)
    heads = {}
    for day, es in by_day.items():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        h = "genesis"
        for e in es:
            h = hashlib.md5(
                f"{h}|{e['event_id']}|{e['user_id']}|{e['event_type']}".encode()
            ).hexdigest()
        heads[day] = (len(es), h, es[-1]["event_id"])
    rows = {r["day"]: r for r in warehouse_audit_chain(spark, sf_dir).collect()}
    assert set(rows) == set(heads)
    for day, (n, h, last_eid) in heads.items():
        r = rows[day]
        assert (r["n_events"], r["head_hash"], r["head_event_id"]) == (n, h, last_eid)
    # tamper sensitivity: editing ONE mid-chain row changes the head
    day, es = next(iter(sorted(by_day.items())))
    es.sort(key=lambda e: (e["ts"], e["event_id"]))
    h = "genesis"
    for i, e in enumerate(es):
        etype = "TAMPERED" if i == len(es) // 2 else e["event_type"]
        h = hashlib.md5(f"{h}|{e['event_id']}|{e['user_id']}|{etype}".encode()).hexdigest()
    assert h != heads[day][1]


def test_cluster_cohesion_accounting(spark, sf_dir):
    """Every scored pair lands in exactly one cluster (both endpoints share
    it), the per-cluster stats recompute from the pair frame, and min <=
    mean always."""
    from sol_spark.operators.dedup import (
        dedup_cluster_cohesion,
        dedup_rouge2_pairs,
        dedup_simhash_clusters,
        release_result,
    )

    lab_df = dedup_simhash_clusters(spark, sf_dir)
    labels = {r["doc"]: r["cluster"] for r in lab_df.collect()}
    release_result(lab_df)
    rg_df = dedup_rouge2_pairs(spark, sf_dir)
    pairs = [(r["doc_a"], r["doc_b"], r["rouge2_f1_ppm"]) for r in rg_df.collect()]
    release_result(rg_df)
    per_cluster = defaultdict(list)
    for a, b, f1 in pairs:
        assert labels[a] == labels[b]  # a candidate pair never crosses clusters
        per_cluster[labels[a]].append(f1)
    out_df = dedup_cluster_cohesion(spark, sf_dir)
    rows = {r["cluster"]: r for r in out_df.collect()}
    release_result(out_df)
    assert set(rows) == set(per_cluster)
    assert rows, "no clusters scored"
    for c, f1s in per_cluster.items():
        r = rows[c]
        assert r["n_pairs"] == len(f1s)
        assert r["mean_f1_ppm"] == sum(f1s) // len(f1s)
        assert r["min_f1_ppm"] == min(f1s)
        assert r["min_f1_ppm"] <= r["mean_f1_ppm"]
        assert r["weak_evidence"] == (min(f1s) < 500000)


def test_audit_chain_stream_equals_batch(spark, sf_dir):
    """Streaming audit chain (string keyed state) must converge to the
    batch fold byte-exactly after the multi-batch replay drains, with no
    out-of-order breaks under the ts-range file replay."""
    from sol_spark.operators.governance import warehouse_audit_chain
    from sol_spark.streaming import pipelines as P
    from tests.test_streaming import _run

    got = _run(spark, sf_dir, P.audit_chain_state, "update", n_files=4)
    latest: dict = {}
    for r in got:
        if r.day not in latest or r.n_events > latest[r.day][0]:
            latest[r.day] = (r.n_events, r.head_hash, r.head_event_id, r.broken_order)
    want = {
        r["day"]: (r["n_events"], r["head_hash"], r["head_event_id"])
        for r in warehouse_audit_chain(spark, sf_dir).collect()
    }
    assert set(latest) == set(want)
    for day in want:
        n, h, eid, broken = latest[day]
        assert (n, h, eid) == want[day], f"day {day}"
        assert broken is False  # the ordered replay never breaks the chain


def test_group_split_never_straddles_a_source(spark, sf_dir):
    import hashlib

    from sol_spark.operators.text import _GROUP_SPLIT_VAL_PCT, text_group_split

    rows = text_group_split(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        assert r["split"] in ("train", "val")
        want = (
            "val"
            if int(hashlib.md5(f"grp{r['source']}".encode()).hexdigest()[:6], 16) % 100
            < _GROUP_SPLIT_VAL_PCT
            else "train"
        )
        assert r["split"] == want
        if r["source"] in by_source:
            assert by_source[r["source"]] == r["split"]  # never straddles
        by_source[r["source"]] = r["split"]
    splits = set(by_source.values())
    assert splits == {"train", "val"}  # both sides populated


def test_decontam_consistency_with_split_and_dedup(spark, sf_dir):
    """Every reported val doc is actually in 'val' under the shared split
    rule, its best train match is in 'train', the best pair appears in the
    full MinHash pair set with the same Jaccard, and every full-dedup pair
    that straddles the split is reported."""
    import hashlib

    from sol_spark.operators.dedup import (
        dedup_cross_split_decontam,
        dedup_minhash_lsh,
        release_result,
    )

    def split_of(doc_id: int) -> str:
        return "val" if int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16) % 100 < 10 else "train"

    out_df = dedup_cross_split_decontam(spark, sf_dir)
    out = {r["val_doc"]: r for r in out_df.collect()}
    release_result(out_df)
    full = {}
    for r in dedup_minhash_lsh(spark, sf_dir).collect():
        full[(r["doc_a"], r["doc_b"])] = r["jaccard_bp"]
    # full-dedup pairs straddling the split must all be reported
    expected = {}
    for (a, b), jb in full.items():
        sa, sb = split_of(a), split_of(b)
        if {sa, sb} == {"train", "val"}:
            v, t = (a, b) if sa == "val" else (b, a)
            cur = expected.setdefault(v, [0, -1, None])
            cur[0] += 1
            if (jb, -t) > (cur[1], -(cur[2] if cur[2] is not None else 1 << 62)):
                cur[1], cur[2] = jb, t
    assert set(out) >= set(expected)
    assert len(out) > 0  # the fixture's dup structure crosses the split
    for v, r in out.items():
        assert split_of(v) == "val"
        assert split_of(r["best_train_doc"]) == "train"
        pair = (min(v, r["best_train_doc"]), max(v, r["best_train_doc"]))
        assert full.get(pair) == r["best_jaccard_bp"]
    for v, (n, jb, t) in expected.items():
        r = out[v]
        assert r["n_train_matches"] >= n
        assert r["best_jaccard_bp"] >= jb


def test_forecast_pi_order_statistics_replay(spark, sf_dir):
    """Replay the residual order statistics in Python from the exact
    hourly means; the interval must bracket the point forecast and hold
    ~80% of historical residuals by construction."""
    import math
    from collections import defaultdict as _dd

    from sol_spark.queries.events_analytics import _PI_HI_BP, _PI_LO_BP, events_forecast_pi, _hourly_x
    from sol_spark.tables import load_tables

    hourly = _hourly_x(load_tables(spark, sf_dir)).collect()
    series = _dd(list)
    for r in hourly:
        series[r["event_type"]].append((r["hour"], r["x"]))
    rows = {r["event_type"]: r for r in events_forecast_pi(spark, sf_dir).collect()}
    assert set(rows) == set(series)

    def r6(v: float) -> float:
        return math.floor(v * 1000000 + 0.5) / 1000000

    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        resid = sorted(b - a for a, b in zip(xs, xs[1:]))
        n = len(resid)
        p10 = next(v for i, v in enumerate(resid) if 10000 * (i + 1) >= _PI_LO_BP * n)
        p90 = next(v for i, v in enumerate(resid) if 10000 * (i + 1) >= _PI_HI_BP * n)
        r = rows[et]
        assert r["n_resid"] == n
        assert r["p10_resid"] == r6(p10) + 0.0
        assert r["p90_resid"] == r6(p90) + 0.0
        assert r["last_value"] == r6(xs[-1])
        assert r["pi_lo"] == r6(xs[-1] + p10) + 0.0
        assert r["pi_hi"] == r6(xs[-1] + p90) + 0.0
        assert r["pi_lo"] <= r["last_value"] + r["p90_resid"]
        # the fences really are the ~[10, 90] band of residual history
        inside = sum(1 for v in resid if p10 <= v <= p90)
        assert inside >= (7 * n) // 10


def test_filtered_topk_respects_the_predicate_exactly(spark, sf_dir):
    """Every returned neighbor carries the query's label; the result equals
    a Python brute-force filtered search; and the filtered ranking differs
    from the unconstrained one somewhere (the predicate has teeth)."""
    import math

    from sol_spark.operators.similarity import N_QUERIES, TOP_K, sim_topk_exact, sim_topk_filtered
    from sol_spark.tables import load_tables

    emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in load_tables(spark, sf_dir)["embeddings"].collect()
    }
    rows = sim_topk_filtered(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for qid, rs in by_q.items():
        qe, want = emb[qid]
        qn = math.sqrt(sum(x * x for x in qe))
        scored = []
        for cid, (ce, lab) in emb.items():
            if cid == qid or lab != want:
                continue
            dot = sum(float(a) * float(b) for a, b in zip(qe, ce))
            cn = math.sqrt(sum(x * x for x in ce))
            scored.append((round(dot / (qn * cn), 6), cid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        rs.sort(key=lambda r: r["rk"])
        assert len(rs) == min(TOP_K, len(scored))
        for r, (cos, cid) in zip(rs, scored):
            assert r["want_label"] == want
            assert emb[r["cid"]][1] == want  # predicate holds on every row
            assert (r["cid"], r["cosine"]) == (cid, cos)
    unfiltered = {
        (r["qid"], r["rk"]): r["cid"] for r in sim_topk_exact(spark, sf_dir).collect()
    }
    filtered = {(r["qid"], r["rk"]): r["cid"] for r in rows}
    assert filtered != unfiltered  # the constraint changes some answer


def test_abc_xyz_class_laws(spark, sf_dir):
    """Classification replayed in Python from the monthly frame: ABC fences
    on cumulative revenue share, XYZ fences on integer CV^2; both
    dimensions must actually separate the fixture parts."""
    from collections import defaultdict as _dd

    from sol_spark.queries.relational import orders_abc_xyz
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    monthly = (
        load_tables(spark, sf_dir)["lineitem"]
        .groupBy(F.col("l_partkey"), F.date_trunc("month", "l_shipdate").alias("m"))
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    )
    months = {r["m"] for r in monthly}
    n = len(months)
    agg = _dd(lambda: [0, 0, 0])  # cents, s1, s2
    for r in monthly:
        a = agg[r["l_partkey"]]
        a[0] += r["cents"]
        a[1] += r["qty"]
        a[2] += r["qty"] * r["qty"]
    tot = sum(a[0] for a in agg.values())
    order = sorted(agg, key=lambda k: (-agg[k][0], k))
    cum, abc = 0, {}
    for k in order:
        cum += agg[k][0]
        abc[k] = "A" if 100 * cum <= 80 * tot else ("B" if 100 * cum <= 95 * tot else "C")
    pres = _dd(int)
    for r in monthly:
        pres[r["l_partkey"]] += 1
    rows = {r["l_partkey"]: r for r in orders_abc_xyz(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for k, (cents, s1, s2) in agg.items():
        r = rows[k]
        assert r["revenue_cents"] == cents
        assert r["rev_share_bp"] == (10000 * cents) // tot
        assert r["abc"] == abc[k]
        dev = pres[k] * s2 - s1 * s1
        assert r["cv2_bp"] == (10000 * dev) // (s1 * s1)
        want = "X" if 4 * dev <= s1 * s1 else ("Y" if dev <= s1 * s1 else "Z")
        assert r["xyz"] == want
        assert r["adi_bp"] == (10000 * n) // pres[k]
        assert r["adi_bp"] >= 10000  # ADI >= 1 by construction
    assert len({r["abc"] for r in rows.values()}) >= 2
    assert len({r["xyz"] for r in rows.values()}) >= 2


def test_slo_budget_replay(spark, sf_dir):
    """Replay the budget arithmetic in Python from daily (n, errs) counts;
    the fixture's ~20% error rate must exhaust a 1% budget immediately
    (non-vacuous alert path)."""
    from collections import defaultdict as _dd

    from sol_spark.queries.events_analytics import (
        SLO_BUDGET_PPM,
        SLO_FAST_BURN_X,
        events_slo_error_budget,
    )
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    ev = (
        load_tables(spark, sf_dir)["events"]
        .select(F.expr("cast(date_trunc('day', ts) as timestamp_ntz)").alias("d"), "event_type")
        .collect()
    )
    daily = _dd(lambda: [0, 0])
    for r in ev:
        a = daily[r["d"]]
        a[0] += 1
        a[1] += r["event_type"] == "error"
    rows = {r["day"]: r for r in events_slo_error_budget(spark, sf_dir).collect()}
    assert set(rows) == set(daily)
    cum_n = cum_e = 0
    for d in sorted(daily):
        n, e = daily[d]
        cum_n += n
        cum_e += e
        r = rows[d]
        assert (r["n_events"], r["n_errors"]) == (n, e)
        assert r["error_ppm"] == (1000000 * e) // n
        assert r["cum_error_ppm"] == (1000000 * cum_e) // cum_n
        assert r["budget_used_ppm"] == (1000000 * 1000000 * cum_e) // (SLO_BUDGET_PPM * cum_n)
        assert r["fast_burn_alert"] == (1000000 * e > SLO_FAST_BURN_X * SLO_BUDGET_PPM * n)
        assert r["budget_exhausted"] == (1000000 * cum_e > SLO_BUDGET_PPM * cum_n)
    assert any(r["fast_burn_alert"] for r in rows.values())
    assert rows[max(daily)]["budget_exhausted"]


def test_incident_islands_replay(spark, sf_dir):
    """Replay the gaps-and-islands rule in Python over the error stream;
    blips + multi-error incidents both occur (non-vacuous)."""
    import datetime

    from sol_spark.queries.events_analytics import INCIDENT_GAP_S, events_incident_stats
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    errs = sorted(
        (int((r["ts"] - datetime.datetime(1970, 1, 1)).total_seconds()), r["event_id"])
        for r in load_tables(spark, sf_dir)["events"]
        .where(F.col("event_type") == "error")
        .select("ts", "event_id")
        .collect()
    )
    incidents = []
    for sec, _eid in errs:
        if not incidents or sec - incidents[-1][-1] >= INCIDENT_GAP_S:
            incidents.append([sec])
        else:
            incidents[-1].append(sec)
    r = events_incident_stats(spark, sf_dir).collect()[0]
    assert r["n_incidents"] == len(incidents)
    assert r["n_error_events"] == len(errs)
    assert r["worst_incident_errors"] == max(len(i) for i in incidents)
    durs = [i[-1] - i[0] for i in incidents]
    assert r["longest_duration_s"] == max(durs)
    assert r["mttr_s"] == sum(durs) // len(incidents)
    assert r["n_blips"] == sum(1 for i in incidents if len(i) == 1)
    assert 0 < r["n_blips"] < r["n_incidents"]  # both island shapes occur
