"""Behavioral invariants for the round-6 twenty-first-wave operators: FK
fan-out profile (distribution laws vs a Python recompute) and delete-vector
accounting (conservation + gate law)."""

from __future__ import annotations

import hashlib
from collections import Counter


def test_fk_fanout_profile_recompute(spark, sf_dir):
    from sol_spark.operators.governance import _FANOUT_EDGES, dq_fk_fanout_profile
    from sol_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    rows = {r["fk"]: r for r in dq_fk_fanout_profile(spark, sf_dir).collect()}
    assert len(rows) == len(_FANOUT_EDGES)
    for child, fk, parent, pk in _FANOUT_EDGES:
        label = f"{child}.{fk} -> {parent}.{pk}"
        child_counts = Counter(r[fk] for r in t[child].select(fk).collect())
        fans = sorted(
            child_counts.get(r[pk], 0) for r in t[parent].select(pk).collect()
        )
        r = rows[label]
        assert r["n_parents"] == len(fans)
        assert r["n_childless"] == sum(1 for f in fans if f == 0)
        assert (r["min_fanout"], r["max_fanout"]) == (fans[0], fans[-1])
        assert r["avg_fanout_x100"] == (100 * sum(fans)) // len(fans)
        # exact lower median
        assert r["p50_fanout"] == fans[(len(fans) - 1) // 2]


def test_delete_vectors_conservation_and_gate(spark, sf_dir):
    from sol_spark.operators.governance import (
        _DV_DELETE_PPM,
        _DV_FILES,
        _DV_REWRITE_BP,
        warehouse_delete_vectors,
    )
    from sol_spark.tables import load_tables

    rows = warehouse_delete_vectors(spark, sf_dir).collect()
    orders = [r["o_orderkey"] for r in load_tables(spark, sf_dir)["orders"].select("o_orderkey").collect()]
    exp_rows = Counter()
    exp_del = Counter()
    for k in orders:
        fid = int(hashlib.md5(f"f{k}".encode()).hexdigest()[:8], 16) % _DV_FILES
        exp_rows[fid] += 1
        if int(hashlib.md5(f"dv{k}".encode()).hexdigest()[:8], 16) % 1000000 < _DV_DELETE_PPM:
            exp_del[fid] += 1
    assert sum(r["n_rows"] for r in rows) == len(orders)
    assert any(r["n_deleted"] > 0 for r in rows), "fault injection must delete something"
    for r in rows:
        assert r["n_rows"] == exp_rows[r["file_id"]]
        assert r["n_deleted"] == exp_del[r["file_id"]]
        assert r["n_live"] == r["n_rows"] - r["n_deleted"]
        assert r["deleted_bp"] == (10000 * r["n_deleted"]) // r["n_rows"]
        assert r["rewrite_flag"] == (
            1 if 10000 * r["n_deleted"] >= _DV_REWRITE_BP * r["n_rows"] else 0
        )


def test_alert_debounce_laws(spark, sf_dir):
    """Debounced firings never exceed raw firings; suppressed is their
    difference; a Python replay over the hourly state sequence matches."""
    from collections import defaultdict

    from sol_spark.queries.events_analytics import (
        DEBOUNCE_THRESHOLD,
        events_alert_debounce,
    )
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    hourly = (
        load_tables(spark, sf_dir)["events"]
        .groupBy(
            "event_type",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 3600"
            ).alias("h"),
        )
        .count()
        .collect()
    )
    seq = defaultdict(dict)
    for r in hourly:
        seq[r["event_type"]][r["h"]] = r["count"]
    expected = {}
    for et, hs in seq.items():
        states = [1 if hs[h] >= DEBOUNCE_THRESHOLD else 0 for h in sorted(hs)]
        raw = sum(
            1 for i, s in enumerate(states) if s == 1 and (i == 0 or states[i - 1] == 0)
        )
        deb = sum(
            1
            for i, s in enumerate(states)
            if i >= 1
            and s == 1
            and states[i - 1] == 1
            and (i == 1 or states[i - 2] == 0)
        )
        expected[et] = (len(states), sum(states), raw, deb)
    got = {
        r["event_type"]: (r["n_hours"], r["n_alarm_hours"], r["raw_alerts"], r["debounced_alerts"])
        for r in events_alert_debounce(spark, sf_dir).collect()
    }
    assert got == expected
    for r in events_alert_debounce(spark, sf_dir).collect():
        assert r["debounced_alerts"] <= r["raw_alerts"]
        assert r["suppressed"] == r["raw_alerts"] - r["debounced_alerts"]


def test_hll_ie_audit_identity(spark, sf_dir):
    """Inclusion-exclusion is exact on exact counts: ie_exact_check equals
    exact_inter and ie_err_bp is 0; side counts recompute from raw
    orders."""
    from sol_spark.queries.relational import sketch_hll_ie_audit
    from sol_spark.tables import load_tables

    orders = load_tables(spark, sf_dir)["orders"].select("o_custkey", "o_orderdate").collect()
    a = {r["o_custkey"] for r in orders if r["o_orderdate"].year <= 1997}
    b = {r["o_custkey"] for r in orders if r["o_orderdate"].year >= 1997}
    row = sketch_hll_ie_audit(spark, sf_dir).collect()[0]
    assert (row["exact_a"], row["exact_b"]) == (len(a), len(b))
    assert row["exact_union"] == len(a | b)
    assert row["exact_inter"] == len(a & b)
    assert row["ie_exact_check"] == row["exact_inter"]
    assert row["ie_err_bp"] == 0
