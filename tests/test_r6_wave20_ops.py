"""Behavioral invariants for the round-6 twentieth-wave operators: the
order-statistic median CI (coverage laws + exact Python recompute) and the
id-gap audit (injected holes recovered exactly)."""

from __future__ import annotations

import math


def test_quantile_ci_matches_order_statistics(spark, sf_dir):
    from sol_spark.queries.relational import _WILSON_Z, stats_quantile_ci
    from sol_spark.tables import load_tables
    from decimal import ROUND_HALF_UP, Decimal

    vals = sorted(
        int(Decimal(repr(r["o_totalprice"] * 100)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
        for r in load_tables(spark, sf_dir)["orders"].select("o_totalprice").collect()
    )
    n = len(vals)
    r_lo = int(math.floor((n - _WILSON_Z * math.sqrt(n)) / 2.0))
    r_hi = int(math.ceil(1.0 + (n + _WILSON_Z * math.sqrt(n)) / 2.0))
    r_med = (n + 1) // 2
    row = stats_quantile_ci(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert (row["r_lo"], row["r_med"], row["r_hi"]) == (r_lo, r_med, r_hi)
    assert row["ci_lo_cents"] == vals[r_lo - 1]
    assert row["median_cents"] == vals[r_med - 1]
    assert row["ci_hi_cents"] == vals[min(r_hi, n) - 1]
    assert row["ci_lo_cents"] <= row["median_cents"] <= row["ci_hi_cents"]


def test_id_gap_audit_recovers_injected_holes(spark, sf_dir):
    """Every reported gap spans only injected ids (id % mod < 3 or ids
    absent from the source), totals reconcile, and the audit is
    non-vacuous."""
    from sol_spark.operators.governance import _GAP_DROP_MOD, dq_id_gap_audit
    from sol_spark.tables import load_tables

    rows = dq_id_gap_audit(spark, sf_dir).collect()
    assert rows, "fault injection must produce at least one gap"
    all_ids = {
        r["o_orderkey"]
        for r in load_tables(spark, sf_dir)["orders"].select("o_orderkey").collect()
    }
    kept = {i for i in all_ids if i % _GAP_DROP_MOD >= 3}
    for r in rows:
        assert r["gap_after"] in kept and r["next_id"] in kept
        assert r["missing"] == r["next_id"] - r["gap_after"] - 1
        for mid in range(r["gap_after"] + 1, r["next_id"]):
            assert mid % _GAP_DROP_MOD < 3 or mid not in all_ids
        assert r["n_actual"] == len(kept)
        assert r["n_expected"] == max(kept) - min(kept) + 1
        assert r["n_missing_total"] == r["n_expected"] - r["n_actual"]
    rks = [r["rk"] for r in rows]
    assert rks == list(range(1, len(rows) + 1))
