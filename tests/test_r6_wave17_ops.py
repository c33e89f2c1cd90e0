"""Behavioral invariants for the round-6 seventeenth-wave operators:
Heaps-law curve (monotone coverage laws + totals), SRM guardrail (exact
recompute), and the RFM migration matrix (accounting + quintile laws)."""

from __future__ import annotations

import hashlib
from collections import defaultdict


def test_heaps_curve_laws(spark, sf_dir):
    """Cumulative counts are strictly increasing; final totals equal the
    corpus token/type counts; per-slice new types never exceed per-slice
    instances."""
    from sol_spark.operators.text import text_heaps_law
    from sol_spark.tables import load_tables
    from pyspark.sql import functions as F

    rows = sorted(text_heaps_law(spark, sf_dir).collect(), key=lambda r: r["slice"])
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        F.explode(F.split(F.expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), " ")).alias("t")
    )
    n_inst = toks.count()
    n_types = toks.distinct().count()
    assert rows[-1]["tokens_cum"] == n_inst
    assert rows[-1]["types_cum"] == n_types
    assert sum(r["n_inst"] for r in rows) == n_inst
    assert sum(r["n_new_types"] for r in rows) == n_types
    prev_t, prev_v = 0, 0
    for r in rows:
        assert 0 <= r["n_new_types"] <= r["n_inst"]
        assert r["tokens_cum"] == prev_t + r["n_inst"]
        assert r["types_cum"] == prev_v + r["n_new_types"]
        prev_t, prev_v = r["tokens_cum"], r["types_cum"]


def test_srm_recompute(spark, sf_dir):
    from sol_spark.queries.events_analytics import _SRM_CRIT_E6, events_ab_srm_check
    from sol_spark.tables import load_tables

    users = {
        r["user_id"]
        for r in load_tables(spark, sf_dir)["events"].select("user_id").distinct().collect()
    }
    n0 = sum(
        1 for u in users if int(hashlib.md5(f"ab{u}".encode()).hexdigest()[:8], 16) % 2 == 0
    )
    n1 = len(users) - n0
    row = events_ab_srm_check(spark, sf_dir).collect()[0]
    assert (row["n0"], row["n1"]) == (n0, n1)
    chi2 = (1000000 * (n0 - n1) ** 2) // (n0 + n1)
    assert row["chi2_e6"] == chi2
    assert row["srm_flag"] == (1 if chi2 > _SRM_CRIT_E6 else 0)


def test_rfm_migration_accounting(spark, sf_dir):
    """Matrix counts cover exactly the repeat customers; quintile margins
    are balanced (each early/late quintile holds n/5 +- 1 customers)."""
    from sol_spark.queries.events_analytics import rfm_migration
    from sol_spark.tables import load_tables

    rows = rfm_migration(spark, sf_dir).collect()
    orders = load_tables(spark, sf_dir)["orders"].select("o_custkey", "o_orderdate").collect()
    epochs = defaultdict(set)
    for o in orders:
        epochs[o["o_custkey"]].add("early" if o["o_orderdate"].year < 1997 else "late")
    n_repeat = sum(1 for v in epochs.values() if len(v) == 2)
    assert sum(r["n_customers"] for r in rows) == n_repeat
    early_m = defaultdict(int)
    late_m = defaultdict(int)
    for r in rows:
        assert 1 <= r["m_early"] <= 5 and 1 <= r["m_late"] <= 5
        early_m[r["m_early"]] += r["n_customers"]
        late_m[r["m_late"]] += r["n_customers"]
    for marg in (early_m, late_m):
        sizes = list(marg.values())
        assert max(sizes) - min(sizes) <= 1
