"""Behavioral invariants for the round-5 operator classes: governance
(expectations / privacy / ER / SCD2 / CDC), exact repeated-span analysis,
and distributed PCA. Oracle parity is covered by the registry sweep; these
pin the semantics the hash-compare can't see (internal consistency,
end-to-end consumption of the covariance by an actual projection, seam
invariants on constructed inputs).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from sol_spark.operators.governance import (
    cdc_apply_changelog,
    dq_expectations,
    er_blocking,
    privacy_k_anonymity,
    scd2_order_priority,
)
from sol_spark.operators.similarity import PCA_DIM, emb_pca_cov
from sol_spark.operators.text import DUPSPAN_K, text_dup_spans
from sol_spark.tables import load_tables


def test_dq_expectations_internal_consistency(spark, sf_dir):
    rows = {(r["table_name"], r["expectation"]): r for r in dq_expectations(spark, sf_dir).collect()}
    assert len(rows) == 11
    for r in rows.values():
        assert 0 <= r["n_failed"] <= r["n_checked"]
        assert r["status"] == ("pass" if r["n_failed"] == 0 else "fail")
    # Structural guarantees of the fixture star: keys unique, RI holds.
    assert rows[("orders", "unique:o_orderkey")]["n_failed"] == 0
    assert rows[("orders", "ref_integrity:o_custkey->customer")]["n_failed"] == 0
    # The deliberately-strict tolerance check must actually fire.
    assert rows[("lineitem", "max:l_discount<=0.06")]["n_failed"] > 0


def test_k_anonymity_accounts_for_every_row(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    out = privacy_k_anonymity(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in out) == t["customer"].count()
    for r in out:
        assert r["n_rows"] == r["group_size"] * r["n_groups"]
        assert r["at_risk"] == (r["group_size"] < 5)


def test_er_blocking_candidates_stay_in_block(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    nk = {r["c_custkey"]: r["c_nationkey"] for r in t["customer"].collect()}
    pairs = er_blocking(spark, sf_dir).collect()
    assert pairs
    for r in pairs:
        assert r["custkey_a"] < r["custkey_b"]
        assert nk[r["custkey_a"]] == nk[r["custkey_b"]]
        assert r["edit_dist"] <= 1


def test_scd2_versions_tile_the_timeline(spark, sf_dir):
    """Per customer: versions are contiguous (eff_to == next eff_from),
    exactly one open (is_current) version, version_n dense from 1."""
    out = scd2_order_priority(spark, sf_dir).toPandas()
    for _, g in out.groupby("custkey"):
        g = g.sort_values("version_n")
        assert list(g["version_n"]) == list(range(1, len(g) + 1))
        assert g["is_current"].sum() == 1
        assert g.iloc[-1]["is_current"]
        # adjacent versions meet exactly
        assert (g["eff_to"].iloc[:-1].values == g["eff_from"].iloc[1:].values).all()
        # consecutive versions always change the tracked attribute
        assert (g["priority"].iloc[:-1].values != g["priority"].iloc[1:].values).all()


def test_cdc_apply_drops_tombstoned_keys(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "ts", "event_id")
    # Keys whose LATEST change is a delete must be absent from the state.
    latest = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        )
        .where("rn = 1")
        .select("user_id", (F.col("event_id") % 10 == 0).alias("deleted"))
        .collect()
    )
    deleted = {r["user_id"] for r in latest if r["deleted"]}
    live = {r["user_id"] for r in latest if not r["deleted"]}
    state = {r["user_id"] for r in cdc_apply_changelog(spark, sf_dir).collect()}
    assert state == live
    assert not (state & deleted)


def test_dup_spans_invariants(spark, sf_dir):
    """Structural invariants of the repeated-span statistic: spans exist
    exactly where duplicated shingles exist, a maximal run never exceeds
    the doc's own shingle count, and a fully-duplicated doc (every shingle
    shared, dup_frac_bp == 10000) reports its whole token sequence as the
    longest span."""
    out = list(text_dup_spans(spark, sf_dir).collect())
    assert len(out) > 0
    full, none = 0, 0
    for r in out:
        assert 0 <= r["n_dup"] <= r["n_shingles"]
        assert r["dup_frac_bp"] == (10000 * r["n_dup"]) // r["n_shingles"]
        assert (r["longest_dup_span_tokens"] > 0) == (r["n_dup"] > 0)
        if r["n_dup"]:
            # run of length rl covers rl + K - 1 tokens, bounded by the doc
            assert DUPSPAN_K <= r["longest_dup_span_tokens"] <= r["n_shingles"] + DUPSPAN_K - 1
        if r["dup_frac_bp"] == 10000:
            full += 1
            assert r["longest_dup_span_tokens"] == r["n_shingles"] + DUPSPAN_K - 1
        if r["n_dup"] == 0:
            none += 1
            assert r["longest_dup_span_tokens"] == 0
    # The fixture exercises both extremes (boilerplate mirrors + unique docs).
    assert full > 0 and none > 0


def test_pca_projection_variance_matches_eigenvalue(spark, sf_dir):
    """End-to-end consumption of emb_pca_cov: rebuild the symmetric
    covariance, eigendecompose on the driver (model-sized), project the
    corpus onto PC1 with a single JVM-side expression, and check the
    projected sample variance equals the top eigenvalue."""
    cov_rows = emb_pca_cov(spark, sf_dir).collect()
    C = np.zeros((PCA_DIM, PCA_DIM))
    for r in cov_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    evals, evecs = np.linalg.eigh(C)
    lam1, v1 = evals[-1], evecs[:, -1]
    t = load_tables(spark, sf_dir)
    proj_expr = " + ".join(f"(embedding[{i}] * {v1[i]!r})" for i in range(PCA_DIM))
    stats = (
        t["embeddings"]
        .select(F.expr(proj_expr).alias("p"))
        .agg(F.var_samp("p").alias("v"))
        .collect()[0]
    )
    # cov entries are rounded to 6dp before eigh; tolerance reflects that.
    assert abs(stats["v"] - lam1) < 1e-3
    assert lam1 == max(evals)


def test_er_clusters_consistent_with_pairs(spark, sf_dir):
    """Entity ids must respect the match graph: both ends of every matched
    pair share an entity, the entity id is the component's min custkey, and
    member counts add up to the clustered-record total."""
    from sol_spark.operators.governance import er_blocking, er_clusters

    pairs = [(r["custkey_a"], r["custkey_b"]) for r in er_blocking(spark, sf_dir).collect()]
    ent = {r["custkey"]: (r["entity_id"], r["n_members"]) for r in er_clusters(spark, sf_dir).collect()}
    assert pairs and ent
    for a, b in pairs:
        assert ent[a][0] == ent[b][0], f"pair ({a},{b}) split across entities"
    for k, (eid, _) in ent.items():
        assert eid <= k
        assert ent[eid][0] == eid  # representative maps to itself
    import collections

    sizes = collections.Counter(eid for eid, _ in ent.values())
    for k, (eid, n) in ent.items():
        assert n == sizes[eid]


def test_pca_whitening_identity_covariance(spark, sf_dir):
    """PCA whitening end-to-end: project onto the top-8 eigenvectors scaled
    by 1/sqrt(eigenvalue) (a single JVM matrix expression compiled from the
    driver-side model) and verify the whitened components have ~unit
    variance and ~zero pairwise covariance — the preprocessing step ANN
    quantizers (PQ/IVF) assume."""
    cov_rows = emb_pca_cov(spark, sf_dir).collect()
    C = np.zeros((PCA_DIM, PCA_DIM))
    for r in cov_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    evals, evecs = np.linalg.eigh(C)
    k = 8
    W_mat = evecs[:, -k:] / np.sqrt(evals[-k:])  # (64, k)
    t = load_tables(spark, sf_dir)
    cols = [
        F.expr(" + ".join(f"(embedding[{i}] * {W_mat[i, j]!r})" for i in range(PCA_DIM))).alias(f"w{j}")
        for j in range(k)
    ]
    wdf = t["embeddings"].select(*cols)
    aggs = [F.var_samp(f"w{j}").alias(f"v{j}") for j in range(k)]
    aggs += [F.covar_samp("w0", f"w{j}").alias(f"c{j}") for j in range(1, k)]
    row = wdf.agg(*aggs).collect()[0]
    for j in range(k):
        assert abs(row[f"v{j}"] - 1.0) < 0.05, f"component {j} variance {row[f'v{j}']}"
    for j in range(1, k):
        assert abs(row[f"c{j}"]) < 0.05


def test_scd2_property_random_changelogs(spark):
    """Property check: the windowed SCD2 builder equals a sequential
    version-builder on random (key, seq, attr) change streams — any change
    pattern, not just the fixture's."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sol_spark.operators.governance import scd2

    def sequential(rows):
        out = {}
        bykey = {}
        for k, seq, a in sorted(rows, key=lambda r: (r[0], r[1])):
            bykey.setdefault(k, []).append((seq, a))
        for k, items in bykey.items():
            versions = []
            prev = None
            for seq, a in items:
                if prev is None or a != prev:
                    versions.append([a, seq, None])
                prev = a
            for i in range(len(versions) - 1):
                versions[i][2] = versions[i + 1][1]
            out[k] = [
                (a, f, t, t is None, i + 1) for i, (a, f, t) in enumerate(versions)
            ]
        return out

    @settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(
            st.tuples(st.integers(1, 4), st.integers(1, 50), st.sampled_from(["a", "b", "c"])),
            min_size=1,
            max_size=40,
            unique_by=lambda r: (r[0], r[1]),  # (key, seq) unique: seq is the ordering
        )
    )
    def check(rows):
        df = spark.createDataFrame(rows, "k bigint, seq bigint, attr string")
        got = {}
        for r in scd2(df, "k", "attr", ["seq"]).collect():
            got.setdefault(r["custkey"], []).append(
                (r["priority"], r["eff_from"], r["eff_to"], r["is_current"], r["version_n"])
            )
        want = sequential(rows)
        assert got == want

    check()


def test_cdc_apply_property_random_changelogs(spark):
    """Property check: the windowed MERGE apply equals a sequential dict
    replay (upserts overwrite, deletes tombstone, later (ts, seq) wins)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sol_spark.operators.governance import cdc_apply

    @settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(
            st.tuples(
                st.integers(1, 4),              # key
                st.integers(1, 30),             # ts (seconds)
                st.integers(1, 1000),           # event_id (unique per row below)
                st.integers(0, 99),             # value
                st.booleans(),                  # is_delete
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda r: r[2],
        )
    )
    def check(rows):
        import datetime

        data = [
            (k, datetime.datetime(2024, 1, 1, 0, 0, ts), eid, float(v), "D" if d else "U")
            for k, ts, eid, v, d in rows
        ]
        df = spark.createDataFrame(
            data, "user_id bigint, ts timestamp_ntz, event_id bigint, value double, op string"
        )
        got = {
            r["user_id"]: (r["current_value"], r["last_ts"], r["n_changes"])
            for r in cdc_apply(df).collect()
        }
        state, counts = {}, {}
        for k, ts, eid, v, op in sorted(data, key=lambda r: (r[1], r[2])):
            counts[k] = counts.get(k, 0) + 1
            state[k] = (v, ts, op)
        want = {
            k: (v, ts, counts[k])
            for k, (v, ts, op) in state.items()
            if op == "U"
        }
        assert got == want

    check()


def test_survival_curve_monotone_nonincreasing(spark, sf_dir):
    """KM survival must start <= 1, never increase, and at-risk counts must
    strictly decrease along the duration axis."""
    from sol_spark.queries.events_analytics import events_survival_km

    rows = events_survival_km(spark, sf_dir).collect()
    assert rows
    prev_s, prev_risk = 1.0 + 1e-9, float("inf")
    for r in rows:
        assert 0.0 <= r["survival"] <= prev_s + 1e-9, r
        assert r["at_risk"] < prev_risk
        assert 1 <= r["n_converted"] <= r["at_risk"]
        prev_s, prev_risk = r["survival"], r["at_risk"]


def test_gini_and_clustering_bounds(spark, sf_dir):
    """Gini lies in [0, 1); every local clustering coefficient lies in
    [0, 1] and equals 1 exactly when the neighborhood is a clique
    (triangles == deg-choose-2)."""
    from sol_spark.operators.dedup import graph_clustering_coef, release_result
    from sol_spark.queries.events_analytics import events_gini

    g = events_gini(spark, sf_dir).collect()[0]
    assert 0.0 <= g["gini"] < 1.0
    cc = graph_clustering_coef(spark, sf_dir)
    rows = cc.collect()
    release_result(cc)
    assert rows
    for r in rows:
        assert 0.0 <= r["clustering_coef"] <= 1.0
        full = r["degree"] * (r["degree"] - 1) // 2
        assert r["triangles"] <= full
        if r["triangles"] == full:
            assert r["clustering_coef"] == 1.0


def test_markov_stationary_is_distribution(spark, sf_dir):
    """The stationary vector must be a probability distribution and stable
    under one more application of P (within fp tolerance)."""
    from sol_spark.queries.events_analytics import (
        events_markov_stationary,
        events_markov_transitions,
    )

    pi = {r["state"]: r["pi"] for r in events_markov_stationary(spark, sf_dir).collect()}
    assert abs(sum(pi.values()) - 1.0) < 1e-3
    assert all(p >= 0 for p in pi.values())
    P = {}
    for r in events_markov_transitions(spark, sf_dir).collect():
        P.setdefault(r["cur"], {})[r["nxt"]] = r["p"]
    nxt = {s: 0.0 for s in pi}
    for cur, row in P.items():
        for to, p in row.items():
            nxt[to] += pi[cur] * p
    for s in pi:
        assert abs(nxt[s] - pi[s]) < 5e-3, (s, nxt[s], pi[s])


def test_geo_nearest_consistent_with_radius_join(spark, sf_dir):
    """Cross-operator consistency: wherever the radius join finds pairs for
    a customer, the nearest-neighbor result must pick the minimum-distance
    one (ties to the smaller supplier key), and its distance can never
    exceed any radius-pair distance for that customer."""
    from sol_spark.operators.geo import geo_nearest_supplier, geo_radius_join

    radius = {}
    for r in geo_radius_join(spark, sf_dir).collect():
        radius.setdefault(r["custkey"], []).append((r["dist_km"], r["suppkey"]))
    nearest = {
        r["custkey"]: (r["dist_km"], r["nearest_suppkey"])
        for r in geo_nearest_supplier(spark, sf_dir).collect()
    }
    assert radius and nearest
    for ck, pairs in radius.items():
        assert ck in nearest, f"customer {ck} has radius pairs but no nearest"
        nd, ns = nearest[ck]
        best = min(pairs)
        assert (nd, ns) == best, (ck, nearest[ck], best)


def test_snapshot_diff_matches_direct_derivation(spark, sf_dir):
    """The diff's change classes must match the snapshot construction:
    'added' keys are exactly those dropped from A (key % 11 == 0) but kept
    in B; 'removed' the reverse; 'changed' only keys with the % 7 price
    uplift present in both."""
    from sol_spark.operators.governance import snapshot_diff
    from sol_spark.tables import load_tables

    keys = [r["o_orderkey"] for r in load_tables(spark, sf_dir)["orders"].select("o_orderkey").collect()]
    expect = {}
    for k in keys:
        in_a, in_b = k % 11 != 0, k % 13 != 0
        if in_a and not in_b:
            expect[k] = "removed"
        elif in_b and not in_a:
            expect[k] = "added"
        elif in_a and in_b and k % 7 == 0:
            expect[k] = "changed"
    got = {r["o_orderkey"]: r["change_type"] for r in snapshot_diff(spark, sf_dir).collect()}
    assert got == expect
