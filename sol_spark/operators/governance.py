"""Data-governance and warehouse-maintenance operators: a declarative
data-quality expectation suite, k-anonymity profiling, entity-resolution
blocking, SCD type-2 dimension building, and CDC changelog application
(MERGE semantics). These are the maintenance jobs a 100 TB lakehouse runs
nightly around the analytics proper.

Scale shape: every expectation is a conditional aggregate folded into ONE
scan per table (never one job per check); referential integrity is a
broadcast anti-join against the dimension keys; entity resolution generates
candidate pairs only within blocking keys (never all-pairs); SCD2 and CDC
are single window passes partitioned by the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sol_spark.registry import register
from sol_spark.tables import load_tables

# ---------------------------------------------------------------------------
# Data-quality expectation suite (Deequ / dbt-test style)
# ---------------------------------------------------------------------------

DQ_EXPECTATIONS_ORACLE = """
WITH li AS (
  SELECT count(*) AS n,
         count(*) FILTER (l_orderkey IS NULL) AS f_null,
         count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS f_qty,
         count(*) FILTER (l_discount > 0.06) AS f_disc,
         count(*) FILTER (l_returnflag NOT IN ('A', 'N', 'R')) AS f_flag
  FROM lineitem
), o AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT o_orderkey) AS f_uniq,
         count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) AS f_status
  FROM orders
), ri AS (
  SELECT count(*) AS n,
         count(*) FILTER (c.c_custkey IS NULL) AS f_ri
  FROM orders o2 LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
), ev AS (
  SELECT count(*) AS n,
         count(*) FILTER (value < 0) AS f_neg,
         count(*) FILTER (event_type NOT IN ('click', 'view', 'signup', 'purchase', 'error')) AS f_type,
         count(*) FILTER (json_extract(props, '$.k') IS NULL) AS f_json
  FROM events
), cu AS (
  SELECT count(*) AS n,
         count(*) FILTER (c_acctbal < -1000 OR c_acctbal > 10000) AS f_bal
  FROM customer
), long AS (
  SELECT 'lineitem' AS table_name, 'not_null:l_orderkey' AS expectation, n, f_null AS n_failed FROM li
  UNION ALL SELECT 'lineitem', 'range:l_quantity[1,50]', n, f_qty FROM li
  UNION ALL SELECT 'lineitem', 'max:l_discount<=0.06', n, f_disc FROM li
  UNION ALL SELECT 'lineitem', 'accepted:l_returnflag', n, f_flag FROM li
  UNION ALL SELECT 'orders', 'unique:o_orderkey', n, f_uniq FROM o
  UNION ALL SELECT 'orders', 'accepted:o_orderstatus', n, f_status FROM o
  UNION ALL SELECT 'orders', 'ref_integrity:o_custkey->customer', n, f_ri FROM ri
  UNION ALL SELECT 'events', 'min:value>=0', n, f_neg FROM ev
  UNION ALL SELECT 'events', 'accepted:event_type', n, f_type FROM ev
  UNION ALL SELECT 'events', 'json_path:props.k', n, f_json FROM ev
  UNION ALL SELECT 'customer', 'range:c_acctbal[-1000,10000]', n, f_bal FROM cu
)
SELECT table_name, expectation, n AS n_checked, n_failed,
       CASE WHEN n_failed = 0 THEN 'pass' ELSE 'fail' END AS status
FROM long ORDER BY table_name, expectation
"""


def _stack(agg: DataFrame, table: str, checks: list[tuple[str, str]]) -> DataFrame:
    """One aggregated row with (n, fail_a, fail_b, ...) -> long format."""
    pairs = ", ".join(f"'{label}', {col}" for label, col in checks)
    return agg.select(
        F.lit(table).alias("table_name"),
        F.expr(f"stack({len(checks)}, {pairs}) AS (expectation, n_failed)"),
        F.col("n").alias("n_checked"),
    ).select(
        "table_name",
        "expectation",
        "n_checked",
        "n_failed",
        F.when(F.col("n_failed") == 0, "pass").otherwise("fail").alias("status"),
    )


@register("dq_expectations", DQ_EXPECTATIONS_ORACLE, tags=("governance", "quality"))
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (Deequ / dbt-test style): 11
    expectations over 4 tables — null checks, value ranges, accepted sets,
    key uniqueness, JSON-path extractability, and referential integrity —
    each table computed in a SINGLE conditional-aggregate scan, RI as a
    broadcast left join on the dimension keys. At 100 TB this is one pass
    over each fact, not one job per expectation."""
    t = load_tables(spark, sf_dir)

    def cnt(cond) -> F.Column:
        return F.count_if(cond)

    li = t["lineitem"].agg(
        F.count(F.lit(1)).alias("n"),
        cnt(F.col("l_orderkey").isNull()).alias("f_null"),
        cnt((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("f_qty"),
        cnt(F.col("l_discount") > 0.06).alias("f_disc"),
        cnt(~F.col("l_returnflag").isin("A", "N", "R")).alias("f_flag"),
    )
    o = t["orders"].agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("f_uniq"),
        cnt(~F.col("o_orderstatus").isin("O", "F", "P")).alias("f_status"),
    )
    ri = (
        t["orders"]
        .join(
            # no broadcast pin: the customer key set grows with SF, so AQE
            # chooses broadcast vs shuffle for this referential-integrity probe
            t["customer"].select("c_custkey"),
            t["orders"]["o_custkey"] == F.col("c_custkey"),
            "left",
        )
        .agg(F.count(F.lit(1)).alias("n"), cnt(F.col("c_custkey").isNull()).alias("f_ri"))
    )
    ev = t["events"].agg(
        F.count(F.lit(1)).alias("n"),
        cnt(F.col("value") < 0).alias("f_neg"),
        cnt(~F.col("event_type").isin("click", "view", "signup", "purchase", "error")).alias("f_type"),
        cnt(F.get_json_object("props", "$.k").isNull()).alias("f_json"),
    )
    cu = t["customer"].agg(
        F.count(F.lit(1)).alias("n"),
        cnt((F.col("c_acctbal") < -1000) | (F.col("c_acctbal") > 10000)).alias("f_bal"),
    )
    out = (
        _stack(li, "lineitem", [
            ("not_null:l_orderkey", "f_null"),
            ("range:l_quantity[1,50]", "f_qty"),
            ("max:l_discount<=0.06", "f_disc"),
            ("accepted:l_returnflag", "f_flag"),
        ])
        .unionAll(_stack(o, "orders", [
            ("unique:o_orderkey", "f_uniq"),
            ("accepted:o_orderstatus", "f_status"),
        ]))
        .unionAll(_stack(ri, "orders", [("ref_integrity:o_custkey->customer", "f_ri")]))
        .unionAll(_stack(ev, "events", [
            ("min:value>=0", "f_neg"),
            ("accepted:event_type", "f_type"),
            ("json_path:props.k", "f_json"),
        ]))
        .unionAll(_stack(cu, "customer", [("range:c_acctbal[-1000,10000]", "f_bal")]))
    )
    return out.orderBy("table_name", "expectation")


# ---------------------------------------------------------------------------
# k-anonymity profile over quasi-identifiers
# ---------------------------------------------------------------------------

K_ANON_THRESHOLD = 5

PRIVACY_K_ANONYMITY_ORACLE = f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment, (floor(c_acctbal / 1000))::BIGINT AS bal_bucket,
         count(*) AS group_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT group_size, count(*) AS n_groups, sum(group_size)::BIGINT AS n_rows,
       group_size < {K_ANON_THRESHOLD} AS at_risk
FROM qi GROUP BY group_size ORDER BY group_size
"""


@register("privacy_k_anonymity", PRIVACY_K_ANONYMITY_ORACLE, tags=("governance", "privacy"))
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group sizes over the quasi-identifier tuple
    (nation, market segment, account-balance bucket) histogrammed by k; any
    group smaller than K_ANON_THRESHOLD re-identifies its members. Two
    chained hash aggregates (QI -> size, size -> histogram), both map-side
    combinable; the first shuffles on the QI key, the second on a tiny
    integer domain — at 100 TB the output stays bounded by the k histogram."""
    t = load_tables(spark, sf_dir)
    qi = (
        t["customer"]
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    return (
        qi.groupBy("group_size")
        .agg(F.count(F.lit(1)).alias("n_groups"), F.sum("group_size").alias("n_rows"))
        .select(
            "group_size",
            "n_groups",
            "n_rows",
            (F.col("group_size") < K_ANON_THRESHOLD).alias("at_risk"),
        )
        .orderBy("group_size")
    )


# ---------------------------------------------------------------------------
# Entity resolution: blocked candidate pairs + edit-distance match
# ---------------------------------------------------------------------------

ER_MAX_EDIT = 1

ER_BLOCKING_ORACLE = f"""
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_EDIT}
ORDER BY custkey_a, custkey_b
"""


@register("er_blocking", ER_BLOCKING_ORACLE, tags=("governance", "entity-resolution"))
def er_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via blocking: candidate pairs are generated ONLY
    within a blocking key (nation), then confirmed with Levenshtein edit
    distance <= ER_MAX_EDIT. The classic record-linkage shape — the
    equi-join on the block key keeps the candidate set |block|² instead of
    |table|²; production blocks on several redundant keys (sorted-
    neighborhood, phonetic) and unions the candidates. A skewed block is
    handled the same way as any skewed join key (salting / AQE skew-split,
    see operators/skew.py)."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
    )
    b = t["customer"].select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
    )
    return (
        a.join(b, "nk")
        .where(F.col("custkey_a") < F.col("custkey_b"))
        .select(
            "custkey_a",
            "custkey_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= ER_MAX_EDIT)
        .orderBy("custkey_a", "custkey_b")
    )


# ---------------------------------------------------------------------------
# SCD type-2 dimension build
# ---------------------------------------------------------------------------

SCD2_ORACLE = """
WITH s AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev
  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), starts AS (
  SELECT o_custkey, o_orderpriority, o_orderdate AS eff_from, o_orderkey
  FROM s WHERE prev IS NULL OR prev <> o_orderpriority
)
SELECT o_custkey AS custkey, o_orderpriority AS priority, eff_from,
       lead(eff_from) OVER w2 AS eff_to,
       lead(eff_from) OVER w2 IS NULL AS is_current,
       row_number() OVER w2 AS version_n
FROM starts
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY eff_from, o_orderkey)
ORDER BY custkey, version_n
"""


def scd2(df: DataFrame, key: str, attr: str, order_by: list[str]) -> DataFrame:
    """Generic SCD type-2 builder: collapse each key's change stream into
    versioned (value, eff_from, eff_to, is_current, version_n) rows, a new
    version opening whenever the tracked attribute changes under the given
    ordering (first order column = the effective timestamp). Two window
    passes over the SAME partitioning — Spark plans one sort + one
    exchange, reused for both lag and lead; no join, no self-union.
    Property-tested against a sequential reference on random changelogs
    (tests/test_r5_ops.py::test_scd2_property_random_changelogs)."""
    w = Window.partitionBy(key).orderBy(*order_by)
    eff = order_by[0]
    starts = (
        df.select(key, attr, *order_by, F.lag(attr).over(w).alias("prev"))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col(attr)))
    )
    # The version windows order by the FULL order_by, not eff alone: two
    # versions can open at the same eff timestamp (same-day changes), and
    # an eff-only ordering leaves lead/row_number tie order engine-defined
    # (caught by the sf0.1 sweep: version_n<->value pairings flipped vs
    # the oracle). The tie-break column makes the ordering total, so the
    # same-day rule is deterministic: later order key = later version.
    w2 = Window.partitionBy(key).orderBy(*order_by)
    return (
        starts.select(
            F.col(key).alias("custkey"),
            F.col(attr).alias("priority"),
            F.col(eff).alias("eff_from"),
            F.lead(eff).over(w2).alias("eff_to"),
            F.row_number().over(w2).alias("version_n"),
        )
        .select(
            "custkey",
            "priority",
            "eff_from",
            "eff_to",
            F.col("eff_to").isNull().alias("is_current"),
            "version_n",
        )
        .orderBy("custkey", "version_n")
    )


@register("scd2_order_priority", SCD2_ORACLE, tags=("governance", "scd"))
def scd2_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 over each customer's order stream —
    the standard dimension-maintenance job for a star-schema warehouse; see
    :func:`scd2` for the plan shape."""
    t = load_tables(spark, sf_dir)
    return scd2(t["orders"], "o_custkey", "o_orderpriority", ["o_orderdate", "o_orderkey"])


# ---------------------------------------------------------------------------
# CDC changelog application (MERGE / upsert-with-delete semantics)
# ---------------------------------------------------------------------------

CDC_APPLY_ORACLE = """
WITH changelog AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM changelog
)
SELECT user_id, value AS current_value, ts AS last_ts, n_changes
FROM latest WHERE rn = 1 AND op = 'U'
ORDER BY user_id
"""


def cdc_apply(changelog: DataFrame) -> DataFrame:
    """Generic MERGE-semantics changelog apply: last-writer-wins per
    `user_id` ordered by (ts, event_id), a trailing 'D' op removing the
    key entirely. One window pass partitioned by the key — the same plan a
    Delta/Iceberg MERGE compiles to for a dedup-then-apply batch; at
    100 TB the shuffle is on the business key and the state never leaves
    the executors. Property-tested against a sequential dict replay on
    random changelogs (tests/test_r5_ops.py)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    wc = Window.partitionBy("user_id")
    return (
        changelog.select(
            "user_id",
            "value",
            "ts",
            "op",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_changes"),
        )
        .where((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            F.col("ts").alias("last_ts"),
            "n_changes",
        )
        .orderBy("user_id")
    )


@register("cdc_apply_changelog", CDC_APPLY_ORACLE, tags=("governance", "cdc"))
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changelog with MERGE semantics — see :func:`cdc_apply`.
    The changelog is derived deterministically from events (every 10th
    event_id is a delete) so both engines see the same input."""
    t = load_tables(spark, sf_dir)
    changelog = t["events"].select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_id") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    return cdc_apply(changelog)


# ---------------------------------------------------------------------------
# l-diversity profile (companion to k-anonymity)
# ---------------------------------------------------------------------------

PRIVACY_L_DIVERSITY_ORACLE = """
WITH qi AS (
  SELECT c_nationkey, (floor(c_acctbal / 1000))::BIGINT AS bal_bucket,
         count(DISTINCT c_mktsegment) AS l, count(*) AS n_rows
  FROM customer GROUP BY 1, 2
)
SELECT l, count(*) AS n_groups, sum(n_rows)::BIGINT AS n_rows,
       l < 2 AS at_risk
FROM qi GROUP BY l ORDER BY l
"""


@register("privacy_l_diversity", PRIVACY_L_DIVERSITY_ORACLE, tags=("governance", "privacy"))
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the companion to k-anonymity: per quasi-identifier
    group (nation, balance bucket), how many DISTINCT values of the
    sensitive attribute (market segment) appear — a group where everyone
    shares one sensitive value leaks it even when the group is large.
    Same two-level hash-aggregate shape as privacy_k_anonymity; the
    count-distinct is per-QI-group, so it partial-aggregates cleanly."""
    t = load_tables(spark, sf_dir)
    qi = (
        t["customer"]
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(
            F.count_distinct("c_mktsegment").alias("l"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return (
        qi.groupBy("l")
        .agg(F.count(F.lit(1)).alias("n_groups"), F.sum("n_rows").alias("n_rows"))
        .select("l", "n_groups", "n_rows", (F.col("l") < 2).alias("at_risk"))
        .orderBy("l")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (table-diff between two versions of a table)
# ---------------------------------------------------------------------------

SNAPSHOT_DIFF_ORACLE = """
WITH snap_a AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 0
), snap_b AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice * 1.1, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
)
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type
FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR (a.o_orderstatus, a.o_totalprice) IS DISTINCT FROM (b.o_orderstatus, b.o_totalprice)
ORDER BY o_orderkey
"""


@register("snapshot_diff", SNAPSHOT_DIFF_ORACLE, tags=("governance", "diff"))
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table diff between two snapshots (the datafold/data-diff operation a
    pipeline runs after a backfill): keys added, removed, or with changed
    payload. The snapshots are derived deterministically from orders
    (version B drops every 13th key, A every 11th, and B uplifts every 7th
    price) so both engines diff identical inputs. One full-outer equi-join
    on the primary key with a payload comparison — at 100 TB this is a
    co-partitioned shuffle join on the key, and the unchanged majority is
    filtered before any output materializes; production short-circuits
    further with per-partition checksums and diffs only mismatched
    partitions."""
    t = load_tables(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    snap_a = base.where("o_orderkey % 11 <> 0")
    snap_b = base.where("o_orderkey % 13 <> 0").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") * 1.1, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a = snap_a.select(
        F.col("o_orderkey").alias("key_a"),
        F.col("o_orderstatus").alias("st_a"),
        F.col("o_totalprice").alias("pr_a"),
    )
    b = snap_b.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderstatus").alias("st_b"),
        F.col("o_totalprice").alias("pr_b"),
    )
    return (
        a.join(b, a["key_a"] == b["key_b"], "full_outer")
        .select(
            F.coalesce("key_a", "key_b").alias("o_orderkey"),
            F.when(F.col("key_a").isNull(), "added")
            .when(F.col("key_b").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            F.col("key_a").isNull().alias("_add"),
            F.col("key_b").isNull().alias("_rm"),
            (
                ~(F.col("st_a").eqNullSafe(F.col("st_b")))
                | ~(F.col("pr_a").eqNullSafe(F.col("pr_b")))
            ).alias("_chg"),
        )
        .where(F.col("_add") | F.col("_rm") | F.col("_chg"))
        .select("o_orderkey", "change_type")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Entity clusters: ER candidate pairs -> connected components -> entity ids
# ---------------------------------------------------------------------------

from sol_spark.operators.dedup import _cc_oracle_sql as _cc_sql  # noqa: E402

_ER_PAIR_SQL = (
    ER_BLOCKING_ORACLE.replace("ORDER BY custkey_a, custkey_b", "")
    .replace("custkey_a", "doc_a")
    .replace("custkey_b", "doc_b")
)

ER_CLUSTERS_ORACLE = f"""
WITH cc AS MATERIALIZED (
  {_cc_sql(f"SELECT doc_a, doc_b FROM ({_ER_PAIR_SQL}) er").replace("ORDER BY doc", "")}
), sizes AS (
  SELECT cluster, count(*) AS n_members FROM cc GROUP BY cluster
)
SELECT c.doc AS custkey, c.cluster AS entity_id, s.n_members
FROM cc c JOIN sizes s ON s.cluster = c.cluster
ORDER BY custkey
"""


@register("er_clusters", ER_CLUSTERS_ORACLE, tags=("governance", "entity-resolution", "iterative"))
def er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity consolidation: feed the blocked+confirmed match pairs into
    the large-star/small-star connected-components labeler and emit one
    entity id (the component's min custkey) per clustered customer record,
    with the entity's member count. The er_blocking -> connected_components
    composition is the canonical record-linkage pipeline; singleton records
    (no match pair) are intentionally absent — production unions them back
    with entity_id = custkey, a row-preserving projection skipped here to
    keep the oracle focused on the clustering semantics.

    Scale shape: inherits er_blocking's in-block candidate generation and
    connected_components' O(log n) star-contraction rounds with per-round
    checkpoint/release; the member-count attach is a broadcast join on the
    entity id."""
    from sol_spark.operators.dedup import connected_components, local_checkpoint, release_result

    pairs = local_checkpoint(
        er_blocking(spark, sf_dir).select(
            F.col("custkey_a").alias("doc_a"), F.col("custkey_b").alias("doc_b")
        )
    )
    cc = connected_components(pairs)  # (doc, cluster), cluster = min member
    sizes = cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    out = local_checkpoint(
        cc.join(F.broadcast(sizes), "cluster")
        .select(F.col("doc").alias("custkey"), F.col("cluster").alias("entity_id"), "n_members")
        .orderBy("custkey")
    )
    release_result(pairs)
    release_result(cc)
    return out


# ---------------------------------------------------------------------------
# k-anonymity generalization lattice (choose the minimal coarsening)
# ---------------------------------------------------------------------------

_GENERALIZE_SQL = f"""
WITH qi AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bb
  FROM customer
), g AS (
  SELECT CASE WHEN grouping(bb) = 0 THEN 0
              WHEN grouping(seg) = 0 THEN 1
              WHEN grouping(nk) = 0 THEN 2
              ELSE 3 END AS level,
         count(*) AS n
  FROM qi
  GROUP BY GROUPING SETS ((nk, seg, bb), (nk, seg), (nk), ())
), lv AS (
  SELECT level, min(n) AS k_min, count(*) AS n_groups,
         CAST(sum(CASE WHEN n < {K_ANON_THRESHOLD} THEN n ELSE 0 END) AS BIGINT) AS n_at_risk
  FROM g GROUP BY level
)
SELECT level, k_min, n_groups, n_at_risk,
       level = (SELECT min(level) FROM lv WHERE k_min >= {K_ANON_THRESHOLD}) AS chosen
FROM lv ORDER BY level
"""


@register("privacy_generalize", _GENERALIZE_SQL, tags=("governance", "privacy"))
def privacy_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization lattice: evaluate the whole coarsening
    ladder — (nation, segment, balance-bucket) -> drop bucket -> drop
    segment -> full generalization — in ONE Expand pass (GROUPING SETS),
    and mark the minimal level whose smallest group reaches
    K_ANON_THRESHOLD. The simplified single-dimension-order Mondrian: a
    release pipeline publishes at the chosen level. Same SQL text runs on
    both engines; the lattice costs one scan regardless of ladder depth
    because Expand multiplies rows, not passes."""
    t = load_tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(_GENERALIZE_SQL)


# ---------------------------------------------------------------------------
# t-closeness profile (completes the k/l/t privacy triad)
# ---------------------------------------------------------------------------

PRIVACY_T_CLOSENESS_ORACLE = """
WITH gdist AS (
  SELECT c_mktsegment AS seg, count(*)::DOUBLE / (SELECT count(*) FROM customer) AS p
  FROM customer GROUP BY 1
), qi AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg, count(*) AS n
  FROM customer GROUP BY 1, 2
), gsz AS (
  SELECT nk, sum(n)::DOUBLE AS gn FROM qi GROUP BY nk
), dist AS (
  SELECT g.nk,
         0.5 * sum(abs(coalesce(q.n, 0) / g.gn - gl.p)) AS tvd
  FROM gsz g CROSS JOIN gdist gl
  LEFT JOIN qi q ON q.nk = g.nk AND q.seg = gl.seg
  GROUP BY g.nk
)
SELECT nk AS nationkey, round(tvd, 6) AS t_distance,
       tvd > 0.2 AS exceeds_t
FROM dist ORDER BY nationkey
"""


@register("privacy_t_closeness", PRIVACY_T_CLOSENESS_ORACLE, tags=("governance", "privacy"))
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit, completing the k-anonymity / l-diversity / t-
    closeness triad: per QI group (nation), the total-variation distance
    between the group's sensitive-attribute distribution (market segment)
    and the corpus distribution — a group can be large (k ok) and diverse
    (l ok) yet still leak because its mix skews far from global. Groups
    with TVD > t = 0.2 are flagged.

    Scale shape: the global distribution is a tiny broadcast; group
    distributions are one (QI, sensitive) hash-aggregate; the per-category
    comparison cross-joins each group against the |categories|-row global
    table — bounded by groups x categories, never rows."""
    t = load_tables(spark, sf_dir)
    total = t["customer"].count()
    glob = (
        t["customer"]
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg((F.count(F.lit(1)) / total).alias("p"))
    )
    qi = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    gsz = qi.groupBy("nk").agg(F.sum("n").cast("double").alias("gn"))
    return (
        gsz.crossJoin(F.broadcast(glob))
        .join(qi, ["nk", "seg"], "left")
        .groupBy("nk")
        .agg(
            (0.5 * F.sum(F.abs(F.coalesce(F.col("n"), F.lit(0)) / F.col("gn") - F.col("p")))).alias("tvd")
        )
        .select(
            F.col("nk").alias("nationkey"),
            F.round("tvd", 6).alias("t_distance"),
            (F.col("tvd") > 0.2).alias("exceeds_t"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Differential-privacy-style noisy counts: Laplace(1/eps) noise added to
# per-group counts, with the noise drawn DETERMINISTICALLY from a
# hash-uniform via the inverse CDF so the release is reproducible and
# cross-engine verifiable (a production release swaps in a real RNG; the
# mechanism, sensitivity bound, and plan shape are identical).
# ---------------------------------------------------------------------------

DP_EPSILON = 1.0  # count sensitivity = 1 => Laplace scale b = 1/eps = 1

DP_COUNTS_ORACLE = f"""
WITH g AS (
  SELECT o_orderpriority AS grp, count(*) AS n FROM orders GROUP BY 1
),
u AS (
  SELECT grp, n,
         ((('0x' || substr(md5('dp' || grp), 1, 8))::BIGINT % 1000000) + 0.5)
         / 1000000.0 AS u
  FROM g
)
SELECT grp, n,
       round(n + (CASE WHEN u > 0.5 THEN -1.0 ELSE 1.0 END)
                 * ln(1 - 2 * abs(u - 0.5)) / {DP_EPSILON}, 3) AS noisy_n,
       {DP_EPSILON} AS epsilon
FROM u ORDER BY grp
"""


@register("privacy_dp_counts", DP_COUNTS_ORACLE, tags=("governance", "privacy"))
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy counts per order priority — the
    differential-privacy release pattern completing the privacy family
    (k-anonymity / l-diversity / t-closeness audit the raw table; this
    protects an aggregate release). Count queries have sensitivity 1, so
    Laplace(1/eps) noise gives eps-DP; the noise is the inverse-CDF
    transform of a (deterministic, md5-derived) uniform, making the
    release reproducible for the oracle — swap the hash-uniform for a real
    RNG in production and nothing else changes.

    Scale shape: one map-side-combined count per group, then pure scalar
    projection on |groups| rows; the noise math never touches row-level
    data, so cost is the aggregate scan alone. The true count is emitted
    alongside for audit only (a real release would drop it)."""
    t = load_tables(spark, sf_dir)
    g = t["orders"].groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    u = g.withColumn(
        "u",
        (F.expr("CAST(conv(substring(md5(concat('dp', grp)), 1, 8), 16, 10) AS BIGINT) % 1000000")
         + F.lit(0.5)) / F.lit(1000000.0),
    )
    return u.select(
        "grp", "n",
        F.round(
            F.col("n")
            + F.when(F.col("u") > 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.expr(f"ln(1 - 2 * abs(u - 0.5)) / {DP_EPSILON}"),
            3,
        ).alias("noisy_n"),
        F.lit(DP_EPSILON).alias("epsilon"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record-linkage scoring over blocked pairs
# ---------------------------------------------------------------------------

# Fixed log-odds weights in "millibans" (1000 * log10(m/u), precomputed
# priors a la Splink's default model — kept as INTEGER constants so the
# score path has no float anywhere; estimating m/u in-engine would drag
# ln() cross-engine ulps into a threshold compare).
FS_W = {
    "name": (40, -8),       # agree: lev(name) <= 1
    "segment": (7, -3),     # agree: exact mktsegment match
    "acctbal": (11, -2),    # agree: |balance delta| <= 100.00
}
FS_T_MATCH = 45     # name + at least one corroborating field
FS_T_POSSIBLE = 10  # name alone, or both non-name fields

ER_FS_ORACLE = f"""
WITH pairs AS (
  SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
         CASE WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 1 ELSE 0 END AS agr_name,
         CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END AS agr_segment,
         CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 100.0 THEN 1 ELSE 0 END AS agr_acctbal
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
),
scored AS (
  SELECT *,
         (CASE WHEN agr_name = 1 THEN {FS_W["name"][0]} ELSE {FS_W["name"][1]} END
        + CASE WHEN agr_segment = 1 THEN {FS_W["segment"][0]} ELSE {FS_W["segment"][1]} END
        + CASE WHEN agr_acctbal = 1 THEN {FS_W["acctbal"][0]} ELSE {FS_W["acctbal"][1]} END) AS score
  FROM pairs
)
SELECT custkey_a, custkey_b, agr_name, agr_segment, agr_acctbal, score,
       CASE WHEN score >= {FS_T_MATCH} THEN 'match' ELSE 'possible' END AS verdict
FROM scored WHERE score >= {FS_T_POSSIBLE}
ORDER BY custkey_a, custkey_b
"""


@register("er_fellegi_sunter", ER_FS_ORACLE, tags=("governance", "entity-resolution"))
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage: candidate pairs from
    the nation block (same lossless blocking as er_blocking), each field
    comparison mapped to an agreement indicator, and the match score
    summed from per-field log-odds weights (1000*log10(m/u) "millibans",
    fixed integer priors) — the classical linkage model behind Splink /
    RecordLinkage, upgrading er_blocking's single-field edit-distance
    rule to evidence accumulation across fields with a match / possible
    (clerical-review) decision boundary.

    Scale shape: one block-keyed equi-join generates candidates (never
    |table|^2; a skewed block is a skewed join key — operators/skew.py
    applies), then scoring is a pure codegen'd projection on the pair
    stream and the thresholds prune it before any further shuffle. The
    weight path is all-integer, so the decision boundary cannot drift
    cross-engine; production fits m/u by EM offline and feeds the same
    integer table."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(
        F.col("c_custkey").alias("custkey_a"), F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"), F.col("c_acctbal").alias("bal_a"),
        F.col("c_nationkey").alias("nk"),
    )
    b = t["customer"].select(
        F.col("c_custkey").alias("custkey_b"), F.col("c_name").alias("name_b"),
        F.col("c_mktsegment").alias("seg_b"), F.col("c_acctbal").alias("bal_b"),
        F.col("c_nationkey").alias("nk"),
    )
    pairs = (
        a.join(b, "nk")
        .where(F.col("custkey_a") < F.col("custkey_b"))
        .select(
            "custkey_a", "custkey_b",
            F.when(F.levenshtein("name_a", "name_b") <= 1, 1).otherwise(0).alias("agr_name"),
            F.when(F.col("seg_a") == F.col("seg_b"), 1).otherwise(0).alias("agr_segment"),
            F.when(F.abs(F.col("bal_a") - F.col("bal_b")) <= 100.0, 1).otherwise(0).alias("agr_acctbal"),
        )
    )
    score = (
        F.when(F.col("agr_name") == 1, F.lit(FS_W["name"][0])).otherwise(F.lit(FS_W["name"][1]))
        + F.when(F.col("agr_segment") == 1, F.lit(FS_W["segment"][0])).otherwise(F.lit(FS_W["segment"][1]))
        + F.when(F.col("agr_acctbal") == 1, F.lit(FS_W["acctbal"][0])).otherwise(F.lit(FS_W["acctbal"][1]))
    )
    return (
        pairs.withColumn("score", score)
        .where(F.col("score") >= FS_T_POSSIBLE)
        .select(
            "custkey_a", "custkey_b", "agr_name", "agr_segment", "agr_acctbal", "score",
            F.when(F.col("score") >= FS_T_MATCH, "match").otherwise("possible").alias("verdict"),
        )
        .orderBy("custkey_a", "custkey_b")
    )


# ---------------------------------------------------------------------------
# User-level DP release with contribution bounding
# ---------------------------------------------------------------------------

DP_USER_CAP = 3  # max events counted per (user, group) => sensitivity = cap

DP_USER_ORACLE = f"""
WITH ranked AS (
  SELECT event_type, user_id,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
),
g AS (
  SELECT event_type AS grp, count(*) AS n_raw,
         sum(CASE WHEN rn <= {DP_USER_CAP} THEN 1 ELSE 0 END) AS n_clamped
  FROM ranked GROUP BY 1
),
u AS (
  SELECT grp, n_raw, n_clamped,
         ((('0x' || substr(md5('dpu' || grp), 1, 8))::BIGINT % 1000000) + 0.5)
         / 1000000.0 AS u
  FROM g
)
SELECT grp, n_raw::BIGINT AS n_raw, n_clamped::BIGINT AS n_clamped,
       (n_raw - n_clamped)::BIGINT AS n_clipped,
       round(n_clamped + (CASE WHEN u > 0.5 THEN -1.0 ELSE 1.0 END)
                 * {DP_USER_CAP} * ln(1 - 2 * abs(u - 0.5)) / {DP_EPSILON}, 3) AS noisy_n,
       {DP_USER_CAP} AS sensitivity, {DP_EPSILON} AS epsilon
FROM u ORDER BY grp
"""


@register("privacy_dp_user_contribution", DP_USER_ORACLE, tags=("governance", "privacy"))
def privacy_dp_user_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-level differential privacy (the accounting privacy_dp_counts
    skips): a user may contribute many events, so event-count sensitivity
    to one user is unbounded until contributions are clamped — each
    (user, event_type) keeps its first {DP_USER_CAP} events (lowest
    event_id, deterministic), the release counts the clamped stream, and
    Laplace noise scales to sensitivity {DP_USER_CAP} (cap/eps), not 1.
    The clamp bias (n_clipped) is reported alongside — the bias/noise
    trade every production DP aggregation (Plume / DP-SQL style) tunes
    with the cap. Same reproducible md5 inverse-CDF uniform as
    privacy_dp_counts; swap in a real RNG and nothing else changes.

    Scale shape: the clamp is one window rank over (user, group) — a
    user-keyed shuffle with bounded per-key state; the release is a
    map-side-combined count and scalar noise math on |groups| rows."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    ranked = t["events"].select(
        "event_type", "user_id",
        F.row_number().over(
            W.partitionBy("user_id", "event_type").orderBy("event_id")
        ).alias("rn"),
    )
    g = ranked.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("rn") <= DP_USER_CAP, 1).otherwise(0)).alias("n_clamped"),
    )
    u = g.withColumn(
        "u",
        (F.expr("CAST(conv(substring(md5(concat('dpu', grp)), 1, 8), 16, 10) AS BIGINT) % 1000000")
         + F.lit(0.5)) / F.lit(1000000.0),
    )
    return u.select(
        "grp",
        F.col("n_raw").cast("long").alias("n_raw"),
        F.col("n_clamped").cast("long").alias("n_clamped"),
        (F.col("n_raw") - F.col("n_clamped")).cast("long").alias("n_clipped"),
        F.round(
            F.col("n_clamped")
            + F.when(F.col("u") > 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.lit(DP_USER_CAP)
            * F.expr(f"ln(1 - 2 * abs(u - 0.5)) / {DP_EPSILON}"),
            3,
        ).alias("noisy_n"),
        F.lit(DP_USER_CAP).alias("sensitivity"),
        F.lit(DP_EPSILON).alias("epsilon"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# Candidate-key discovery: uniqueness profiling across tables
# ---------------------------------------------------------------------------

_KEY_CANDIDATES = [
    ("orders", ("o_orderkey",)),
    ("orders", ("o_custkey",)),
    ("orders", ("o_custkey", "o_orderdate")),
    ("lineitem", ("l_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("customer", ("c_custkey",)),
    ("customer", ("c_name",)),
    ("events", ("event_id",)),
    ("events", ("user_id", "event_type")),
]


def _key_discovery_oracle() -> str:
    blocks = []
    for tbl, cols in _KEY_CANDIDATES:
        combo = ", ".join(cols)
        label = "+".join(cols)
        blocks.append(f"""
SELECT '{tbl}' AS table_name, '{label}' AS candidate,
       (SELECT count(*) FROM {tbl})::BIGINT AS n_rows,
       count(*)::BIGINT AS n_groups,
       max(n)::BIGINT AS max_group,
       (max(n) = 1) AS is_unique,
       ((10000 * ((SELECT count(*) FROM {tbl}) - count(*)))
         // (SELECT count(*) FROM {tbl}))::BIGINT AS dup_bp
FROM (SELECT count(*) AS n FROM {tbl} GROUP BY {combo}) g""")
    return (
        "SELECT * FROM (" + "\nUNION ALL\n".join(blocks)
        + ") u ORDER BY table_name, candidate"
    )


DQ_KEY_DISCOVERY_ORACLE = _key_discovery_oracle()


@register("dq_key_discovery", DQ_KEY_DISCOVERY_ORACLE, tags=("governance", "profiling"))
def dq_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: each declared key candidate (single
    columns and composites across orders / lineitem / customer / events)
    is graded for uniqueness — group count, largest duplicate group, a
    boolean key verdict, and the duplication rate in basis points. The
    profiling step that comes BEFORE dq_expectations can assert
    `unique(o_orderkey)`: it finds which uniqueness expectations are
    even true (here: surrogate keys hold, natural keys like c_name or
    (user_id, event_type) don't — that failure count is the point).

    Scale shape: one hash aggregate per candidate keyed by the candidate
    itself (map-side combine collapses duplicates early; the second
    count-of-groups agg sees |distinct| rows only). Candidates audit
    independently — at 100 TB run them as one pass per table via
    grouping sets when the candidate list shares a table."""
    t = load_tables(spark, sf_dir)
    parts = []
    for tbl, cols in _KEY_CANDIDATES:
        n_rows = t[tbl].count()
        g = t[tbl].groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
        parts.append(
            g.agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.max("n").alias("max_group"),
            ).select(
                F.lit(tbl).alias("table_name"),
                F.lit("+".join(cols)).alias("candidate"),
                F.lit(n_rows).cast("long").alias("n_rows"),
                F.col("n_groups").cast("long").alias("n_groups"),
                F.col("max_group").cast("long").alias("max_group"),
                (F.col("max_group") == 1).alias("is_unique"),
                F.expr(f"(10000 * ({n_rows} - n_groups)) div {n_rows}").cast("long").alias("dup_bp"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.orderBy("table_name", "candidate")


# ---------------------------------------------------------------------------
# Survivorship: golden-record construction per resolved entity
# ---------------------------------------------------------------------------

ER_SURVIVORSHIP_ORACLE = f"""
WITH cc AS MATERIALIZED (
  SELECT custkey, entity_id FROM ({ER_CLUSTERS_ORACLE.replace("ORDER BY custkey", "")}) q
), m AS MATERIALIZED (
  SELECT cc.entity_id, c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
         row_number() OVER (PARTITION BY cc.entity_id
                            ORDER BY c.c_acctbal DESC, c.c_custkey) AS bal_rk,
         row_number() OVER (PARTITION BY cc.entity_id
                            ORDER BY c.c_custkey) AS key_rk
  FROM cc JOIN customer c ON c.c_custkey = cc.custkey
), agg AS (
  SELECT entity_id, count(*) AS n_members,
         round(sum(c_acctbal), 2) AS total_acctbal
  FROM m GROUP BY entity_id
)
SELECT a.entity_id, a.n_members,
       nm.c_name AS survived_name,
       ph.c_mktsegment AS survived_segment,
       a.total_acctbal
FROM agg a
JOIN m nm ON nm.entity_id = a.entity_id AND nm.bal_rk = 1
JOIN m ph ON ph.entity_id = a.entity_id AND ph.key_rk = 1
ORDER BY a.entity_id
"""


@register("er_survivorship", ER_SURVIVORSHIP_ORACLE, tags=("governance", "entity-resolution"))
def er_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record construction over the resolved entities: for each
    er_clusters entity, survive one value per attribute under explicit,
    deterministic rules — name from the member with the highest account
    balance (most-complete-record proxy; ties break on custkey), market segment
    from the lowest custkey (first-registered wins), balances summed.
    Rule-per-attribute survivorship is the step after clustering in every
    MDM pipeline (the Fellegi-Sunter scorer upstream decides WHO matches;
    this decides WHAT the merged row says).

    Scale shape: one join of the entity map against the customer table on
    the record key, then two row_number windows partitioned by entity
    (entity widths are blocking-bounded) and one per-entity aggregate —
    no cross-entity data movement beyond the entity-key shuffle the
    clustering already paid."""
    cc = er_clusters(spark, sf_dir).select("custkey", "entity_id")
    t = load_tables(spark, sf_dir)
    m = cc.join(
        t["customer"].select(
            F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment", "c_acctbal"
        ),
        "custkey",
    )
    w_bal = Window.partitionBy("entity_id").orderBy(
        F.col("c_acctbal").desc(), F.col("custkey")
    )
    w_key = Window.partitionBy("entity_id").orderBy("custkey")
    ranked = m.select(
        "entity_id", "custkey", "c_name", "c_mktsegment", "c_acctbal",
        F.row_number().over(w_bal).alias("bal_rk"),
        F.row_number().over(w_key).alias("key_rk"),
    )
    agg = ranked.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )
    nm = ranked.where("bal_rk = 1").select("entity_id", F.col("c_name").alias("survived_name"))
    ph = ranked.where("key_rk = 1").select("entity_id", F.col("c_mktsegment").alias("survived_segment"))
    return (
        agg.join(nm, "entity_id")
        .join(ph, "entity_id")
        .select("entity_id", "n_members", "survived_name", "survived_segment", "total_acctbal")
        .orderBy("entity_id")
    )


# ---------------------------------------------------------------------------
# Cross-table reconciliation report (migration / replication audit)
# ---------------------------------------------------------------------------

RECON_BUCKETS = 16

DQ_RECONCILIATION_ORACLE = f"""
WITH src AS (
  SELECT o_orderkey % {RECON_BUCKETS} AS bucket,
         count(*) AS n_src,
         sum(o_totalprice) AS amt_src
  FROM orders GROUP BY 1
), tgt AS (
  SELECT l_orderkey % {RECON_BUCKETS} AS bucket,
         count(DISTINCT l_orderkey) AS n_tgt,
         sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS amt_tgt
  FROM lineitem GROUP BY 1
)
SELECT coalesce(s.bucket, t.bucket) AS bucket,
       coalesce(s.n_src, 0) AS n_src,
       coalesce(t.n_tgt, 0) AS n_tgt,
       coalesce(s.n_src, 0) = coalesce(t.n_tgt, 0) AS counts_match,
       round(coalesce(s.amt_src, 0), 2) AS amt_src,
       round(coalesce(t.amt_tgt, 0), 2) AS amt_tgt,
       round(coalesce(s.amt_src, 0) - coalesce(t.amt_tgt, 0), 2) + 0.0 AS amt_delta
FROM src s FULL JOIN tgt t ON t.bucket = s.bucket
ORDER BY bucket
"""


@register("dq_reconciliation", DQ_RECONCILIATION_ORACLE, tags=("governance", "dq"))
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: the header side (orders: row count +
    booked o_totalprice) against the detail side (lineitem: distinct order
    count + recomputed gross amount), bucketed by order-key hash so a
    mismatch localizes to 1/{RECON_BUCKETS} of the keyspace instead of one
    corpus-wide boolean — the standard migration/replication sign-off
    report. Count equality per bucket proves no dropped/duplicated orders;
    the amount delta prices header-vs-detail drift (the fixture's prices
    are independent, so deltas are expected non-zero — the audit's job is
    to REPORT them deterministically, the sign-off threshold is policy).

    Scale shape: each side is one map-side-combined hash aggregate to
    {RECON_BUCKETS} rows (COUNT DISTINCT on the detail side pre-aggregates
    per order inside the same shuffle); the full outer join runs on
    {RECON_BUCKETS} rows. Neither table ever joins the other row-level —
    reconciliation at 100 TB must never shuffle the fact tables against
    each other."""
    t = load_tables(spark, sf_dir)
    src = t["orders"].groupBy((F.col("o_orderkey") % RECON_BUCKETS).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_src"), F.sum("o_totalprice").alias("amt_src")
    )
    tgt = t["lineitem"].groupBy((F.col("l_orderkey") % RECON_BUCKETS).alias("bucket")).agg(
        F.count_distinct("l_orderkey").alias("n_tgt"),
        F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("amt_tgt"),
    )
    return (
        src.join(tgt, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_src", F.lit(0)).alias("n_src"),
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
            (F.coalesce("n_src", F.lit(0)) == F.coalesce("n_tgt", F.lit(0))).alias(
                "counts_match"
            ),
            F.round(F.coalesce("amt_src", F.lit(0.0)), 2).alias("amt_src"),
            F.round(F.coalesce("amt_tgt", F.lit(0.0)), 2).alias("amt_tgt"),
            (
                F.round(
                    F.coalesce("amt_src", F.lit(0.0)) - F.coalesce("amt_tgt", F.lit(0.0)), 2
                )
                + 0.0
            ).alias("amt_delta"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# DP noisy SUM with per-user contribution clipping
# ---------------------------------------------------------------------------

DP_SUM_CLIP = 200000.0  # per-user per-group contribution cap (price units)

DP_SUM_ORACLE = f"""
WITH per_user AS (
  SELECT o_orderpriority AS grp, o_custkey,
         least(sum(o_totalprice), {DP_SUM_CLIP}) AS clipped
  FROM orders GROUP BY 1, 2
), g AS (
  SELECT grp, sum(clipped) AS s, count(*) AS n_users,
         sum(CASE WHEN clipped = {DP_SUM_CLIP} THEN 1 ELSE 0 END)::BIGINT AS n_clipped
  FROM per_user GROUP BY grp
), u AS (
  SELECT grp, s, n_users, n_clipped,
         ((('0x' || substr(md5('dpsum' || grp), 1, 8))::BIGINT % 1000000) + 0.5)
         / 1000000.0 AS u
  FROM g
)
SELECT grp, n_users, n_clipped,
       round(s, 2) AS clipped_sum,
       round(s + (CASE WHEN u > 0.5 THEN -1.0 ELSE 1.0 END)
               * {DP_SUM_CLIP} * ln(1 - 2 * abs(u - 0.5)) / {DP_EPSILON}, 2) AS noisy_sum,
       {DP_EPSILON} AS epsilon
FROM u ORDER BY grp
"""


@register("privacy_dp_sum", DP_SUM_ORACLE, tags=("governance", "privacy"))
def privacy_dp_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level DP noisy SUM per order priority: each customer's total
    contribution to a group is first CLIPPED to {DP_SUM_CLIP} (bounding
    the sensitivity a single person can induce — without the clip a sum
    release has unbounded sensitivity and no finite noise protects it),
    then Laplace(clip/eps) noise is added via the same deterministic
    md5-uniform inverse-CDF as privacy_dp_counts. Completes the release
    family: counts (sensitivity 1), per-user contribution bounding, and
    now numeric sums (sensitivity = clip). n_clipped prices the
    bias-vs-noise trade a release owner tunes the clip with.

    Scale shape: two chained map-side-combined aggregates (user-group
    partials, then group), noise as a scalar projection over |groups|
    rows — row-level data is never touched after the first aggregate."""
    t = load_tables(spark, sf_dir)
    per_user = (
        t["orders"]
        .groupBy(F.col("o_orderpriority").alias("grp"), "o_custkey")
        .agg(F.least(F.sum("o_totalprice"), F.lit(DP_SUM_CLIP)).alias("clipped"))
    )
    g = per_user.groupBy("grp").agg(
        F.sum("clipped").alias("s"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("clipped") == DP_SUM_CLIP, 1).otherwise(0)).alias("n_clipped"),
    )
    u = g.withColumn(
        "u",
        (
            F.expr(
                "CAST(conv(substring(md5(concat('dpsum', grp)), 1, 8), 16, 10) AS BIGINT)"
                " % 1000000"
            )
            + F.lit(0.5)
        )
        / F.lit(1000000.0),
    )
    noise = (
        F.when(F.col("u") > 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.lit(DP_SUM_CLIP)
        * F.log(1 - 2 * F.abs(F.col("u") - 0.5))
        / F.lit(DP_EPSILON)
    )
    return u.select(
        "grp",
        "n_users",
        "n_clipped",
        F.round("s", 2).alias("clipped_sum"),
        F.round(F.col("s") + noise, 2).alias("noisy_sum"),
        F.lit(DP_EPSILON).alias("epsilon"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# Partition-level statistics collection (ANALYZE TABLE ... PARTITION analog)
# ---------------------------------------------------------------------------

PARTITION_STATS_ORACLE = """
SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
       count(*) AS n_rows,
       count(DISTINCT o_custkey) AS ndv_custkey,
       min(o_orderkey) AS min_orderkey,
       max(o_orderkey) AS max_orderkey,
       round(min(o_totalprice), 2) AS min_totalprice,
       round(max(o_totalprice), 2) AS max_totalprice,
       round(sum(o_totalprice), 2) AS sum_totalprice,
       count(*) - count(o_orderstatus) AS null_status
FROM orders
GROUP BY 1 ORDER BY month
"""


@register("warehouse_partition_stats", PARTITION_STATS_ORACLE, tags=("governance", "warehouse", "stats"))
def warehouse_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level statistics collection — the ANALYZE TABLE ...
    PARTITION pass a lakehouse table owner schedules after each load:
    per month-partition row counts, key NDV, min/max envelopes (exactly
    what zone-map pruning and CBO join-size estimates consume;
    layout_skipping_audit grades how well those envelopes skip), a sum
    for reconciliation, and the null count per required column. Kept
    exact here so the oracle is exact; production swaps NDV for the HLL
    sketch (sketch_hll_rollup is that path) with nothing else changing.

    Scale shape: ONE map-side-combined hash aggregate keyed by the
    partition expression — COUNT DISTINCT pre-aggregates per
    (month, custkey) inside the same shuffle (Spark's two-phase distinct
    rewrite); min/max/sum/null-count are five-double partials. Output is
    one row per partition, bounded by the calendar."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_custkey").alias("ndv_custkey"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.max("o_orderkey").alias("max_orderkey"),
            F.round(F.min("o_totalprice"), 2).alias("min_totalprice"),
            F.round(F.max("o_totalprice"), 2).alias("max_totalprice"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
            (F.count(F.lit(1)) - F.count("o_orderstatus")).alias("null_status"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Point-in-time (PIT) join: facts against the SCD2 dimension version that
# was in effect at the fact's timestamp — the feature-store join.
# ---------------------------------------------------------------------------

PIT_JOIN_ORACLE = """
WITH s AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev
  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), starts AS (
  SELECT o_custkey, o_orderpriority, o_orderdate AS eff_from, o_orderkey
  FROM s WHERE prev IS NULL OR prev <> o_orderpriority
), dim AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority, eff_from,
         lead(eff_from) OVER w2 AS eff_to,
         row_number() OVER w2 AS version_n
  FROM starts
  WINDOW w2 AS (PARTITION BY o_custkey ORDER BY eff_from, o_orderkey)
), pit AS (
  SELECT d.version_n, d.priority, o.o_orderkey, o.o_totalprice, o.o_custkey
  FROM orders o JOIN dim d
    ON d.custkey = o.o_custkey
   AND o.o_orderdate >= d.eff_from
   AND (d.eff_to IS NULL OR o.o_orderdate < d.eff_to)
)
SELECT version_n, priority,
       count(*)::BIGINT AS n_orders,
       count(DISTINCT o_custkey)::BIGINT AS n_customers,
       round(sum(o_totalprice), 2) AS revenue
FROM pit GROUP BY version_n, priority ORDER BY version_n, priority
"""


@register("warehouse_pit_join", PIT_JOIN_ORACLE, tags=("governance", "scd", "join"))
def warehouse_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correct join (the feature-store / ML-training join):
    each order is matched to the SCD2 dimension version whose
    [eff_from, eff_to) validity window contains the order date — never a
    later version (no leakage of future attribute values into training
    features), then rolled up per (version_n, priority).

    Scale shape: the dim build is the shared :func:`scd2` two-window pass;
    the fact-dim match is an EQUI-join on the customer key with the
    validity range as a residual predicate — one co-partitioned shuffle,
    never a time-range cross join. Versions partition each key's timeline,
    so every fact matches exactly one version (zero-width same-day
    versions match none, by the [from, to) rule — deterministic in both
    engines)."""
    t = load_tables(spark, sf_dir)
    dim = scd2(t["orders"], "o_custkey", "o_orderpriority", ["o_orderdate", "o_orderkey"])
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    pit = o.join(
        dim,
        (F.col("custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= F.col("eff_from"))
        & (F.col("eff_to").isNull() | (F.col("o_orderdate") < F.col("eff_to"))),
    )
    return (
        pit.groupBy("version_n", "priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("version_n", "priority")
    )


# ---------------------------------------------------------------------------
# Local DP: K-ary randomized response with unbiased frequency estimation.
# ---------------------------------------------------------------------------

RR_P_PPM = 250000  # lie probability p = 0.25
_RR_CATS = ("click", "error", "purchase", "signup", "view")
_RR_K = len(_RR_CATS)

RR_ORACLE = f"""
WITH cats(idx, cat) AS (VALUES {", ".join(f"({i}, '{c}')" for i, c in enumerate(_RR_CATS))}),
coined AS (
  SELECT e.event_id, e.event_type,
         ('0x' || substr(md5('rr1' || e.event_id), 1, 8))::BIGINT % 1000000 AS coin,
         ('0x' || substr(md5('rr2' || e.event_id), 1, 8))::BIGINT % {_RR_K - 1} AS shift,
         c.idx AS true_idx
  FROM events e JOIN cats c ON c.cat = e.event_type
),
reported AS (
  SELECT CASE WHEN coin < {RR_P_PPM}
              THEN (SELECT cat FROM cats
                    WHERE idx = (true_idx + 1 + shift) % {_RR_K})
              ELSE event_type END AS rep,
         event_type
  FROM coined
),
n_tot AS (SELECT count(*)::DOUBLE AS n FROM reported),
obs AS (SELECT rep AS cat, count(*) AS reported_count FROM reported GROUP BY 1),
tru AS (SELECT event_type AS cat, count(*) AS true_count FROM reported GROUP BY 1)
SELECT t.cat, t.true_count::BIGINT AS true_count, o.reported_count::BIGINT AS reported_count,
       round(n.n * ((o.reported_count / n.n - {RR_P_PPM / 1e6} / {_RR_K - 1})
             / (1.0 - {RR_P_PPM / 1e6} - {RR_P_PPM / 1e6} / {_RR_K - 1})), 2) AS est_count,
       round(abs(n.n * ((o.reported_count / n.n - {RR_P_PPM / 1e6} / {_RR_K - 1})
             / (1.0 - {RR_P_PPM / 1e6} - {RR_P_PPM / 1e6} / {_RR_K - 1}))
             - t.true_count) / t.true_count, 4) AS rel_err
FROM tru t JOIN obs o ON o.cat = t.cat, n_tot n
ORDER BY t.cat
"""


@register("privacy_randomized_response", RR_ORACLE, tags=("governance", "privacy"))
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ary randomized response (Warner) — the local-DP mechanism: each
    row lies about its category with p=0.25 (reporting one of the K-1
    others uniformly), then the collector de-biases the observed
    frequencies with the closed-form unbiased estimator. epsilon_LDP =
    ln((1-p)/(p/(K-1))) = ln(12) ~= 2.48 per row. Coins are the corpus'
    integer-ppm md5 convention — the acceptance test is BIGINT vs BIGINT,
    never a float-vs-probability compare, and the whole mechanism is
    reproducible cross-engine.

    Scale shape: perturbation is a pure projection (two md5s per row,
    codegen'd); estimation is one K-row hash-agg plus scalar math. The
    honest part: est_count is graded against the true count it is
    estimating (rel_err column), the same audit contract as the sketch
    family."""
    t = load_tables(spark, sf_dir)
    cats = F.array(*[F.lit(c) for c in _RR_CATS])
    idx_map = F.create_map(*[x for i, c in enumerate(_RR_CATS) for x in (F.lit(c), F.lit(i))])
    coined = t["events"].select(
        "event_id", "event_type",
        (F.expr("CAST(conv(substring(md5(concat('rr1', cast(event_id AS string))), 1, 8), 16, 10) AS BIGINT)") % 1000000).alias("coin"),
        (F.expr("CAST(conv(substring(md5(concat('rr2', cast(event_id AS string))), 1, 8), 16, 10) AS BIGINT)") % (_RR_K - 1)).alias("shift"),
        idx_map[F.col("event_type")].alias("true_idx"),
    )
    reported = coined.select(
        "event_type",
        F.when(
            F.col("coin") < RR_P_PPM,
            F.element_at(cats, ((F.col("true_idx") + 1 + F.col("shift")) % _RR_K + 1).cast("int")),
        ).otherwise(F.col("event_type")).alias("rep"),
    )
    n_tot = reported.agg(F.count(F.lit(1)).cast("double").alias("n"))
    obs = reported.groupBy(F.col("rep").alias("cat")).agg(F.count(F.lit(1)).alias("reported_count"))
    tru = reported.groupBy(F.col("event_type").alias("tcat")).agg(F.count(F.lit(1)).alias("true_count"))
    p = RR_P_PPM / 1e6
    q = p / (_RR_K - 1)
    est = F.col("n") * ((F.col("reported_count") / F.col("n") - q) / (1.0 - p - q))
    return (
        tru.join(obs, F.col("cat") == F.col("tcat"))
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.col("tcat").alias("cat"), "true_count", "reported_count",
            F.round(est, 2).alias("est_count"),
            F.round(F.abs(est - F.col("true_count")) / F.col("true_count"), 4).alias("rel_err"),
        )
        .orderBy("cat")
    )


# ---------------------------------------------------------------------------
# Data-freshness / cadence audit over the event stream.
# ---------------------------------------------------------------------------

DQ_FRESHNESS_ORACLE = """
WITH bounds AS (SELECT max(ts) AS global_max, min(ts) AS global_min FROM events),
per AS (
  SELECT event_type, count(*) AS n_events, max(ts) AS last_ts, min(ts) AS first_ts
  FROM events GROUP BY event_type
)
SELECT p.event_type, p.n_events::BIGINT AS n_events, p.last_ts,
       CAST(date_diff('second', p.last_ts, b.global_max) // 60 AS BIGINT) AS staleness_min,
       CAST((SELECT count(*) FROM events e
             WHERE e.event_type = p.event_type
               AND e.ts > b.global_max - INTERVAL 24 HOUR) AS BIGINT) AS last_24h,
       CAST((p.n_events * 3600) // (1 + date_diff('second', b.global_min, b.global_max))
            AS BIGINT) AS per_hour_rate,
       date_diff('second', p.last_ts, b.global_max) // 60 <= 120 AS is_fresh
FROM per p, bounds b ORDER BY p.event_type
"""


@register("dq_freshness", DQ_FRESHNESS_ORACLE, tags=("governance", "dq"))
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness / cadence audit per event source: staleness of the last
    arrival vs the stream's watermark (global max ts), last-24h arrival
    count vs the lifetime hourly rate, and a fresh/stale flag at a 2 h
    SLO — the table a warehouse's ingestion monitor renders. All integer
    minute/second arithmetic; no floats anywhere.

    Scale shape: one hash-agg scan for per-source bounds plus one
    conditional-agg scan for the recent window (Catalyst merges both
    against the same parquet scan); the global bounds row broadcasts."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    bounds = e.agg(F.max("ts").alias("global_max"), F.min("ts").alias("global_min"))
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    recent = (
        e.crossJoin(F.broadcast(bounds.select("global_max")))
        .filter(F.col("ts") > F.col("global_max") - F.expr("INTERVAL 24 HOURS"))
        .groupBy(F.col("event_type").alias("rtype"))
        .agg(F.count(F.lit(1)).alias("last_24h"))
    )
    stal_min = (
        (F.unix_timestamp("global_max") - F.unix_timestamp("last_ts")) / 60
    ).cast("bigint")
    return (
        per.crossJoin(F.broadcast(bounds))
        .join(recent, F.col("event_type") == F.col("rtype"))
        .select(
            "event_type", "n_events", "last_ts",
            stal_min.alias("staleness_min"),
            "last_24h",
            F.expr(
                "CAST((n_events * 3600) div (1 + (unix_timestamp(global_max) - unix_timestamp(global_min))) AS BIGINT)"
            ).alias("per_hour_rate"),
            (stal_min <= 120).alias("is_fresh"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Duplicate-payment audit: near-identical orders close in time.
# ---------------------------------------------------------------------------

DUP_PAY_WINDOW_DAYS = 7
DUP_PAY_TOL_PCT = 3  # amounts within 3% of each other (non-vacuous at every fixture SF)

DUP_PAY_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT a.o_custkey AS custkey, a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
       a.cents AS cents_a, b.cents AS cents_b,
       CAST(abs(date_diff('day', a.o_orderdate, b.o_orderdate)) AS BIGINT) AS day_gap,
       a.o_orderdate = b.o_orderdate AS same_day
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= {DUP_PAY_WINDOW_DAYS}
  AND abs(a.cents - b.cents) * 100 <= least(a.cents, b.cents) * {DUP_PAY_TOL_PCT}
ORDER BY custkey, orderkey_a, orderkey_b
"""


@register("dq_duplicate_payments", DUP_PAY_ORACLE, tags=("governance", "dq", "join"))
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment audit (the classic AP-controls test): flag order
    pairs from the same customer within {DUP_PAY_WINDOW_DAYS} days whose
    amounts agree within {DUP_PAY_TOL_PCT}% — double submissions, split
    invoices, re-keyed payments. Everything is BIGINT (integer cents, day
    gaps): the tolerance test is |ca - cb| * 100 <= min(ca, cb) * pct,
    never a float ratio.

    Scale shape: self-join EQUI on the customer key (one co-partitioned
    shuffle; candidate set is per-customer, not global) with the date
    window and amount tolerance as residual predicates — the same
    key+residual pattern as the attribution and PIT joins. A customer
    with pathologically many orders is a plain skewed join key
    (operators/skew.py applies)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("orderkey_a"),
        F.col("o_orderdate").alias("date_a"), F.col("cents").alias("cents_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck_b"), F.col("o_orderkey").alias("orderkey_b"),
        F.col("o_orderdate").alias("date_b"), F.col("cents").alias("cents_b"),
    )
    gap = F.abs(F.datediff("date_a", "date_b"))
    return (
        a.join(b, (F.col("custkey") == F.col("ck_b")) & (F.col("orderkey_a") < F.col("orderkey_b")))
        .filter(
            (gap <= DUP_PAY_WINDOW_DAYS)
            & (F.abs(F.col("cents_a") - F.col("cents_b")) * 100
               <= F.least("cents_a", "cents_b") * DUP_PAY_TOL_PCT)
        )
        .select(
            "custkey", "orderkey_a", "orderkey_b", "cents_a", "cents_b",
            gap.cast("bigint").alias("day_gap"),
            (F.col("date_a") == F.col("date_b")).alias("same_day"),
        )
        .orderBy("custkey", "orderkey_a", "orderkey_b")
    )


# ---------------------------------------------------------------------------
# Blocking-scheme quality audit: reduction ratio + pair completeness.
# ---------------------------------------------------------------------------

ER_AUDIT_SAMPLE_MOD = 10  # exhaustive ground truth on custkey % 10 == 0

ER_QUALITY_ORACLE = f"""
WITH blocks AS (
  SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1
),
cand AS (
  SELECT sum(n * (n - 1) // 2) AS cand_pairs, sum(n) AS n_rows FROM blocks
),
samp AS (
  SELECT c_custkey, c_name, c_nationkey FROM customer
  WHERE c_custkey % {ER_AUDIT_SAMPLE_MOD} = 0
),
truth AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb,
         a.c_nationkey = b.c_nationkey AS same_block
  FROM samp a JOIN samp b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= {ER_MAX_EDIT}
),
pc AS (
  SELECT count(*) AS true_matches,
         sum(CASE WHEN same_block THEN 1 ELSE 0 END) AS found_in_block
  FROM truth
)
SELECT c.n_rows::BIGINT AS n_rows,
       c.cand_pairs::BIGINT AS cand_pairs,
       (c.n_rows * (c.n_rows - 1) // 2)::BIGINT AS full_pairs,
       round(1.0 - c.cand_pairs / (c.n_rows * (c.n_rows - 1) / 2.0), 6) AS reduction_ratio,
       p.true_matches::BIGINT AS true_matches_sampled,
       p.found_in_block::BIGINT AS found_in_block_sampled,
       round(p.found_in_block / (1.0 * p.true_matches), 6) AS pair_completeness
FROM cand c, pc p
"""


@register("er_blocking_quality", ER_QUALITY_ORACLE, tags=("governance", "entity-resolution", "eval"))
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-scheme audit for er_blocking: reduction ratio (how much of
    the all-pairs space the nation block prunes — closed form on block
    sizes, NO pair is materialized for it) and pair completeness (what
    fraction of true edit-distance matches the block retains), the two
    standard record-linkage quality metrics. Ground truth is exhaustive
    on a deterministic 1-in-{ER_AUDIT_SAMPLE_MOD} key sample — the same
    honest-audit contract as sim_recall_eval, sized so the all-pairs
    truth stays tractable at any SF.

    Scale shape: reduction ratio is one block-size hash-agg plus closed-
    form C(n,2) arithmetic; the truth pass is all-pairs ONLY on the fixed
    sample fraction (|S|^2/2 comparisons, bounded by construction)."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    blocks = cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    cand = blocks.agg(
        F.sum(F.expr("n * (n - 1) div 2")).alias("cand_pairs"),
        F.sum("n").alias("n_rows"),
    )
    samp = cust.filter(F.col("c_custkey") % ER_AUDIT_SAMPLE_MOD == 0).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    a = samp.select(
        F.col("c_custkey").alias("ka"), F.col("c_name").alias("na"), F.col("c_nationkey").alias("ba")
    )
    b = samp.select(
        F.col("c_custkey").alias("kb"), F.col("c_name").alias("nb"), F.col("c_nationkey").alias("bb")
    )
    truth = (
        a.join(b, F.col("ka") < F.col("kb"))
        .filter(F.levenshtein("na", "nb") <= ER_MAX_EDIT)
        .select((F.col("ba") == F.col("bb")).alias("same_block"))
    )
    pc = truth.agg(
        F.count(F.lit(1)).alias("true_matches_sampled"),
        F.sum(F.when(F.col("same_block"), 1).otherwise(0)).alias("found_in_block_sampled"),
    )
    return (
        cand.crossJoin(F.broadcast(pc))
        .select(
            "n_rows", "cand_pairs",
            F.expr("n_rows * (n_rows - 1) div 2").alias("full_pairs"),
            F.round(1.0 - F.col("cand_pairs") / (F.col("n_rows") * (F.col("n_rows") - 1) / 2.0), 6).alias("reduction_ratio"),
            "true_matches_sampled", "found_in_block_sampled",
            F.round(F.col("found_in_block_sampled") / (1.0 * F.col("true_matches_sampled")), 6).alias("pair_completeness"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance: merge partial agg states (base + delta)
# ---------------------------------------------------------------------------

AGG_MERGE_CUTOFF = "1997-01-01"  # base = shipped before, delta = on/after

AGG_STATE_MERGE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT AS n_rows,
       sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_cents,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_cents,
       min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_price_cents,
       max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS max_price_cents,
       (sum(CAST(round(l_extendedprice * 100) AS BIGINT)) // count(*))::BIGINT AS avg_price_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("warehouse_agg_state_merge", AGG_STATE_MERGE_ORACLE, tags=("warehouse", "agg", "scale"))
def warehouse_agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the nightly-merge pattern where a
    materialized per-(returnflag, linestatus) rollup is kept current by
    aggregating ONLY the delta partition and merging its partial state
    into the stored base state — never rescanning the base fact table.
    Here both states are computed (base = shipped before
    {AGG_MERGE_CUTOFF}, delta = on/after), then MERGED with the
    associative state algebra (sum of counts/sums, min of mins, max of
    maxes; avg derived from merged sums at read time — never averaged
    averages), while the ORACLE aggregates the full table directly — so
    the green row PROVES the merge is lossless, the property that makes
    the incremental schedule safe at 100 TB. All state is exact integer
    cents, so mergeability is algebraic, not approximate.

    Scale shape: two partition-pruned scans (on a date-partitioned table
    the base state would be a stored {{~6}}-row table, not a scan) each
    ending in a tiny hash-agg, then a 12-row union + re-agg — the merge
    step itself is constant-size regardless of fact-table size, which is
    the entire point."""
    t = load_tables(spark, sf_dir)

    def partial(df):
        cents_q = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
        cents_p = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents_q).alias("sum_qty_cents"),
            F.sum(cents_p).alias("sum_price_cents"),
            F.min(cents_p).alias("min_price_cents"),
            F.max(cents_p).alias("max_price_cents"),
        )

    li = t["lineitem"]
    base = partial(li.filter(F.col("l_shipdate") < AGG_MERGE_CUTOFF))
    delta = partial(li.filter(F.col("l_shipdate") >= AGG_MERGE_CUTOFF))
    merged = (
        base.unionAll(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_qty_cents").cast("bigint").alias("sum_qty_cents"),
            F.sum("sum_price_cents").cast("bigint").alias("sum_price_cents"),
            F.min("min_price_cents").alias("min_price_cents"),
            F.max("max_price_cents").alias("max_price_cents"),
        )
    )
    return merged.select(
        "l_returnflag", "l_linestatus", "n_rows", "sum_qty_cents", "sum_price_cents",
        "min_price_cents", "max_price_cents",
        F.expr("sum_price_cents div n_rows").alias("avg_price_cents"),
    ).orderBy("l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# DP top-k selection (exponential mechanism via the Gumbel-max trick):
# release WHICH k users are heaviest without releasing exact activity,
# plus Laplace-noised counts for the selected rows. Complements
# privacy_dp_counts (noisy aggregates over a public group key) — here the
# IDENTITY of the released rows is itself the private choice.
# ---------------------------------------------------------------------------

DP_TOPK_K = 10
DP_TOPK_EPS = 1.0
# Gumbel scale 2k/eps: a composition-safe budget split across k picks
# (count sensitivity 1 per pick), released in one shot via Gumbel-max.
DP_TOPK_SCALE = 2.0 * DP_TOPK_K / DP_TOPK_EPS

DP_TOPK_ORACLE = f"""
WITH g AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
noisy AS (
  SELECT user_id, n,
         n + {DP_TOPK_SCALE} * (-ln(-ln(
           ((('0x' || substr(md5('dptk' || user_id), 1, 8))::BIGINT % 1000000) + 0.5)
           / 1000000.0))) AS score,
         ((('0x' || substr(md5('dptkl' || user_id), 1, 8))::BIGINT % 1000000) + 0.5)
         / 1000000.0 AS ul
  FROM g
),
sel AS (
  SELECT user_id, n, score, ul,
         row_number() OVER (ORDER BY score DESC, user_id) AS rank
  FROM noisy
)
SELECT rank, user_id,
       round(n + (CASE WHEN ul > 0.5 THEN -1.0 ELSE 1.0 END)
               * ln(1 - 2 * abs(ul - 0.5)) * {DP_TOPK_K} / {DP_TOPK_EPS}, 3) AS noisy_count,
       {DP_TOPK_EPS} AS epsilon
FROM sel WHERE rank <= {DP_TOPK_K}
ORDER BY rank
"""


@register("privacy_dp_topk", DP_TOPK_ORACLE, tags=("governance", "privacy"))
def privacy_dp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private top-{DP_TOPK_K} heavy users: the exponential
    mechanism realized as Gumbel-max — per-user activity count plus
    Gumbel({DP_TOPK_SCALE}) noise, release the k arg-max identities, and
    attach Laplace-noised counts (scale k/eps) for the released rows only.
    True counts never leave. As in privacy_dp_counts, noise is an
    inverse-CDF transform of a deterministic md5 uniform so the release is
    oracle-reproducible; swap in a real RNG in production.

    Scale shape: the corpus collapses to user grain in one map-side
    combined hash-agg; selection is ORDER BY noisy score LIMIT k — Spark
    plans TakeOrderedAndProject (per-partition heaps + k-row driver
    merge), never a global sort; the rank window then runs on k rows.
    ln/abs are IEEE-stable cross-engine; the only floats released are
    already noise-dominated and rounded at 3."""
    t = load_tables(spark, sf_dir)
    g = t["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    uni = (
        "((CAST(conv(substring(md5(concat('{tag}', CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        " % 1000000) + 0.5) / 1000000.0"
    )
    noisy = g.select(
        "user_id", "n",
        (F.col("n") + DP_TOPK_SCALE * -F.log(-F.log(F.expr(uni.format(tag="dptk"))))).alias("score"),
        F.expr(uni.format(tag="dptkl")).alias("ul"),
    )
    top = noisy.orderBy(F.desc("score"), "user_id").limit(DP_TOPK_K)
    w = Window.orderBy(F.desc("score"), "user_id")
    lap = (
        F.when(F.col("ul") > 0.5, -1.0).otherwise(1.0)
        * F.log(1 - 2 * F.abs(F.col("ul") - 0.5))
        * DP_TOPK_K / DP_TOPK_EPS
    )
    return top.select(
        F.row_number().over(w).alias("rank"),
        "user_id",
        F.round(F.col("n") + lap, 3).alias("noisy_count"),
        F.lit(DP_TOPK_EPS).alias("epsilon"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Approximate functional-dependency discovery (profiling for CBO/modeling)
# ---------------------------------------------------------------------------

_FD_CANDIDATES: tuple[tuple[str, str, str], ...] = (
    ("customer", "c_nationkey", "c_mktsegment"),
    ("lineitem", "l_orderkey", "l_linestatus"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
)


def _fd_cte(table: str, lhs: str, rhs: str) -> str:
    label = f"{table}: {lhs} -> {rhs}"
    return f"""
SELECT '{label}' AS fd,
       sum(tot)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_lhs,
       (sum(tot) - sum(mx))::BIGINT AS n_violations,
       ((1000000 * (sum(tot) - sum(mx))) // sum(tot))::BIGINT AS err_ppm,
       (CASE WHEN sum(tot) = sum(mx) THEN 1 ELSE 0 END)::BIGINT AS holds
FROM (
  SELECT l, max(c) AS mx, sum(c) AS tot
  FROM (SELECT {lhs} AS l, {rhs} AS r, count(*)::BIGINT AS c FROM {table} GROUP BY 1, 2) g
  GROUP BY l
) p"""


FD_DISCOVERY_ORACLE = (
    "\nUNION ALL\n".join(_fd_cte(t_, l_, r_) for t_, l_, r_ in _FD_CANDIDATES)
    + "\nORDER BY fd"
)


@register("warehouse_fd_discovery", FD_DISCOVERY_ORACLE, tags=("warehouse", "profiling", "audit"))
def warehouse_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency audit (Metanome/TANE-style, fixed
    candidate list): for each candidate A -> B, the g3 violation count —
    the minimum rows to delete so the FD holds exactly, i.e.
    N - sum over A of max count per (A, B). Exact keys report 0
    violations; near-FDs report an integer-ppm error the modeler can
    threshold. The profiling input behind key inference, normalization
    advice, and CBO uniqueness hints.

    Scale shape: each candidate is two map-side-combined hash-aggs
    ((A, B) counts, then a per-A max/sum fold) and a one-row final
    aggregate — one shuffle per candidate on the (A, B) key, no windows,
    no joins; the six one-row results union into the scorecard. All
    counts and the ppm are exact BIGINTs."""
    t = load_tables(spark, sf_dir)
    parts = []
    for table, lhs, rhs in _FD_CANDIDATES:
        cnt = (
            t[table]
            .select(F.col(lhs).alias("l"), F.col(rhs).alias("r"))
            .groupBy("l", "r")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        per_lhs = cnt.groupBy("l").agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        parts.append(
            per_lhs.agg(
                F.sum("tot").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                (F.sum("tot") - F.sum("mx")).cast("long").alias("n_violations"),
                F.expr("(1000000 * (sum(tot) - sum(mx))) div sum(tot)")
                .cast("long").alias("err_ppm"),
                F.when(F.sum("tot") == F.sum("mx"), 1).otherwise(0)
                .cast("long").alias("holds"),
            ).select(F.lit(f"{table}: {lhs} -> {rhs}").alias("fd"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fd")


# ---------------------------------------------------------------------------
# Referential-integrity (foreign-key orphan) audit across the star
# ---------------------------------------------------------------------------

_FK_EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _fk_cte(child: str, fk: str, parent: str, pk: str) -> str:
    label = f"{child}.{fk} -> {parent}.{pk}"
    return f"""
SELECT '{label}' AS fk,
       sum(n)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_keys,
       COALESCE(sum(CASE WHEN pk IS NULL THEN n END), 0)::BIGINT AS orphan_rows,
       sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END)::BIGINT AS orphan_keys,
       ((1000000 * COALESCE(sum(CASE WHEN pk IS NULL THEN n END), 0)) // sum(n))::BIGINT AS orphan_ppm
FROM (SELECT {fk} AS k, count(*)::BIGINT AS n FROM {child} WHERE {fk} IS NOT NULL GROUP BY 1) c
LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON p.pk = c.k"""


FK_ORPHANS_ORACLE = (
    "\nUNION ALL\n".join(_fk_cte(*e) for e in _FK_EDGES) + "\nORDER BY fk"
)


@register("dq_fk_orphans", FK_ORPHANS_ORACLE, tags=("warehouse", "dq", "audit"))
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the schema's FK graph: for each
    child.fk -> parent.pk edge, the rows and distinct keys whose parent is
    missing, with an integer-ppm orphan rate — the cross-TABLE complement
    to dq_expectations' row-local rules, and the check a warehouse runs
    after every load before exposing a snapshot. An intact fixture reports
    zeros; the audit's value is that the zeros are MEASURED.

    Scale shape: the child side collapses to its distinct-key histogram
    BEFORE any join (a map-side-combined hash-agg, keys not rows), then
    one equi-join per edge against the parent's key projection — at 100 TB
    each edge shuffles only distinct keys, and AQE broadcasts the small
    parent sides. No window, no anti-join pass separate from the
    accounting join (one join serves both counts)."""
    t = load_tables(spark, sf_dir)
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        ck = (
            t[child]
            .filter(F.col(fk).isNotNull())
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        pks = t[parent].select(F.col(pk).alias("pk")).distinct()
        joined = ck.join(pks, ck["k"] == pks["pk"], "left")
        parts.append(
            joined.agg(
                F.sum("n").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.coalesce(F.sum(F.when(F.col("pk").isNull(), F.col("n"))), F.lit(0))
                .cast("long").alias("orphan_rows"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
                .cast("long").alias("orphan_keys"),
                F.expr(
                    "(1000000 * COALESCE(sum(CASE WHEN pk IS NULL THEN n END), 0)) div sum(n)"
                ).cast("long").alias("orphan_ppm"),
            ).select(F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("fk"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fk")


# ---------------------------------------------------------------------------
# DP quantile release (exponential mechanism over value bins, Gumbel-max)
# ---------------------------------------------------------------------------

DP_QUANT_EPS = 1.0          # total budget across the three releases
DP_QUANT_BINW = 10000       # o_totalprice bin width
_DP_QUANT_QS = (25, 50, 75)
DP_QUANT_SCALE = 2.0 * len(_DP_QUANT_QS) / DP_QUANT_EPS  # 2/eps_i, eps split 3 ways

DP_QUANTILE_ORACLE = f"""
WITH hist AS (
  SELECT (CAST(floor(o_totalprice) AS BIGINT) // {DP_QUANT_BINW})::BIGINT AS bin,
         count(*)::BIGINT AS cnt
  FROM orders GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
         COALESCE(sum(cnt) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS below,
         sum(cnt) OVER ()::BIGINT AS n
  FROM hist
),
scored AS (
  SELECT q.q, c.bin, c.cnt, c.below, c.n,
         ((q.q * c.n) // 100)::BIGINT AS target,
         -abs(c.below + c.cnt // 2 - (q.q * c.n) // 100)
           + {DP_QUANT_SCALE} * (-ln(-ln(
             ((('0x' || substr(md5('dpq' || q.q || '_' || c.bin), 1, 8))::BIGINT
               % 1000000) + 0.5) / 1000000.0))) AS score
  FROM cum c CROSS JOIN (SELECT unnest([{", ".join(str(x) for x in _DP_QUANT_QS)}]) AS q) q
),
sel AS (
  SELECT q, bin, cnt, below, target,
         row_number() OVER (PARTITION BY q ORDER BY score DESC, bin) AS rn
  FROM scored
),
truth AS (
  SELECT q.q, min(c.bin) AS true_bin
  FROM cum c CROSS JOIN (SELECT unnest([{", ".join(str(x) for x in _DP_QUANT_QS)}]) AS q) q
  WHERE c.below + c.cnt >= (q.q * c.n) // 100
  GROUP BY q.q
)
SELECT s.q::BIGINT AS q, s.bin AS released_bin, t.true_bin::BIGINT AS true_bin,
       (s.below + s.cnt // 2)::BIGINT AS released_rank_mid,
       s.target,
       abs(s.below + s.cnt // 2 - s.target)::BIGINT AS rank_err
FROM sel s JOIN truth t ON t.q = s.q
WHERE s.rn = 1
ORDER BY s.q
"""


@register("privacy_dp_quantile", DP_QUANTILE_ORACLE, tags=("governance", "privacy"))
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private quantile release: the exponential mechanism
    over order-total value bins via Gumbel-max (the privacy_dp_topk
    machinery pointed at rank utility): a bin's utility is -|its midpoint
    rank - target rank|, scored plus Gumbel(2*3/eps) noise (budget split
    across the three releases, rank sensitivity 1), and the arg-max bin is
    released per quantile. Noise is the deterministic md5 inverse-CDF
    uniform as in the other privacy_dp_* ops — oracle-reproducible, swap a
    real RNG in production. true_bin/rank_err are AUDIT columns grading
    mechanism utility; a production release drops them.

    Scale shape: the corpus collapses to a bounded value-bin histogram in
    one map-side-combined hash-agg; every window after that runs on the
    bin frame (bounded by the value range / bin width), and the selection
    is a per-quantile row_number over it. 100x more orders changes bin
    COUNTS, not bin count."""
    t = load_tables(spark, sf_dir)
    hist = (
        t["orders"]
        .groupBy(
            F.expr(f"CAST(floor(o_totalprice) AS BIGINT) div {DP_QUANT_BINW}")
            .cast("long").alias("bin")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_below = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bin", "cnt",
        F.coalesce(F.sum("cnt").over(w_below), F.lit(0)).cast("long").alias("below"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in _DP_QUANT_QS])).alias("q")
    )
    uni = (
        "((CAST(conv(substring(md5(concat('dpq', CAST(q AS STRING), '_', CAST(bin AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        " % 1000000) + 0.5) / 1000000.0"
    )
    scored = cum.crossJoin(F.broadcast(qs)).select(
        "q", "bin", "cnt", "below", "n",
        F.expr("(q * n) div 100").cast("long").alias("target"),
        (
            -F.abs(F.col("below") + F.expr("cnt div 2") - F.expr("(q * n) div 100"))
            + DP_QUANT_SCALE * -F.log(-F.log(F.expr(uni)))
        ).alias("score"),
    )
    w_sel = Window.partitionBy("q").orderBy(F.desc("score"), "bin")
    sel = scored.withColumn("rn", F.row_number().over(w_sel)).filter(F.col("rn") == 1)
    truth = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("below") + F.col("cnt") >= F.expr("(q * n) div 100"))
        .groupBy("q")
        .agg(F.min("bin").alias("true_bin"))
    )
    return (
        sel.join(truth, "q")
        .select(
            F.col("q").cast("long").alias("q"),
            F.col("bin").alias("released_bin"),
            F.col("true_bin").cast("long").alias("true_bin"),
            (F.col("below") + F.expr("cnt div 2")).cast("long").alias("released_rank_mid"),
            "target",
            F.abs(F.col("below") + F.expr("cnt div 2") - F.col("target"))
            .cast("long").alias("rank_err"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# Pseudonymization consistency audit (tokenize, prove joins survive)
# ---------------------------------------------------------------------------

TOKENIZE_ORACLE = """
WITH raw_counts AS (
  SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id
),
tok_counts AS (
  SELECT md5('tk' || user_id) AS token, count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
hist_raw AS (
  SELECT n, count(*)::BIGINT AS c FROM raw_counts GROUP BY n
),
hist_tok AS (
  SELECT n, count(*)::BIGINT AS c FROM tok_counts GROUP BY n
)
SELECT COALESCE(r.n, t.n)::BIGINT AS events_per_entity,
       COALESCE(r.c, 0)::BIGINT AS n_raw_entities,
       COALESCE(t.c, 0)::BIGINT AS n_token_entities,
       (CASE WHEN COALESCE(r.c, 0) = COALESCE(t.c, 0) THEN 1 ELSE 0 END)::BIGINT AS consistent
FROM hist_raw r FULL OUTER JOIN hist_tok t ON t.n = r.n
ORDER BY events_per_entity
"""


@register("privacy_tokenize_consistency", TOKENIZE_ORACLE, tags=("governance", "privacy", "audit"))
def privacy_tokenize_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization acceptance audit: tokenize user ids with a keyed
    hash (md5('tk'||id) standing in for HMAC-with-secret) and prove the
    analytical structure SURVIVES — the per-entity activity histogram
    computed over raw ids and over tokens must match row for row (any
    token collision merges two users and shifts a histogram bucket; any
    non-determinism splits one). This is the check a privacy team signs
    before swapping tokens into the warehouse: aggregates stay right,
    while the raw id never has to leave the ingest boundary again.

    Scale shape: two map-side-combined count aggs (one keyed by id, one
    by token) collapsed to their bounded count-histograms, full-outer
    joined on the count — no raw-grain join, no window."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    raw_hist = (
        e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    )
    tok_hist = (
        e.groupBy(F.expr("md5(concat('tk', CAST(user_id AS STRING)))").alias("token"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    return (
        raw_hist.join(tok_hist, "n", "full_outer")
        .select(
            F.col("n").alias("events_per_entity"),
            F.coalesce(F.col("cr"), F.lit(0)).cast("long").alias("n_raw_entities"),
            F.coalesce(F.col("ct"), F.lit(0)).cast("long").alias("n_token_entities"),
            F.when(
                F.coalesce(F.col("cr"), F.lit(0)) == F.coalesce(F.col("ct"), F.lit(0)), 1
            ).otherwise(0).cast("long").alias("consistent"),
        )
        .orderBy("events_per_entity")
    )


# ---------------------------------------------------------------------------
# Late-arriving dimension handling (inferred members + coverage accounting)
# ---------------------------------------------------------------------------

_LATE_DIM_KEEP_PPM = 900000  # 90% of customers have "arrived" in the snapshot

INFERRED_MEMBERS_ORACLE = f"""
WITH snapshot AS (
  SELECT c_custkey FROM customer
  WHERE (('0x' || substr(md5('ld' || c_custkey), 1, 8))::BIGINT % 1000000) < {_LATE_DIM_KEEP_PPM}
),
facts AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
tagged AS (
  SELECT f.o_custkey, f.cents,
         CASE WHEN s.c_custkey IS NULL THEN 'inferred' ELSE 'real' END AS member_status
  FROM facts f LEFT JOIN snapshot s ON s.c_custkey = f.o_custkey
)
SELECT member_status,
       count(DISTINCT o_custkey)::BIGINT AS n_members,
       count(*)::BIGINT AS n_facts,
       sum(cents)::BIGINT AS fact_revenue_cents
FROM tagged GROUP BY member_status ORDER BY member_status
"""


@register("warehouse_inferred_members", INFERRED_MEMBERS_ORACLE, tags=("warehouse", "etl", "audit"))
def warehouse_inferred_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling: facts whose dimension row hasn't
    landed yet (simulated by a deterministic 90% 'arrived' snapshot of
    customer) are attached to INFERRED placeholder members instead of
    being dropped or failing the load — the Kimball pattern every
    warehouse ETL implements. The readout is the accounting both paths
    get: member counts, fact counts, and revenue under real vs inferred
    members, so a backfill job knows exactly how much restates when the
    true dimension rows arrive (and the load provably conserved every
    fact: the two n_facts sum to the fact count).

    Scale shape: one left join of facts against the snapshot key
    projection (AQE broadcasts the dim side) and one two-row conditional
    agg with a distinct-member count — the exact plan shape of the
    production MERGE's accounting query."""
    t = load_tables(spark, sf_dir)
    snapshot = t["customer"].filter(
        F.expr(
            "CAST(conv(substring(md5(concat('ld', CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) "
            f"% 1000000 < {_LATE_DIM_KEEP_PPM}"
        )
    ).select("c_custkey")
    facts = t["orders"].select(
        "o_custkey", F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents")
    )
    tagged = facts.join(snapshot, facts["o_custkey"] == snapshot["c_custkey"], "left").select(
        "o_custkey", "cents",
        F.when(F.col("c_custkey").isNull(), "inferred").otherwise("real").alias("member_status"),
    )
    return (
        tagged.groupBy("member_status")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_members"),
            F.count(F.lit(1)).cast("long").alias("n_facts"),
            F.sum("cents").cast("long").alias("fact_revenue_cents"),
        )
        .orderBy("member_status")
    )


# ---------------------------------------------------------------------------
# Junk-dimension build (low-cardinality flag combos -> surrogate keys)
# ---------------------------------------------------------------------------

JUNK_DIM_ORACLE = """
WITH combos AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         count(*)::BIGINT AS n_facts,
         min(o_orderkey)::BIGINT AS first_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT row_number() OVER (ORDER BY status, priority) AS junk_key,
       status, priority, n_facts, first_orderkey
FROM combos ORDER BY junk_key
"""


@register("warehouse_junk_dimension", JUNK_DIM_ORACLE, tags=("warehouse", "etl"))
def warehouse_junk_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Junk-dimension build (the Kimball pattern for stray low-cardinality
    flags): the distinct (status, priority) combos observed in the fact
    table become one tiny dimension with DETERMINISTIC surrogate keys
    (dense row_number over the total (status, priority) order — never a
    nondeterministic monotonically_increasing_id, so two independent
    builds assign identical keys and the fact FK backfill is
    reproducible). n_facts per combo is the occupancy audit that says
    whether the junk dim should be enumerated-in-advance instead.

    Scale shape: the fact table collapses to its combo histogram in one
    map-side-combined hash-agg; the surrogate window runs on the bounded
    combo frame only."""
    t = load_tables(spark, sf_dir)
    combos = t["orders"].groupBy(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"),
        F.min("o_orderkey").cast("long").alias("first_orderkey"),
    )
    w = Window.orderBy("status", "priority")
    return combos.select(
        F.row_number().over(w).cast("long").alias("junk_key"),
        "status", "priority", "n_facts", "first_orderkey",
    ).orderBy("junk_key")


# ---------------------------------------------------------------------------
# Bridge-table allocation (many-to-many with exact bp factors, conserved)
# ---------------------------------------------------------------------------

BRIDGE_ALLOC_ORACLE = """
WITH numbered AS (
  SELECT l_orderkey,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn,
         count(*) OVER (PARTITION BY l_orderkey)::BIGINT AS n_lines
  FROM lineitem
),
alloc AS (
  SELECT l.l_orderkey, o.o_orderpriority AS priority,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
         (10000 // l.n_lines
          + CASE WHEN l.rn = 1 THEN 10000 % l.n_lines ELSE 0 END)::BIGINT AS factor_bp
  FROM numbered l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT priority,
       count(DISTINCT l_orderkey)::BIGINT AS n_orders,
       count(*)::BIGINT AS n_lines,
       sum(factor_bp)::BIGINT AS factor_bp_total,
       sum(cents * factor_bp)::BIGINT AS alloc_centsbp,
       (CASE WHEN sum(factor_bp) = 10000 * count(DISTINCT l_orderkey)
             THEN 1 ELSE 0 END)::BIGINT AS conserved
FROM alloc GROUP BY priority ORDER BY priority
"""


@register("warehouse_bridge_allocation", BRIDGE_ALLOC_ORACLE, tags=("warehouse", "etl", "audit"))
def warehouse_bridge_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bridge-table allocation factors (the Kimball many-to-many pattern):
    an order's value is split across its lines with EXACT integer
    basis-point factors — 10000 div n per line, remainder assigned to
    exactly ONE line (row_number 1 in a per-order window; the fixture has
    duplicate line numbers, so a min(l_linenumber) rule would double-pay
    the remainder — caught by the conservation test) — so per-order
    factors sum to exactly 10000 and allocated
    value is conserved TO THE UNIT (float factors 1/n leak pennies at
    warehouse scale and reconciliation pages someone at quarter close).
    The readout proves it: per priority, factor totals equal
    10000 x orders and the allocated cents-bp mass is exact.

    Scale shape: one per-order width hash-agg joined back to lines plus
    the order header (both equi-joins on the order key — co-partitioned,
    one shuffle family), then a per-priority conditional agg."""
    t = load_tables(spark, sf_dir)
    w_ord = Window.partitionBy("l_orderkey")
    numbered = t["lineitem"].select(
        "l_orderkey",
        F.row_number().over(w_ord.orderBy("l_linenumber", "l_partkey", "l_suppkey")).alias("rn"),
        F.count(F.lit(1)).over(w_ord).cast("long").alias("n_lines"),
    )
    alloc = (
        numbered
        .join(
            t["orders"].select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.col("o_orderpriority").alias("priority"),
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
            ),
            "l_orderkey",
        )
        .select(
            "l_orderkey", "priority", "cents",
            (
                F.expr("10000 div n_lines")
                + F.when(F.col("rn") == 1, F.expr("10000 % n_lines")).otherwise(0)
            ).cast("long").alias("factor_bp"),
        )
    )
    return (
        alloc.groupBy("priority")
        .agg(
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("factor_bp").cast("long").alias("factor_bp_total"),
            F.sum(F.col("cents") * F.col("factor_bp")).cast("long").alias("alloc_centsbp"),
            F.when(
                F.sum("factor_bp") == 10000 * F.countDistinct("l_orderkey"), 1
            ).otherwise(0).cast("long").alias("conserved"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Sequence-gap (ingest completeness) audit over a presumed-dense id column
# ---------------------------------------------------------------------------

GAP_TOP_K = 5

_GAP_DROP_MOD = 997  # fault injection: ids with id % 997 < 3 "never arrived"

ID_GAP_ORACLE = f"""
WITH ids AS (
  SELECT DISTINCT o_orderkey AS id FROM orders
  WHERE o_orderkey % {_GAP_DROP_MOD} >= 3
),
tot AS (
  SELECT count(*)::BIGINT AS n_actual,
         (max(id) - min(id) + 1)::BIGINT AS n_expected
  FROM ids
),
gaps AS (
  SELECT id AS gap_after,
         lead(id) OVER (ORDER BY id) AS next_id,
         lead(id) OVER (ORDER BY id) - id - 1 AS missing
  FROM ids
),
ranked AS (
  SELECT gap_after, next_id, missing,
         row_number() OVER (ORDER BY missing DESC, gap_after) AS rk
  FROM gaps WHERE missing > 0
)
SELECT r.rk, r.gap_after, r.next_id, r.missing,
       t.n_actual, t.n_expected,
       (t.n_expected - t.n_actual)::BIGINT AS n_missing_total
FROM ranked r CROSS JOIN tot t
WHERE r.rk <= {GAP_TOP_K}
ORDER BY r.rk
"""


@register("dq_id_gap_audit", ID_GAP_ORACLE, tags=("warehouse", "dq", "audit"))
def dq_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-completeness audit over a presumed-dense id sequence: the
    top-{GAP_TOP_K} largest holes (gap_after .. next_id) plus the total
    missing count against the id envelope — the check that catches a
    dropped CDC batch or a partial file long before any metric drifts
    (a Benford/volume anomaly fires on distribution; this fires on
    EXACTLY which ids never arrived). The fixture's ids are dense, so the
    audit injects a deterministic lost batch (id % {_GAP_DROP_MOD} < 3)
    the same way warehouse_inferred_members simulates a late dimension —
    the machinery under test is the gap detection, which must then report
    exactly those holes. All integers.

    Scale shape: distinct ids feed one lead() window; at 100 TB the
    window decomposes by id-range bucket (each bucket needs one boundary
    row from its neighbor — the classic sessionize-at-scale trick), and
    the top-k is TakeOrdered over gap rows only."""
    t = load_tables(spark, sf_dir)
    ids = (
        t["orders"]
        .filter(F.expr(f"o_orderkey % {_GAP_DROP_MOD} >= 3"))
        .select(F.col("o_orderkey").alias("id"))
        .distinct()
    )
    tot = ids.agg(
        F.count(F.lit(1)).cast("long").alias("n_actual"),
        (F.max("id") - F.min("id") + 1).cast("long").alias("n_expected"),
    )
    w = Window.orderBy("id")
    gaps = ids.select(
        F.col("id").alias("gap_after"),
        F.lead("id").over(w).alias("next_id"),
        (F.lead("id").over(w) - F.col("id") - 1).alias("missing"),
    ).filter(F.col("missing") > 0)
    ranked = gaps.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("missing"), "gap_after"))
    ).filter(F.col("rk") <= GAP_TOP_K)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rk", "gap_after", "next_id", F.col("missing").cast("long").alias("missing"),
            "n_actual", "n_expected",
            (F.col("n_expected") - F.col("n_actual")).cast("long").alias("n_missing_total"),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# FK fan-out profile (join cardinality distribution for the CBO)
# ---------------------------------------------------------------------------

_FANOUT_EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
)


def _fanout_cte(child: str, fk: str, parent: str, pk: str) -> str:
    label = f"{child}.{fk} -> {parent}.{pk}"
    return f"""
SELECT '{label}' AS fk,
       count(*)::BIGINT AS n_parents,
       COALESCE(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END), 0)::BIGINT AS n_childless,
       min(n)::BIGINT AS min_fanout,
       max(n)::BIGINT AS max_fanout,
       ((100 * sum(n)) // count(*))::BIGINT AS avg_fanout_x100,
       (SELECT min(nn) FROM (
          SELECT n AS nn, sum(count(*)) OVER (ORDER BY n
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(count(*)) OVER () AS tot
          FROM (
            SELECT p2.{pk}, COALESCE(c2.n, 0) AS n
            FROM {parent} p2 LEFT JOIN (
              SELECT {fk} AS k, count(*)::BIGINT AS n FROM {child} GROUP BY 1) c2
              ON c2.k = p2.{pk}
          ) f GROUP BY n) h
        WHERE 2 * cum >= tot)::BIGINT AS p50_fanout
FROM (
  SELECT p.{pk}, COALESCE(c.n, 0) AS n
  FROM {parent} p LEFT JOIN (
    SELECT {fk} AS k, count(*)::BIGINT AS n FROM {child} GROUP BY 1) c
    ON c.k = p.{pk}
) f"""


FK_FANOUT_ORACLE = (
    "\nUNION ALL\n".join(_fanout_cte(*e) for e in _FANOUT_EDGES) + "\nORDER BY fk"
)


@register("dq_fk_fanout_profile", FK_FANOUT_ORACLE, tags=("warehouse", "profiling", "cbo", "audit"))
def dq_fk_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out profile per FK edge — the per-parent child-count
    distribution (min / exact lower-median / max, avg x100, childless
    parents) a cost-based optimizer multiplies through join trees and a
    modeler reads before denormalizing: a p50 of 4 with a max of 400 says
    'skewed join, salt it' (see skew_diagnose for the per-KEY view; this
    is the per-EDGE summary). Parents with no children are COUNTED (left
    join, fan-out 0) — dropping them inflates every statistic. The median
    is the exact lower median read off the bounded fan-out histogram; all
    columns exact integers.

    Scale shape: per edge, the child collapses to per-key counts (one
    map-side-combined hash-agg), left-joins the parent key projection,
    and every percentile-ish readout runs on the BOUNDED distinct-fanout
    histogram — no sort of the raw frame, no float percentile."""
    t = load_tables(spark, sf_dir)
    parts = []
    for child, fk, parent, pk in _FANOUT_EDGES:
        ck = t[child].groupBy(F.col(fk).alias("k")).agg(F.count(F.lit(1)).cast("long").alias("n"))
        fan = (
            t[parent].select(F.col(pk).alias("pkk"))
            .join(ck, F.col("pkk") == F.col("k"), "left")
            .select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"))
        )
        hist = fan.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cum = hist.select(
            "n", "c",
            F.sum("c").over(w).alias("cum"),
            F.sum("c").over(Window.partitionBy()).alias("tot"),
        )
        p50 = cum.filter(2 * F.col("cum") >= F.col("tot")).agg(F.min("n").alias("p50_fanout"))
        agg = fan.agg(
            F.count(F.lit(1)).cast("long").alias("n_parents"),
            F.sum(F.when(F.col("n") == 0, 1).otherwise(0)).cast("long").alias("n_childless"),
            F.min("n").cast("long").alias("min_fanout"),
            F.max("n").cast("long").alias("max_fanout"),
            F.expr("(100 * sum(n)) div count(*)").cast("long").alias("avg_fanout_x100"),
        )
        parts.append(
            agg.crossJoin(F.broadcast(p50)).select(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("fk"),
                "n_parents", "n_childless", "min_fanout", "max_fanout",
                "avg_fanout_x100", F.col("p50_fanout").cast("long").alias("p50_fanout"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fk")


# ---------------------------------------------------------------------------
# Merge-on-read delete-vector accounting (Iceberg/Delta MoR compaction gate)
# ---------------------------------------------------------------------------

_DV_FILES = 16           # simulated base files (hash of the row key)
_DV_DELETE_PPM = 50000   # 5% of rows carry a position delete
_DV_REWRITE_BP = 800     # rewrite a file when deleted share >= 8%

DELETE_VECTOR_ORACLE = f"""
WITH rows_ AS (
  SELECT ((('0x' || substr(md5('f' || o_orderkey::VARCHAR), 1, 8))::BIGINT
           % {_DV_FILES} + {_DV_FILES}) % {_DV_FILES}) AS file_id,
         CASE WHEN (('0x' || substr(md5('dv' || o_orderkey::VARCHAR), 1, 8))::BIGINT
                    % 1000000) < {_DV_DELETE_PPM} THEN 1 ELSE 0 END AS deleted
  FROM orders
),
files AS (
  SELECT file_id, count(*)::BIGINT AS n_rows, sum(deleted)::BIGINT AS n_deleted
  FROM rows_ GROUP BY file_id
)
SELECT file_id, n_rows, n_deleted,
       (n_rows - n_deleted)::BIGINT AS n_live,
       ((10000 * n_deleted) // n_rows)::BIGINT AS deleted_bp,
       (CASE WHEN 10000 * n_deleted >= {_DV_REWRITE_BP} * n_rows THEN 1 ELSE 0 END)::BIGINT AS rewrite_flag
FROM files ORDER BY file_id
"""


@register("warehouse_delete_vectors", DELETE_VECTOR_ORACLE, tags=("warehouse", "layout", "audit"))
def warehouse_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete-vector accounting (the Iceberg v2 / Delta DV
    pattern): rows are hash-assigned to {_DV_FILES} simulated base files,
    a deterministic {_DV_DELETE_PPM}-ppm position-delete vector marks
    victims, and the per-file scorecard (rows / deleted / live /
    deleted-bp) drives the compaction gate — rewrite when the dead share
    crosses {_DV_REWRITE_BP} bp, the read-amplification budget every MoR
    table maintains. Complements layout compaction (small files) with the
    other rewrite trigger (dead rows). All integers; the coins are the
    repo's standard md5-ppm fault injection.

    Scale shape: one projection to (file, deleted) + one {_DV_FILES}-row
    hash-agg — exactly the metadata-table query a real lake answers from
    manifests without touching data files."""
    t = load_tables(spark, sf_dir)
    rows_ = t["orders"].select(
        F.expr(
            f"pmod(CAST(conv(substring(md5(concat('f', CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT), {_DV_FILES})"
        ).alias("file_id"),
        F.expr(
            "CASE WHEN CAST(conv(substring(md5(concat('dv', CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT) "
            f"% 1000000 < {_DV_DELETE_PPM} THEN 1 ELSE 0 END"
        ).alias("deleted"),
    )
    files = rows_.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("deleted").cast("long").alias("n_deleted"),
    )
    return files.select(
        "file_id", "n_rows", "n_deleted",
        (F.col("n_rows") - F.col("n_deleted")).cast("long").alias("n_live"),
        F.expr("(10000 * n_deleted) div n_rows").cast("long").alias("deleted_bp"),
        F.expr(
            f"CASE WHEN 10000 * n_deleted >= {_DV_REWRITE_BP} * n_rows THEN 1 ELSE 0 END"
        ).cast("long").alias("rewrite_flag"),
    ).orderBy("file_id")


# ---------------------------------------------------------------------------
# Hash-uniformity goodness-of-fit (audits the md5-shard assumption)
# ---------------------------------------------------------------------------

_HU_BUCKETS = 16
_HU_CRIT_E6 = 24995790  # chi-square(15) 95th percentile * 1e6, literal

HASH_UNIFORMITY_ORACLE = f"""
WITH b AS (
  SELECT ((('0x' || substr(md5('hu' || o_orderkey::VARCHAR), 1, 8))::BIGINT
           % {_HU_BUCKETS} + {_HU_BUCKETS}) % {_HU_BUCKETS}) AS bucket,
         count(*)::BIGINT AS n
  FROM orders GROUP BY 1
),
tot AS (SELECT sum(n)::BIGINT AS t, count(*)::BIGINT AS k FROM b)
SELECT tot.k AS n_buckets, tot.t AS n_rows,
       min(b.n)::BIGINT AS min_bucket,
       max(b.n)::BIGINT AS max_bucket,
       ((1000000 * {_HU_BUCKETS} * sum((b.n * {_HU_BUCKETS} - tot.t) * (b.n * {_HU_BUCKETS} - tot.t)))
         // ({_HU_BUCKETS} * {_HU_BUCKETS} * tot.t))::BIGINT AS chi2_e6,
       (CASE WHEN (1000000 * {_HU_BUCKETS} * sum((b.n * {_HU_BUCKETS} - tot.t) * (b.n * {_HU_BUCKETS} - tot.t)))
                  // ({_HU_BUCKETS} * {_HU_BUCKETS} * tot.t) > {_HU_CRIT_E6}
             THEN 1 ELSE 0 END)::BIGINT AS nonuniform_flag
FROM b CROSS JOIN tot
GROUP BY tot.k, tot.t
"""


@register("dq_hash_uniformity", HASH_UNIFORMITY_ORACLE, tags=("warehouse", "dq", "audit"))
def dq_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodness-of-fit audit for the md5 bucket assignment every sharding,
    sampling, and split operator in this repo leans on: chi-square of the
    {_HU_BUCKETS}-bucket counts against uniform, held in exact integers by
    clearing denominators (sum((k*n - t)^2) scaled by 1e6*k / (k^2*t) ==
    1e6 * sum((n - t/k)^2 / (t/k)), no float expected counts), compared
    to the chi-square({_HU_BUCKETS - 1}) critical value as a literal. A
    flagged audit means the key domain correlates with the hash bytes —
    every hash-mod sample downstream is then biased.

    Scale shape: one {_HU_BUCKETS}-row hash-agg plus a 1-row fold."""
    t = load_tables(spark, sf_dir)
    k = _HU_BUCKETS
    b = t["orders"].groupBy(
        F.expr(
            f"pmod(CAST(conv(substring(md5(concat('hu', CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT), {k})"
        ).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = b.agg(F.sum("n").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("kk"))
    chi2 = F.expr(
        f"(1000000 * {k} * sum((n * {k} - t) * (n * {k} - t))) div ({k} * {k} * t)"
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("kk", "t")
        .agg(
            F.min("n").cast("long").alias("min_bucket"),
            F.max("n").cast("long").alias("max_bucket"),
            chi2.cast("long").alias("chi2_e6"),
            F.expr(
                f"CASE WHEN (1000000 * {k} * sum((n * {k} - t) * (n * {k} - t))) div ({k} * {k} * t) > {_HU_CRIT_E6} "
                "THEN 1 ELSE 0 END"
            ).cast("long").alias("nonuniform_flag"),
        )
        .select(
            F.col("kk").alias("n_buckets"), F.col("t").alias("n_rows"),
            "min_bucket", "max_bucket", "chi2_e6", "nonuniform_flag",
        )
    )


# ---------------------------------------------------------------------------
# Snapshot/partition retention policy: keep the last N daily partitions,
# then month-end representatives for a longer horizon, expire the rest —
# the expire-snapshots planning query (Iceberg expireSnapshots / Delta
# VACUUM with a tiered GFS-style retention schedule).
# ---------------------------------------------------------------------------

RETAIN_DAILY = 7     # most recent 7 days kept at day grain
RETAIN_WEEKS = 4     # last present day of each of the last 4 epoch-weeks kept

RETENTION_ORACLE = f"""
WITH days AS (
  SELECT date_trunc('day', ts) AS part_day, count(*)::BIGINT AS n_rows
  FROM events GROUP BY 1
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY part_day DESC) AS day_rk,
         row_number() OVER (PARTITION BY (floor(epoch(part_day))::BIGINT // 604800)
                            ORDER BY part_day DESC) AS in_week_rk,
         (floor(epoch(part_day))::BIGINT // 604800) AS widx,
         max(floor(epoch(part_day))::BIGINT // 604800) OVER () AS max_widx
  FROM days
)
SELECT part_day, n_rows,
       CASE WHEN day_rk <= {RETAIN_DAILY} THEN 'daily'
            WHEN in_week_rk = 1 AND widx > max_widx - {RETAIN_WEEKS} THEN 'weekly'
            ELSE 'expire' END AS policy,
       day_rk::BIGINT AS recency_rank
FROM ranked ORDER BY part_day
"""


@register("warehouse_retention_policy", RETENTION_ORACLE, tags=("warehouse", "maintenance"))
def warehouse_retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered partition-retention plan over the daily event partitions:
    the most recent {RETAIN_DAILY} days stay at day grain, each of the
    last {RETAIN_WEEKS} epoch-weeks keeps its last present day as the
    week-end representative, and everything older is marked for expiry —
    the grandfather-father-son schedule behind Iceberg expire_snapshots /
    Delta VACUUM planning, as a pure metadata query. Weeks are timezone-
    free epoch // 604800 BIGINTs (the events_lifecycle_states convention
    — calendar ISO weeks differ between engines); every rule is an
    integer rank off ONE ordered pass over the DISTINCT day list (total
    order — no tie ambiguity), so the plan is deterministic and
    engine-exact. A production schedule appends monthly/yearly tiers with
    the same in-bucket-rank rule on coarser integer buckets.

    Scale shape: the day inventory is a metadata-scale hash-agg (a real
    lakehouse reads the partition/snapshot manifest); ranking windows run
    over |days| rows. The fact table is scanned once, never shuffled at
    row grain, and the expiry itself is a separate metadata delete."""
    t = load_tables(spark, sf_dir)
    days = (
        t["events"]
        .groupBy(F.expr("cast(date_trunc('day', ts) as timestamp_ntz)").alias("part_day"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    widx = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', part_day) div 604800"
    )
    ranked = days.select(
        "*",
        F.row_number().over(Window.orderBy(F.col("part_day").desc())).alias("day_rk"),
        F.row_number()
        .over(Window.partitionBy(widx).orderBy(F.col("part_day").desc()))
        .alias("in_week_rk"),
        widx.alias("widx"),
        F.max(widx).over(Window.partitionBy()).alias("max_widx"),
    )
    return (
        ranked.select(
            "part_day",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.when(F.col("day_rk") <= RETAIN_DAILY, F.lit("daily"))
            .when(
                (F.col("in_week_rk") == 1)
                & (F.col("widx") > F.col("max_widx") - RETAIN_WEEKS),
                F.lit("weekly"),
            )
            .otherwise(F.lit("expire"))
            .alias("policy"),
            F.col("day_rk").cast("long").alias("recency_rank"),
        )
        .orderBy("part_day")
    )


# ---------------------------------------------------------------------------
# Tamper-evident audit-log chain verification: per-day hash chains over the
# event log, recomputed and checked — the "has anyone edited history"
# query for an append-only compliance log.
# ---------------------------------------------------------------------------

AUDIT_CHAIN_ORACLE = """
WITH RECURSIVE ev AS MATERIALIZED (
  SELECT date_trunc('day', ts) AS day, event_id, user_id, event_type,
         row_number() OVER (PARTITION BY date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY date_trunc('day', ts)) AS n
  FROM events
), chain AS (
  SELECT day, event_id, rn, n,
         md5('genesis' || '|' || event_id::VARCHAR || '|' || user_id::VARCHAR
             || '|' || event_type) AS h
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.day, e.event_id, e.rn, e.n,
         md5(c.h || '|' || e.event_id::VARCHAR || '|' || e.user_id::VARCHAR
             || '|' || e.event_type)
  FROM ev e JOIN chain c ON e.day = c.day AND e.rn = c.rn + 1
)
SELECT day, n::BIGINT AS n_events,
       max(CASE WHEN rn = n THEN h END) AS head_hash,
       max(CASE WHEN rn = n THEN event_id END)::BIGINT AS head_event_id
FROM chain
GROUP BY day, n ORDER BY day
"""


@register("warehouse_audit_chain", AUDIT_CHAIN_ORACLE, tags=("warehouse", "governance", "integrity"))
def warehouse_audit_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident hash chain per day over the audit (event) log:
    h_1 = md5('genesis' | row_1), h_i = md5(h_{i-1} | row_i) in the total
    (ts, event_id) order, emitting each day's chain head — the receipt a
    compliance pipeline stores out-of-band; any historical edit, delete,
    or reorder changes every subsequent hash and the head stops matching
    the stored receipt (the verify step is one equi-join of receipts to
    this output). Day-scoped chains bound the sequential dependency: a
    year of history verifies as 365 independent chains.

    Scale shape: the chain is inherently sequential WITHIN a day but
    embarrassingly parallel ACROSS days — one Arrow grouped-map per day
    partition computes the fold (the events_ewma recurrence pattern, with
    md5 strings instead of doubles); the oracle replays the identical fold
    as a recursive CTE. Output is |days| rows."""
    import pandas as pd
    from hashlib import md5 as _md5

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        F.expr("cast(date_trunc('day', ts) as timestamp_ntz)").alias("day"),
        "ts", "event_id", "user_id", "event_type",
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # Coerce ids to int EXPLICITLY before formatting: the oracle hashes
        # user_id::VARCHAR, and f"{uid}" is only byte-identical while pandas
        # delivers a non-null int64 — a nullable/float-typed column would
        # silently render '123.0'/'nan' and corrupt every downstream hash
        # (r7 ADVICE item 4). int() raises loudly on NaN instead.
        h = "genesis"
        for eid, uid, et in zip(pdf["event_id"], pdf["user_id"], pdf["event_type"]):
            h = _md5(f"{h}|{int(eid)}|{int(uid)}|{et}".encode()).hexdigest()
        return pd.DataFrame(
            {
                "day": [pdf["day"].iloc[0]],
                "n_events": [len(pdf)],
                "head_hash": [h],
                "head_event_id": [int(pdf["event_id"].iloc[-1])],
            }
        )

    return (
        ev.groupBy("day")
        .applyInPandas(
            fold,
            "day timestamp_ntz, n_events bigint, head_hash string, head_event_id bigint",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Synthetic-data allocation with exact marginals: apportion a fixed budget
# of synthetic rows across the (event_type, day-of-week) contingency cells
# proportionally to the true counts, using LARGEST-REMAINDER rounding so
# the synthetic total is exactly the budget and every cell is within one
# row of its exact proportional share — the allocation step of a
# marginal-preserving synthetic data generator (the release mechanism
# privacy_dp_counts pairs with when counts must stay non-noisy).
# ---------------------------------------------------------------------------

SYNTH_BUDGET = 10000  # synthetic rows to allocate

SYNTH_ALLOCATION_ORACLE = f"""
WITH cells AS (
  -- +1: DuckDB dayofweek is 0(Sun)..6, Spark's is 1(Sun)..7
  SELECT event_type, (dayofweek(ts) + 1)::BIGINT AS dow, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT sum(c)::BIGINT AS t FROM cells),
quota AS (
  SELECT event_type, dow, c,
         (({SYNTH_BUDGET}::BIGINT * c) // t)::BIGINT AS q,
         ({SYNTH_BUDGET}::BIGINT * c - (({SYNTH_BUDGET}::BIGINT * c) // t) * t)::BIGINT AS rem
  FROM cells, tot
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, event_type, dow) AS rk,
         {SYNTH_BUDGET} - sum(q) OVER () AS leftover
  FROM quota
)
SELECT event_type, dow, c AS true_count,
       (q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS synth_count,
       q::BIGINT AS floor_quota,
       rem::BIGINT AS remainder_units
FROM ranked
ORDER BY event_type, dow
"""


@register("privacy_synthetic_allocation", SYNTH_ALLOCATION_ORACLE, tags=("governance", "privacy", "synthetic"))
def privacy_synthetic_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a {SYNTH_BUDGET}-row
    synthetic budget across the (event_type, day-of-week) contingency
    cells: each cell gets floor(budget * c / total), and the leftover rows
    go one-each to the cells with the largest fractional remainders
    (remainders compared as EXACT integer units budget*c - q*total — no
    float ever enters, and the tie order (remainder, event_type, dow) is
    total, so the allocation is engine-identical). Guarantees: synthetic
    total == budget exactly; every cell within one row of its exact
    share — the quota property that makes marginal-preserving synthesis
    auditable.

    Scale shape: one contingency hash-agg over the fact; everything after
    runs on the bounded |event_types| x 7 cell frame (the rank window is
    deliberately global over that metadata-sized frame)."""
    t = load_tables(spark, sf_dir)
    cells = (
        t["events"]
        .groupBy("event_type", F.dayofweek("ts").cast("bigint").alias("dow"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cells.agg(F.sum("c").alias("t"))
    quota = cells.crossJoin(F.broadcast(tot)).select(
        "event_type", "dow", "c",
        F.expr(f"(cast({SYNTH_BUDGET} as bigint) * c) div t").alias("q"),
        F.expr(
            f"cast({SYNTH_BUDGET} as bigint) * c - ((cast({SYNTH_BUDGET} as bigint) * c) div t) * t"
        ).alias("rem"),
    )
    w_rank = Window.orderBy(F.col("rem").desc(), "event_type", "dow")
    ranked = quota.select(
        "*",
        F.row_number().over(w_rank).alias("rk"),
        (F.lit(SYNTH_BUDGET) - F.sum("q").over(Window.partitionBy())).alias("leftover"),
    )
    return ranked.select(
        "event_type", "dow",
        F.col("c").cast("long").alias("true_count"),
        (F.col("q") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)).cast("long").alias("synth_count"),
        F.col("q").cast("long").alias("floor_quota"),
        F.col("rem").cast("long").alias("remainder_units"),
    ).orderBy("event_type", "dow")


# ---------------------------------------------------------------------------
# Schema/profile drift between two epochs of the same table: the ingest
# regression alarm that fires when an upstream producer silently changes
# cardinality or starts emitting nulls, BEFORE downstream joins blow up.
# ---------------------------------------------------------------------------

_DRIFT_COLS = ("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
_DRIFT_SPLIT_Y = 1996  # epoch a: years < split; epoch b: years >= split


def _drift_oracle_sql() -> str:
    per_col_aggs = ", ".join(
        f"count(*) - count({c}) AS {c}_nulls, count(DISTINCT {c}) AS {c}_ndv"
        for c in _DRIFT_COLS
    )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT late, n, '{c}' AS col, {c}_nulls AS nulls, {c}_ndv AS ndv FROM pro"
        for c in _DRIFT_COLS
    )
    return f"""
WITH pro AS MATERIALIZED (
  SELECT (year(o_orderdate) >= {_DRIFT_SPLIT_Y}) AS late,
         count(*) AS n, {per_col_aggs}
  FROM orders GROUP BY 1
), long AS (
  {unions}
)
SELECT a.col,
       a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
       ((1000000 * a.nulls) // a.n)::BIGINT AS null_ppm_a,
       ((1000000 * b.nulls) // b.n)::BIGINT AS null_ppm_b,
       a.ndv::BIGINT AS ndv_a, b.ndv::BIGINT AS ndv_b,
       ((1000000 * abs(b.ndv - a.ndv)) // a.ndv)::BIGINT AS ndv_drift_ppm,
       (abs(b.ndv - a.ndv) * 10 > a.ndv) AS drift_flag
FROM long a JOIN long b ON a.col = b.col AND a.late = false AND b.late = true
ORDER BY a.col
"""


DQ_SCHEMA_DRIFT_ORACLE = _drift_oracle_sql()


@register("dq_schema_drift", DQ_SCHEMA_DRIFT_ORACLE, tags=("governance", "dq", "profiling"))
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile drift between two epochs of the orders table:
    null rate and exact distinct cardinality per epoch, the NDV drift in
    integer ppm, and a flag when cardinality moved more than 10% (integer
    cross-multiplication — no float threshold). This is the ingest
    regression alarm: a producer that silently starts hashing customer
    ids, collapsing statuses, or defaulting a column to NULL shows up
    here as a cardinality cliff before any downstream join degrades.

    Scale shape: ONE scan — a 2-group conditional aggregate whose exact
    per-column distincts rewrite through RewriteDistinctAggregates
    (expand + partial agg, the profile_columns discipline; swap in
    approx_count_distinct at 100 TB); the wide 2-row profile unpivots via
    stack() and self-joins into the per-column scorecard, all on
    metadata-sized frames."""
    t = load_tables(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _DRIFT_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}_ndv"))
    pro = (
        t["orders"]
        .groupBy((F.year("o_orderdate") >= _DRIFT_SPLIT_Y).alias("late"))
        .agg(*aggs)
    )
    stack_args = ", ".join(
        f"'{c}', {c}_nulls, {c}_ndv" for c in _DRIFT_COLS
    )
    long = pro.selectExpr(
        "late", "n", f"stack({len(_DRIFT_COLS)}, {stack_args}) AS (col, nulls, ndv)"
    )
    # Pivot the two epochs with one conditional agg instead of an a/b
    # self-join: the self-join form re-planned the whole upstream
    # aggregate (and its scan) once per side — 4 parquet scans for a
    # one-scan claim (caught by the plan pin in test_r8_plans).
    return (
        long.groupBy("col")
        .agg(
            F.max(F.when(~F.col("late"), F.col("n"))).alias("na"),
            F.max(F.when(F.col("late"), F.col("n"))).alias("nb"),
            F.max(F.when(~F.col("late"), F.col("nulls"))).alias("nulls_a"),
            F.max(F.when(F.col("late"), F.col("nulls"))).alias("nulls_b"),
            F.max(F.when(~F.col("late"), F.col("ndv"))).alias("ndva"),
            F.max(F.when(F.col("late"), F.col("ndv"))).alias("ndvb"),
        )
        .select(
            "col",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.expr("(1000000 * nulls_a) div na").cast("long").alias("null_ppm_a"),
            F.expr("(1000000 * nulls_b) div nb").cast("long").alias("null_ppm_b"),
            F.col("ndva").cast("long").alias("ndv_a"),
            F.col("ndvb").cast("long").alias("ndv_b"),
            F.expr("(1000000 * abs(ndvb - ndva)) div ndva").cast("long").alias("ndv_drift_ppm"),
            (F.abs(F.col("ndvb") - F.col("ndva")) * 10 > F.col("ndva")).alias("drift_flag"),
        )
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# Write-Audit-Publish gate: the staging checklist a lakehouse runs on a
# landed-but-unpublished batch; publish iff every check passes.
# ---------------------------------------------------------------------------

WAP_STAGE_Y = 2001        # the staged batch: the newest (partial) year
WAP_VOL_FLOOR_X10 = 8     # staged volume must be >= 80% of the published per-year avg
WAP_VOL_CEIL = 2          # ... and <= 2x it

WAP_GATE_ORACLE = f"""
WITH staged AS MATERIALIZED (
  SELECT * FROM orders WHERE year(o_orderdate) = {WAP_STAGE_Y}
), pub AS MATERIALIZED (
  SELECT * FROM orders WHERE year(o_orderdate) < {WAP_STAGE_Y}
), wide AS (
  SELECT
    (SELECT count(*) FROM staged)::BIGINT AS n,
    ((SELECT count(*) FROM pub) // (SELECT count(DISTINCT year(o_orderdate)) FROM pub))::BIGINT AS avg_y,
    (SELECT count(*) - count(o_custkey) FROM staged)::BIGINT AS null_keys,
    (SELECT COALESCE(sum(c - 1), 0) FROM (
       SELECT count(*) AS c FROM staged GROUP BY o_orderkey HAVING count(*) > 1) d)::BIGINT AS pk_dups,
    (SELECT count(*) FROM staged s WHERE NOT EXISTS (
       SELECT 1 FROM customer c WHERE c.c_custkey = s.o_custkey))::BIGINT AS fk_orphans,
    (SELECT count(*) FROM staged WHERE o_totalprice <= 0)::BIGINT AS bad_price,
    (SELECT count(*) FROM (
       SELECT DISTINCT o_orderstatus FROM staged
       EXCEPT
       SELECT DISTINCT o_orderstatus FROM pub) q)::BIGINT AS novel_status
), graded AS (
  SELECT 'fk_orphans' AS check_name, fk_orphans AS observed, 0::BIGINT AS bound,
         fk_orphans = 0 AS ok FROM wide
  UNION ALL SELECT 'null_keys', null_keys, 0, null_keys = 0 FROM wide
  UNION ALL SELECT 'pk_duplicates', pk_dups, 0, pk_dups = 0 FROM wide
  UNION ALL SELECT 'price_domain', bad_price, 0, bad_price = 0 FROM wide
  UNION ALL SELECT 'status_novel', novel_status, 0, novel_status = 0 FROM wide
  UNION ALL SELECT 'volume_ceiling', n, {WAP_VOL_CEIL} * avg_y, n <= {WAP_VOL_CEIL} * avg_y FROM wide
  UNION ALL SELECT 'volume_floor', 10 * n, {WAP_VOL_FLOOR_X10} * avg_y,
                   10 * n >= {WAP_VOL_FLOOR_X10} * avg_y FROM wide
)
SELECT check_name, observed, bound, ok,
       (SELECT bool_and(ok) FROM graded) AS publish
FROM graded ORDER BY check_name
"""


@register("warehouse_wap_gate", WAP_GATE_ORACLE, tags=("warehouse", "dq", "governance"))
def warehouse_wap_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish gate: the staged batch (newest order year —
    landed, not yet published) runs the publish checklist against the
    published history — primary-key duplicates, FK orphans vs the
    customer dimension, null keys, value-domain violations, NOVEL status
    codes the history has never seen, and a volume band (>= {WAP_VOL_FLOOR_X10}0%
    and <= {WAP_VOL_CEIL}00% of the published per-year average, integer
    cross-multiplications). One row per check with the observed count and
    its bound, plus the overall publish verdict — the swap/no-swap
    decision Iceberg/Delta WAP branches gate on. On the fixture the
    partial staged year FAILS the volume floor, so the blocking branch is
    exercised at every SF while the integrity checks pass.

    Scale shape: every check is a conditional aggregate or an anti-join
    against a broadcastable dimension over the staged slice only
    (partition pruning at scale: the staged year is the natural partition
    key); the checklist itself is a 7-row frame."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    staged = o.filter(F.year("o_orderdate") == WAP_STAGE_Y)
    pub = o.filter(F.year("o_orderdate") < WAP_STAGE_Y)
    pubs = pub.agg(
        F.expr("count(*) div count(DISTINCT year(o_orderdate))").cast("long").alias("avg_y")
    )
    stats = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) - F.count("o_custkey")).cast("long").alias("null_keys"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).cast("long").alias("bad_price"),
    )
    pk_dups = (
        staged.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long").alias("pk_dups"))
    )
    fk_orphans = (
        staged.join(t["customer"], staged["o_custkey"] == t["customer"]["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("fk_orphans"))
    )
    novel = (
        staged.select("o_orderstatus").distinct()
        .join(pub.select("o_orderstatus").distinct(), "o_orderstatus", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("novel_status"))
    )
    wide = (
        stats.crossJoin(F.broadcast(pubs))
        .crossJoin(F.broadcast(pk_dups))
        .crossJoin(F.broadcast(fk_orphans))
        .crossJoin(F.broadcast(novel))
    )
    graded = wide.selectExpr(
        f"""stack(7,
          'fk_orphans', fk_orphans, CAST(0 AS BIGINT), fk_orphans = 0,
          'null_keys', null_keys, CAST(0 AS BIGINT), null_keys = 0,
          'pk_duplicates', pk_dups, CAST(0 AS BIGINT), pk_dups = 0,
          'price_domain', bad_price, CAST(0 AS BIGINT), bad_price = 0,
          'status_novel', novel_status, CAST(0 AS BIGINT), novel_status = 0,
          'volume_ceiling', n, CAST({WAP_VOL_CEIL} * avg_y AS BIGINT), n <= {WAP_VOL_CEIL} * avg_y,
          'volume_floor', 10 * n, CAST({WAP_VOL_FLOOR_X10} * avg_y AS BIGINT),
            10 * n >= {WAP_VOL_FLOOR_X10} * avg_y
        ) AS (check_name, observed, bound, ok)"""
    )
    verdict = graded.agg(F.min("ok").alias("publish"))
    return (
        graded.crossJoin(F.broadcast(verdict))
        .select("check_name", "observed", "bound", "ok", "publish")
        .orderBy("check_name")
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance for an aggregate: apply a changelog's
# +/- deltas to yesterday's materialized agg instead of recomputing it.
# ---------------------------------------------------------------------------

IVM_AGG_ORACLE = """
WITH effective AS (
  -- post-changelog state, recomputed from scratch: base rows minus
  -- deletes, plus inserts, with updates re-priced (+5 percent on the cents)
  SELECT o_orderdate, o_orderpriority,
         CASE WHEN o_orderkey % 10 = 6
              THEN CAST(round(o_totalprice * 100) AS BIGINT)
                   + CAST(round(o_totalprice * 100) AS BIGINT) // 20
              ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
  FROM orders
  WHERE NOT (o_orderkey % 10 = 7)
)
SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym, o_orderpriority,
       count(*)::BIGINT AS n_orders, sum(cents)::BIGINT AS revenue_cents
FROM effective
GROUP BY 1, 2
ORDER BY ym, o_orderpriority
"""


def ivm_orders_frame(orders: DataFrame) -> DataFrame:
    """Shared IVM fixture shaping: (o_orderkey, ym, o_orderpriority, cents,
    slot). Module-level so the streaming twin replays the IDENTICAL
    synthetic changelog (sol_spark/streaming/pipelines.py)."""
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    return orders.select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        "o_orderpriority",
        cents.alias("cents"),
        (F.col("o_orderkey") % 10).alias("slot"),
    )


def ivm_base_agg(o: DataFrame) -> DataFrame:
    """Yesterday's materialized view over :func:`ivm_orders_frame` rows:
    the snapshot excludes post-snapshot inserts (slots 8, 9) but still
    contains the rows the changelog will delete (7) or update (6)."""
    return (
        o.filter(F.col("slot") < 8)
        .groupBy("ym", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("rev"))
    )


def ivm_changelog(o: DataFrame) -> DataFrame:
    """The synthetic CDC changelog as signed delta rows over
    :func:`ivm_orders_frame`: insert(+), delete(-), update(-old, +new with
    the integer +5% reprice). Carries o_orderkey so a stream replay can
    range-split it into deterministic micro-batch files."""
    ins = o.filter(F.col("slot").isin(8, 9)).select(
        "o_orderkey", "ym", "o_orderpriority", F.lit(1).alias("dn"), F.col("cents").alias("drev")
    )
    dels = o.filter(F.col("slot") == 7).select(
        "o_orderkey", "ym", "o_orderpriority", F.lit(-1).alias("dn"), (-F.col("cents")).alias("drev")
    )
    upd_old = o.filter(F.col("slot") == 6).select(
        "o_orderkey", "ym", "o_orderpriority", F.lit(-1).alias("dn"), (-F.col("cents")).alias("drev")
    )
    upd_new = o.filter(F.col("slot") == 6).select(
        "o_orderkey",
        "ym",
        "o_orderpriority",
        F.lit(1).alias("dn"),
        (F.col("cents") + F.expr("cents div 20")).alias("drev"),
    )
    return ins.unionByName(dels).unionByName(upd_old).unionByName(upd_new)


def ivm_merge(snapshot: DataFrame, deltas: DataFrame) -> DataFrame:
    """The groups-sized IVM merge: aggregate the delta rows to the view
    grain, full-outer join against the snapshot agg, add the signed sums,
    drop groups whose count reaches zero — exactly what a recompute would
    produce. The fact is never rescanned; this runs per micro-batch in the
    streaming twin and once in the batch operator."""
    delta_agg = deltas.groupBy("ym", "o_orderpriority").agg(
        F.sum("dn").alias("dn"), F.sum("drev").alias("drev")
    )
    return (
        snapshot.join(delta_agg, ["ym", "o_orderpriority"], "full_outer")
        .select(
            "ym",
            "o_orderpriority",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (F.coalesce("rev", F.lit(0)) + F.coalesce("drev", F.lit(0))).alias("rev"),
        )
        .filter(F.col("n") > 0)
    )


@register("warehouse_ivm_agg", IVM_AGG_ORACLE, tags=("warehouse", "cdc", "incremental"))
def warehouse_ivm_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a (month, priority) revenue
    aggregate under a CDC changelog: the base snapshot's materialized agg
    is MERGED with the changelog's signed deltas — +1/+cents for inserts,
    -1/-cents for deletes, a delete+insert pair for updates — instead of
    rescanning the base. Synthetic changelog over orders: keys %10 in
    (8,9) are inserts (they post-date the snapshot), %10 = 7 rows are
    deletes, %10 = 6 rows are updates re-priced +5%. Groups whose count
    reaches zero drop out, exactly as a recompute would drop them.

    The ORACLE IS THE FULL RECOMPUTE over the post-changelog state, so the
    exact-hash compare proves the delta-merge path equals rescanning —
    the invariant that makes IVM trustworthy. All money is exact BIGINT
    cents; the +5%% reprice is integer `div 20` so both paths round
    identically.

    Scale shape: at 100 TB the base agg is |groups| rows (months x 5
    priorities — dim-scale, NOT fact-scale) and the changelog agg scans
    only the delta partition; the merge is a groups-sized outer union.
    The base fact is never rescanned — that is the entire point, and the
    reason nightly aggregate refresh stays minutes, not hours. (Here the
    "materialized" base agg is derived in-plan from the same fixture, so
    the driver can verify it; a production run reads it from the table
    the previous run wrote.)"""
    t = load_tables(spark, sf_dir)
    orders = ivm_orders_frame(t["orders"])
    merged = ivm_merge(ivm_base_agg(orders), ivm_changelog(orders))
    return merged.select(
        "ym",
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("rev").alias("revenue_cents"),
    ).orderBy("ym", "o_orderpriority")


# ---------------------------------------------------------------------------
# Benford first-digit audit: the classic fabricated-numbers screen for a
# money column, with precomputed integer-ppm expectations.
# ---------------------------------------------------------------------------

# log10(1 + 1/d) in exact ppm, as LITERALS (both engines share the
# constants instead of each calling log10 and disagreeing by an ulp).
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}

_BENFORD_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()
) + " END"

DQ_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0
),
counts AS (
  SELECT d, count(*)::BIGINT AS n_obs FROM digits GROUP BY d
),
tot AS (SELECT sum(n_obs)::BIGINT AS n FROM counts)
SELECT d AS digit, n_obs,
       (1000000 * n_obs) // n AS obs_ppm,
       {_BENFORD_CASE} AS exp_ppm,
       floor(((CAST(1000000 AS DOUBLE) * n_obs / n - {_BENFORD_CASE})
              * (CAST(1000000 AS DOUBLE) * n_obs / n - {_BENFORD_CASE}) / {_BENFORD_CASE})
             * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS chi2_contrib
FROM counts CROSS JOIN tot
ORDER BY digit
"""


@register("dq_benford_audit", DQ_BENFORD_ORACLE, tags=("governance", "dq", "audit"))
def dq_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of the money column — the classic screen
    for fabricated or truncated figures in a financial fact: observed
    first-significant-digit frequencies (of the exact cent amounts)
    against Benford expectations, with each digit's chi-square
    contribution. The log10(1+1/d) expectations are PRECOMPUTED integer
    ppm literals shared by both engines — calling log10 at runtime would
    let the engines disagree by an ulp inside a downstream round (the
    pow/ln rule from the cross-engine float discipline). Counts and
    obs_ppm are exact integers; the chi2 contribution is one shared IEEE
    tree rounded half-up at 6.

    Scale shape: a 9-group map-side-combinable hash-agg over one fact
    scan plus a broadcast 1-row total — digit extraction is a codegen
    string op on the cent integer, no UDF."""
    t = load_tables(spark, sf_dir)
    digits = (
        t["orders"]
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
            ).alias("d")
        )
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = counts.agg(F.sum("n_obs").alias("n"))
    chi = (
        f"floor(((CAST(1000000 AS DOUBLE) * n_obs / n - {_BENFORD_CASE})"
        f" * (CAST(1000000 AS DOUBLE) * n_obs / n - {_BENFORD_CASE}) / {_BENFORD_CASE})"
        " * 1000000 + 0.5) / cast(1000000 as double)"
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            "n_obs",
            F.expr("(1000000 * n_obs) div n").alias("obs_ppm"),
            F.expr(_BENFORD_CASE).alias("exp_ppm"),
            F.expr(chi).alias("chi2_contrib"),
        )
        .orderBy("digit")
    )
