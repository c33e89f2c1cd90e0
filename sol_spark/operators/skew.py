"""Skew-mitigation operators: salted two-phase aggregation and salted join.

The 100 TB problem: a power-law key (one user with 10% of all events, one
null-heavy join key) turns a single shuffle partition into the straggler
that dominates job time. Two standard mitigations, both expressed as plain
DataFrame ops so they compose with everything else:

  * **Salted aggregation** — phase 1 groups on (key, salt) with salt =
    pmod(hash(row-unique), N_SALTS), spreading one hot key over N_SALTS
    reducers; phase 2 re-aggregates the N_SALTS partials per key. Works for
    any algebraic aggregate (sum/count/min/max — the partial-merge shapes
    HashAggregateExec already exploits map-side).
  * **Salted broadcast-side replication** (for joins) — replicate the small
    side N_SALTS times (one copy per salt) and salt the big side, so the hot
    key's rows land on N_SALTS tasks. With AQE skew-join splitting
    (spark.sql.adaptive.skewJoin, on in our profile) this is only needed
    when the skew is inside a single key, which AQE cannot split further.

The salted aggregation is oracle-verified (its result is definitionally the
plain group-by); the plan test asserts the two-phase shape survives
optimization (Catalyst must NOT collapse the two groupBys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sol_spark.registry import register
from sol_spark.tables import load_tables

N_SALTS = 8


def salted_sum(df: DataFrame, key: str, value: str, n_salts: int = N_SALTS) -> DataFrame:
    """Two-phase salted sum/count of ``value`` grouped by ``key``."""
    salted = df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("n")
    )


SALTED_AGG_ORACLE = """
SELECT user_id, round(sum(value), 2) AS sum_value, count(*) AS n
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("skew_salted_agg", SALTED_AGG_ORACLE, tags=("agg", "skew"))
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over events.user_id — result is
    definitionally identical to the plain group-by (the oracle), which is
    exactly what makes salting a safe drop-in under skew."""
    t = load_tables(spark, sf_dir)
    out = salted_sum(t["events"], "user_id", "value")
    return out.select(
        "user_id", F.round("sum_value", 2).alias("sum_value"), "n"
    ).orderBy("user_id")


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salts: int = N_SALTS) -> DataFrame:
    """Equi-join with the small side replicated n_salts times and the big
    side salted — every hot-key row set is spread over n_salts tasks.
    small must be broadcast-sized * n_salts."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    return big_salted.join(F.broadcast(small_rep), [key, "_salt"]).drop("_salt")


SALTED_JOIN_ORACLE = """
SELECT e.user_id, e.event_id, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id
"""


@register("skew_salted_join", SALTED_JOIN_ORACLE, tags=("join", "skew"))
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated-broadcast join events->customer: identical result
    set to the plain equi-join (the oracle)."""
    t = load_tables(spark, sf_dir)
    joined = salted_join(
        t["events"].select("user_id", "event_id"),
        t["customer"].select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
        "user_id",
    )
    return joined.select("user_id", "event_id", "c_mktsegment").orderBy("event_id")


# ---------------------------------------------------------------------------
# Skew diagnosis: per-key frequency report for a join/agg key — the audit
# that decides WHETHER to salt (skew_salted_*) or rely on AQE skew-split,
# run before the expensive job.
# ---------------------------------------------------------------------------

SKEW_DIAGNOSE_ORACLE = """
WITH freq AS (
  SELECT o_custkey AS key, count(*) AS n FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT count(*) AS n_keys, sum(n) AS n_rows, max(n) AS max_n,
         avg(n) AS mean_n
  FROM freq
)
SELECT f.key, f.n::BIGINT AS n,
       round(f.n / s.mean_n, 4) AS x_mean,
       round(100.0 * f.n / s.n_rows, 4) AS pct_of_rows,
       CASE WHEN f.n > 2 * s.mean_n THEN 1 ELSE 0 END AS is_hot
FROM freq f, stats s
ORDER BY f.n DESC, f.key
LIMIT 20
"""


@register("skew_diagnose", SKEW_DIAGNOSE_ORACLE, tags=("skew", "profiling"))
def skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key report for a prospective join/agg key: the 20 heaviest
    keys with their skew multiple (x mean frequency), share of all rows,
    and a >2x-mean hot flag — the diagnosis that chooses between plain
    hash partitioning, salting (skew_salted_*), and AQE skew-split
    BEFORE paying for the skewed shuffle. On the uniform fixture keys the
    report's verdict is "no hot keys" (all flags 0) — exactly what it
    should say. Plan: one map-side-combined key count, a 1-row stats
    broadcast, and a top-20 TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir)
    freq = t["orders"].groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("n"))
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.avg("n").alias("mean_n"),
    )
    return (
        freq.join(F.broadcast(stats))
        .select(
            "key", F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("mean_n"), 4).alias("x_mean"),
            F.round(100.0 * F.col("n") / F.col("n_rows"), 4).alias("pct_of_rows"),
            F.when(F.col("n") > 2 * F.col("mean_n"), 1).otherwise(0).alias("is_hot"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(20)
    )
