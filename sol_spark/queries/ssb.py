"""Star Schema Benchmark (SSB) q1.1–q4.3, adapted to the driver fixtures.

The reference ships the stock SSB corpus and only compiles the plans
(/root/reference/sql/core/src/test/resources/ssb/1.1.sql..4.3.sql, schemas at
/root/reference/sql/core/src/test/scala/org/apache/spark/sql/SSBQuerySuite.scala:33-66).
We run every query and hash-match a DuckDB oracle.

SSB's star schema (lineorder fact + date/customer/supplier/part dims) does
not exist in the fixtures, so it is DERIVED deterministically — identically
in the Spark build and the oracle CTEs:
  * lineorder  := lineitem ⋈ orders on orderkey; lo_revenue =
    l_extendedprice*(1-l_discount); lo_supplycost = 0.6*l_extendedprice
    (profit = extprice*(0.4-discount) stays an exact 4-decimal product).
  * dates      := distinct o_orderdate with d_year / d_yearmonthnum /
    d_weeknuminyear = (dayofyear-1) div 7 + 1 (integer math — engine-neutral,
    unlike ISO week functions).
  * customer/supplier dims gain nation/region names and a synthetic city
    n_name || '_' || (key % 10).
  * part gains p_category = 'MFGR#'||((brandnum-1) div 5 + 1) and
    p_mfgr = 'MFGR#'||((brandnum-1) div 10 + 1) from p_brand ('Brand#1'..'Brand#25').
Filter constants are re-targeted to the fixture domains (years 1995–2001,
nations NATION_0..24; region→nation layout: AMERICA = NATION_{1,6,11,16,21},
ASIA = NATION_{2,7,...}, EUROPE = NATION_{3,8,...}).

Scale notes: all four dims broadcast (dates ≈ #distinct days, dims ≈ small),
so every SSB query is a single fact scan + broadcast hash joins + one
partial/final aggregation — no fact-side shuffle until the final group-by.
The lineitem⋈orders spine is the one true fact-fact shuffle; at 100 TB both
sides would be bucketed on orderkey to make it co-located (see README).
Rounding policy follows sol_spark/queries/tpch.py (4-decimal exact products
rounded at 4).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sol_spark.registry import register
from sol_spark.tables import load_tables

# Per-(session, sf_dir) derived-star cache — the load_tables/_ds catalog
# discipline (see tpcds._ds): the star is five immutable LAZY plans whose
# re-derivation is pure py4j/analysis overhead per registered-query build.
_STAR_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)

# ---------------------------------------------------------------------------
# Shared star-schema derivation
# ---------------------------------------------------------------------------

STAR_CTES = """
dates AS (
  SELECT DISTINCT o_orderdate AS d_datekey,
         year(o_orderdate) AS d_year,
         year(o_orderdate)*100 + month(o_orderdate) AS d_yearmonthnum,
         (dayofyear(o_orderdate)-1) // 7 + 1 AS d_weeknuminyear
  FROM orders),
cust AS (
  SELECT c_custkey, n_name AS c_nation, r_name AS c_region,
         n_name || '_' || (c_custkey % 10) AS c_city
  FROM customer JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey),
supp AS (
  SELECT s_suppkey, n_name AS s_nation, r_name AS s_region,
         n_name || '_' || (s_suppkey % 10) AS s_city
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey),
partd AS (
  SELECT p_partkey, p_brand AS p_brand1,
         CAST(substr(p_brand, 7) AS INT) AS p_brandnum,
         'MFGR#' || ((CAST(substr(p_brand, 7) AS INT) - 1) // 5 + 1) AS p_category,
         'MFGR#' || ((CAST(substr(p_brand, 7) AS INT) - 1) // 10 + 1) AS p_mfgr
  FROM part),
lineorder AS (
  SELECT o_custkey AS lo_custkey, l_suppkey AS lo_suppkey, l_partkey AS lo_partkey,
         o_orderdate AS lo_orderdate, l_quantity AS lo_quantity,
         l_extendedprice AS lo_extendedprice, l_discount AS lo_discount,
         l_extendedprice * (1 - l_discount) AS lo_revenue,
         0.6 * l_extendedprice AS lo_supplycost
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
"""


def _star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build the derived star schema as DataFrames (broadcastable dims).

    Cached per (session, sf_dir); shallow-copied on return so callers may
    rebind dict entries without touching the shared catalog."""
    sf_abs = os.path.abspath(sf_dir)
    per_session = _STAR_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_abs)
    if cached is None:
        cached = _build_star(spark, sf_dir)
        per_session[sf_abs] = cached
    return dict(cached)


def _build_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    t = load_tables(spark, sf_dir)
    dates = (
        t["orders"]
        .select("o_orderdate")
        .distinct()
        .select(
            F.col("o_orderdate").alias("d_datekey"),
            F.year("o_orderdate").alias("d_year"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("d_yearmonthnum"),
            F.expr("CAST((dayofyear(o_orderdate)-1) DIV 7 + 1 AS BIGINT)").alias("d_weeknuminyear"),
        )
    )
    nation_region = t["nation"].join(
        t["region"], t["nation"].n_regionkey == t["region"].r_regionkey
    )
    cust = (
        t["customer"]
        .join(nation_region, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            F.col("n_name").alias("c_nation"),
            F.col("r_name").alias("c_region"),
            F.concat(F.col("n_name"), F.lit("_"), (F.col("c_custkey") % 10).cast("string")).alias("c_city"),
        )
    )
    supp = (
        t["supplier"]
        .join(nation_region, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            F.col("n_name").alias("s_nation"),
            F.col("r_name").alias("s_region"),
            F.concat(F.col("n_name"), F.lit("_"), (F.col("s_suppkey") % 10).cast("string")).alias("s_city"),
        )
    )
    brandnum = F.expr("CAST(substring(p_brand, 7, 8) AS INT)")
    partd = t["part"].select(
        "p_partkey",
        F.col("p_brand").alias("p_brand1"),
        brandnum.alias("p_brandnum"),
        F.expr("concat('MFGR#', CAST((CAST(substring(p_brand,7,8) AS INT)-1) DIV 5 + 1 AS STRING))").alias("p_category"),
        F.expr("concat('MFGR#', CAST((CAST(substring(p_brand,7,8) AS INT)-1) DIV 10 + 1 AS STRING))").alias("p_mfgr"),
    )
    lineorder = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("lo_custkey"),
            F.col("l_suppkey").alias("lo_suppkey"),
            F.col("l_partkey").alias("lo_partkey"),
            F.col("o_orderdate").alias("lo_orderdate"),
            F.col("l_quantity").alias("lo_quantity"),
            F.col("l_extendedprice").alias("lo_extendedprice"),
            F.col("l_discount").alias("lo_discount"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("lo_revenue"),
            (F.lit(0.6) * F.col("l_extendedprice")).alias("lo_supplycost"),
        )
    )
    return {
        "dates": F.broadcast(dates),
        "cust": F.broadcast(cust),
        "supp": F.broadcast(supp),
        "partd": F.broadcast(partd),
        "lineorder": lineorder,
    }


def _oracle(body: str) -> str:
    return f"WITH {STAR_CTES} {body}"


# ---------------------------------------------------------------------------
# Flight 1: single-table restriction + date dim (scan-dominated)
# ---------------------------------------------------------------------------


@register(
    "ssb_q1_1",
    _oracle("""
SELECT round(sum(lo_extendedprice * lo_discount), 4) AS revenue
FROM lineorder JOIN dates ON lo_orderdate = d_datekey
WHERE d_year = 1996 AND lo_discount BETWEEN 0.01 AND 0.03 AND lo_quantity < 25
"""),
    tags=("ssb", "agg"),
)
def ssb_q1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q1.1 (ssb/1.1.sql): year slice, discount/qty band, revenue sum."""
    s = _star(spark, sf_dir)
    return (
        s["lineorder"]
        .join(s["dates"], F.col("lo_orderdate") == F.col("d_datekey"))
        .filter(
            (F.col("d_year") == 1996)
            & F.col("lo_discount").between(0.01, 0.03)
            & (F.col("lo_quantity") < 25)
        )
        .agg(F.round(F.sum(F.col("lo_extendedprice") * F.col("lo_discount")), 4).alias("revenue"))
    )


@register(
    "ssb_q1_2",
    _oracle("""
SELECT round(sum(lo_extendedprice * lo_discount), 4) AS revenue
FROM lineorder JOIN dates ON lo_orderdate = d_datekey
WHERE d_yearmonthnum = 199601 AND lo_discount BETWEEN 0.04 AND 0.06
  AND lo_quantity BETWEEN 26 AND 35
"""),
    tags=("ssb", "agg"),
)
def ssb_q1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q1.2 (ssb/1.2.sql): month slice."""
    s = _star(spark, sf_dir)
    return (
        s["lineorder"]
        .join(s["dates"], F.col("lo_orderdate") == F.col("d_datekey"))
        .filter(
            (F.col("d_yearmonthnum") == 199601)
            & F.col("lo_discount").between(0.04, 0.06)
            & F.col("lo_quantity").between(26, 35)
        )
        .agg(F.round(F.sum(F.col("lo_extendedprice") * F.col("lo_discount")), 4).alias("revenue"))
    )


@register(
    "ssb_q1_3",
    _oracle("""
SELECT round(sum(lo_extendedprice * lo_discount), 4) AS revenue
FROM lineorder JOIN dates ON lo_orderdate = d_datekey
WHERE d_weeknuminyear = 6 AND d_year = 1997
  AND lo_discount BETWEEN 0.05 AND 0.07 AND lo_quantity BETWEEN 26 AND 35
"""),
    tags=("ssb", "agg"),
)
def ssb_q1_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q1.3 (ssb/1.3.sql): week slice."""
    s = _star(spark, sf_dir)
    return (
        s["lineorder"]
        .join(s["dates"], F.col("lo_orderdate") == F.col("d_datekey"))
        .filter(
            (F.col("d_weeknuminyear") == 6)
            & (F.col("d_year") == 1997)
            & F.col("lo_discount").between(0.05, 0.07)
            & F.col("lo_quantity").between(26, 35)
        )
        .agg(F.round(F.sum(F.col("lo_extendedprice") * F.col("lo_discount")), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Flight 2: part x supplier restrictions, group by year x brand
# ---------------------------------------------------------------------------


def _q2(spark: SparkSession, sf_dir: str, part_pred, supp_pred) -> DataFrame:
    s = _star(spark, sf_dir)
    return (
        s["lineorder"]
        .join(s["dates"], F.col("lo_orderdate") == F.col("d_datekey"))
        .join(s["partd"], F.col("lo_partkey") == F.col("p_partkey"))
        .join(s["supp"], F.col("lo_suppkey") == F.col("s_suppkey"))
        .filter(part_pred & supp_pred)
        .groupBy("d_year", "p_brand1")
        .agg(F.round(F.sum("lo_revenue"), 4).alias("revenue"))
        .orderBy("d_year", "p_brand1")
    )


Q2_BODY = """
SELECT d_year, p_brand1, round(sum(lo_revenue), 4) AS revenue
FROM lineorder
JOIN dates ON lo_orderdate = d_datekey
JOIN partd ON lo_partkey = p_partkey
JOIN supp ON lo_suppkey = s_suppkey
WHERE {pred}
GROUP BY d_year, p_brand1
ORDER BY d_year, p_brand1
"""


@register("ssb_q2_1", _oracle(Q2_BODY.format(pred="p_category = 'MFGR#3' AND s_region = 'AMERICA'")), tags=("ssb", "agg", "join"))
def ssb_q2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q2.1 (ssb/2.1.sql): category x supplier-region drill."""
    return _q2(spark, sf_dir, F.col("p_category") == "MFGR#3", F.col("s_region") == "AMERICA")


@register("ssb_q2_2", _oracle(Q2_BODY.format(pred="p_brandnum BETWEEN 21 AND 24 AND s_region = 'ASIA'")), tags=("ssb", "agg", "join"))
def ssb_q2_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q2.2 (ssb/2.2.sql): brand range x supplier-region."""
    return _q2(spark, sf_dir, F.col("p_brandnum").between(21, 24), F.col("s_region") == "ASIA")


@register("ssb_q2_3", _oracle(Q2_BODY.format(pred="p_brand1 = 'Brand#23' AND s_region = 'EUROPE'")), tags=("ssb", "agg", "join"))
def ssb_q2_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q2.3 (ssb/2.3.sql): single brand x supplier-region."""
    return _q2(spark, sf_dir, F.col("p_brand1") == "Brand#23", F.col("s_region") == "EUROPE")


# ---------------------------------------------------------------------------
# Flight 3: customer x supplier geography over time
# ---------------------------------------------------------------------------


def _q3(spark: SparkSession, sf_dir: str, pred, group_cols: list[str]) -> DataFrame:
    s = _star(spark, sf_dir)
    return (
        s["lineorder"]
        .join(s["dates"], F.col("lo_orderdate") == F.col("d_datekey"))
        .join(s["cust"], F.col("lo_custkey") == F.col("c_custkey"))
        .join(s["supp"], F.col("lo_suppkey") == F.col("s_suppkey"))
        .filter(pred)
        .groupBy(*group_cols, "d_year")
        .agg(F.round(F.sum("lo_revenue"), 4).alias("revenue"))
        .orderBy(*group_cols, "d_year")
    )


Q3_BODY = """
SELECT {groups}, d_year, round(sum(lo_revenue), 4) AS revenue
FROM lineorder
JOIN dates ON lo_orderdate = d_datekey
JOIN cust ON lo_custkey = c_custkey
JOIN supp ON lo_suppkey = s_suppkey
WHERE {pred}
GROUP BY {groups}, d_year
ORDER BY {groups}, d_year
"""


@register(
    "ssb_q3_1",
    _oracle(Q3_BODY.format(groups="c_nation, s_nation",
                           pred="c_region = 'ASIA' AND s_region = 'ASIA' AND d_year BETWEEN 1995 AND 1997")),
    tags=("ssb", "agg", "join"),
)
def ssb_q3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q3.1 (ssb/3.1.sql): intra-region trade by nation pair."""
    return _q3(
        spark, sf_dir,
        (F.col("c_region") == "ASIA") & (F.col("s_region") == "ASIA") & F.col("d_year").between(1995, 1997),
        ["c_nation", "s_nation"],
    )


@register(
    "ssb_q3_2",
    _oracle(Q3_BODY.format(groups="c_city, s_city",
                           pred="c_nation = 'NATION_7' AND s_nation = 'NATION_7'")),
    tags=("ssb", "agg", "join"),
)
def ssb_q3_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q3.2 (ssb/3.2.sql): intra-nation trade by city pair."""
    return _q3(
        spark, sf_dir,
        (F.col("c_nation") == "NATION_7") & (F.col("s_nation") == "NATION_7"),
        ["c_city", "s_city"],
    )


@register(
    "ssb_q3_3",
    _oracle(Q3_BODY.format(groups="c_city, s_city",
                           pred="c_city IN ('NATION_7_1','NATION_7_5') AND s_city IN ('NATION_7_1','NATION_7_5')")),
    tags=("ssb", "agg", "join"),
)
def ssb_q3_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q3.3 (ssb/3.3.sql): two-city drill."""
    cities = ["NATION_7_1", "NATION_7_5"]
    return _q3(
        spark, sf_dir,
        F.col("c_city").isin(cities) & F.col("s_city").isin(cities),
        ["c_city", "s_city"],
    )


@register(
    "ssb_q3_4",
    _oracle(Q3_BODY.format(groups="c_city, s_city",
                           pred="c_city IN ('NATION_7_1','NATION_7_5') AND s_city IN ('NATION_7_1','NATION_7_5') AND d_year = 1997")),
    tags=("ssb", "agg", "join"),
)
def ssb_q3_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q3.4 (ssb/3.4.sql): two-city single-period drill (period widened
    month->year: at sf<=0.01 a single month of a city pair is empty)."""
    cities = ["NATION_7_1", "NATION_7_5"]
    return _q3(
        spark, sf_dir,
        F.col("c_city").isin(cities) & F.col("s_city").isin(cities) & (F.col("d_year") == 1997),
        ["c_city", "s_city"],
    )


# ---------------------------------------------------------------------------
# Flight 4: profit drill-down across all four dims
# ---------------------------------------------------------------------------


Q4_BODY = """
SELECT {groups}, round(sum(lo_revenue - lo_supplycost), 4) AS profit
FROM lineorder
JOIN dates ON lo_orderdate = d_datekey
JOIN cust ON lo_custkey = c_custkey
JOIN supp ON lo_suppkey = s_suppkey
JOIN partd ON lo_partkey = p_partkey
WHERE {pred}
GROUP BY {groups}
ORDER BY {groups}
"""


def _q4(spark: SparkSession, sf_dir: str, pred, group_cols: list[str]) -> DataFrame:
    s = _star(spark, sf_dir)
    return (
        s["lineorder"]
        .join(s["dates"], F.col("lo_orderdate") == F.col("d_datekey"))
        .join(s["cust"], F.col("lo_custkey") == F.col("c_custkey"))
        .join(s["supp"], F.col("lo_suppkey") == F.col("s_suppkey"))
        .join(s["partd"], F.col("lo_partkey") == F.col("p_partkey"))
        .filter(pred)
        .groupBy(*group_cols)
        .agg(F.round(F.sum(F.col("lo_revenue") - F.col("lo_supplycost")), 4).alias("profit"))
        .orderBy(*group_cols)
    )


@register(
    "ssb_q4_1",
    _oracle(Q4_BODY.format(groups="d_year, c_nation",
                           pred="c_region = 'AMERICA' AND s_region = 'AMERICA' AND p_mfgr IN ('MFGR#1','MFGR#2')")),
    tags=("ssb", "agg", "join"),
)
def ssb_q4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q4.1 (ssb/4.1.sql): profit by year x customer nation."""
    return _q4(
        spark, sf_dir,
        (F.col("c_region") == "AMERICA") & (F.col("s_region") == "AMERICA")
        & F.col("p_mfgr").isin("MFGR#1", "MFGR#2"),
        ["d_year", "c_nation"],
    )


@register(
    "ssb_q4_2",
    _oracle(Q4_BODY.format(groups="d_year, s_nation, p_category",
                           pred="c_region = 'AMERICA' AND s_region = 'AMERICA' AND d_year IN (1997, 1998) AND p_mfgr IN ('MFGR#1','MFGR#2')")),
    tags=("ssb", "agg", "join"),
)
def ssb_q4_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q4.2 (ssb/4.2.sql): profit drill to supplier nation x category."""
    return _q4(
        spark, sf_dir,
        (F.col("c_region") == "AMERICA") & (F.col("s_region") == "AMERICA")
        & F.col("d_year").isin(1997, 1998) & F.col("p_mfgr").isin("MFGR#1", "MFGR#2"),
        ["d_year", "s_nation", "p_category"],
    )


@register(
    "ssb_q4_3",
    _oracle(Q4_BODY.format(groups="d_year, s_city, p_brand1",
                           pred="c_region = 'AMERICA' AND s_nation = 'NATION_11' AND p_category = 'MFGR#3'")),
    tags=("ssb", "agg", "join"),
)
def ssb_q4_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB q4.3 (ssb/4.3.sql): profit drill to supplier city x brand."""
    return _q4(
        spark, sf_dir,
        (F.col("c_region") == "AMERICA") & (F.col("s_nation") == "NATION_11")
        & (F.col("p_category") == "MFGR#3"),
        ["d_year", "s_city", "p_brand1"],
    )
