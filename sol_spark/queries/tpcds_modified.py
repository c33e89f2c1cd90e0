"""TPC-DS "modified" dialect corpus (Impala-style rewrites), adapted to the
derived store_sales star — the last reference query corpus with no repo
counterpart (r8 verdict "What's missing" #4, "Next round" #6).

Reference: /root/reference/sql/core/src/test/resources/tpcds-modifiedQueries/
(20 dialect rewrites of base queries + ss_max). The corpus's distinguishing
shapes, each preserved here rather than collapsed back into the base form:

  * **Static partition-key bands**: every query carries literal
    `ss_sold_date_sk BETWEEN ...` range filters that are semantically
    redundant with the dim-side date filter but prune at the FACT scan —
    the reference corpus's whole point (its comments say "partition key
    filter"). In the derived star ss_sold_date_sk IS orders.o_orderdate,
    so the literal band pushes down to the orders parquet scan
    (`PushedFilters` on o_orderdate) where the dim filter alone cannot
    prune until after the join. At 100 TB over date-partitioned fact
    files this is the difference between scanning one month and scanning
    the table; at the fixture SFs it is verified as pushdown, and the
    results are pinned equal to the unpruned base semantics by each
    query's oracle.
  * **Literal day IN-lists** (q46): the corpus enumerates individual
    partition days; q46m carries the weekend days of 1997 H1 as literal
    timestamps generated from the calendar, both engines.
  * **Union-all of group-bys instead of ROLLUP** (q27): three aggregation
    passes over a shared `results` relation with hand-built g_state
    flags — the ExpandExec-free formulation (base q27 keeps the one-pass
    rollup; this variant pins the dialect's 3-pass shape).
  * **Semi-join form instead of EXISTS** (q10): `left semi join` over a
    non-deduplicated UNION ALL channel CTE — the semi join absorbs the
    duplicates, so the dedup shuffle the decorrelated-EXISTS form pays
    is dropped (strictly fewer shuffles; documented per-query).
  * **Preserved dialect quirks**: q59m's tue_sales1/tue_sales1 self-ratio
    (verbatim in the reference file) and q27m's duplicated IN-list
    entries are kept, because the corpus is a dialect-fidelity test, not
    a cleanup opportunity.
  * **ss_max**: the corpus's scan-profile query — count/count-distinct/
    max over the fact's key columns in one pass.

Filter constants are re-targeted to the fixture domains exactly like
tpcds.py (years 1995-2001, managers 0..39, manufact 1..3, the ST_k /
NATION_x_y state/city domains, the %60 demographics). Money follows the
tpch.py rounding policy (exact 4-decimal inputs; round(.,4) sums,
round(.,6) ratios/averages).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from sol_spark.registry import register
from sol_spark.queries.tpcds import DS_CTES, _ds

# ---------------------------------------------------------------------------
# Partition-band helpers: one literal timestamp band list, both engines.
# ---------------------------------------------------------------------------


def _band_spark(col: str, ranges: list[tuple[str, str]]):
    cond = None
    for lo, hi in ranges:
        c = F.col(col).between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"))
        cond = c if cond is None else (cond | c)
    return cond


def _band_sql(col: str, ranges: list[tuple[str, str]]) -> str:
    return (
        "("
        + " OR ".join(
            f"{col} BETWEEN TIMESTAMP '{lo} 00:00:00' AND TIMESTAMP '{hi} 00:00:00'"
            for lo, hi in ranges
        )
        + ")"
    )


# One December band per fixture year — mirrors the reference q3's
# one-band-per-year disjunction (tpcds-modifiedQueries/q3.sql lines 17-180).
_DEC_BANDS = [(f"{y}-12-01", f"{y}-12-31") for y in range(1995, 2001)]

# Weekend days (Sat/Sun) of 1997 H1 — the literal partition-day IN-list
# shape of tpcds-modifiedQueries/q46.sql, generated from the calendar so
# both engines carry identical literals. Python weekday(): Mon=0..Sun=6.
_Q46_DAYS = [
    d.isoformat()
    for d in (
        _dt.date(1997, 1, 1) + _dt.timedelta(days=i) for i in range(181)
    )
    if d.weekday() >= 5
]


# ---------------------------------------------------------------------------
# ss_max — fact scan profile: counts + per-key maxima in one pass
# ---------------------------------------------------------------------------

SS_MAX_ORACLE = f"""
WITH {DS_CTES}
SELECT count(*)::BIGINT AS total,
       count(ss_sold_date_sk)::BIGINT AS not_null_total,
       count(DISTINCT ss_sold_date_sk)::BIGINT AS unique_days,
       max(ss_sold_date_sk) AS max_ss_sold_date_sk,
       max(ss_sold_time_sk)::BIGINT AS max_ss_sold_time_sk,
       max(ss_item_sk)::BIGINT AS max_ss_item_sk,
       max(ss_customer_sk)::BIGINT AS max_ss_customer_sk,
       max(ss_cdemo_sk)::BIGINT AS max_ss_cdemo_sk,
       max(ss_hdemo_sk)::BIGINT AS max_ss_hdemo_sk,
       max(ss_addr_sk)::BIGINT AS max_ss_addr_sk,
       max(ss_store_sk)::BIGINT AS max_ss_store_sk,
       max(ss_promo_sk)::BIGINT AS max_ss_promo_sk
FROM store_sales
"""


@register("tpcds_ss_max", SS_MAX_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_ss_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS ss_max (reference tpcds-modifiedQueries/ss_max.sql): the
    corpus's scan-profile query — row count, non-null/distinct day counts,
    and the max of every fact key, one full scan, no joins. The distinct
    day count is the only shuffle (partial distinct then merge); everything
    else is a map-side-combinable max."""
    ds = _ds(spark, sf_dir)
    ss = ds["store_sales"]
    return ss.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("ss_sold_date_sk").alias("not_null_total"),
        F.countDistinct("ss_sold_date_sk").alias("unique_days"),
        F.max("ss_sold_date_sk").alias("max_ss_sold_date_sk"),
        F.max("ss_sold_time_sk").alias("max_ss_sold_time_sk"),
        F.max("ss_item_sk").alias("max_ss_item_sk"),
        F.max("ss_customer_sk").alias("max_ss_customer_sk"),
        F.max("ss_cdemo_sk").alias("max_ss_cdemo_sk"),
        F.max("ss_hdemo_sk").alias("max_ss_hdemo_sk"),
        F.max("ss_addr_sk").alias("max_ss_addr_sk"),
        F.max("ss_store_sk").alias("max_ss_store_sk"),
        F.max("ss_promo_sk").alias("max_ss_promo_sk"),
    )


# ---------------------------------------------------------------------------
# q3m — December brand sales, one band per year
# ---------------------------------------------------------------------------

Q3M_ORACLE = f"""
WITH {DS_CTES}
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       round(sum(ss_ext_sales_price), 4) AS sum_agg
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manufact_id = 2 AND d_moy = 12
  AND {_band_sql("ss_sold_date_sk", _DEC_BANDS)}
GROUP BY d_year, i_brand, i_brand_id
ORDER BY d_year, sum_agg DESC, brand_id
LIMIT 100
"""


@register("tpcds_q3m", Q3M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q3m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3, modified dialect (reference tpcds-modifiedQueries/q3.sql):
    base q3 retargeted to December plus the corpus's one-band-per-year
    partition-key disjunction — six literal December ranges that push down
    to the fact (orders) scan, pruning BEFORE the date_dim join instead of
    after it. Redundant with d_moy=12 by construction; that redundancy is
    the corpus's test."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", _DEC_BANDS))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_moy") == 12)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(ds["item"].filter(F.col("i_manufact_id") == 2), F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("d_year", "i_brand", "i_brand_id")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("sum_agg"))
        .select("d_year", F.col("i_brand_id").alias("brand_id"), F.col("i_brand").alias("brand"), "sum_agg")
        .orderBy("d_year", F.desc("sum_agg"), "brand_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q7m — demographic/promotion item averages, year band
# ---------------------------------------------------------------------------

Q7M_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_id,
       round(avg(ss_quantity), 6) AS agg1,
       round(avg(ss_list_price), 6) AS agg2,
       round(avg(ss_coupon_amt), 6) AS agg3,
       round(avg(ss_sales_price), 6) AS agg4
FROM store_sales JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
                 JOIN date_dim ON ss_sold_date_sk = d_date_sk
                 JOIN item ON ss_item_sk = i_item_sk
                 JOIN promotion ON ss_promo_sk = p_promo_sk
WHERE cd_gender = 'F' AND cd_marital_status = 'D' AND cd_education_status = 'Primary'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 1998
  AND {_band_sql("ss_sold_date_sk", [("1998-01-01", "1998-12-31")])}
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
"""


@register("tpcds_q7m", Q7M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q7m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7, modified dialect (reference tpcds-modifiedQueries/q7.sql):
    base q7 with the corpus's F/W/Primary demographics slice retargeted to
    the derived domain (F/D/Primary — W is not a derived marital status)
    and the full-year partition band on the fact scan (the reference file's
    2450815-2451179 = calendar 1998)."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        (F.col("cd_gender") == "F")
        & (F.col("cd_marital_status") == "D")
        & (F.col("cd_education_status") == "Primary")
    )
    promo = ds["promotion"].filter((F.col("p_channel_email") == "N") | (F.col("p_channel_event") == "N"))
    return (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1998-01-01", "1998-12-31")]))
        .join(F.broadcast(cd), F.col("ss_cdemo_sk") == F.col("cd_demo_sk"))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 1998)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(promo), F.col("ss_promo_sk") == F.col("p_promo_sk"))
        .groupBy("i_item_id")
        .agg(
            F.round(F.avg("ss_quantity"), 6).alias("agg1"),
            F.round(F.avg("ss_list_price"), 6).alias("agg2"),
            F.round(F.avg("ss_coupon_amt"), 6).alias("agg3"),
            F.round(F.avg("ss_sales_price"), 6).alias("agg4"),
        )
        .orderBy("i_item_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q10m — multi-channel shoppers via explicit semi joins over UNION ALL
# ---------------------------------------------------------------------------

Q10M_ORACLE = f"""
WITH {DS_CTES},
v1 AS (
  SELECT ws_bill_customer_sk AS customer_sk FROM web_sales
  WHERE year(ws_sold_date_sk) = 1997 AND month(ws_sold_date_sk) BETWEEN 4 AND 7
  UNION ALL
  SELECT cs_bill_customer_sk FROM catalog_sales
  WHERE year(cs_sold_date_sk) = 1997 AND month(cs_sold_date_sk) BETWEEN 4 AND 7),
v2 AS (
  SELECT ss_customer_sk AS customer_sk FROM store_sales
  WHERE year(ss_sold_date_sk) = 1997 AND month(ss_sold_date_sk) BETWEEN 4 AND 7)
SELECT cd_gender, cd_marital_status, cd_education_status,
       count(*)::BIGINT AS cnt1, count(*)::BIGINT AS cnt2, count(*)::BIGINT AS cnt3
FROM customer_dim c
JOIN customer_address ca ON c.c_current_addr_sk = ca.ca_address_sk
JOIN customer_demographics ON cd_demo_sk = c.c_customer_sk % 60
SEMI JOIN v1 ON v1.customer_sk = c.c_customer_sk
SEMI JOIN v2 ON v2.customer_sk = c.c_customer_sk
WHERE ca_state IN ('ST_0', 'ST_3', 'ST_5')
GROUP BY cd_gender, cd_marital_status, cd_education_status
ORDER BY cd_gender, cd_marital_status, cd_education_status
"""


@register("tpcds_q10m", Q10M_ORACLE, tags=("tpcds", "modified", "join"))
def tpcds_q10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10, modified dialect (reference
    tpcds-modifiedQueries/q10.sql): the corpus replaces base q10's EXISTS
    subqueries with explicit `left semi join`s over a UNION ALL channel
    CTE — and critically does NOT dedupe v1/v2 first. The semi join
    absorbs duplicates, so this form drops the distinct shuffle the
    decorrelated-EXISTS base pays per channel (strictly fewer shuffles at
    any SF). Grouping is the full 3-attribute demographics profile with
    the corpus's repeated count(*) columns."""
    ds = _ds(spark, sf_dir)

    def window(df: DataFrame, date: str, key: str) -> DataFrame:
        return df.filter((F.year(date) == 1997) & F.month(date).between(4, 7)).select(
            F.col(key).alias("customer_sk")
        )

    v1 = window(ds["web_sales"], "ws_sold_date_sk", "ws_bill_customer_sk").unionAll(
        window(ds["catalog_sales"], "cs_sold_date_sk", "cs_bill_customer_sk")
    )
    v2 = window(ds["store_sales"], "ss_sold_date_sk", "ss_customer_sk")
    ca = ds["customer_address"].filter(F.col("ca_state").isin("ST_0", "ST_3", "ST_5")).select("ca_address_sk")
    return (
        ds["customer_dim"].select("c_customer_sk", "c_current_addr_sk")
        .join(F.broadcast(ca), F.col("c_current_addr_sk") == F.col("ca_address_sk"), "left_semi")
        .join(v1, F.col("c_customer_sk") == F.col("customer_sk"), "left_semi")
        .join(v2, F.col("c_customer_sk") == F.col("customer_sk"), "left_semi")
        .join(F.broadcast(ds["customer_demographics"]), F.col("cd_demo_sk") == F.col("c_customer_sk") % 60)
        .groupBy("cd_gender", "cd_marital_status", "cd_education_status")
        .agg(
            F.count(F.lit(1)).alias("cnt1"),
            F.count(F.lit(1)).alias("cnt2"),
            F.count(F.lit(1)).alias("cnt3"),
        )
        .orderBy("cd_gender", "cd_marital_status", "cd_education_status")
    )


# ---------------------------------------------------------------------------
# q19m — six-table star with zip inequality, one-month band
# ---------------------------------------------------------------------------

Q19M_ORACLE = f"""
WITH {DS_CTES}
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id, i_manufact,
       round(sum(ss_ext_sales_price), 4) AS ext_price
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
              JOIN customer_dim ON ss_customer_sk = c_customer_sk
              JOIN customer_address ON c_current_addr_sk = ca_address_sk
              JOIN store ON ss_store_sk = s_store_sk
WHERE i_manager_id = 7 AND d_moy = 11 AND d_year = 1998
  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  AND {_band_sql("ss_sold_date_sk", [("1998-11-01", "1998-11-30")])}
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price DESC, brand, brand_id, i_manufact_id, i_manufact
LIMIT 100
"""


@register("tpcds_q19m", Q19M_ORACLE, tags=("tpcds", "modified", "join"))
def tpcds_q19m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19, modified dialect (reference
    tpcds-modifiedQueries/q19.sql): base q19 with manager 7 and the
    corpus's single-month partition band (2451484-2451513 = Nov 1999,
    retargeted Nov 1998 to the base's year) pruning the fact scan ahead of
    the five dim joins."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1998-11-01", "1998-11-30")]))
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 11) & (F.col("d_year") == 1998))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(ds["item"].filter(F.col("i_manager_id") == 7), F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .join(ds["customer_address"], F.col("c_current_addr_sk") == F.col("ca_address_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .filter(F.substring("ca_zip", 1, 5) != F.substring("s_zip", 1, 5))
        .groupBy("i_brand", "i_brand_id", "i_manufact_id", "i_manufact")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("ext_price"))
        .select(
            F.col("i_brand_id").alias("brand_id"),
            F.col("i_brand").alias("brand"),
            "i_manufact_id",
            "i_manufact",
            "ext_price",
        )
        .orderBy(F.desc("ext_price"), "brand", "brand_id", "i_manufact_id", "i_manufact")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q27m — union-all of three group-bys instead of ROLLUP
# ---------------------------------------------------------------------------

_Q27M_WHERE = f"""cd_gender = 'F' AND cd_marital_status = 'D' AND cd_education_status = 'Primary'
    AND d_year = 2000 AND s_state IN ('ST_0', 'ST_1', 'ST_2', 'ST_2')
    AND {_band_sql("ss_sold_date_sk", [("2000-01-01", "2000-12-31")])}"""

Q27M_ORACLE = f"""
WITH {DS_CTES},
results AS MATERIALIZED (
  SELECT i_item_id, s_state, ss_quantity, ss_list_price, ss_coupon_amt, ss_sales_price
  FROM store_sales JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
                   JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
                   JOIN item ON ss_item_sk = i_item_sk
  WHERE {_Q27M_WHERE})
SELECT i_item_id, s_state, g_state, agg1, agg2, agg3, agg4 FROM (
  SELECT i_item_id, s_state, 0::INTEGER AS g_state,
         round(avg(ss_quantity), 6) AS agg1, round(avg(ss_list_price), 6) AS agg2,
         round(avg(ss_coupon_amt), 6) AS agg3, round(avg(ss_sales_price), 6) AS agg4
  FROM results GROUP BY i_item_id, s_state
  UNION ALL
  SELECT i_item_id, CAST(NULL AS VARCHAR), 1::INTEGER,
         round(avg(ss_quantity), 6), round(avg(ss_list_price), 6),
         round(avg(ss_coupon_amt), 6), round(avg(ss_sales_price), 6)
  FROM results GROUP BY i_item_id
  UNION ALL
  SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 1::INTEGER,
         round(avg(ss_quantity), 6), round(avg(ss_list_price), 6),
         round(avg(ss_coupon_amt), 6), round(avg(ss_sales_price), 6)
  FROM results) foo
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100
"""


@register("tpcds_q27m", Q27M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q27m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q27, modified dialect (reference
    tpcds-modifiedQueries/q27.sql): the corpus hand-rolls the rollup as a
    `results` CTE re-aggregated at three levels and UNION ALL'd, with
    0/1/1 g_state flags (note the grand row gets 1, exactly what
    grouping(s_state) yields — pinning the two forms equal). The
    duplicated 'ST_2' IN-list entry is the reference file's own quirk,
    kept verbatim. Base q27 remains the one-pass ExpandExec rollup; this
    variant is the dialect's three-pass shape (the oracle CTE is
    MATERIALIZED for the same reason — see the verify skill's chained-CTE
    rule)."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        (F.col("cd_gender") == "F")
        & (F.col("cd_marital_status") == "D")
        & (F.col("cd_education_status") == "Primary")
    )
    st = ds["store"].filter(F.col("s_state").isin("ST_0", "ST_1", "ST_2", "ST_2"))
    results = (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("2000-01-01", "2000-12-31")]))
        .join(F.broadcast(cd), F.col("ss_cdemo_sk") == F.col("cd_demo_sk"))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 2000)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(st), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .select("i_item_id", "s_state", "ss_quantity", "ss_list_price", "ss_coupon_amt", "ss_sales_price")
    )

    def aggs() -> list:
        return [
            F.round(F.avg("ss_quantity"), 6).alias("agg1"),
            F.round(F.avg("ss_list_price"), 6).alias("agg2"),
            F.round(F.avg("ss_coupon_amt"), 6).alias("agg3"),
            F.round(F.avg("ss_sales_price"), 6).alias("agg4"),
        ]

    null_s = F.lit(None).cast("string")
    lvl_state = results.groupBy("i_item_id", "s_state").agg(*aggs()).select(
        "i_item_id", "s_state", F.lit(0).cast("int").alias("g_state"), "agg1", "agg2", "agg3", "agg4"
    )
    lvl_item = results.groupBy("i_item_id").agg(*aggs()).select(
        "i_item_id", null_s.alias("s_state"), F.lit(1).cast("int").alias("g_state"), "agg1", "agg2", "agg3", "agg4"
    )
    lvl_grand = results.groupBy().agg(*aggs()).select(
        null_s.alias("i_item_id"), null_s.alias("s_state"), F.lit(1).cast("int").alias("g_state"),
        "agg1", "agg2", "agg3", "agg4",
    )
    return (
        lvl_state.unionAll(lvl_item).unionAll(lvl_grand)
        .orderBy(F.asc_nulls_first("i_item_id"), F.asc_nulls_first("s_state"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q34m — month-edge ticket counts, three-year single band
# ---------------------------------------------------------------------------

Q34M_ORACLE = f"""
WITH {DS_CTES},
dj AS (
  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
  FROM store_sales
  JOIN date_dim ON ss_sold_date_sk = d_date_sk
  JOIN store ON ss_store_sk = s_store_sk
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  WHERE (d_dom BETWEEN 1 AND 3 OR d_dom BETWEEN 25 AND 28)
    AND d_year IN (1999, 2000, 2001)
    AND s_state IN ('ST_0', 'ST_1', 'ST_2', 'ST_3')
    AND hd_vehicle_count > 0
    AND hd_dep_count / hd_vehicle_count > 1.2
    AND {_band_sql("ss_sold_date_sk", [("1999-01-01", "2001-12-31")])}
  GROUP BY ss_ticket_number, ss_customer_sk
  HAVING count(*) BETWEEN 4 AND 7)
SELECT c_last_name, c_first_name, ss_ticket_number, cnt
FROM dj JOIN customer_dim ON ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, ss_ticket_number DESC
"""


@register("tpcds_q34m", Q34M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q34m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34, modified dialect (reference
    tpcds-modifiedQueries/q34.sql): base q34 plus the corpus's single
    three-year band (2450816-2451910) on the fact scan — one BETWEEN, not
    per-month pieces, exactly as the reference file writes it."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter(
        (F.col("hd_vehicle_count") > 0)
        & (F.col("hd_dep_count") / F.col("hd_vehicle_count") > 1.2)
    )
    dd = ds["date_dim"].filter(
        (F.col("d_dom").between(1, 3) | F.col("d_dom").between(25, 28))
        & F.col("d_year").isin(1999, 2000, 2001)
    )
    dj = (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1999-01-01", "2001-12-31")]))
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(
            F.broadcast(ds["store"].filter(F.col("s_state").isin("ST_0", "ST_1", "ST_2", "ST_3"))),
            F.col("ss_store_sk") == F.col("s_store_sk"),
        )
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .groupBy("ss_ticket_number", "ss_customer_sk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(4, 7))
    )
    return (
        dj.join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .select("c_last_name", "c_first_name", "ss_ticket_number", "cnt")
        .orderBy("c_last_name", "c_first_name", F.desc("ss_ticket_number"))
    )


# ---------------------------------------------------------------------------
# q42m / q52m — category/brand December sales, one-month band
# ---------------------------------------------------------------------------

Q42M_ORACLE = f"""
WITH {DS_CTES}
SELECT d_year, i_category_id, i_category,
       round(sum(ss_ext_sales_price), 4) AS sum_sales
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manager_id = 1 AND d_moy = 12 AND d_year = 1998
  AND {_band_sql("ss_sold_date_sk", [("1998-12-01", "1998-12-31")])}
GROUP BY d_year, i_category_id, i_category
ORDER BY sum_sales DESC, d_year, i_category_id, i_category
LIMIT 100
"""


@register("tpcds_q42m", Q42M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q42m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q42, modified dialect (reference
    tpcds-modifiedQueries/q42.sql): base q42 at the corpus's Dec-1998
    month with the matching single-month partition band (2451149-2451179)
    on the fact scan."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1998-12-01", "1998-12-31")]))
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 12) & (F.col("d_year") == 1998))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(ds["item"].filter(F.col("i_manager_id") == 1), F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("d_year", "i_category_id", "i_category")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("sum_sales"))
        .orderBy(F.desc("sum_sales"), "d_year", "i_category_id", "i_category")
        .limit(100)
    )


Q52M_ORACLE = f"""
WITH {DS_CTES}
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       round(sum(ss_ext_sales_price), 4) AS ext_price
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manager_id = 1 AND d_moy = 12 AND d_year = 1998
  AND {_band_sql("ss_sold_date_sk", [("1998-12-01", "1998-12-31")])}
GROUP BY d_year, i_brand, i_brand_id
ORDER BY d_year, ext_price DESC, brand_id
LIMIT 100
"""


@register("tpcds_q52m", Q52M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q52m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q52, modified dialect (reference
    tpcds-modifiedQueries/q52.sql): base q52 at Dec 1998 with the
    matching single-month partition band — the corpus's comment calls it
    out as "added for partition pruning"."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1998-12-01", "1998-12-31")]))
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 12) & (F.col("d_year") == 1998))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(ds["item"].filter(F.col("i_manager_id") == 1), F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("d_year", "i_brand", "i_brand_id")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("ext_price"))
        .select("d_year", F.col("i_brand_id").alias("brand_id"), F.col("i_brand").alias("brand"), "ext_price")
        .orderBy("d_year", F.desc("ext_price"), "brand_id")
        .limit(100)
    )

# ---------------------------------------------------------------------------
# q43m — day-of-week pivot, full-year band
# ---------------------------------------------------------------------------

Q43M_ORACLE = f"""
WITH {DS_CTES}
SELECT s_store_name, s_store_sk,
       round(sum(CASE WHEN d_dow = 0 THEN ss_sales_price END), 4) AS sun_sales,
       round(sum(CASE WHEN d_dow = 1 THEN ss_sales_price END), 4) AS mon_sales,
       round(sum(CASE WHEN d_dow = 2 THEN ss_sales_price END), 4) AS tue_sales,
       round(sum(CASE WHEN d_dow = 3 THEN ss_sales_price END), 4) AS wed_sales,
       round(sum(CASE WHEN d_dow = 4 THEN ss_sales_price END), 4) AS thu_sales,
       round(sum(CASE WHEN d_dow = 5 THEN ss_sales_price END), 4) AS fri_sales,
       round(sum(CASE WHEN d_dow = 6 THEN ss_sales_price END), 4) AS sat_sales
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN store ON ss_store_sk = s_store_sk
WHERE d_year = 2000
  AND {_band_sql("ss_sold_date_sk", [("2000-01-01", "2000-12-31")])}
GROUP BY s_store_name, s_store_sk
ORDER BY s_store_name, s_store_sk
LIMIT 100
"""


@register("tpcds_q43m", Q43M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q43m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q43, modified dialect (reference
    tpcds-modifiedQueries/q43.sql): base q43's seven conditional-sum
    day-of-week pivot with the corpus's full-year partition band
    (2450816-2451179) on the fact scan."""
    ds = _ds(spark, sf_dir)
    days = [("sun", 0), ("mon", 1), ("tue", 2), ("wed", 3), ("thu", 4), ("fri", 5), ("sat", 6)]
    aggs = [
        F.round(F.sum(F.when(F.col("d_dow") == dw, F.col("ss_sales_price"))), 4).alias(f"{nm}_sales")
        for nm, dw in days
    ]
    return (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("2000-01-01", "2000-12-31")]))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 2000)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("s_store_name", "s_store_sk")
        .agg(*aggs)
        .orderBy("s_store_name", "s_store_sk")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q46m — weekend per-ticket totals via a literal partition-day IN-list
# ---------------------------------------------------------------------------

_Q46_DAYS_SQL = ", ".join(f"TIMESTAMP '{d} 00:00:00'" for d in _Q46_DAYS)

Q46M_ORACLE = f"""
WITH {DS_CTES},
dn AS (
  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
         round(sum(ss_coupon_amt), 4) AS amt, round(sum(ss_net_profit), 4) AS profit
  FROM store_sales
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  JOIN customer_address ON ss_addr_sk = ca_address_sk
  WHERE (hd_dep_count = 4 OR hd_vehicle_count = 3) AND year(ss_sold_date_sk) = 1997
    AND ss_sold_date_sk IN ({_Q46_DAYS_SQL})
  GROUP BY ss_ticket_number, ss_customer_sk, ca_city)
SELECT c.c_customer_sk, dn.bought_city, dn.ss_ticket_number, dn.amt, dn.profit
FROM dn JOIN customer_dim c ON dn.ss_customer_sk = c.c_customer_sk
        JOIN customer_address cur ON c.c_current_addr_sk = cur.ca_address_sk
WHERE cur.ca_city <> dn.bought_city
ORDER BY c.c_customer_sk, dn.ss_ticket_number
LIMIT 100
"""


@register("tpcds_q46m", Q46M_ORACLE, tags=("tpcds", "modified", "join"))
def tpcds_q46m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46, modified dialect (reference
    tpcds-modifiedQueries/q46.sql): the corpus expresses q46's weekend
    filter (d_dow in (6,0)) as a literal IN-list of ~300 individual
    partition days. Here the weekend days of 1997 H1 are generated from
    the calendar into literal timestamps carried by BOTH engines — an
    in-set predicate the parquet scan can evaluate without any dim join,
    the corpus's partition-pruning point taken to its extreme."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter((F.col("hd_dep_count") == 4) | (F.col("hd_vehicle_count") == 3))
    sale_ca = ds["customer_address"].select(
        F.col("ca_address_sk").alias("sale_addr"), F.col("ca_city").alias("bought_city")
    )
    day_lits = [_dt.datetime.fromisoformat(d + "T00:00:00") for d in _Q46_DAYS]
    dn = (
        ds["store_sales"]
        .filter((F.year("ss_sold_date_sk") == 1997) & F.col("ss_sold_date_sk").isin(day_lits))
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .join(sale_ca, F.col("ss_addr_sk") == F.col("sale_addr"))
        .groupBy("ss_ticket_number", "ss_customer_sk", "bought_city")
        .agg(F.round(F.sum("ss_coupon_amt"), 4).alias("amt"), F.round(F.sum("ss_net_profit"), 4).alias("profit"))
    )
    cur = ds["customer_address"].select(
        F.col("ca_address_sk").alias("cur_addr"), F.col("ca_city").alias("cur_city")
    )
    return (
        dn.join(ds["customer_dim"].select("c_customer_sk", "c_current_addr_sk"), F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .join(cur, F.col("c_current_addr_sk") == F.col("cur_addr"))
        .filter(F.col("cur_city") != F.col("bought_city"))
        .select("c_customer_sk", "bought_city", "ss_ticket_number", "amt", "profit")
        .orderBy("c_customer_sk", "ss_ticket_number")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q53m — quarterly deviation window, twelve-month band
# ---------------------------------------------------------------------------

Q53M_ORACLE = f"""
WITH {DS_CTES},
tmp1 AS (
  SELECT i_manufact_id, d_qoy,
         sum(ss_sales_price) AS sum_sales_raw,
         avg(sum(ss_sales_price)) OVER (PARTITION BY i_manufact_id) AS avg_raw
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
                   JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
  WHERE d_month_seq IN (37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48)
    AND {_band_sql("ss_sold_date_sk", [("1995-01-01", "1995-12-31")])}
    AND ((i_category IN ('Sports', 'Books') AND i_class IN ('ECONOMY', 'PROMO', 'STANDARD')
          AND i_brand IN ('Brand#3', 'Brand#7', 'Brand#9', 'Brand#14'))
      OR (i_category IN ('Music', 'Shoes') AND i_class IN ('LARGE', 'MEDIUM', 'SMALL')
          AND i_brand IN ('Brand#16', 'Brand#21', 'Brand#23', 'Brand#25')))
  GROUP BY i_manufact_id, d_qoy)
SELECT i_manufact_id,
       round(sum_sales_raw, 4) AS sum_sales,
       round(avg_raw, 6) AS avg_quarterly_sales
FROM tmp1
WHERE CASE WHEN avg_raw > 0 THEN abs(sum_sales_raw - avg_raw) / avg_raw ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
LIMIT 100
"""


@register("tpcds_q53m", Q53M_ORACLE, tags=("tpcds", "modified", "window"))
def tpcds_q53m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53, modified dialect (reference
    tpcds-modifiedQueries/q53.sql): base q53's aggregate-then-window
    deviation filter with the corpus's twelve-month partition band
    (2451911-2452275) retargeted to the base's d_month_seq 37-48 window
    (= calendar 1995)."""
    ds = _ds(spark, sf_dir)
    it = ds["item"].filter(
        (
            F.col("i_category").isin("Sports", "Books")
            & F.col("i_class").isin("ECONOMY", "PROMO", "STANDARD")
            & F.col("i_brand").isin("Brand#3", "Brand#7", "Brand#9", "Brand#14")
        )
        | (
            F.col("i_category").isin("Music", "Shoes")
            & F.col("i_class").isin("LARGE", "MEDIUM", "SMALL")
            & F.col("i_brand").isin("Brand#16", "Brand#21", "Brand#23", "Brand#25")
        )
    )
    dd = ds["date_dim"].filter(F.col("d_month_seq").isin(*range(37, 49)))
    grouped = (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1995-01-01", "1995-12-31")]))
        .join(it, F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("i_manufact_id", "d_qoy")
        .agg(F.sum("ss_sales_price").alias("_sum"))
    )
    w = W.partitionBy("i_manufact_id")
    withavg = grouped.select("i_manufact_id", "_sum", F.avg("_sum").over(w).alias("_avg"))
    return (
        withavg.filter(
            F.when(F.col("_avg") > 0, F.abs(F.col("_sum") - F.col("_avg")) / F.col("_avg")).otherwise(F.lit(None)) > 0.1
        )
        .select(
            "i_manufact_id",
            F.round("_sum", 4).alias("sum_sales"),
            F.round("_avg", 6).alias("avg_quarterly_sales"),
        )
        .orderBy("avg_quarterly_sales", "sum_sales", "i_manufact_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q55m — brand revenue for one manager-month, one-month band
# ---------------------------------------------------------------------------

Q55M_ORACLE = f"""
WITH {DS_CTES}
SELECT i_brand_id AS brand_id, i_brand AS brand,
       round(sum(ss_ext_sales_price), 4) AS ext_price
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manager_id = 38 AND d_moy = 11 AND d_year = 1999
  AND {_band_sql("ss_sold_date_sk", [("1999-11-01", "1999-11-30")])}
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC, brand_id
LIMIT 100
"""


@register("tpcds_q55m", Q55M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q55m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q55, modified dialect (reference
    tpcds-modifiedQueries/q55.sql): base q55 with the corpus's manager 48
    retargeted into the derived 0..39 domain (38) and its one-month
    partition band (2452215-2452244 = Nov) on the fact scan."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1999-11-01", "1999-11-30")]))
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 11) & (F.col("d_year") == 1999))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(ds["item"].filter(F.col("i_manager_id") == 38), F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("i_brand", "i_brand_id")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("ext_price"))
        .select(F.col("i_brand_id").alias("brand_id"), F.col("i_brand").alias("brand"), "ext_price")
        .orderBy(F.desc("ext_price"), "brand_id")
        .limit(100)
    )

# ---------------------------------------------------------------------------
# q59m — year-over-year weekly dow ratios, with the dialect's self-ratio
# ---------------------------------------------------------------------------

from sol_spark.queries.tpcds import _Q59_W1, _Q59_W2

Q59M_ORACLE = f"""
WITH {DS_CTES},
wss AS (
  SELECT d_week_seq, ss_store_sk,
         round(sum(CASE WHEN d_dow = 0 THEN ss_sales_price END), 4) AS sun_sales,
         round(sum(CASE WHEN d_dow = 1 THEN ss_sales_price END), 4) AS mon_sales,
         round(sum(CASE WHEN d_dow = 2 THEN ss_sales_price END), 4) AS tue_sales,
         round(sum(CASE WHEN d_dow = 3 THEN ss_sales_price END), 4) AS wed_sales,
         round(sum(CASE WHEN d_dow = 5 THEN ss_sales_price END), 4) AS fri_sales
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  GROUP BY d_week_seq, ss_store_sk),
y AS (SELECT s_store_name, wss.d_week_seq, ss_store_sk,
             sun_sales, mon_sales, tue_sales, wed_sales, fri_sales
      FROM wss JOIN store ON ss_store_sk = s_store_sk
      WHERE d_week_seq BETWEEN {_Q59_W1} AND {_Q59_W1 + 51}),
x AS (SELECT ss_store_sk, d_week_seq,
             sun_sales, mon_sales, wed_sales, fri_sales
      FROM wss
      WHERE d_week_seq BETWEEN {_Q59_W2} AND {_Q59_W2 + 51})
SELECT y.s_store_name, y.d_week_seq,
       round(y.sun_sales / x.sun_sales, 6) AS sun_ratio,
       round(y.mon_sales / x.mon_sales, 6) AS mon_ratio,
       round(y.tue_sales / y.tue_sales, 6) AS tue_ratio,
       round(y.wed_sales / x.wed_sales, 6) AS wed_ratio,
       round(y.fri_sales / x.fri_sales, 6) AS fri_ratio
FROM y JOIN x ON y.ss_store_sk = x.ss_store_sk
            AND y.d_week_seq = x.d_week_seq + 52
ORDER BY y.s_store_name, y.d_week_seq
LIMIT 100
"""


@register("tpcds_q59m", Q59M_ORACLE, tags=("tpcds", "modified", "join"))
def tpcds_q59m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59, modified dialect (reference
    tpcds-modifiedQueries/q59.sql): base q59's pivot-once/self-join-at-52
    shape, PLUS the reference file's own quirk — its select list computes
    `tue_sales1 / tue_sales1` (current year over ITSELF, line 29), so the
    Tuesday ratio is 1 wherever the store traded a Tuesday and NULL
    otherwise. Preserved verbatim: this corpus tests dialect fidelity, and
    the quirk exercises the null-propagation path the other columns
    can't."""
    ds = _ds(spark, sf_dir)
    days = [("sun", 0), ("mon", 1), ("tue", 2), ("wed", 3), ("fri", 5)]
    wss = (
        ds["store_sales"]
        .join(F.broadcast(ds["date_dim"]), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .groupBy("d_week_seq", "ss_store_sk")
        .agg(
            *[
                F.round(F.sum(F.when(F.col("d_dow") == dw, F.col("ss_sales_price"))), 4).alias(f"{nm}_sales")
                for nm, dw in days
            ]
        )
    )
    y = (
        wss.filter(F.col("d_week_seq").between(_Q59_W1, _Q59_W1 + 51))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .select("s_store_name", "ss_store_sk", "d_week_seq", *[f"{nm}_sales" for nm, _ in days])
    )
    x = wss.filter(F.col("d_week_seq").between(_Q59_W2, _Q59_W2 + 51)).select(
        F.col("ss_store_sk").alias("x_store_sk"),
        F.col("d_week_seq").alias("x_week_seq"),
        *[F.col(f"{nm}_sales").alias(f"x_{nm}") for nm, _ in days if nm != "tue"],
    )
    return (
        y.join(
            x,
            (F.col("ss_store_sk") == F.col("x_store_sk"))
            & (F.col("d_week_seq") == F.col("x_week_seq") + 52),
        )
        .select(
            "s_store_name",
            "d_week_seq",
            F.round(F.col("sun_sales") / F.col("x_sun"), 6).alias("sun_ratio"),
            F.round(F.col("mon_sales") / F.col("x_mon"), 6).alias("mon_ratio"),
            F.round(F.col("tue_sales") / F.col("tue_sales"), 6).alias("tue_ratio"),
            F.round(F.col("wed_sales") / F.col("x_wed"), 6).alias("wed_ratio"),
            F.round(F.col("fri_sales") / F.col("x_fri"), 6).alias("fri_ratio"),
        )
        .orderBy("s_store_name", "d_week_seq")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q63m — monthly manager deviation (integer-unit), year band
# ---------------------------------------------------------------------------

Q63M_ORACLE = f"""
WITH {DS_CTES},
v1 AS (
  SELECT i_manager_id, month(ss_sold_date_sk) AS d_moy,
         sum(CAST(round(ss_sales_price * 10000) AS BIGINT)) AS sum_units
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  WHERE year(ss_sold_date_sk) = 1997 AND i_category IN ('Books', 'Music')
    AND {_band_sql("ss_sold_date_sk", [("1997-01-01", "1997-12-31")])}
  GROUP BY i_manager_id, month(ss_sold_date_sk)),
v2 AS (
  SELECT i_manager_id, d_moy, sum_units,
         sum(sum_units) OVER (PARTITION BY i_manager_id) AS tot_units,
         count(*) OVER (PARTITION BY i_manager_id) AS n_months
  FROM v1)
SELECT i_manager_id, d_moy, sum_units / 10000.0 AS sum_sales,
       ((2 * tot_units + n_months) // (2 * n_months)) / 10000.0 AS avg_monthly_sales
FROM v2
WHERE tot_units > 0
  AND abs(10 * n_months * sum_units - 10 * tot_units) > tot_units
ORDER BY i_manager_id, d_moy
LIMIT 100
"""


@register("tpcds_q63m", Q63M_ORACLE, tags=("tpcds", "modified", "window"))
def tpcds_q63m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q63, modified dialect (reference
    tpcds-modifiedQueries/q63.sql): base q63's exact-integer deviation
    window (the q47/q57 BIGINT ten-thousandths discipline) with the
    corpus's twelve-month partition band on the fact scan — here the band
    IS the year filter pushed to the parquet scan, where base q63's
    year() expression cannot prune row groups by min/max stats."""
    ds = _ds(spark, sf_dir)
    items = ds["item"].filter(F.col("i_category").isin("Books", "Music")).select("i_item_sk", "i_manager_id")
    v1 = (
        ds["store_sales"]
        .filter(
            (F.year("ss_sold_date_sk") == 1997)
            & _band_spark("ss_sold_date_sk", [("1997-01-01", "1997-12-31")])
        )
        .join(items, F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("i_manager_id", F.month("ss_sold_date_sk").alias("d_moy"))
        .agg(F.sum(F.round(F.col("ss_sales_price") * 10000).cast("bigint")).alias("sum_units"))
    )
    w = W.partitionBy("i_manager_id")
    return (
        v1.withColumn("tot_units", F.sum("sum_units").over(w))
        .withColumn("n_months", F.count(F.lit(1)).over(w))
        .filter(
            (F.col("tot_units") > 0)
            & (F.abs(10 * F.col("n_months") * F.col("sum_units") - 10 * F.col("tot_units")) > F.col("tot_units"))
        )
        .select(
            "i_manager_id", "d_moy",
            (F.col("sum_units") / 10000.0).alias("sum_sales"),
            (F.expr("(2 * tot_units + n_months) div (2 * n_months)") / 10000.0).alias("avg_monthly_sales"),
        )
        .orderBy("i_manager_id", "d_moy")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q65m — low-revenue items per store, year band
# ---------------------------------------------------------------------------

Q65M_ORACLE = f"""
WITH {DS_CTES},
rev AS (
  SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue_raw
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE d_month_seq BETWEEN 37 AND 48
    AND {_band_sql("ss_sold_date_sk", [("1995-01-01", "1995-12-31")])}
  GROUP BY ss_store_sk, ss_item_sk),
ave AS (
  SELECT ss_store_sk, avg(revenue_raw) AS ave FROM rev GROUP BY ss_store_sk)
SELECT s_store_name, i_item_desc, round(r.revenue_raw, 4) AS revenue,
       i_current_price, i_brand
FROM rev r JOIN ave a ON r.ss_store_sk = a.ss_store_sk
           JOIN store ON s_store_sk = r.ss_store_sk
           JOIN item ON i_item_sk = r.ss_item_sk
WHERE r.revenue_raw <= 0.1 * a.ave
ORDER BY s_store_name, i_item_desc, i_brand, revenue
LIMIT 100
"""


@register("tpcds_q65m", Q65M_ORACLE, tags=("tpcds", "modified", "join"))
def tpcds_q65m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65, modified dialect (reference
    tpcds-modifiedQueries/q65.sql): the corpus keeps q65's text-level
    DOUBLE-computation of the (store, item) revenue subquery (once under
    the average, once joined back). Here, as in base q65, it is ONE
    aggregate with the per-store average as a window — but the corpus's
    partition band is added to the fact scan, pruning BOTH textual scans
    at once (they are the same scan in this formulation; the reference's
    ReuseExchange only approximates that)."""
    ds = _ds(spark, sf_dir)
    rev = (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1995-01-01", "1995-12-31")]))
        .join(
            F.broadcast(ds["date_dim"].filter(F.col("d_month_seq").between(37, 48))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .groupBy("ss_store_sk", "ss_item_sk")
        .agg(F.sum("ss_sales_price").alias("revenue_raw"))
    )
    w = W.partitionBy("ss_store_sk")
    flagged = rev.withColumn("ave", F.avg("revenue_raw").over(w)).filter(
        F.col("revenue_raw") <= 0.1 * F.col("ave")
    )
    return (
        flagged.join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .select(
            "s_store_name",
            "i_item_desc",
            F.round("revenue_raw", 4).alias("revenue"),
            "i_current_price",
            "i_brand",
        )
        .orderBy("s_store_name", "i_item_desc", "i_brand", "revenue")
        .limit(100)
    )

# ---------------------------------------------------------------------------
# q68m — moved-city ticket totals, trimmed city pair, narrow dom band
# ---------------------------------------------------------------------------

Q68M_ORACLE = f"""
WITH {DS_CTES},
dn AS (
  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
         round(sum(ss_ext_sales_price), 4) AS extended_price,
         round(sum(ss_ext_list_price), 4) AS list_price,
         round(sum(ss_ext_tax), 4) AS extended_tax
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
                   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
                   JOIN customer_address ON ss_addr_sk = ca_address_sk
  WHERE d_dom BETWEEN 1 AND 2
    AND (hd_dep_count = 5 OR hd_vehicle_count = 3)
    AND d_year IN (1999, 2000, 2001)
    AND s_city IN ('NATION_9_0', 'NATION_17_1')
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city)
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       extended_price, extended_tax, list_price
FROM dn JOIN customer_dim ON ss_customer_sk = c_customer_sk
        JOIN customer_address ON c_current_addr_sk = ca_address_sk
WHERE ca_city <> bought_city
ORDER BY c_last_name, ss_ticket_number
LIMIT 100
"""


@register("tpcds_q68m", Q68M_ORACLE, tags=("tpcds", "modified", "join"))
def tpcds_q68m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q68, modified dialect (reference
    tpcds-modifiedQueries/q68.sql): base q68 with the corpus's deltas —
    the city list trimmed to a pair ('Midway','Fairview' → the first two
    derived nation-cities), d_dom narrowed to 1-2, and hd_dep_count 5
    (the file's value; base uses 4). Its partition filter is COMMENTED
    OUT in the reference file ("changed to match exact same partitions"),
    so none is added here either — fidelity includes the absence."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter((F.col("hd_dep_count") == 5) | (F.col("hd_vehicle_count") == 3))
    st = ds["store"].filter(F.col("s_city").isin("NATION_9_0", "NATION_17_1"))
    dn = (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter(F.col("d_dom").between(1, 2) & F.col("d_year").isin(1999, 2000, 2001))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(F.broadcast(st), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .join(ds["customer_address"], F.col("ss_addr_sk") == F.col("ca_address_sk"))
        .groupBy("ss_ticket_number", "ss_customer_sk", "ss_addr_sk", "ca_city")
        .agg(
            F.round(F.sum("ss_ext_sales_price"), 4).alias("extended_price"),
            F.round(F.sum("ss_ext_list_price"), 4).alias("list_price"),
            F.round(F.sum("ss_ext_tax"), 4).alias("extended_tax"),
        )
        .select("ss_ticket_number", "ss_customer_sk", F.col("ca_city").alias("bought_city"), "extended_price", "list_price", "extended_tax")
    )
    return (
        dn.join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .join(ds["customer_address"], F.col("c_current_addr_sk") == F.col("ca_address_sk"))
        .filter(F.col("ca_city") != F.col("bought_city"))
        .select(
            "c_last_name", "c_first_name", "ca_city", "bought_city", "ss_ticket_number",
            "extended_price", "extended_tax", "list_price",
        )
        .orderBy("c_last_name", "ss_ticket_number")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q73m — small-basket ticket counts, income-band disjunction
# ---------------------------------------------------------------------------

Q73M_ORACLE = f"""
WITH {DS_CTES},
dj AS (
  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
                   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  WHERE d_dom BETWEEN 1 AND 2
    AND (hd_income_band_sk >= 15 OR hd_income_band_sk = 0)
    AND hd_vehicle_count > 0
    AND CASE WHEN hd_vehicle_count > 0 THEN hd_dep_count / hd_vehicle_count ELSE NULL END > 1
    AND d_year IN (1998, 1999, 2000)
    AND s_state IN ('ST_0', 'ST_1', 'ST_2', 'ST_3')
  GROUP BY ss_ticket_number, ss_customer_sk)
SELECT c_last_name, c_first_name, ss_ticket_number, cnt
FROM dj JOIN customer_dim ON ss_customer_sk = c_customer_sk
WHERE cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, ss_ticket_number
"""


@register("tpcds_q73m", Q73M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q73m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q73, modified dialect (reference
    tpcds-modifiedQueries/q73.sql): the corpus's buy-potential
    disjunction ('>10000' OR 'Unknown') mapped onto the derived
    income-band attribute (top quartile OR unknown-coded band 0 — the
    derived demographics has no buy_potential), over the file's 1998-2000
    year triple. The dialect's bare `ORDER BY cnt DESC` is completed with
    the ticket tiebreak both engines share (our lead/lag total-order
    discipline); like the reference file, no LIMIT."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter(
        ((F.col("hd_income_band_sk") >= 15) | (F.col("hd_income_band_sk") == 0))
        & (F.col("hd_vehicle_count") > 0)
        & (
            F.when(F.col("hd_vehicle_count") > 0, F.col("hd_dep_count") / F.col("hd_vehicle_count")).otherwise(F.lit(None))
            > 1
        )
    )
    dj = (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter(F.col("d_dom").between(1, 2) & F.col("d_year").isin(1998, 1999, 2000))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(F.broadcast(ds["store"].filter(F.col("s_state").isin("ST_0", "ST_1", "ST_2", "ST_3"))), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .groupBy("ss_ticket_number", "ss_customer_sk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(1, 5))
    )
    return (
        dj.join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .select("c_last_name", "c_first_name", "ss_ticket_number", "cnt")
        .orderBy(F.desc("cnt"), "ss_ticket_number")
    )


# ---------------------------------------------------------------------------
# q79m — Monday shoppers, widened vehicle slice, top-100
# ---------------------------------------------------------------------------

Q79M_ORACLE = f"""
WITH {DS_CTES},
ms AS (
  SELECT ss_ticket_number, ss_customer_sk, s_city,
         round(sum(ss_coupon_amt), 4) AS amt,
         round(sum(ss_net_profit), 4) AS profit
  FROM store_sales
  JOIN date_dim ON ss_sold_date_sk = d_date_sk
  JOIN store ON ss_store_sk = s_store_sk
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  WHERE (hd_dep_count = 8 OR hd_vehicle_count > 0)
    AND d_dow = 1 AND d_year BETWEEN 1998 AND 2000
  GROUP BY ss_ticket_number, ss_customer_sk, s_city)
SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS city,
       ss_ticket_number, amt, profit
FROM ms
JOIN customer_dim ON ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, city, profit, ss_ticket_number
LIMIT 100
"""


@register("tpcds_q79m", Q79M_ORACLE, tags=("tpcds", "modified", "agg"))
def tpcds_q79m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q79, modified dialect (reference
    tpcds-modifiedQueries/q79.sql): base q79 with the corpus's widened
    household slice (`hd_vehicle_count > 0` — the file's literal, vs the
    base's > 3) and its added LIMIT 100 under the profit-bearing order.
    The ticket tiebreak keeps the top-100 deterministic, as in base."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter((F.col("d_dow") == 1) & F.col("d_year").between(1998, 2000))
    hd = ds["household_demographics"].filter(
        (F.col("hd_dep_count") == 8) | (F.col("hd_vehicle_count") > 0)
    )
    ms = (
        ds["store_sales"]
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .groupBy("ss_ticket_number", "ss_customer_sk", "s_city")
        .agg(
            F.round(F.sum("ss_coupon_amt"), 4).alias("amt"),
            F.round(F.sum("ss_net_profit"), 4).alias("profit"),
        )
    )
    return (
        ms.join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .select(
            "c_last_name",
            "c_first_name",
            F.substring("s_city", 1, 30).alias("city"),
            "ss_ticket_number",
            "amt",
            "profit",
        )
        .orderBy("c_last_name", "c_first_name", "city", "profit", "ss_ticket_number")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q89m — monthly brand/store deviation, year band
# ---------------------------------------------------------------------------

Q89M_ORACLE = f"""
WITH {DS_CTES},
tmp1 AS (
  SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
         sum(ss_sales_price) AS sum_sales_raw,
         avg(sum(ss_sales_price)) OVER
           (PARTITION BY i_category, i_brand, s_store_name, s_company_name) AS avg_raw
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
                   JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
  WHERE d_year = 1999
    AND {_band_sql("ss_sold_date_sk", [("1999-01-01", "1999-12-31")])}
    AND ((i_category IN ('Books', 'Home', 'Sports') AND i_class IN ('ECONOMY', 'STANDARD', 'PROMO'))
      OR (i_category IN ('Music', 'Shoes') AND i_class IN ('SMALL', 'LARGE')))
  GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name, d_moy)
SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
       round(sum_sales_raw, 4) AS sum_sales,
       round(avg_raw, 6) AS avg_monthly_sales
FROM tmp1
WHERE CASE WHEN avg_raw <> 0 THEN abs(sum_sales_raw - avg_raw) / avg_raw ELSE NULL END > 0.1
ORDER BY sum_sales_raw - avg_raw, s_store_name, i_category, i_class, i_brand, d_moy
LIMIT 100
"""


@register("tpcds_q89m", Q89M_ORACLE, tags=("tpcds", "modified", "window"))
def tpcds_q89m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89, modified dialect (reference
    tpcds-modifiedQueries/q89.sql): base q89 with the corpus's
    twelve-month partition band (2451545-2451910 = calendar 2000,
    retargeted to the base's 1999) on the fact scan ahead of the
    three-dim star join and deviation window."""
    ds = _ds(spark, sf_dir)
    it = ds["item"].filter(
        (
            F.col("i_category").isin("Books", "Home", "Sports")
            & F.col("i_class").isin("ECONOMY", "STANDARD", "PROMO")
        )
        | (F.col("i_category").isin("Music", "Shoes") & F.col("i_class").isin("SMALL", "LARGE"))
    )
    grouped = (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1999-01-01", "1999-12-31")]))
        .join(it, F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 1999)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("i_category", "i_class", "i_brand", "s_store_name", "s_company_name", "d_moy")
        .agg(F.sum("ss_sales_price").alias("_sum"))
    )
    w = W.partitionBy("i_category", "i_brand", "s_store_name", "s_company_name")
    withavg = grouped.select(
        "i_category", "i_class", "i_brand", "s_store_name", "s_company_name", "d_moy",
        "_sum", F.avg("_sum").over(w).alias("_avg"),
    )
    return (
        withavg.filter(
            F.when(F.col("_avg") != 0, F.abs(F.col("_sum") - F.col("_avg")) / F.col("_avg")).otherwise(F.lit(None)) > 0.1
        )
        .select(
            "i_category", "i_class", "i_brand", "s_store_name", "s_company_name", "d_moy",
            F.round("_sum", 4).alias("sum_sales"),
            F.round("_avg", 6).alias("avg_monthly_sales"),
            (F.col("_sum") - F.col("_avg")).alias("_dev"),
        )
        .orderBy("_dev", "s_store_name", "i_category", "i_class", "i_brand", "d_moy")
        .drop("_dev")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q98m — class revenue shares, dual date predicate, no LIMIT
# ---------------------------------------------------------------------------

Q98M_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_desc, i_category, i_class, i_current_price,
       round(sum(ss_ext_sales_price), 4) AS itemrevenue,
       round(sum(ss_ext_sales_price) * 100 / sum(sum(ss_ext_sales_price))
             OVER (PARTITION BY i_class), 6) AS revenueratio
FROM store_sales JOIN item ON ss_item_sk = i_item_sk
                 JOIN date_dim ON ss_sold_date_sk = d_date_sk
WHERE i_category IN ('Music', 'Sports', 'Books')
  AND d_date_sk BETWEEN TIMESTAMP '1997-02-22 00:00:00' AND TIMESTAMP '1997-03-24 00:00:00'
  AND {_band_sql("ss_sold_date_sk", [("1997-02-22", "1997-03-24")])}
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
"""


@register("tpcds_q98m", Q98M_ORACLE, tags=("tpcds", "modified", "window"))
def tpcds_q98m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98, modified dialect (reference
    tpcds-modifiedQueries/q98.sql): base q98 with the corpus's DUAL date
    predicate — the d_date dim filter AND the equivalent literal band
    directly on the fact's ss_sold_date_sk ("partition key filter
    (1 calendar month)"), so the fact scan prunes without waiting for the
    dim join — a different category triple, and the file's commented-out
    LIMIT honored by emitting the full result."""
    ds = _ds(spark, sf_dir)
    grouped = (
        ds["store_sales"]
        .filter(_band_spark("ss_sold_date_sk", [("1997-02-22", "1997-03-24")]))
        .join(
            ds["item"].filter(F.col("i_category").isin("Music", "Sports", "Books")),
            F.col("ss_item_sk") == F.col("i_item_sk"),
        )
        .join(
            F.broadcast(
                ds["date_dim"].filter(
                    F.col("d_date_sk").between(
                        F.lit("1997-02-22").cast("timestamp"), F.lit("1997-03-24").cast("timestamp")
                    )
                )
            ),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .groupBy("i_item_id", "i_item_desc", "i_category", "i_class", "i_current_price")
        .agg(F.sum("ss_ext_sales_price").alias("_rev"))
    )
    w = W.partitionBy("i_class")
    return (
        grouped.select(
            "i_item_id",
            "i_item_desc",
            "i_category",
            "i_class",
            "i_current_price",
            F.round(F.col("_rev"), 4).alias("itemrevenue"),
            F.round(F.col("_rev") * 100 / F.sum("_rev").over(w), 6).alias("revenueratio"),
        )
        .orderBy("i_category", "i_class", "i_item_id", "i_item_desc", "revenueratio")
        .select("i_item_desc", "i_category", "i_class", "i_current_price", "itemrevenue", "revenueratio")
    )
