"""TPC-DS mini-corpus (store_sales star), adapted to the driver fixtures.

The reference ships three full TPC-DS corpora and compiles every plan
(/root/reference/sql/core/src/test/resources/tpcds/q1.sql..q99.sql,
/root/reference/sql/core/src/test/resources/tpcds-v2.7.0/,
/root/reference/sql/core/src/test/scala/org/apache/spark/sql/TPCDSQuerySuite.scala:39-120).
We derive the store_sales star the same way ssb.py derives SSB, run the
FULL 99-query corpus spanning the suite's operator shapes — star joins,
rollup/grouping(), windows over aggregates, disjunctive bands, correlated
subqueries, cross-channel unions/intersects, inventory fact-fact joins,
deviation windows, returns analytics — and hash-match every query against
a DuckDB oracle (COVERAGE.md "Query corpora" has the query-by-shape map).

TPC-DS's schema does not exist in the fixtures, so it is DERIVED
deterministically — identically in the Spark build and the oracle CTEs:
  * store_sales := lineitem ⋈ orders on orderkey. All money columns are
    exact 4-decimal products of fixture data (ext_sales = extprice*(1-disc),
    ext_tax = extprice*tax, coupon = extprice*disc; list price columns reuse
    extprice rather than a per-unit division) so sums round exactly at 4
    under the cross-engine rounding policy (see tpch.py module docstring).
  * date_dim    := distinct o_orderdate with year/moy/dom.
  * item        := part; i_brand_id = brand number (1..25),
    i_category_id = (brandnum-1) div 5 + 1 mapped onto five category names,
    i_manufact_id = (brandnum-1) div 10 + 1, i_manager_id = p_partkey % 40.
  * store       := supplier + nation city (same city rule as ssb.py);
    zips are lpad(key % 97).
  * customer_address := customer + nation city / zip (1:1 with customers).
  * household/customer demographics := distinct c_custkey % 100 / % 60 with
    attributes derived from the sk (dep/vehicle counts, gender/marital/
    education buckets) — every fact-side sk is guaranteed to resolve.
  * promotion   := distinct o_orderkey % 20 with channel flags from the sk.
  * ss_addr_sk  := o_custkey, except every 7th order "bought from" the
    previous customer's address — without this perturbation the sale-time
    and current addresses are identical by construction and q68's
    moved-city filter is vacuously empty.
  * web_sales / catalog_sales (r4) := the store_sales construction over
    DISJOINT order subsets (o_orderkey % 3 = 0 -> web, = 1 -> catalog) with
    channel keys ws_web_page_sk = o_orderkey % 10 and cs_call_center_sk =
    o_custkey % 5; web/catalog_returns mirror store_returns within each
    subset. store_sales keeps ALL tickets, so the pre-r4 oracles are
    untouched and cross-channel unions (q2/q33/q77) are well-defined.
Filter constants are re-targeted to the fixture domains (years 1995-2001,
managers 0..39, manufact 1..3, categories Sports/Books/Home/Music/Shoes).

Scale notes: date_dim (~#days), store (|supplier|), both demographics
(≤100 rows) and promotion (20) are hint-broadcast — bounded cardinality at
any SF. item and customer/customer_address grow with SF, so those joins are
left to AQE (broadcast when small, shuffle-hash beyond); at 100 TB the
customer joins become the only fact-side shuffles, exactly as stock TPC-DS
plans them. Every query is one pass over the derived fact.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from sol_spark.registry import register
from sol_spark.tables import load_tables

# Per-(session, sf_dir) derived-star cache; see _ds's docstring. Weakly
# keyed on the session object so entries die with their session (the
# load_tables discipline — id() reuse after GC could hand a new session
# plans bound to a dead JVM).
_DS_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)

# ---------------------------------------------------------------------------
# Shared derived-star CTEs (DuckDB dialect; `//` = integer division)
# ---------------------------------------------------------------------------

DS_CTES = """
date_dim AS (
  SELECT DISTINCT o_orderdate AS d_date_sk,
         year(o_orderdate) AS d_year,
         month(o_orderdate) AS d_moy,
         day(o_orderdate) AS d_dom,
         (year(o_orderdate) - 1992) * 12 + month(o_orderdate) AS d_month_seq,
         quarter(o_orderdate) AS d_qoy,
         dayofweek(o_orderdate) AS d_dow,
         (o_orderdate::DATE - DATE '1992-01-01') // 7 AS d_week_seq
  FROM orders),
time_dim AS (
  SELECT DISTINCT (l_orderkey * 131 + l_partkey) % 86400 AS t_time_sk,
         ((l_orderkey * 131 + l_partkey) % 86400) // 3600 AS t_hour,
         (((l_orderkey * 131 + l_partkey) % 86400) % 3600) // 60 AS t_minute
  FROM lineitem),
item AS (
  SELECT p_partkey AS i_item_sk,
         'ITEM_' || p_partkey AS i_item_id,
         p_name AS i_item_desc,
         p_brand AS i_brand,
         CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
         p_type AS i_class,
         (CAST(substr(p_brand, 7) AS INT) - 1) // 5 + 1 AS i_category_id,
         CASE (CAST(substr(p_brand, 7) AS INT) - 1) // 5 + 1
           WHEN 1 THEN 'Sports' WHEN 2 THEN 'Books' WHEN 3 THEN 'Home'
           WHEN 4 THEN 'Music' ELSE 'Shoes' END AS i_category,
         (CAST(substr(p_brand, 7) AS INT) - 1) // 10 + 1 AS i_manufact_id,
         'MFGR#' || ((CAST(substr(p_brand, 7) AS INT) - 1) // 10 + 1) AS i_manufact,
         p_partkey % 40 AS i_manager_id,
         p_retailprice AS i_current_price
  FROM part),
store AS (
  SELECT s_suppkey AS s_store_sk,
         n_name || '_' || (s_suppkey % 10) AS s_city,
         lpad(CAST(s_suppkey % 97 AS VARCHAR), 5, '0') AS s_zip,
         'ST_' || (s_nationkey % 7) AS s_state,
         'Store_' || s_suppkey AS s_store_name,
         'Company_' || (s_suppkey % 3) AS s_company_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
customer_address AS (
  SELECT c_custkey AS ca_address_sk,
         n_name || '_' || (c_custkey % 10) AS ca_city,
         lpad(CAST(c_custkey % 97 AS VARCHAR), 5, '0') AS ca_zip,
         'ST_' || (c_nationkey % 7) AS ca_state
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
customer_dim AS (
  SELECT c_custkey AS c_customer_sk,
         substr(c_name, 1, 8) AS c_first_name,
         substr(c_name, 10) AS c_last_name,
         c_custkey AS c_current_addr_sk
  FROM customer),
household_demographics AS (
  SELECT DISTINCT c_custkey % 100 AS hd_demo_sk,
         (c_custkey % 100) % 10 AS hd_dep_count,
         (c_custkey % 100) % 5 AS hd_vehicle_count,
         (c_custkey % 100) % 20 AS hd_income_band_sk
  FROM customer),
income_band AS (
  SELECT DISTINCT (c_custkey % 100) % 20 AS ib_income_band_sk,
         ((c_custkey % 100) % 20) * 5000 AS ib_lower_bound,
         ((c_custkey % 100) % 20) * 5000 + 4999 AS ib_upper_bound
  FROM customer),
customer_demographics AS (
  SELECT DISTINCT c_custkey % 60 AS cd_demo_sk,
         CASE WHEN (c_custkey % 60) % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE (c_custkey % 60) % 3 WHEN 0 THEN 'S' WHEN 1 THEN 'M' ELSE 'D' END AS cd_marital_status,
         CASE (c_custkey % 60) % 4 WHEN 0 THEN 'College' WHEN 1 THEN 'Primary'
           WHEN 2 THEN 'Secondary' ELSE 'Advanced Degree' END AS cd_education_status
  FROM customer),
promotion AS (
  SELECT DISTINCT o_orderkey % 20 AS p_promo_sk,
         CASE WHEN (o_orderkey % 20) % 2 = 0 THEN 'N' ELSE 'Y' END AS p_channel_email,
         CASE WHEN (o_orderkey % 20) % 3 = 0 THEN 'N' ELSE 'Y' END AS p_channel_event
  FROM orders),
warehouse AS (
  SELECT DISTINCT s_suppkey % 6 AS w_warehouse_sk,
         'WH_' || (s_suppkey % 6) AS w_warehouse_name,
         'WST_' || ((s_suppkey % 6) % 3) AS w_state
  FROM supplier),
ship_mode AS (
  SELECT DISTINCT (l_orderkey + l_linenumber) % 4 AS sm_ship_mode_sk,
         CASE (l_orderkey + l_linenumber) % 4
           WHEN 0 THEN 'AIR' WHEN 1 THEN 'TRUCK' WHEN 2 THEN 'MAIL' ELSE 'SHIP' END AS sm_type
  FROM lineitem),
reason AS (
  SELECT DISTINCT (l_orderkey * 7 + l_linenumber) % 5 AS r_reason_sk,
         'Reason_' || ((l_orderkey * 7 + l_linenumber) % 5) AS r_reason_desc
  FROM lineitem),
call_center AS (
  SELECT DISTINCT o_custkey % 5 AS cc_call_center_sk,
         'CC_' || (o_custkey % 5) AS cc_name,
         'Manager_' || ((o_custkey % 5) % 3) AS cc_manager
  FROM orders),
inventory AS (
  SELECT DISTINCT l_shipdate AS inv_date_sk,
         l_partkey AS inv_item_sk,
         l_suppkey % 6 AS inv_warehouse_sk,
         (l_partkey * 31 + (l_suppkey % 6) * 7 + day(l_shipdate) * 11) % 1000 AS inv_quantity_on_hand
  FROM lineitem),
store_sales AS (
  SELECT l_orderkey AS ss_ticket_number,
         l_linenumber AS ss_line_number,
         o_orderdate AS ss_sold_date_sk,
         l_partkey AS ss_item_sk,
         o_custkey AS ss_customer_sk,
         l_suppkey AS ss_store_sk,
         o_custkey % 60 AS ss_cdemo_sk,
         o_custkey % 100 AS ss_hdemo_sk,
         CASE WHEN o_orderkey % 7 = 0 AND o_custkey > 1
              THEN o_custkey - 1 ELSE o_custkey END AS ss_addr_sk,
         (l_orderkey * 131 + l_partkey) % 86400 AS ss_sold_time_sk,
         l_orderkey % 20 AS ss_promo_sk,
         l_quantity AS ss_quantity,
         l_extendedprice AS ss_list_price,
         l_extendedprice * (1 - l_discount) AS ss_sales_price,
         l_extendedprice * l_discount AS ss_coupon_amt,
         l_extendedprice * (1 - l_discount) AS ss_ext_sales_price,
         l_extendedprice AS ss_ext_list_price,
         l_extendedprice * l_tax AS ss_ext_tax,
         l_extendedprice * (0.5 - l_discount) AS ss_net_profit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
store_returns AS (
  SELECT l_orderkey AS sr_ticket_number,
         l_partkey AS sr_item_sk,
         l_linenumber AS sr_line_number,
         o_custkey AS sr_customer_sk,
         l_suppkey AS sr_store_sk,
         l_shipdate AS sr_returned_date_sk,
         (l_orderkey * 7 + l_linenumber) % 5 AS sr_reason_sk,
         l_quantity AS sr_return_quantity,
         l_extendedprice * (1 - l_discount) AS sr_return_amt,
         l_extendedprice * l_tax AS sr_return_tax
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'),
web_sales AS (
  SELECT o_orderdate AS ws_sold_date_sk,
         l_partkey AS ws_item_sk,
         o_custkey AS ws_bill_customer_sk,
         o_custkey AS ws_bill_addr_sk,
         o_orderkey % 10 AS ws_web_page_sk,
         l_suppkey % 6 AS ws_warehouse_sk,
         l_shipdate AS ws_ship_date_sk,
         (l_orderkey + l_linenumber) % 4 AS ws_ship_mode_sk,
         (l_orderkey * 131 + l_partkey) % 86400 AS ws_sold_time_sk,
         l_extendedprice * l_discount AS ws_ext_discount_amt,
         l_orderkey AS ws_order_number,
         l_quantity AS ws_quantity,
         l_extendedprice * (1 - l_discount) AS ws_ext_sales_price,
         l_extendedprice * (0.5 - l_discount) AS ws_net_profit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey % 3 = 0),
catalog_sales AS (
  SELECT o_orderdate AS cs_sold_date_sk,
         l_partkey AS cs_item_sk,
         o_custkey AS cs_bill_customer_sk,
         o_custkey % 5 AS cs_call_center_sk,
         o_custkey % 100 AS cs_bill_hdemo_sk,
         o_custkey % 60 AS cs_bill_cdemo_sk,
         (l_orderkey * 131 + l_partkey) % 86400 AS cs_sold_time_sk,
         l_extendedprice * l_discount AS cs_ext_discount_amt,
         l_suppkey % 6 AS cs_warehouse_sk,
         l_shipdate AS cs_ship_date_sk,
         (l_orderkey + l_linenumber) % 4 AS cs_ship_mode_sk,
         l_orderkey % 20 AS cs_promo_sk,
         l_orderkey AS cs_order_number,
         l_quantity AS cs_quantity,
         l_extendedprice * (1 - l_discount) AS cs_ext_sales_price,
         l_extendedprice * (0.5 - l_discount) AS cs_net_profit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey % 3 = 1),
web_returns AS (
  SELECT l_shipdate AS wr_returned_date_sk,
         l_partkey AS wr_item_sk,
         o_orderkey % 10 AS wr_web_page_sk,
         l_orderkey AS wr_order_number,
         l_quantity AS wr_return_quantity,
         (l_orderkey * 7 + l_linenumber) % 5 AS wr_reason_sk,
         o_custkey AS wr_returning_customer_sk,
         o_custkey AS wr_returning_addr_sk,
         o_custkey % 60 AS wr_returning_cdemo_sk,
         l_extendedprice * (1 - l_discount) AS wr_return_amt,
         l_extendedprice * l_tax AS wr_net_loss
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey % 3 = 0 AND l_returnflag = 'R'),
catalog_returns AS (
  SELECT l_shipdate AS cr_returned_date_sk,
         l_partkey AS cr_item_sk,
         o_custkey % 5 AS cr_call_center_sk,
         l_orderkey AS cr_order_number,
         l_quantity AS cr_return_quantity,
         o_custkey AS cr_returning_customer_sk,
         o_custkey % 60 AS cr_returning_cdemo_sk,
         o_custkey % 100 AS cr_returning_hdemo_sk,
         l_extendedprice * (1 - l_discount) AS cr_return_amt,
         l_extendedprice * l_tax AS cr_net_loss
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey % 3 = 1 AND l_returnflag = 'R')
"""


def _ds(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build the derived TPC-DS star as DataFrames.

    Bounded-cardinality dims (date_dim, store, demographics, promotion) are
    returned plain but hint-broadcast at the join sites; item/customer dims
    are SF-proportional and left to AQE.

    Cached per (session, sf_dir) exactly like :func:`load_tables`'s catalog
    cache (r12 optimization round, guide §1.2/§5 — the driver should do
    almost no data work): the star is 21 LAZY DataFrames derived through
    several hundred analyzed transformations, which cost ~1.2-1.5 s of pure
    py4j + per-call analysis on EVERY registered-query build — re-derived
    106 times across the TPC-DS corpus with byte-identical plans. Sharing
    immutable lazy plans is a catalog, not result caching: nothing is
    materialized, and every action still scans the parquet fixtures.
    """
    sf_abs = os.path.abspath(sf_dir)
    per_session = _DS_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_abs)
    if cached is None:
        cached = _build_ds(spark, sf_dir)
        per_session[sf_abs] = cached
    # Shallow copy: callers may pop/overwrite dict entries, never mutate the
    # (immutable) DataFrames themselves.
    return dict(cached)


def _build_ds(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    t = load_tables(spark, sf_dir)
    brandnum = F.expr("CAST(substr(p_brand, 7) AS INT)")
    category_id = F.expr("(CAST(substr(p_brand, 7) AS INT) - 1) DIV 5 + 1")
    manufact_id = F.expr("(CAST(substr(p_brand, 7) AS INT) - 1) DIV 10 + 1")
    date_dim = (
        t["orders"]
        .select("o_orderdate")
        .distinct()
        .select(
            F.col("o_orderdate").alias("d_date_sk"),
            F.year("o_orderdate").alias("d_year"),
            F.month("o_orderdate").alias("d_moy"),
            F.dayofmonth("o_orderdate").alias("d_dom"),
            ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate")).alias("d_month_seq"),
            F.quarter("o_orderdate").alias("d_qoy"),
            # DuckDB dayofweek: Sunday = 0; Spark dayofweek: Sunday = 1.
            (F.dayofweek("o_orderdate") - 1).alias("d_dow"),
            F.floor(F.datediff("o_orderdate", F.lit("1992-01-01")) / 7)
            .cast("long")
            .alias("d_week_seq"),
        )
    )
    time_sk = (F.col("l_orderkey") * 131 + F.col("l_partkey")) % 86400
    time_dim = (
        t["lineitem"]
        .select(
            time_sk.alias("t_time_sk"),
            (time_sk / 3600).cast("long").alias("t_hour"),
            ((time_sk % 3600) / 60).cast("long").alias("t_minute"),
        )
        .distinct()
    )
    item = t["part"].select(
        F.col("p_partkey").alias("i_item_sk"),
        F.concat(F.lit("ITEM_"), F.col("p_partkey")).alias("i_item_id"),
        F.col("p_name").alias("i_item_desc"),
        F.col("p_brand").alias("i_brand"),
        brandnum.alias("i_brand_id"),
        F.col("p_type").alias("i_class"),
        category_id.alias("i_category_id"),
        F.element_at(
            F.array(*[F.lit(c) for c in ("Sports", "Books", "Home", "Music", "Shoes")]),
            category_id.cast("int"),
        ).alias("i_category"),
        manufact_id.alias("i_manufact_id"),
        F.concat(F.lit("MFGR#"), manufact_id).alias("i_manufact"),
        (F.col("p_partkey") % 40).alias("i_manager_id"),
        F.col("p_retailprice").alias("i_current_price"),
    )
    nation = t["nation"]
    store = (
        t["supplier"]
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_suppkey").alias("s_store_sk"),
            F.concat_ws("_", "n_name", F.col("s_suppkey") % 10).alias("s_city"),
            F.lpad((F.col("s_suppkey") % 97).cast("string"), 5, "0").alias("s_zip"),
            F.concat(F.lit("ST_"), F.col("s_nationkey") % 7).alias("s_state"),
            F.concat(F.lit("Store_"), F.col("s_suppkey")).alias("s_store_name"),
            F.concat(F.lit("Company_"), F.col("s_suppkey") % 3).alias("s_company_name"),
        )
    )
    customer_address = (
        t["customer"]
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").alias("ca_address_sk"),
            F.concat_ws("_", "n_name", F.col("c_custkey") % 10).alias("ca_city"),
            F.lpad((F.col("c_custkey") % 97).cast("string"), 5, "0").alias("ca_zip"),
            F.concat(F.lit("ST_"), F.col("c_nationkey") % 7).alias("ca_state"),
        )
    )
    customer_dim = t["customer"].select(
        F.col("c_custkey").alias("c_customer_sk"),
        F.substring("c_name", 1, 8).alias("c_first_name"),
        F.expr("substring(c_name, 10)").alias("c_last_name"),
        F.col("c_custkey").alias("c_current_addr_sk"),
    )
    hd_sk = F.col("c_custkey") % 100
    household_demographics = (
        t["customer"]
        .select(
            hd_sk.alias("hd_demo_sk"),
            (hd_sk % 10).alias("hd_dep_count"),
            (hd_sk % 5).alias("hd_vehicle_count"),
            (hd_sk % 20).alias("hd_income_band_sk"),
        )
        .distinct()
    )
    income_band = (
        t["customer"]
        .select(
            (hd_sk % 20).alias("ib_income_band_sk"),
            ((hd_sk % 20) * 5000).alias("ib_lower_bound"),
            ((hd_sk % 20) * 5000 + 4999).alias("ib_upper_bound"),
        )
        .distinct()
    )
    cd_sk = F.col("c_custkey") % 60
    customer_demographics = (
        t["customer"]
        .select(
            cd_sk.alias("cd_demo_sk"),
            F.when(cd_sk % 2 == 0, "M").otherwise("F").alias("cd_gender"),
            F.when(cd_sk % 3 == 0, "S").when(cd_sk % 3 == 1, "M").otherwise("D").alias("cd_marital_status"),
            F.when(cd_sk % 4 == 0, "College")
            .when(cd_sk % 4 == 1, "Primary")
            .when(cd_sk % 4 == 2, "Secondary")
            .otherwise("Advanced Degree")
            .alias("cd_education_status"),
        )
        .distinct()
    )
    promo_sk = F.col("o_orderkey") % 20
    promotion = (
        t["orders"]
        .select(
            promo_sk.alias("p_promo_sk"),
            F.when(promo_sk % 2 == 0, "N").otherwise("Y").alias("p_channel_email"),
            F.when(promo_sk % 3 == 0, "N").otherwise("Y").alias("p_channel_event"),
        )
        .distinct()
    )
    wh_sk = F.col("s_suppkey") % 6
    warehouse = (
        t["supplier"]
        .select(
            wh_sk.alias("w_warehouse_sk"),
            F.concat(F.lit("WH_"), wh_sk).alias("w_warehouse_name"),
            F.concat(F.lit("WST_"), wh_sk % 3).alias("w_state"),
        )
        .distinct()
    )
    sm_sk = (F.col("l_orderkey") + F.col("l_linenumber")) % 4
    ship_mode = (
        t["lineitem"]
        .select(
            sm_sk.alias("sm_ship_mode_sk"),
            F.element_at(
                F.array(*[F.lit(m) for m in ("AIR", "TRUCK", "MAIL", "SHIP")]),
                (sm_sk + 1).cast("int"),
            ).alias("sm_type"),
        )
        .distinct()
    )
    reason_sk = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 5
    reason = (
        t["lineitem"]
        .select(
            reason_sk.alias("r_reason_sk"),
            F.concat(F.lit("Reason_"), reason_sk).alias("r_reason_desc"),
        )
        .distinct()
    )
    cc_sk = F.col("o_custkey") % 5
    call_center = (
        t["orders"]
        .select(
            cc_sk.alias("cc_call_center_sk"),
            F.concat(F.lit("CC_"), cc_sk).alias("cc_name"),
            F.concat(F.lit("Manager_"), cc_sk % 3).alias("cc_manager"),
        )
        .distinct()
    )
    inv_wh = F.col("l_suppkey") % 6
    inventory = (
        t["lineitem"]
        .select(
            F.col("l_shipdate").alias("inv_date_sk"),
            F.col("l_partkey").alias("inv_item_sk"),
            inv_wh.alias("inv_warehouse_sk"),
            ((F.col("l_partkey") * 31 + inv_wh * 7 + F.dayofmonth("l_shipdate") * 11) % 1000)
            .alias("inv_quantity_on_hand"),
        )
        .distinct()
    )
    o = t["orders"]
    li = t["lineitem"]
    store_returns = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_orderkey").alias("sr_ticket_number"),
            F.col("l_partkey").alias("sr_item_sk"),
            F.col("l_linenumber").alias("sr_line_number"),
            F.col("o_custkey").alias("sr_customer_sk"),
            F.col("l_suppkey").alias("sr_store_sk"),
            F.col("l_shipdate").alias("sr_returned_date_sk"),
            ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 5).alias("sr_reason_sk"),
            F.col("l_quantity").alias("sr_return_quantity"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sr_return_amt"),
            (F.col("l_extendedprice") * F.col("l_tax")).alias("sr_return_tax"),
        )
    )
    store_sales = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_orderkey").alias("ss_ticket_number"),
        F.col("l_linenumber").alias("ss_line_number"),
        F.col("o_orderdate").alias("ss_sold_date_sk"),
        F.col("l_partkey").alias("ss_item_sk"),
        F.col("o_custkey").alias("ss_customer_sk"),
        F.col("l_suppkey").alias("ss_store_sk"),
        (F.col("o_custkey") % 60).alias("ss_cdemo_sk"),
        (F.col("o_custkey") % 100).alias("ss_hdemo_sk"),
        F.when((F.col("o_orderkey") % 7 == 0) & (F.col("o_custkey") > 1), F.col("o_custkey") - 1)
        .otherwise(F.col("o_custkey"))
        .alias("ss_addr_sk"),
        ((F.col("l_orderkey") * 131 + F.col("l_partkey")) % 86400).alias("ss_sold_time_sk"),
        (F.col("l_orderkey") % 20).alias("ss_promo_sk"),
        F.col("l_quantity").alias("ss_quantity"),
        F.col("l_extendedprice").alias("ss_list_price"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ss_sales_price"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("ss_coupon_amt"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ss_ext_sales_price"),
        F.col("l_extendedprice").alias("ss_ext_list_price"),
        (F.col("l_extendedprice") * F.col("l_tax")).alias("ss_ext_tax"),
        (F.col("l_extendedprice") * (0.5 - F.col("l_discount"))).alias("ss_net_profit"),
    )
    # Web / catalog channels: disjoint order subsets (o_orderkey % 3 routes
    # every 3rd order to web, the next to catalog) with channel-prefixed
    # fact columns — the same derivation trick as store_returns. store_sales
    # keeps ALL tickets (the 37 pre-r4 oracles depend on it); the channel
    # facts are additional views, so cross-channel unions (q2, q33, q77) are
    # well-defined and each channel's numbers are internally consistent.
    web_filter = F.col("o_orderkey") % 3 == 0
    catalog_filter = F.col("o_orderkey") % 3 == 1
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    web_sales = joined.filter(web_filter).select(
        F.col("o_orderdate").alias("ws_sold_date_sk"),
        F.col("l_partkey").alias("ws_item_sk"),
        F.col("o_custkey").alias("ws_bill_customer_sk"),
        F.col("o_custkey").alias("ws_bill_addr_sk"),
        (F.col("o_orderkey") % 10).alias("ws_web_page_sk"),
        (F.col("l_suppkey") % 6).alias("ws_warehouse_sk"),
        F.col("l_shipdate").alias("ws_ship_date_sk"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 4).alias("ws_ship_mode_sk"),
        ((F.col("l_orderkey") * 131 + F.col("l_partkey")) % 86400).alias("ws_sold_time_sk"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("ws_ext_discount_amt"),
        F.col("l_orderkey").alias("ws_order_number"),
        F.col("l_quantity").alias("ws_quantity"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ws_ext_sales_price"),
        (F.col("l_extendedprice") * (0.5 - F.col("l_discount"))).alias("ws_net_profit"),
    )
    catalog_sales = joined.filter(catalog_filter).select(
        F.col("o_orderdate").alias("cs_sold_date_sk"),
        F.col("l_partkey").alias("cs_item_sk"),
        F.col("o_custkey").alias("cs_bill_customer_sk"),
        (F.col("o_custkey") % 5).alias("cs_call_center_sk"),
        (F.col("o_custkey") % 100).alias("cs_bill_hdemo_sk"),
        (F.col("o_custkey") % 60).alias("cs_bill_cdemo_sk"),
        ((F.col("l_orderkey") * 131 + F.col("l_partkey")) % 86400).alias("cs_sold_time_sk"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("cs_ext_discount_amt"),
        (F.col("l_suppkey") % 6).alias("cs_warehouse_sk"),
        F.col("l_shipdate").alias("cs_ship_date_sk"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 4).alias("cs_ship_mode_sk"),
        (F.col("l_orderkey") % 20).alias("cs_promo_sk"),
        F.col("l_orderkey").alias("cs_order_number"),
        F.col("l_quantity").alias("cs_quantity"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("cs_ext_sales_price"),
        (F.col("l_extendedprice") * (0.5 - F.col("l_discount"))).alias("cs_net_profit"),
    )
    returned = joined.filter(F.col("l_returnflag") == "R")
    web_returns = returned.filter(web_filter).select(
        F.col("l_shipdate").alias("wr_returned_date_sk"),
        F.col("l_partkey").alias("wr_item_sk"),
        (F.col("o_orderkey") % 10).alias("wr_web_page_sk"),
        F.col("l_orderkey").alias("wr_order_number"),
        F.col("l_quantity").alias("wr_return_quantity"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 5).alias("wr_reason_sk"),
        F.col("o_custkey").alias("wr_returning_customer_sk"),
        F.col("o_custkey").alias("wr_returning_addr_sk"),
        (F.col("o_custkey") % 60).alias("wr_returning_cdemo_sk"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("wr_return_amt"),
        (F.col("l_extendedprice") * F.col("l_tax")).alias("wr_net_loss"),
    )
    catalog_returns = returned.filter(catalog_filter).select(
        F.col("l_shipdate").alias("cr_returned_date_sk"),
        F.col("l_partkey").alias("cr_item_sk"),
        (F.col("o_custkey") % 5).alias("cr_call_center_sk"),
        F.col("l_orderkey").alias("cr_order_number"),
        F.col("l_quantity").alias("cr_return_quantity"),
        F.col("o_custkey").alias("cr_returning_customer_sk"),
        (F.col("o_custkey") % 60).alias("cr_returning_cdemo_sk"),
        (F.col("o_custkey") % 100).alias("cr_returning_hdemo_sk"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("cr_return_amt"),
        (F.col("l_extendedprice") * F.col("l_tax")).alias("cr_net_loss"),
    )
    return {
        "date_dim": date_dim,
        "time_dim": time_dim,
        "item": item,
        "store": store,
        "customer_address": customer_address,
        "customer_dim": customer_dim,
        "household_demographics": household_demographics,
        "customer_demographics": customer_demographics,
        "promotion": promotion,
        "income_band": income_band,
        "warehouse": warehouse,
        "ship_mode": ship_mode,
        "reason": reason,
        "call_center": call_center,
        "inventory": inventory,
        "store_sales": store_sales,
        "store_returns": store_returns,
        "web_sales": web_sales,
        "catalog_sales": catalog_sales,
        "web_returns": web_returns,
        "catalog_returns": catalog_returns,
    }


# ---------------------------------------------------------------------------
# q3 — year/brand sales for one manufacturer in November
# ---------------------------------------------------------------------------

Q3_ORACLE = f"""
WITH {DS_CTES}
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       round(sum(ss_ext_sales_price), 4) AS sum_agg
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manufact_id = 2 AND d_moy = 11
GROUP BY d_year, i_brand, i_brand_id
ORDER BY d_year, sum_agg DESC, brand_id
LIMIT 100
"""


@register("tpcds_q3", Q3_ORACLE, tags=("tpcds", "star", "agg"))
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3 (reference tpcds/q3.sql; i_manufact_id retargeted 128→2).

    Star join: fact ⋈ broadcast(date_dim) ⋈ item, then partial+final agg on
    (year, brand). (d_year, brand_id) is a unique group key, so the top-100
    is deterministic."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_moy") == 11)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(ds["item"].filter(F.col("i_manufact_id") == 2), F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("d_year", "i_brand", "i_brand_id")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("sum_agg"))
        .select(
            "d_year",
            F.col("i_brand_id").alias("brand_id"),
            F.col("i_brand").alias("brand"),
            "sum_agg",
        )
        .orderBy("d_year", F.desc("sum_agg"), "brand_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q7 — demographic/promotion item averages
# ---------------------------------------------------------------------------

Q7_ORACLE = f"""
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
WHERE cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
"""


@register("tpcds_q7", Q7_ORACLE, tags=("tpcds", "star", "agg"))
def tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7 (reference tpcds/q7.sql). Four-dim star join with a
    demographics slice (cd sk%12==0 → 1/12 of the fact) and a disjunctive
    promotion filter. All money inputs are exact 4-decimal, so avg =
    exact-sum / count is engine-stable at round-6."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        (F.col("cd_gender") == "M")
        & (F.col("cd_marital_status") == "S")
        & (F.col("cd_education_status") == "College")
    )
    promo = ds["promotion"].filter((F.col("p_channel_email") == "N") | (F.col("p_channel_event") == "N"))
    return (
        ds["store_sales"]
        .join(F.broadcast(cd), F.col("ss_cdemo_sk") == F.col("cd_demo_sk"))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 2000)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
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
# q19 — brand revenue where customer zip differs from store zip
# ---------------------------------------------------------------------------

Q19_ORACLE = f"""
WITH {DS_CTES}
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id, i_manufact,
       round(sum(ss_ext_sales_price), 4) AS ext_price
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
              JOIN customer_dim ON ss_customer_sk = c_customer_sk
              JOIN customer_address ON c_current_addr_sk = ca_address_sk
              JOIN store ON ss_store_sk = s_store_sk
WHERE i_manager_id = 8 AND d_moy = 11 AND d_year = 1998
  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price DESC, brand, brand_id, i_manufact_id, i_manufact
LIMIT 100
"""


@register("tpcds_q19", Q19_ORACLE, tags=("tpcds", "star", "join"))
def tpcds_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19 (reference tpcds/q19.sql). Six-table star with a
    non-equi residual (customer zip != store zip) applied after the joins.
    customer/address joins are SF-proportional → left to AQE; store and
    date_dim broadcast."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 11) & (F.col("d_year") == 1998))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(ds["item"].filter(F.col("i_manager_id") == 8), F.col("ss_item_sk") == F.col("i_item_sk"))
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
# q42 — category sales for one manager-month
# ---------------------------------------------------------------------------

Q42_ORACLE = f"""
WITH {DS_CTES}
SELECT d_year, i_category_id, i_category,
       round(sum(ss_ext_sales_price), 4) AS sum_sales
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manager_id = 1 AND d_moy = 11 AND d_year = 2000
GROUP BY d_year, i_category_id, i_category
ORDER BY sum_sales DESC, d_year, i_category_id, i_category
LIMIT 100
"""


@register("tpcds_q42", Q42_ORACLE, tags=("tpcds", "star", "agg"))
def tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q42 (reference tpcds/q42.sql; sum aliased sum_sales both
    engines for the driver's column-name-sorted hash)."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 11) & (F.col("d_year") == 2000))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(ds["item"].filter(F.col("i_manager_id") == 1), F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("d_year", "i_category_id", "i_category")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("sum_sales"))
        .orderBy(F.desc("sum_sales"), "d_year", "i_category_id", "i_category")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q52 — brand sales for one manager-month (q3 shape, equality filter on year)
# ---------------------------------------------------------------------------

Q52_ORACLE = f"""
WITH {DS_CTES}
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       round(sum(ss_ext_sales_price), 4) AS ext_price
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manager_id = 1 AND d_moy = 11 AND d_year = 2000
GROUP BY d_year, i_brand, i_brand_id
ORDER BY d_year, ext_price DESC, brand_id
LIMIT 100
"""


@register("tpcds_q52", Q52_ORACLE, tags=("tpcds", "star", "agg"))
def tpcds_q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q52 (reference tpcds/q52.sql)."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 11) & (F.col("d_year") == 2000))),
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
# q55 — brand revenue for one manager-month
# ---------------------------------------------------------------------------

Q55_ORACLE = f"""
WITH {DS_CTES}
SELECT i_brand_id AS brand_id, i_brand AS brand,
       round(sum(ss_ext_sales_price), 4) AS ext_price
FROM date_dim JOIN store_sales ON d_date_sk = ss_sold_date_sk
              JOIN item ON ss_item_sk = i_item_sk
WHERE i_manager_id = 28 AND d_moy = 11 AND d_year = 1999
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC, brand_id
LIMIT 100
"""


@register("tpcds_q55", Q55_ORACLE, tags=("tpcds", "star", "agg"))
def tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q55 (reference tpcds/q55.sql)."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter((F.col("d_moy") == 11) & (F.col("d_year") == 1999))),
            F.col("ss_sold_date_sk") == F.col("d_date_sk"),
        )
        .join(ds["item"].filter(F.col("i_manager_id") == 28), F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy("i_brand", "i_brand_id")
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("ext_price"))
        .select(F.col("i_brand_id").alias("brand_id"), F.col("i_brand").alias("brand"), "ext_price")
        .orderBy(F.desc("ext_price"), "brand_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q68 — per-ticket totals for dep/vehicle households, moved-city customers
# ---------------------------------------------------------------------------

Q68_ORACLE = f"""
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
  WHERE d_dom BETWEEN 1 AND 5
    AND (hd_dep_count = 4 OR hd_vehicle_count = 3)
    AND d_year IN (1999, 2000, 2001)
    AND s_city IN ('NATION_9_0', 'NATION_17_1', 'NATION_23_3', 'NATION_19_5')
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city)
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       extended_price, extended_tax, list_price
FROM dn JOIN customer_dim ON ss_customer_sk = c_customer_sk
        JOIN customer_address ON c_current_addr_sk = ca_address_sk
WHERE ca_city <> bought_city
ORDER BY c_last_name, ss_ticket_number
LIMIT 100
"""


@register("tpcds_q68", Q68_ORACLE, tags=("tpcds", "star", "join"))
def tpcds_q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q68 (reference tpcds/q68.sql; cities retargeted to the derived
    nation-city domain). Inner aggregate per ticket, then a second
    customer/current-address join filtering tickets bought in a different
    city than the customer now lives in. ss_ticket_number is unique per dn
    row (one customer per order), making the top-100 deterministic."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter((F.col("hd_dep_count") == 4) | (F.col("hd_vehicle_count") == 3))
    st = ds["store"].filter(F.col("s_city").isin("NATION_9_0", "NATION_17_1", "NATION_23_3", "NATION_19_5"))
    dn = (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter(F.col("d_dom").between(1, 5) & F.col("d_year").isin(1999, 2000, 2001))),
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
# q98 — item revenue share within class over a 30-day window
# ---------------------------------------------------------------------------

Q98_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_desc, i_category, i_class, i_current_price,
       round(sum(ss_ext_sales_price), 4) AS itemrevenue,
       round(sum(ss_ext_sales_price) * 100 / sum(sum(ss_ext_sales_price))
             OVER (PARTITION BY i_class), 6) AS revenueratio
FROM store_sales JOIN item ON ss_item_sk = i_item_sk
                 JOIN date_dim ON ss_sold_date_sk = d_date_sk
WHERE i_category IN ('Sports', 'Books', 'Home')
  AND d_date_sk BETWEEN TIMESTAMP '1997-02-22 00:00:00' AND TIMESTAMP '1997-03-24 00:00:00'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100
"""


@register("tpcds_q98", Q98_ORACLE, tags=("tpcds", "star", "window"))
def tpcds_q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98 (reference tpcds/q98.sql; window date retargeted into the
    fixture span). Aggregate-then-window: the class-share ratio is a window
    sum over the per-item aggregates — a few thousand rows post-agg, so the
    PARTITION BY i_class window is cheap at any SF. Ratio rounded at 6
    (non-terminating division; see tpch.py rounding policy)."""
    ds = _ds(spark, sf_dir)
    grouped = (
        ds["store_sales"]
        .join(
            ds["item"].filter(F.col("i_category").isin("Sports", "Books", "Home")),
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
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q27 — demographic item/state averages with ROLLUP
# ---------------------------------------------------------------------------

Q27_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_id, s_state, grouping(s_state) AS g_state,
       round(avg(ss_quantity), 6) AS agg1,
       round(avg(ss_list_price), 6) AS agg2,
       round(avg(ss_coupon_amt), 6) AS agg3,
       round(avg(ss_sales_price), 6) AS agg4
FROM store_sales JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
                 JOIN date_dim ON ss_sold_date_sk = d_date_sk
                 JOIN store ON ss_store_sk = s_store_sk
                 JOIN item ON ss_item_sk = i_item_sk
WHERE cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
  AND d_year = 2000 AND s_state IN ('ST_0', 'ST_1', 'ST_2')
GROUP BY ROLLUP (i_item_id, s_state)
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100
"""


@register("tpcds_q27", Q27_ORACLE, tags=("tpcds", "star", "rollup"))
def tpcds_q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q27 (reference tpcds/q27.sql; states retargeted to the derived
    ST_k domain). ROLLUP over (item, state) with grouping(): the ExpandExec
    path composed with a 4-dim star join. NULLS FIRST pinned in the oracle —
    Spark's ASC default — because LIMIT makes row selection order-sensitive."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        (F.col("cd_gender") == "M")
        & (F.col("cd_marital_status") == "S")
        & (F.col("cd_education_status") == "College")
    )
    st = ds["store"].filter(F.col("s_state").isin("ST_0", "ST_1", "ST_2"))
    return (
        ds["store_sales"]
        .join(F.broadcast(cd), F.col("ss_cdemo_sk") == F.col("cd_demo_sk"))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 2000)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(st), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .rollup("i_item_id", "s_state")
        .agg(
            F.grouping("s_state").alias("g_state"),
            F.round(F.avg("ss_quantity"), 6).alias("agg1"),
            F.round(F.avg("ss_list_price"), 6).alias("agg2"),
            F.round(F.avg("ss_coupon_amt"), 6).alias("agg3"),
            F.round(F.avg("ss_sales_price"), 6).alias("agg4"),
        )
        .orderBy(F.asc_nulls_first("i_item_id"), F.asc_nulls_first("s_state"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q36 — gross-margin ROLLUP hierarchy with rank-within-parent
# ---------------------------------------------------------------------------

Q36_ORACLE = f"""
WITH {DS_CTES}
SELECT round(sum(ss_net_profit) / sum(ss_ext_sales_price), 6) AS gross_margin,
       i_category, i_class,
       grouping(i_category) + grouping(i_class) AS lochierarchy,
       rank() OVER (
         PARTITION BY grouping(i_category) + grouping(i_class),
                      CASE WHEN grouping(i_class) = 0 THEN i_category END
         ORDER BY sum(ss_net_profit) / sum(ss_ext_sales_price) ASC) AS rank_within_parent
FROM store_sales JOIN date_dim ON d_date_sk = ss_sold_date_sk
                 JOIN item ON i_item_sk = ss_item_sk
                 JOIN store ON s_store_sk = ss_store_sk
WHERE d_year = 2000 AND s_state IN ('ST_0', 'ST_1', 'ST_2', 'ST_3')
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC,
         CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent
LIMIT 100
"""


@register("tpcds_q36", Q36_ORACLE, tags=("tpcds", "star", "rollup", "window"))
def tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 (reference tpcds/q36.sql). ROLLUP + grouping() feeding a
    rank() window partitioned by the grouping level — ExpandExec output as
    window input. The rank orders on the UNROUNDED margin: both engines sum
    exact 4-decimal doubles, so the ratio is bit-identical and the rank is
    stable; round(...,6) only for the hashed output column."""
    ds = _ds(spark, sf_dir)
    st = ds["store"].filter(F.col("s_state").isin("ST_0", "ST_1", "ST_2", "ST_3"))
    grouped = (
        ds["store_sales"]
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 2000)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(st), F.col("ss_store_sk") == F.col("s_store_sk"))
        .rollup("i_category", "i_class")
        .agg(
            (F.sum("ss_net_profit") / F.sum("ss_ext_sales_price")).alias("_margin"),
            (F.grouping("i_category") + F.grouping("i_class")).alias("lochierarchy"),
            F.grouping("i_class").alias("_g_class"),
        )
    )
    w = W.partitionBy(
        "lochierarchy", F.when(F.col("_g_class") == 0, F.col("i_category"))
    ).orderBy(F.asc("_margin"))
    return (
        grouped.select(
            F.round("_margin", 6).alias("gross_margin"),
            "i_category",
            "i_class",
            "lochierarchy",
            F.rank().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.asc_nulls_first(F.when(F.col("lochierarchy") == 0, F.col("i_category"))),
            "rank_within_parent",
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q53 — manufacturer quarterly sales vs their average (deviation filter)
# ---------------------------------------------------------------------------

Q53_ORACLE = f"""
WITH {DS_CTES},
tmp1 AS (
  SELECT i_manufact_id, d_qoy,
         sum(ss_sales_price) AS sum_sales_raw,
         avg(sum(ss_sales_price)) OVER (PARTITION BY i_manufact_id) AS avg_raw
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
                   JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
  WHERE d_month_seq IN (37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48)
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


@register("tpcds_q53", Q53_ORACLE, tags=("tpcds", "star", "window"))
def tpcds_q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53 (reference tpcds/q53.sql; month_seq/brand/class constants
    retargeted — d_month_seq 37-48 = calendar year 1995). Aggregate-then-
    window: avg of quarterly sums per manufacturer, keep quarters deviating
    >10%. The window partitions on i_manufact_id over post-agg rows (#manu x
    #quarters — tiny at any SF)."""
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
# q89 — monthly brand/store sales deviating from the yearly average
# ---------------------------------------------------------------------------

Q89_ORACLE = f"""
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


@register("tpcds_q89", Q89_ORACLE, tags=("tpcds", "star", "window"))
def tpcds_q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89 (reference tpcds/q89.sql; class lists retargeted to the
    derived p_type domain). Monthly (brand, store) sales vs the yearly
    average for that slice; the deviation ORDER BY uses the unrounded
    difference — bit-identical across engines because the summed inputs are
    exact 4-decimal doubles (tpch.py rounding policy)."""
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
# q13 — disjunctive demographic/geography bands over one fact pass
# ---------------------------------------------------------------------------

Q13_ORACLE = f"""
WITH {DS_CTES}
SELECT round(avg(ss_quantity), 6) AS avg_qty,
       round(avg(ss_ext_sales_price), 6) AS avg_sales,
       round(avg(ss_ext_list_price), 6) AS avg_list,
       round(sum(ss_ext_list_price), 4) AS sum_list
FROM store_sales
  JOIN store ON s_store_sk = ss_store_sk
  JOIN date_dim ON ss_sold_date_sk = d_date_sk
  JOIN customer_demographics ON cd_demo_sk = ss_cdemo_sk
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  JOIN customer_address ON ss_addr_sk = ca_address_sk
WHERE d_year = 2000
  AND ((cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price BETWEEN 1000 AND 40000 AND hd_dep_count = 3)
    OR (cd_marital_status = 'S' AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 500 AND 20000 AND hd_dep_count = 1)
    OR (cd_marital_status = 'D' AND cd_education_status = 'Secondary'
        AND ss_sales_price BETWEEN 2000 AND 60000 AND hd_dep_count = 1))
  AND ((ca_state IN ('ST_0', 'ST_1', 'ST_2') AND ss_net_profit BETWEEN 100 AND 5000)
    OR (ca_state IN ('ST_3', 'ST_4') AND ss_net_profit BETWEEN 1000 AND 10000)
    OR (ca_state IN ('ST_5', 'ST_6') AND ss_net_profit BETWEEN 500 AND 8000))
"""


@register("tpcds_q13", Q13_ORACLE, tags=("tpcds", "star", "filter"))
def tpcds_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q13 (reference tpcds/q13.sql; wholesale-cost columns stand in
    as list price, bands retargeted to the derived domains). The equi keys
    common to every OR branch are factored into plain joins — identically
    in the oracle — leaving a 6-predicate disjunctive residual filter over
    one fact pass; all small dims broadcast."""
    ds = _ds(spark, sf_dir)
    demo_band = (
        (F.col("cd_marital_status") == "M") & (F.col("cd_education_status") == "Advanced Degree")
        & F.col("ss_sales_price").between(1000, 40000) & (F.col("hd_dep_count") == 3)
    ) | (
        (F.col("cd_marital_status") == "S") & (F.col("cd_education_status") == "College")
        & F.col("ss_sales_price").between(500, 20000) & (F.col("hd_dep_count") == 1)
    ) | (
        (F.col("cd_marital_status") == "D") & (F.col("cd_education_status") == "Secondary")
        & F.col("ss_sales_price").between(2000, 60000) & (F.col("hd_dep_count") == 1)
    )
    geo_band = (
        (F.col("ca_state").isin("ST_0", "ST_1", "ST_2") & F.col("ss_net_profit").between(100, 5000))
        | (F.col("ca_state").isin("ST_3", "ST_4") & F.col("ss_net_profit").between(1000, 10000))
        | (F.col("ca_state").isin("ST_5", "ST_6") & F.col("ss_net_profit").between(500, 8000))
    )
    return (
        ds["store_sales"]
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 2000)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["customer_demographics"]), F.col("ss_cdemo_sk") == F.col("cd_demo_sk"))
        .join(F.broadcast(ds["household_demographics"]), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .join(ds["customer_address"], F.col("ss_addr_sk") == F.col("ca_address_sk"))
        .filter(demo_band & geo_band)
        .agg(
            F.round(F.avg("ss_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("ss_ext_sales_price"), 6).alias("avg_sales"),
            F.round(F.avg("ss_ext_list_price"), 6).alias("avg_list"),
            F.round(F.sum("ss_ext_list_price"), 4).alias("sum_list"),
        )
    )


# ---------------------------------------------------------------------------
# q6 — states whose customers buy items priced above 1.2x their category avg
# ---------------------------------------------------------------------------

Q6_ORACLE = f"""
WITH {DS_CTES}
SELECT a.ca_state AS state, count(*) AS cnt
FROM customer_address a
  JOIN customer_dim c ON a.ca_address_sk = c.c_current_addr_sk
  JOIN store_sales s ON c.c_customer_sk = s.ss_customer_sk
  JOIN date_dim d ON s.ss_sold_date_sk = d.d_date_sk
  JOIN item i ON s.ss_item_sk = i.i_item_sk
WHERE d.d_month_seq =
      (SELECT DISTINCT d_month_seq FROM date_dim WHERE d_year = 2000 AND d_moy = 1)
  AND i.i_current_price > 1.04 *
      (SELECT avg(j.i_current_price) FROM item j WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING count(*) >= 10
ORDER BY cnt, state
LIMIT 100
"""


@register("tpcds_q6", Q6_ORACLE, tags=("tpcds", "star", "subquery"))
def tpcds_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q6 (reference tpcds/q6.sql). Two subquery shapes: an
    uncorrelated scalar (the chosen month_seq) and a correlated scalar
    (category average price), decorrelated here — as Catalyst's
    RewriteCorrelatedScalarSubquery would — into an aggregate-then-join on
    i_category (25-part bound, broadcast). The 1.04x comparison (the
    reference's 1.2 retargeted: fixture prices span only 900-999.9) is on
    unrounded doubles: both engines average identical inputs, so the
    cutoff is bit-identical."""
    ds = _ds(spark, sf_dir)
    month_seq = (
        ds["date_dim"]
        .filter((F.col("d_year") == 2000) & (F.col("d_moy") == 1))
        .select("d_month_seq")
        .distinct()
    )
    cat_avg = ds["item"].groupBy("i_category").agg(F.avg("i_current_price").alias("cat_avg_price"))
    pricey_items = (
        ds["item"]
        .join(F.broadcast(cat_avg), "i_category")
        .filter(F.col("i_current_price") > 1.04 * F.col("cat_avg_price"))
        .select("i_item_sk")
    )
    dd = ds["date_dim"].join(F.broadcast(month_seq), "d_month_seq").select("d_date_sk")
    return (
        ds["store_sales"]
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(pricey_items, F.col("ss_item_sk") == F.col("i_item_sk"), "left_semi")
        .join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .join(ds["customer_address"], F.col("c_current_addr_sk") == F.col("ca_address_sk"))
        .groupBy(F.col("ca_state").alias("state"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 10)
        .orderBy("cnt", "state")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q73 — tickets whose item counts fall in a band, for high-dependency households
# ---------------------------------------------------------------------------

Q73_ORACLE = f"""
WITH {DS_CTES},
dj AS (
  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
                   JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  WHERE d_dom BETWEEN 1 AND 2
    AND hd_vehicle_count > 0
    AND CASE WHEN hd_vehicle_count > 0 THEN hd_dep_count / hd_vehicle_count ELSE NULL END > 1
    AND d_year IN (1999, 2000, 2001)
    AND s_state IN ('ST_0', 'ST_1', 'ST_2', 'ST_3')
  GROUP BY ss_ticket_number, ss_customer_sk)
SELECT c_last_name, c_first_name, ss_ticket_number, cnt
FROM dj JOIN customer_dim ON ss_customer_sk = c_customer_sk
WHERE cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, ss_ticket_number
"""


@register("tpcds_q73", Q73_ORACLE, tags=("tpcds", "star", "having"))
def tpcds_q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q73 (reference tpcds/q73.sql; buy_potential/county filters
    retargeted to the derived demographics/state domains). Per-ticket item
    counts banded 1-5 — aggregate-then-filter-then-join: the count band
    applies BEFORE the customer join, so only qualifying tickets shuffle."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter(
        (F.col("hd_vehicle_count") > 0)
        & (
            F.when(
                F.col("hd_vehicle_count") > 0,
                F.col("hd_dep_count") / F.col("hd_vehicle_count"),
            ).otherwise(F.lit(None))
            > 1
        )
    )
    dj = (
        ds["store_sales"]
        .join(
            F.broadcast(ds["date_dim"].filter(F.col("d_dom").between(1, 2) & F.col("d_year").isin(1999, 2000, 2001))),
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
# q65 — (store, item) pairs with revenue below 10% of the store average
# ---------------------------------------------------------------------------

Q65_ORACLE = f"""
WITH {DS_CTES},
rev AS (
  SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue_raw
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE d_month_seq BETWEEN 37 AND 48
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


@register("tpcds_q65", Q65_ORACLE, tags=("tpcds", "star", "agg"))
def tpcds_q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 (reference tpcds/q65.sql; month_seq window retargeted to
    1995). The reference text computes the same (store, item) revenue
    subquery TWICE (once under the per-store average) — here it is one
    aggregate with the store average as a window over the post-agg rows,
    the formulation the reference's own ReuseExchange merely approximates.
    The 0.1x threshold compares unrounded sums (bit-identical per the
    rounding policy)."""
    ds = _ds(spark, sf_dir)
    rev = (
        ds["store_sales"]
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
# q34 — month-end shopping-party tickets (count band 4-7)
# ---------------------------------------------------------------------------

Q34_ORACLE = f"""
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
  GROUP BY ss_ticket_number, ss_customer_sk
  HAVING count(*) BETWEEN 4 AND 7)
SELECT c_last_name, c_first_name, ss_ticket_number, cnt
FROM dj JOIN customer_dim ON ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, ss_ticket_number DESC
"""


@register("tpcds_q34", Q34_ORACLE, tags=("tpcds", "star", "having"))
def tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34 (reference tpcds/q34.sql; county/buy_potential retargeted
    to the derived state/demographics domains, count band rescaled 15-20 →
    4-7 to the fixture's lineitems-per-order). The month-start OR month-end
    date disjunction survives into the broadcast dim filter; the count band
    applies before the customer join, like q73."""
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
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["store"].filter(F.col("s_state").isin("ST_0", "ST_1", "ST_2", "ST_3"))), F.col("ss_store_sk") == F.col("s_store_sk"))
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
# q43 — per-store day-of-week sales pivot (7 conditional sums)
# ---------------------------------------------------------------------------

Q43_ORACLE = f"""
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
GROUP BY s_store_name, s_store_sk
ORDER BY s_store_name, s_store_sk
LIMIT 100
"""


@register("tpcds_q43", Q43_ORACLE, tags=("tpcds", "star", "pivot"))
def tpcds_q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q43 (reference tpcds/q43.sql; gmt_offset filter dropped — the
    derived store has no timezone). Manual day-of-week pivot: seven
    conditional sums in ONE fact pass (the same ExpandExec-free shape the
    reference plans for CASE aggregates). d_dow is normalized to
    Sunday = 0 in both engines (Spark dayofweek() is 1-based)."""
    ds = _ds(spark, sf_dir)
    days = [("sun", 0), ("mon", 1), ("tue", 2), ("wed", 3), ("thu", 4), ("fri", 5), ("sat", 6)]
    aggs = [
        F.round(F.sum(F.when(F.col("d_dow") == dw, F.col("ss_sales_price"))), 4).alias(f"{nm}_sales")
        for nm, dw in days
    ]
    return (
        ds["store_sales"]
        .join(F.broadcast(ds["date_dim"].filter(F.col("d_year") == 2000)), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("s_store_name", "s_store_sk")
        .agg(*aggs)
        .orderBy("s_store_name", "s_store_sk")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q88 — eight half-hour store-traffic counts in one row
# ---------------------------------------------------------------------------

_Q88_HD = """((hd_dep_count = 4 AND hd_vehicle_count <= 6)
       OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
       OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))"""

_Q88_BANDS = [
    ("h8_30_to_9", 8, True), ("h9_to_9_30", 9, False), ("h9_30_to_10", 9, True),
    ("h10_to_10_30", 10, False), ("h10_30_to_11", 10, True), ("h11_to_11_30", 11, False),
    ("h11_30_to_12", 11, True), ("h12_to_12_30", 12, False),
]


def _q88_oracle() -> str:
    subs = []
    for name, hour, late in _Q88_BANDS:
        minute = "t_minute >= 30" if late else "t_minute < 30"
        subs.append(f"""
{name}_s AS (
  SELECT count(*) AS {name}
  FROM store_sales
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  JOIN time_dim ON ss_sold_time_sk = t_time_sk
  JOIN store ON ss_store_sk = s_store_sk
  WHERE t_hour = {hour} AND {minute}
    AND {_Q88_HD}
    AND s_state IN ('ST_0', 'ST_1', 'ST_2'))""")
    cols = ", ".join(name for name, _, _ in _Q88_BANDS)
    froms = " CROSS JOIN ".join(f"{name}_s" for name, _, _ in _Q88_BANDS)
    return f"WITH {DS_CTES},{','.join(subs)}\nSELECT {cols} FROM {froms}"


@register("tpcds_q88", _q88_oracle(), tags=("tpcds", "star", "multiband"))
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 (reference tpcds/q88.sql; store/demographic filters
    retargeted to the derived domains). The textbook formulation — and the
    oracle — is EIGHT separate fact scans cross-joined into one row; this
    engine rewrites it as ONE fact pass with eight conditional counts
    (count_if over the half-hour band predicates), the multi-scan fusion
    AQE cannot do for you. Same single-row result, 8x less scan I/O — the
    kind of rewrite that matters at 100 TB."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter(
        ((F.col("hd_dep_count") == 4) & (F.col("hd_vehicle_count") <= 6))
        | ((F.col("hd_dep_count") == 2) & (F.col("hd_vehicle_count") <= 4))
        | ((F.col("hd_dep_count") == 0) & (F.col("hd_vehicle_count") <= 2))
    )
    mins = F.col("t_hour") * 60 + F.col("t_minute")
    td = ds["time_dim"].filter((mins >= 510) & (mins < 750))
    aggs = []
    for name, hour, late in _Q88_BANDS:
        cond = (F.col("t_hour") == hour) & (
            (F.col("t_minute") >= 30) if late else (F.col("t_minute") < 30)
        )
        aggs.append(F.count_if(cond).alias(name))
    return (
        ds["store_sales"]
        .join(F.broadcast(td), F.col("ss_sold_time_sk") == F.col("t_time_sk"))
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .join(F.broadcast(ds["store"].filter(F.col("s_state").isin("ST_0", "ST_1", "ST_2"))), F.col("ss_store_sk") == F.col("s_store_sk"))
        .agg(*aggs)
    )


# ---------------------------------------------------------------------------
# q90 — morning/evening traffic ratio
# ---------------------------------------------------------------------------

Q90_ORACLE = f"""
WITH {DS_CTES},
am AS (
  SELECT count(*) AS amc FROM store_sales
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  JOIN time_dim ON ss_sold_time_sk = t_time_sk
  WHERE t_hour BETWEEN 8 AND 9 AND hd_dep_count BETWEEN 2 AND 4),
pm AS (
  SELECT count(*) AS pmc FROM store_sales
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  JOIN time_dim ON ss_sold_time_sk = t_time_sk
  WHERE t_hour BETWEEN 19 AND 20 AND hd_dep_count BETWEEN 2 AND 4)
SELECT amc, pmc, round(amc::DOUBLE / pmc, 6) AS am_pm_ratio
FROM am CROSS JOIN pm
"""


@register("tpcds_q90", Q90_ORACLE, tags=("tpcds", "star", "ratio"))
def tpcds_q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q90 (reference tpcds/q90.sql; web_sales/web_page mapped onto
    the single store channel the fixtures model). Ratio of two disjoint
    time-band counts — the oracle computes them as two scans cross-joined;
    this engine computes both in ONE pass with conditional counts (the
    bands are disjoint filters of the same joined fact)."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter(F.col("hd_dep_count").between(2, 4))
    td = ds["time_dim"].filter(F.col("t_hour").between(8, 9) | F.col("t_hour").between(19, 20))
    return (
        ds["store_sales"]
        .join(F.broadcast(td), F.col("ss_sold_time_sk") == F.col("t_time_sk"))
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .agg(
            F.count_if(F.col("t_hour").between(8, 9)).alias("amc"),
            F.count_if(F.col("t_hour").between(19, 20)).alias("pmc"),
        )
        .select(
            "amc", "pmc",
            F.round(F.col("amc").cast("double") / F.col("pmc"), 6).alias("am_pm_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# q96 — half-hour rush count at a store group
# ---------------------------------------------------------------------------

Q96_ORACLE = f"""
WITH {DS_CTES}
SELECT count(*) AS cnt
FROM store_sales
JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
JOIN time_dim ON ss_sold_time_sk = t_time_sk
JOIN store ON ss_store_sk = s_store_sk
WHERE t_hour = 20 AND t_minute >= 30 AND hd_dep_count = 7 AND s_state = 'ST_1'
"""


@register("tpcds_q96", Q96_ORACLE, tags=("tpcds", "star", "count"))
def tpcds_q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q96 (reference tpcds/q96.sql; store name → derived state
    group). Plain filtered count through three broadcast dims — every
    filter reaches the scan side of its join, the fact never shuffles."""
    ds = _ds(spark, sf_dir)
    return (
        ds["store_sales"]
        .join(F.broadcast(ds["household_demographics"].filter(F.col("hd_dep_count") == 7)), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .join(F.broadcast(ds["time_dim"].filter((F.col("t_hour") == 20) & (F.col("t_minute") >= 30))), F.col("ss_sold_time_sk") == F.col("t_time_sk"))
        .join(F.broadcast(ds["store"].filter(F.col("s_state") == "ST_1")), F.col("ss_store_sk") == F.col("s_store_sk"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# q51 — cumulative channel race (full outer + running max windows)
# ---------------------------------------------------------------------------

Q51_ORACLE = f"""
WITH {DS_CTES},
promo_v AS (
  SELECT ss_item_sk AS item_sk, d_month_seq,
         round(sum(sum(ss_ext_sales_price))
               OVER (PARTITION BY ss_item_sk ORDER BY d_month_seq
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cume_sales
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE ss_promo_sk % 2 = 1 AND d_year IN (1999, 2000)
  GROUP BY ss_item_sk, d_month_seq),
store_v AS (
  SELECT ss_item_sk AS item_sk, d_month_seq,
         round(sum(sum(ss_ext_sales_price))
               OVER (PARTITION BY ss_item_sk ORDER BY d_month_seq
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cume_sales
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE ss_promo_sk % 2 = 0 AND d_year IN (1999, 2000)
  GROUP BY ss_item_sk, d_month_seq),
x AS (
  SELECT COALESCE(p.item_sk, s.item_sk) AS item_sk,
         COALESCE(p.d_month_seq, s.d_month_seq) AS month_seq,
         p.cume_sales AS promo_sales,
         s.cume_sales AS store_sales
  FROM promo_v p FULL OUTER JOIN store_v s
    ON p.item_sk = s.item_sk AND p.d_month_seq = s.d_month_seq),
y AS (
  SELECT item_sk, month_seq,
         max(promo_sales) OVER (PARTITION BY item_sk ORDER BY month_seq
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS promo_cumulative,
         max(store_sales) OVER (PARTITION BY item_sk ORDER BY month_seq
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cumulative
  FROM x)
SELECT item_sk, month_seq, promo_cumulative, store_cumulative
FROM y WHERE promo_cumulative > store_cumulative
ORDER BY item_sk, month_seq
LIMIT 100
"""


@register("tpcds_q51", Q51_ORACLE, tags=("tpcds", "window", "fullouter"))
def tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 (reference tpcds/q51.sql; web channel mapped onto the
    odd-promo half of the single store channel the fixtures model).
    Aggregate -> window-over-aggregate per channel, FULL OUTER join on
    (item, month), then running-max windows that carry each channel's
    cumulative total across the other channel's gap months.

    Scale shape: both windows partition by item_sk (SF-proportional key),
    so no global sort; the full-outer join keys on (item, month) — the same
    partitioning the windows need, one exchange reused. Cumulative money
    stays an exact 4-decimal sum, so round-at-4 is the identity in both
    engines."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter(F.col("d_year").isin(1999, 2000))

    def channel(promo_parity: int) -> DataFrame:
        cume = W.partitionBy("item_sk").orderBy("d_month_seq").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        return (
            ds["store_sales"]
            .filter(F.col("ss_promo_sk") % 2 == promo_parity)
            .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
            .groupBy(F.col("ss_item_sk").alias("item_sk"), "d_month_seq")
            .agg(F.sum("ss_ext_sales_price").alias("m_sales"))
            .select(
                "item_sk",
                "d_month_seq",
                F.round(F.sum("m_sales").over(cume), 4).alias("cume_sales"),
            )
        )

    p = channel(1).withColumnsRenamed(
        {"cume_sales": "promo_sales", "item_sk": "p_item", "d_month_seq": "p_month"}
    )
    s = channel(0).withColumnsRenamed(
        {"cume_sales": "store_sales", "item_sk": "s_item", "d_month_seq": "s_month"}
    )
    x = (
        p.join(
            s,
            (F.col("p_item") == F.col("s_item")) & (F.col("p_month") == F.col("s_month")),
            "full_outer",
        )
        .select(
            F.coalesce("p_item", "s_item").alias("item_sk"),
            F.coalesce("p_month", "s_month").alias("month_seq"),
            "promo_sales",
            "store_sales",
        )
    )
    carry = W.partitionBy("item_sk").orderBy("month_seq").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        x.select(
            "item_sk",
            "month_seq",
            F.max("promo_sales").over(carry).alias("promo_cumulative"),
            F.max("store_sales").over(carry).alias("store_cumulative"),
        )
        .filter(F.col("promo_cumulative") > F.col("store_cumulative"))
        .orderBy("item_sk", "month_seq")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q59 — week-over-week per-store day-of-week sales ratios (self-join)
# ---------------------------------------------------------------------------

# d_week_seq = days-since-1992-01-01 // 7: weeks of 2000 = [417, 468],
# the same weeks one year earlier = [365, 416] (52-week offset).
_Q59_W1, _Q59_W2 = 417, 365

Q59_ORACLE = f"""
WITH {DS_CTES},
wss AS (
  SELECT d_week_seq, ss_store_sk,
         round(sum(CASE WHEN d_dow = 0 THEN ss_sales_price END), 4) AS sun_sales,
         round(sum(CASE WHEN d_dow = 1 THEN ss_sales_price END), 4) AS mon_sales,
         round(sum(CASE WHEN d_dow = 3 THEN ss_sales_price END), 4) AS wed_sales,
         round(sum(CASE WHEN d_dow = 5 THEN ss_sales_price END), 4) AS fri_sales
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  GROUP BY d_week_seq, ss_store_sk),
y AS (SELECT s_store_name, wss.d_week_seq, ss_store_sk,
             sun_sales, mon_sales, wed_sales, fri_sales
      FROM wss JOIN store ON ss_store_sk = s_store_sk
      WHERE d_week_seq BETWEEN {_Q59_W1} AND {_Q59_W1 + 51}),
x AS (SELECT ss_store_sk, d_week_seq,
             sun_sales, mon_sales, wed_sales, fri_sales
      FROM wss
      WHERE d_week_seq BETWEEN {_Q59_W2} AND {_Q59_W2 + 51})
SELECT y.s_store_name, y.d_week_seq,
       round(y.sun_sales / x.sun_sales, 6) AS sun_ratio,
       round(y.mon_sales / x.mon_sales, 6) AS mon_ratio,
       round(y.wed_sales / x.wed_sales, 6) AS wed_ratio,
       round(y.fri_sales / x.fri_sales, 6) AS fri_ratio
FROM y JOIN x ON y.ss_store_sk = x.ss_store_sk
            AND y.d_week_seq = x.d_week_seq + 52
ORDER BY y.s_store_name, y.d_week_seq
LIMIT 100
"""


@register("tpcds_q59", Q59_ORACLE, tags=("tpcds", "selfjoin", "pivot"))
def tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59 (reference tpcds/q59.sql; 4 of 7 dow columns — the
    fixture week is sparse enough that all-7 yields mostly-null ratios).
    Weekly per-store dow pivot computed ONCE, then self-joined at a
    52-week offset for year-over-year ratios.

    Scale shape: the pivot agg collapses the fact to |store| x |week| rows
    before the self-join, so the join is dim-sized; both sides come from
    the same aggregate (Spark reuses the shuffle via ReusedExchange)."""
    ds = _ds(spark, sf_dir)
    days = [("sun", 0), ("mon", 1), ("wed", 3), ("fri", 5)]
    wss = (
        ds["store_sales"]
        .join(F.broadcast(ds["date_dim"]), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .groupBy("d_week_seq", "ss_store_sk")
        .agg(
            *[
                F.round(
                    F.sum(F.when(F.col("d_dow") == dw, F.col("ss_sales_price"))), 4
                ).alias(f"{nm}_sales")
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
        *[F.col(f"{nm}_sales").alias(f"x_{nm}") for nm, _ in days],
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
            *[
                F.round(F.col(f"{nm}_sales") / F.col(f"x_{nm}"), 6).alias(f"{nm}_ratio")
                for nm, _ in days
            ],
        )
        .orderBy("s_store_name", "d_week_seq")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q50 — return latency bands per store (fact-fact ss x sr join)
# ---------------------------------------------------------------------------

Q50_ORACLE = f"""
WITH {DS_CTES},
j AS (
  SELECT s_store_name, s_company_name, s_city, s_state,
         (sr_returned_date_sk::DATE - ss_sold_date_sk::DATE) AS lag_days
  FROM store_sales
  JOIN store_returns ON ss_ticket_number = sr_ticket_number
                     AND ss_item_sk = sr_item_sk
                     AND ss_line_number = sr_line_number
  JOIN store ON ss_store_sk = s_store_sk
  WHERE year(sr_returned_date_sk) = 1998)
SELECT s_store_name, s_company_name, s_city, s_state,
       count(*) FILTER (WHERE lag_days <= 30) AS d_30,
       count(*) FILTER (WHERE lag_days > 30 AND lag_days <= 60) AS d_31_60,
       count(*) FILTER (WHERE lag_days > 60 AND lag_days <= 90) AS d_61_90,
       count(*) FILTER (WHERE lag_days > 90 AND lag_days <= 120) AS d_91_120,
       count(*) FILTER (WHERE lag_days > 120) AS d_gt_120
FROM j
GROUP BY s_store_name, s_company_name, s_city, s_state
ORDER BY s_store_name, s_company_name, s_city, s_state
"""


@register("tpcds_q50", Q50_ORACLE, tags=("tpcds", "returns", "join", "bands"))
def tpcds_q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q50 (reference tpcds/q50.sql). store_returns is DERIVED as the
    returned-flag lineitems (l_returnflag = 'R'), with the return date =
    l_shipdate — so sold->returned latency is a real, data-driven interval.
    The sale and return facts join on the composite line identity
    (ticket, item, line), then latency is bucketed per store.

    Scale shape: ss joins sr on the same composite key both facts are
    keyed by; the return-year filter prunes sr before the join, and AQE
    picks broadcast vs co-shuffle by the filtered size. One pass over each
    fact, one dim broadcast, one small final agg (|store| groups)."""
    ds = _ds(spark, sf_dir)
    sr = ds["store_returns"].filter(F.year("sr_returned_date_sk") == 1998)
    lag_days = F.datediff("sr_returned_date_sk", "ss_sold_date_sk")
    return (
        ds["store_sales"]
        .join(
            sr,
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
        )
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .select("s_store_name", "s_company_name", "s_city", "s_state", lag_days.alias("lag_days"))
        .groupBy("s_store_name", "s_company_name", "s_city", "s_state")
        .agg(
            F.count_if(F.col("lag_days") <= 30).alias("d_30"),
            F.count_if((F.col("lag_days") > 30) & (F.col("lag_days") <= 60)).alias("d_31_60"),
            F.count_if((F.col("lag_days") > 60) & (F.col("lag_days") <= 90)).alias("d_61_90"),
            F.count_if((F.col("lag_days") > 90) & (F.col("lag_days") <= 120)).alias("d_91_120"),
            F.count_if(F.col("lag_days") > 120).alias("d_gt_120"),
        )
        .orderBy("s_store_name", "s_company_name", "s_city", "s_state")
    )


# ---------------------------------------------------------------------------
# q93 — net paid per customer after subtracting one reason-code's returns
# ---------------------------------------------------------------------------

Q93_ORACLE = f"""
WITH {DS_CTES},
t AS (
  SELECT ss_customer_sk,
         ss_sales_price - coalesce(sr_return_amt, 0) AS act_sales
  FROM store_sales
  LEFT JOIN (SELECT * FROM store_returns WHERE sr_reason_sk = 3) sr
         ON ss_ticket_number = sr_ticket_number
        AND ss_item_sk = sr_item_sk
        AND ss_line_number = sr_line_number)
SELECT ss_customer_sk, round(sum(act_sales), 4) AS sumsales
FROM t
GROUP BY ss_customer_sk
ORDER BY sumsales, ss_customer_sk
LIMIT 100
"""


@register("tpcds_q93", Q93_ORACLE, tags=("tpcds", "returns", "outerjoin"))
def tpcds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 (reference tpcds/q93.sql; the reason dim is derived as
    sr_reason_sk = (ticket*7+line) % 5 — one code selects ~20% of returns).
    LEFT OUTER fact-fact join on line identity: a matched return cancels
    the sale exactly (sr_return_amt equals ss_sales_price by construction,
    so act_sales is exact-0 for matched lines — no float residue), then
    per-customer net sums, ascending top-100.

    Scale shape: the reason filter prunes sr to a fraction before the
    join; both facts share the (ticket,item,line) key. The final agg
    shuffles |customer|-proportional rows."""
    ds = _ds(spark, sf_dir)
    sr = ds["store_returns"].filter(F.col("sr_reason_sk") == 3)
    return (
        ds["store_sales"]
        .join(
            sr,
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
            "left",
        )
        .select(
            "ss_customer_sk",
            (F.col("ss_sales_price") - F.coalesce("sr_return_amt", F.lit(0))).alias("act_sales"),
        )
        .groupBy("ss_customer_sk")
        .agg(F.round(F.sum("act_sales"), 4).alias("sumsales"))
        .orderBy("sumsales", "ss_customer_sk")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q61 — promotional-channel revenue share (two scalar aggregates)
# ---------------------------------------------------------------------------

Q61_ORACLE = f"""
WITH {DS_CTES},
promotional AS (
  SELECT round(sum(ss_ext_sales_price), 4) AS promotions
  FROM store_sales
  JOIN promotion ON ss_promo_sk = p_promo_sk
  JOIN item ON ss_item_sk = i_item_sk
  JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE (p_channel_email = 'Y' OR p_channel_event = 'Y')
    AND i_category = 'Books' AND d_year = 2000 AND d_moy = 11),
all_sales AS (
  SELECT round(sum(ss_ext_sales_price), 4) AS total
  FROM store_sales
  JOIN item ON ss_item_sk = i_item_sk
  JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE i_category = 'Books' AND d_year = 2000 AND d_moy = 11)
SELECT promotions, total,
       round(promotions / total * 100, 6) AS promo_pct
FROM promotional, all_sales
"""


@register("tpcds_q61", Q61_ORACLE, tags=("tpcds", "star", "ratio"))
def tpcds_q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q61 (reference tpcds/q61.sql; gmt-offset store slice mapped
    onto the whole derived store set). Promotional vs total revenue for one
    category-month: two scalar star aggregates cross-joined into a ratio —
    the scalar-subquery-pair shape (reference SparkStrategies plans each as
    its own subtree; here an explicit 1x1 crossJoin).

    Scale shape: both branches scan the fact once with the same
    category/date dims broadcast; the promo branch adds one more broadcast
    dim. No fact shuffle at all — partial+final scalar agg."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter((F.col("d_year") == 2000) & (F.col("d_moy") == 11))
    books = ds["item"].filter(F.col("i_category") == "Books")
    base = (
        ds["store_sales"]
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(books, F.col("ss_item_sk") == F.col("i_item_sk"))
    )
    promo = ds["promotion"].filter(
        (F.col("p_channel_email") == "Y") | (F.col("p_channel_event") == "Y")
    )
    promotional = (
        base.join(F.broadcast(promo), F.col("ss_promo_sk") == F.col("p_promo_sk"))
        .agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("promotions"))
    )
    total = base.agg(F.round(F.sum("ss_ext_sales_price"), 4).alias("total"))
    return promotional.crossJoin(total).select(
        "promotions",
        "total",
        F.round(F.col("promotions") / F.col("total") * 100, 6).alias("promo_pct"),
    )


# ---------------------------------------------------------------------------
# q15 — zip/state/high-ticket disjunction over customer geography
# ---------------------------------------------------------------------------

Q15_ORACLE = f"""
WITH {DS_CTES}
SELECT ca_zip, round(sum(ss_sales_price), 4) AS sum_sales
FROM store_sales
JOIN customer_dim ON ss_customer_sk = c_customer_sk
JOIN customer_address ON c_current_addr_sk = ca_address_sk
JOIN date_dim ON ss_sold_date_sk = d_date_sk
WHERE (substr(ca_zip, 1, 4) IN ('0001', '0003', '0005', '0008')
       OR ca_state IN ('ST_3', 'ST_5')
       OR ss_sales_price > 5000)
  AND d_qoy = 2 AND d_year = 2000
GROUP BY ca_zip
ORDER BY ca_zip
"""


@register("tpcds_q15", Q15_ORACLE, tags=("tpcds", "star", "disjunction"))
def tpcds_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q15 (reference tpcds/q15.sql; catalog channel mapped onto the
    store fact — the fixtures model one channel). The WHERE is a
    cross-table disjunction (address zip/state OR fact-side ticket value),
    so it CANNOT push below the customer joins — it filters the joined
    stream, exactly as stock TPC-DS plans it.

    Scale shape: fact -> customer -> address are the only SF-proportional
    joins (customer keys); date_dim broadcasts. The final agg groups by
    ~97 zips."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter((F.col("d_qoy") == 2) & (F.col("d_year") == 2000))
    return (
        ds["store_sales"]
        .join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .join(ds["customer_address"], F.col("c_current_addr_sk") == F.col("ca_address_sk"))
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .filter(
            F.substring("ca_zip", 1, 4).isin("0001", "0003", "0005", "0008")
            | F.col("ca_state").isin("ST_3", "ST_5")
            | (F.col("ss_sales_price") > 5000)
        )
        .groupBy("ca_zip")
        .agg(F.round(F.sum("ss_sales_price"), 4).alias("sum_sales"))
        .orderBy("ca_zip")
    )


# ---------------------------------------------------------------------------
# q45 — zip-list OR item-subquery disjunction
# ---------------------------------------------------------------------------

Q45_ORACLE = f"""
WITH {DS_CTES}
SELECT ca_zip, ca_city, round(sum(ss_sales_price), 4) AS sum_sales
FROM store_sales
JOIN customer_dim ON ss_customer_sk = c_customer_sk
JOIN customer_address ON c_current_addr_sk = ca_address_sk
JOIN item ON ss_item_sk = i_item_sk
JOIN date_dim ON ss_sold_date_sk = d_date_sk
WHERE (substr(ca_zip, 1, 4) IN ('0002', '0004', '0006', '0009')
       OR i_item_id IN (SELECT i_item_id FROM item
                        WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
  AND d_qoy = 1 AND d_year = 1999
GROUP BY ca_zip, ca_city
ORDER BY ca_zip, ca_city
LIMIT 100
"""


@register("tpcds_q45", Q45_ORACLE, tags=("tpcds", "star", "disjunction", "subquery"))
def tpcds_q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q45 (reference tpcds/q45.sql). The classic OR-of-IN-subquery:
    zip in a literal list OR item_id in a subquery's result. An IN-subquery
    under OR cannot decorrelate to a semi-join, so it is built as a
    broadcast left-join flag (matched => qualifies) — the same hash-lookup
    the reference's BroadcastHashJoin-as-ExistenceJoin performs
    (SparkStrategies.scala:247 ExtractEquiJoinKeys -> ExistenceJoin).

    Scale shape: the qualifying-item set is 10 rows -> broadcast flag join
    costs nothing; everything else is the q15 geography pipeline plus the
    item dim join."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter((F.col("d_qoy") == 1) & (F.col("d_year") == 1999))
    qual_items = (
        ds["item"]
        .filter(F.col("i_item_sk").isin(2, 3, 5, 7, 11, 13, 17, 19, 23, 29))
        .select(F.col("i_item_id").alias("qual_item_id"))
        .distinct()
        .withColumn("item_ok", F.lit(True))
    )
    return (
        ds["store_sales"]
        .join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .join(ds["customer_address"], F.col("c_current_addr_sk") == F.col("ca_address_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(qual_items), F.col("i_item_id") == F.col("qual_item_id"), "left")
        .filter(
            F.substring("ca_zip", 1, 4).isin("0002", "0004", "0006", "0009")
            | F.coalesce("item_ok", F.lit(False))
        )
        .groupBy("ca_zip", "ca_city")
        .agg(F.round(F.sum("ss_sales_price"), 4).alias("sum_sales"))
        .orderBy("ca_zip", "ca_city")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q79 — per-ticket amounts for high-dependency households on Mondays
# ---------------------------------------------------------------------------

Q79_ORACLE = f"""
WITH {DS_CTES},
per_ticket AS (
  SELECT ss_ticket_number, ss_customer_sk, s_city,
         round(sum(ss_coupon_amt), 4) AS amt,
         round(sum(ss_net_profit), 4) AS profit
  FROM store_sales
  JOIN date_dim ON ss_sold_date_sk = d_date_sk
  JOIN store ON ss_store_sk = s_store_sk
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  WHERE (hd_dep_count = 8 OR hd_vehicle_count > 3)
    AND d_dow = 1 AND d_year BETWEEN 1998 AND 2000
  GROUP BY ss_ticket_number, ss_customer_sk, s_city)
SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS city,
       ss_ticket_number, amt, profit
FROM per_ticket
JOIN customer_dim ON ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, city, profit, ss_ticket_number
LIMIT 100
"""


@register("tpcds_q79", Q79_ORACLE, tags=("tpcds", "star", "perticket"))
def tpcds_q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q79 (reference tpcds/q79.sql). Monday shoppers from
    high-dependency households: per-(ticket, customer, city) amounts, then
    the customer dim joins AFTER the aggregate — the agg collapses the
    fact to ticket granularity first, so the name join touches |tickets|
    rows, not |lines| (the same agg-before-join the stock plan does).

    Scale shape: three broadcast dims filter the fact in the scan stage;
    the per-ticket agg shuffles on the ticket composite; the customer join
    keys the aggregated rows."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter((F.col("d_dow") == 1) & F.col("d_year").between(1998, 2000))
    hd = ds["household_demographics"].filter(
        (F.col("hd_dep_count") == 8) | (F.col("hd_vehicle_count") > 3)
    )
    per_ticket = (
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
        per_ticket.join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
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
# q1 — customers returning more than 1.2x their store's average
# ---------------------------------------------------------------------------

Q1_ORACLE = f"""
WITH {DS_CTES},
customer_total_return AS (
  SELECT sr_customer_sk AS ctr_customer_sk,
         sr_store_sk AS ctr_store_sk,
         sum(sr_return_amt) AS ctr_total_return
  FROM store_returns JOIN date_dim ON sr_returned_date_sk = d_date_sk
  WHERE d_year = 2000
  GROUP BY sr_customer_sk, sr_store_sk),
store_avg AS (
  SELECT ctr_store_sk, avg(ctr_total_return) * 1.2 AS cutoff
  FROM customer_total_return GROUP BY ctr_store_sk)
SELECT c.c_customer_sk, ctr.ctr_store_sk AS store_sk, c.c_last_name,
       round(ctr.ctr_total_return, 4) AS total_return
FROM customer_total_return ctr
JOIN store_avg sa ON ctr.ctr_store_sk = sa.ctr_store_sk
JOIN store s ON s.s_store_sk = ctr.ctr_store_sk
JOIN customer_dim c ON c.c_customer_sk = ctr.ctr_customer_sk
WHERE ctr.ctr_total_return > sa.cutoff AND s.s_state = 'ST_1'
ORDER BY c.c_customer_sk, store_sk
LIMIT 100
"""


@register("tpcds_q1", Q1_ORACLE, tags=("tpcds", "star", "subquery", "returns"))
def tpcds_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1 (reference tpcds/q1.sql; 'TN' retargeted to the derived
    ST_1). The corpus's canonical correlated-aggregate pattern: per
    (customer, store) return totals compared against 1.2x the per-store
    average of those SAME totals. Decorrelated as Catalyst would
    (RewriteCorrelatedScalarSubquery): the CTE aggregate is built once and
    self-joined against its own per-store re-aggregate — the second pass is
    a ReusedExchange of the first's shuffle, not a second scan of the fact.
    The cutoff comparison stays on unrounded doubles (identical inputs both
    engines — see the q6 note).

    Scale: store_avg is |stores| rows (broadcast); the ctr⋈avg join is
    co-partitioned on store_sk only after the (customer, store) agg has
    already collapsed the fact, so the big shuffle happens exactly once."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter(F.col("d_year") == 2000).select("d_date_sk")
    ctr = (
        ds["store_returns"]
        .join(F.broadcast(dd), F.col("sr_returned_date_sk") == F.col("d_date_sk"))
        .groupBy("sr_customer_sk", "sr_store_sk")
        .agg(F.sum("sr_return_amt").alias("ctr_total_return"))
    )
    store_avg = ctr.groupBy("sr_store_sk").agg(
        (F.avg("ctr_total_return") * 1.2).alias("cutoff")
    ).withColumnRenamed("sr_store_sk", "avg_store_sk")
    st = ds["store"].filter(F.col("s_state") == "ST_1").select("s_store_sk")
    return (
        ctr.join(F.broadcast(store_avg), F.col("sr_store_sk") == F.col("avg_store_sk"))
        .filter(F.col("ctr_total_return") > F.col("cutoff"))
        .join(F.broadcast(st), F.col("sr_store_sk") == F.col("s_store_sk"), "left_semi")
        .join(ds["customer_dim"], F.col("sr_customer_sk") == F.col("c_customer_sk"))
        .select(
            "c_customer_sk",
            F.col("sr_store_sk").alias("store_sk"),
            "c_last_name",
            F.round("ctr_total_return", 4).alias("total_return"),
        )
        .orderBy("c_customer_sk", "store_sk")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q24 — returns-matched sales per (customer, store), self-average threshold
# ---------------------------------------------------------------------------

Q24_ORACLE = f"""
WITH {DS_CTES},
ssales AS (
  SELECT c.c_last_name, s.s_store_name, i.i_class,
         sum(ss.ss_sales_price) AS netpaid
  FROM store_sales ss
  JOIN store_returns sr ON ss.ss_ticket_number = sr.sr_ticket_number
                       AND ss.ss_item_sk = sr.sr_item_sk
                       AND ss.ss_line_number = sr.sr_line_number
  JOIN store s ON ss.ss_store_sk = s.s_store_sk
  JOIN item i ON ss.ss_item_sk = i.i_item_sk
  JOIN customer_dim c ON ss.ss_customer_sk = c.c_customer_sk
  WHERE s.s_state IN ('ST_1', 'ST_2')
  GROUP BY c.c_last_name, s.s_store_name, i.i_class
)
SELECT c_last_name, s_store_name, round(sum(netpaid), 4) AS paid
FROM ssales
WHERE i_class = 'PROMO'
GROUP BY c_last_name, s_store_name
HAVING sum(netpaid) > (SELECT 0.05 * avg(netpaid) FROM ssales)
ORDER BY c_last_name, s_store_name
"""


@register("tpcds_q24", Q24_ORACLE, tags=("tpcds", "returns", "subquery"))
def tpcds_q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q24 (reference tpcds/q24a.sql; color -> i_class, zip filter ->
    derived states). Distinct shape in the corpus: the fact joins its OWN
    returns channel on the (ticket, item, line) compound key — a fact-fact
    join both sides of which shuffle on the same composite key — and the
    HAVING threshold is a scalar subquery over the SAME aggregated CTE
    (ssales built once; the global avg is a one-row broadcast; Catalyst
    plans the second pass as a ReusedExchange of the first's shuffle).
    Sum comparison stays on unrounded doubles (identical inputs both
    engines, q6/q1 note)."""
    ds = _ds(spark, sf_dir)
    st = ds["store"].filter(F.col("s_state").isin("ST_1", "ST_2"))
    sr = ds["store_returns"].select(
        F.col("sr_ticket_number").alias("t"),
        F.col("sr_item_sk").alias("i"),
        F.col("sr_line_number").alias("ln"),
    )
    ssales = (
        ds["store_sales"]
        .join(
            sr,
            (F.col("ss_ticket_number") == F.col("t"))
            & (F.col("ss_item_sk") == F.col("i"))
            & (F.col("ss_line_number") == F.col("ln")),
        )
        .join(F.broadcast(st), F.col("ss_store_sk") == F.col("s_store_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(ds["customer_dim"], F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .groupBy("c_last_name", "s_store_name", "i_class")
        .agg(F.sum("ss_sales_price").alias("netpaid"))
    )
    threshold = ssales.agg((F.avg("netpaid") * 0.05).alias("cutoff"))
    return (
        ssales.filter(F.col("i_class") == "PROMO")
        .groupBy("c_last_name", "s_store_name")
        .agg(F.sum("netpaid").alias("paid_raw"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("paid_raw") > F.col("cutoff"))
        .select("c_last_name", "s_store_name", F.round("paid_raw", 4).alias("paid"))
        .orderBy("c_last_name", "s_store_name")
    )


# ---------------------------------------------------------------------------
# q44 — best and worst performing items by average net profit
# ---------------------------------------------------------------------------

Q44_ORACLE = f"""
WITH {DS_CTES},
perf AS (
  SELECT ss_item_sk, avg(ss_net_profit) AS avg_profit
  FROM store_sales WHERE ss_store_sk = 4
  GROUP BY ss_item_sk
), ranked AS (
  SELECT ss_item_sk, avg_profit,
         row_number() OVER (ORDER BY avg_profit DESC, ss_item_sk) AS best_rk,
         row_number() OVER (ORDER BY avg_profit ASC, ss_item_sk) AS worst_rk
  FROM perf
)
SELECT b.best_rk AS rnk, ib.i_item_desc AS best_performing, iw.i_item_desc AS worst_performing
FROM ranked b
JOIN ranked w ON b.best_rk = w.worst_rk
JOIN item ib ON ib.i_item_sk = b.ss_item_sk
JOIN item iw ON iw.i_item_sk = w.ss_item_sk
WHERE b.best_rk <= 10
ORDER BY rnk
"""


@register("tpcds_q44", Q44_ORACLE, tags=("tpcds", "window", "selfjoin"))
def tpcds_q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q44 (reference tpcds/q44.sql, without the null-hdemo branch the
    derived fact cannot produce). Shape: ONE aggregate ranked twice
    (ascending and descending row_number), self-joined on rank to pair the
    k-th best with the k-th worst item — rank alignment, not a top-k. The
    global windows are UNPARTITIONED by the spec; they run AFTER the
    per-item aggregate, so the single-reducer sort sees |items| rows, not
    the fact (the same bounded-input justification as win_ntile_pctrank;
    deterministic via the item_sk tie-break)."""
    ds = _ds(spark, sf_dir)
    perf = (
        ds["store_sales"]
        .filter(F.col("ss_store_sk") == 4)
        .groupBy("ss_item_sk")
        .agg(F.avg("ss_net_profit").alias("avg_profit"))
    )
    ranked = perf.select(
        "ss_item_sk",
        F.row_number().over(W.orderBy(F.desc("avg_profit"), F.col("ss_item_sk"))).alias("best_rk"),
        F.row_number().over(W.orderBy(F.asc("avg_profit"), F.col("ss_item_sk"))).alias("worst_rk"),
    )
    item = ds["item"].select("i_item_sk", "i_item_desc")
    best = ranked.filter(F.col("best_rk") <= 10).select(
        F.col("best_rk").alias("rnk"), F.col("ss_item_sk").alias("bsk")
    )
    worst = ranked.select(F.col("worst_rk").alias("rnk2"), F.col("ss_item_sk").alias("wsk"))
    return (
        best.join(worst, F.col("rnk") == F.col("rnk2"))
        .join(item.withColumnRenamed("i_item_desc", "best_performing"), F.col("bsk") == F.col("i_item_sk"))
        .drop("i_item_sk")
        .join(item.withColumnRenamed("i_item_desc", "worst_performing"), F.col("wsk") == F.col("i_item_sk"))
        .select("rnk", "best_performing", "worst_performing")
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# q9 — banded conditional averages (15 scalar subqueries -> one pass)
# ---------------------------------------------------------------------------

def _q9_bands() -> list[tuple[int, int, int]]:
    # (lo, hi, count_threshold); quantity domain is 1..50 in the fixtures.
    return [(1, 10, 15000), (11, 20, 15000), (21, 30, 15000), (31, 40, 15000), (41, 50, 15000)]


def _q9_oracle() -> str:
    cols = []
    for i, (lo, hi, th) in enumerate(_q9_bands(), 1):
        band = f"ss_quantity BETWEEN {lo} AND {hi}"
        cols.append(
            f"CASE WHEN count(*) FILTER (WHERE {band}) > {th} "
            f"THEN round(avg(ss_coupon_amt) FILTER (WHERE {band}), 4) "
            f"ELSE round(avg(ss_ext_tax) FILTER (WHERE {band}), 4) END AS bucket{i}"
        )
    sel = ",\n       ".join(cols)
    return f"""
WITH {{ctes}}
SELECT {sel}
FROM store_sales
""".replace("{ctes}", DS_CTES)


Q9_ORACLE = _q9_oracle()


@register("tpcds_q9", Q9_ORACLE, tags=("tpcds", "star", "subquery", "conditional"))
def tpcds_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q9 (reference tpcds/q9.sql; thresholds retargeted to the
    fixture's 1..50 quantity domain). The spec writes 15 scalar subqueries —
    5 quantity bands x (count, avg-if-high, avg-if-low) — each a separate
    fact scan in a naive plan. Spark-first re-expression: ONE pass with
    15 FILTER-ed aggregates (partial+final, map-side combined), then the
    CASE picks per band. At 100 TB that is 1 scan instead of 15 — the
    textbook case for collapsing scalar subqueries over the same fact into
    conditional aggregation. Averages on exact-4-decimal inputs round at 4
    (cross-engine policy, tpch.py)."""
    ds = _ds(spark, sf_dir)
    aggs = []
    for i, (lo, hi, th) in enumerate(_q9_bands(), 1):
        band = F.col("ss_quantity").between(lo, hi)
        aggs.append(F.count(F.when(band, 1)).alias(f"n{i}"))
        aggs.append(F.round(F.avg(F.when(band, F.col("ss_coupon_amt"))), 4).alias(f"hi{i}"))
        aggs.append(F.round(F.avg(F.when(band, F.col("ss_ext_tax"))), 4).alias(f"lo{i}"))
    one = ds["store_sales"].agg(*aggs)
    out = []
    for i, (lo, hi, th) in enumerate(_q9_bands(), 1):
        out.append(
            F.when(F.col(f"n{i}") > th, F.col(f"hi{i}")).otherwise(F.col(f"lo{i}")).alias(f"bucket{i}")
        )
    return one.select(*out)


# ---------------------------------------------------------------------------
# q41 — dimension-only correlated EXISTS count
# ---------------------------------------------------------------------------

Q41_ORACLE = f"""
WITH {DS_CTES}
SELECT DISTINCT i1.i_item_desc AS i_product_name
FROM item i1
WHERE i1.i_manufact_id BETWEEN 1 AND 2
  AND (SELECT count(*) FROM item i2
       WHERE i2.i_manufact = i1.i_manufact
         AND i2.i_category IN ('Sports', 'Books')
         AND i2.i_current_price BETWEEN 940 AND 960) > 0
ORDER BY i_product_name
LIMIT 100
"""


@register("tpcds_q41", Q41_ORACLE, tags=("tpcds", "dimension", "subquery"))
def tpcds_q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q41 (reference tpcds/q41.sql; color/size/unit predicates
    retargeted to derived category/price). A DIMENSION-ONLY query: the
    correlated count(*) > 0 over the same dimension decorrelates to a
    left-semi self-join on i_manufact — no fact table touched at all, the
    plan the optimizer should (and does) produce instead of a per-row
    subquery loop. Both sides are |item| rows; AQE broadcasts the filtered
    probe side."""
    ds = _ds(spark, sf_dir)
    i1 = ds["item"].filter(F.col("i_manufact_id").between(1, 2))
    probe = (
        ds["item"]
        .filter(
            F.col("i_category").isin("Sports", "Books")
            & F.col("i_current_price").between(940, 960)
        )
        .select(F.col("i_manufact").alias("m2"))
    )
    return (
        i1.join(probe, F.col("i_manufact") == F.col("m2"), "left_semi")
        .select(F.col("i_item_desc").alias("i_product_name"))
        .distinct()
        .orderBy("i_product_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q28 — banded list-price stats with per-band distinct counts
# ---------------------------------------------------------------------------

def _q28_bands() -> list[tuple[int, int]]:
    return [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)]


def _q28_oracle() -> str:
    cols = []
    for i, (lo, hi) in enumerate(_q28_bands(), 1):
        b = f"ss_quantity BETWEEN {lo} AND {hi}"
        cols.append(f"round(avg(ss_list_price) FILTER (WHERE {b}), 4) AS b{i}_avg")
        cols.append(f"count(ss_list_price) FILTER (WHERE {b}) AS b{i}_cnt")
        cols.append(
            f"count(DISTINCT CASE WHEN {b} THEN ss_list_price END) AS b{i}_cntd"
        )
    sel = ",\n       ".join(cols)
    return f"""
WITH {{ctes}}
SELECT {sel}
FROM store_sales
""".replace("{ctes}", DS_CTES)


Q28_ORACLE = _q28_oracle()


@register("tpcds_q28", Q28_ORACLE, tags=("tpcds", "star", "distinct", "conditional"))
def tpcds_q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q28 (reference tpcds/q28.sql; 6 price-band subqueries -> 5
    quantity bands on the fixture domain). Each band needs avg, count AND
    count(DISTINCT) — the distinct forces Catalyst's Expand-based
    multi-distinct rewrite: one scan fans each row into one replica per
    distinct group (ExpandExec, the same machinery as grouping sets), then
    two aggregate levels. The spec's 5 separate fact scans collapse into
    that single Expand pass — scan once, not 5 times, at 100 TB."""
    ds = _ds(spark, sf_dir)
    aggs = []
    for i, (lo, hi) in enumerate(_q28_bands(), 1):
        b = F.col("ss_quantity").between(lo, hi)
        aggs.append(F.round(F.avg(F.when(b, F.col("ss_list_price"))), 4).alias(f"b{i}_avg"))
        aggs.append(F.count(F.when(b, F.col("ss_list_price"))).alias(f"b{i}_cnt"))
        aggs.append(
            F.count_distinct(F.when(b, F.col("ss_list_price"))).alias(f"b{i}_cntd")
        )
    return ds["store_sales"].agg(*aggs)


# ---------------------------------------------------------------------------
# q70 — state/county profit rollup, filtered to top-5 states by a window
# ---------------------------------------------------------------------------

Q70_ORACLE = f"""
WITH {DS_CTES},
top_states AS (
  SELECT s_state FROM (
    SELECT s.s_state,
           rank() OVER (ORDER BY sum(ss.ss_net_profit) DESC, s.s_state) AS r
    FROM store_sales ss JOIN store s ON ss.ss_store_sk = s.s_store_sk
    GROUP BY s.s_state
  ) t WHERE r <= 5
)
SELECT round(sum(ss.ss_net_profit), 4) AS total_sum,
       CASE WHEN grouping(s.s_state) = 1 THEN NULL ELSE s.s_state END AS state,
       CASE WHEN grouping(s.s_city) = 1 THEN NULL ELSE s.s_city END AS city,
       grouping(s.s_state) + grouping(s.s_city) AS lochierarchy
FROM store_sales ss
JOIN store s ON ss.ss_store_sk = s.s_store_sk
WHERE s.s_state IN (SELECT s_state FROM top_states)
GROUP BY ROLLUP (s.s_state, s.s_city)
ORDER BY lochierarchy DESC, state NULLS FIRST, city NULLS FIRST
"""


@register("tpcds_q70", Q70_ORACLE, tags=("tpcds", "rollup", "window", "subquery"))
def tpcds_q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q70 (reference tpcds/q70.sql; county -> derived city). Two
    passes over the fact: pass 1 aggregates per state and RANKS states by a
    window over that 7-row aggregate (the classic filter-by-windowed-
    aggregate subquery, decorrelated to a left-semi join); pass 2 rolls up
    (state, city) for the surviving states. The rank window runs on
    |states| rows — after aggregation, never on the fact."""
    ds = _ds(spark, sf_dir)
    joined = ds["store_sales"].join(
        F.broadcast(ds["store"].select("s_store_sk", "s_state", "s_city")),
        F.col("ss_store_sk") == F.col("s_store_sk"),
    )
    per_state = joined.groupBy("s_state").agg(F.sum("ss_net_profit").alias("p"))
    top = (
        per_state.select(
            "s_state", F.rank().over(W.orderBy(F.desc("p"), F.col("s_state"))).alias("r")
        )
        .filter(F.col("r") <= 5)
        .select("s_state")
    )
    return (
        joined.join(F.broadcast(top), "s_state", "left_semi")
        .rollup("s_state", "s_city")
        .agg(
            F.round(F.sum("ss_net_profit"), 4).alias("total_sum"),
            F.grouping("s_state").alias("g_state"),
            F.grouping("s_city").alias("g_city"),
        )
        .select(
            "total_sum",
            F.when(F.col("g_state") == 1, None).otherwise(F.col("s_state")).alias("state"),
            F.when(F.col("g_city") == 1, None).otherwise(F.col("s_city")).alias("city"),
            (F.col("g_state") + F.col("g_city")).alias("lochierarchy"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.col("state").asc_nulls_first(),
            F.col("city").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# q67 — 8-level rollup ranked per category
# ---------------------------------------------------------------------------

Q67_ORACLE = f"""
WITH {DS_CTES},
agg AS (
  SELECT i.i_category, i.i_class, i.i_brand, i.i_item_desc AS i_product_name,
         d.d_year, d.d_qoy, d.d_moy, s.s_store_name AS s_store_id,
         sum(CAST(round(ss.ss_sales_price * 10000) AS BIGINT) * ss.ss_quantity) / 10000.0 AS sumsales
  FROM store_sales ss
  JOIN date_dim d ON ss.ss_sold_date_sk = d.d_date_sk
  JOIN item i ON ss.ss_item_sk = i.i_item_sk
  JOIN store s ON ss.ss_store_sk = s.s_store_sk
  WHERE d.d_year = 2000
  GROUP BY ROLLUP (i.i_category, i.i_class, i.i_brand, i.i_item_desc,
                   d.d_year, d.d_qoy, d.d_moy, s.s_store_name)
)
SELECT * FROM (
  SELECT agg.*,
         rank() OVER (PARTITION BY i_category ORDER BY sumsales DESC) AS rk
  FROM agg
) t
WHERE rk <= 10
ORDER BY i_category NULLS FIRST, rk, i_class NULLS FIRST, i_brand NULLS FIRST,
         i_product_name NULLS FIRST, d_year NULLS FIRST, d_qoy NULLS FIRST,
         d_moy NULLS FIRST, s_store_id NULLS FIRST
"""


@register("tpcds_q67", Q67_ORACLE, tags=("tpcds", "rollup", "window"))
def tpcds_q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 (reference tpcds/q67.sql; rk cut 100 -> 10 for fixture
    scale). The corpus's heaviest grouping query: an 8-column ROLLUP (9
    aggregation levels, one ExpandExec fanning every fact row 9x) followed
    by a per-category rank over the aggregate. Scale notes: the Expand
    multiplies shuffle input 9x — the real-cluster mitigation is partial
    aggregation before the Expand shuffle (map-side combine per level,
    which Spark applies automatically); the rank window partitions on
    i_category over ALREADY-AGGREGATED rows. Ties share ranks in both
    engines, so the rk <= 10 row SET is deterministic even where sumsales
    ties. sumsales is an exact BIGINT ten-thousandths sum divided once at
    display — round(sum(double), 4) tied in the last digit at sf0.1 under
    the strict sweep."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter(F.col("d_year") == 2000)
    agg = (
        ds["store_sales"]
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .rollup(
            "i_category", "i_class", "i_brand", "i_item_desc",
            "d_year", "d_qoy", "d_moy", "s_store_name",
        )
        .agg(
            (
                F.sum(F.round(F.col("ss_sales_price") * 10000).cast("bigint") * F.col("ss_quantity"))
                / 10000.0
            ).alias("sumsales")
        )
        .select(
            "i_category", "i_class", "i_brand",
            F.col("i_item_desc").alias("i_product_name"),
            "d_year", "d_qoy", "d_moy",
            F.col("s_store_name").alias("s_store_id"),
            "sumsales",
        )
    )
    w = W.partitionBy("i_category").orderBy(F.desc("sumsales"))
    return (
        agg.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 10)
        .orderBy(
            F.col("i_category").asc_nulls_first(),
            "rk",
            F.col("i_class").asc_nulls_first(),
            F.col("i_brand").asc_nulls_first(),
            F.col("i_product_name").asc_nulls_first(),
            F.col("d_year").asc_nulls_first(),
            F.col("d_qoy").asc_nulls_first(),
            F.col("d_moy").asc_nulls_first(),
            F.col("s_store_id").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# q2 — week-over-week cross-channel (web + catalog) day-of-week ratios
# ---------------------------------------------------------------------------

_Q2_DOW = {0: "sun", 1: "mon", 2: "tue", 3: "wed", 4: "thu", 5: "fri", 6: "sat"}

Q2_ORACLE = f"""
WITH {DS_CTES},
wscs AS (
  SELECT ws_sold_date_sk AS sold_date_sk, ws_ext_sales_price AS sales_price FROM web_sales
  UNION ALL
  SELECT cs_sold_date_sk, cs_ext_sales_price FROM catalog_sales
), wswscs AS (
  SELECT d_week_seq,
         {", ".join(f"round(sum(CASE WHEN d_dow = {k} THEN sales_price END), 4) AS {v}_sales" for k, v in _Q2_DOW.items())}
  FROM wscs JOIN date_dim ON sold_date_sk = d_date_sk
  GROUP BY d_week_seq
), y AS (
  SELECT * FROM wswscs
  WHERE d_week_seq IN (SELECT DISTINCT d_week_seq FROM date_dim WHERE d_year = 1996)
), z AS (
  SELECT * FROM wswscs
  WHERE d_week_seq IN (SELECT DISTINCT d_week_seq FROM date_dim WHERE d_year = 1997)
)
SELECT y.d_week_seq AS d_week_seq1,
       {", ".join(f"round(y.{v}_sales / z.{v}_sales, 6) AS {v}_ratio" for v in _Q2_DOW.values())}
FROM y JOIN z ON y.d_week_seq = z.d_week_seq - 53
ORDER BY d_week_seq1
"""


@register("tpcds_q2", Q2_ORACLE, tags=("tpcds", "crosschannel", "pivot"))
def tpcds_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q2 (reference tpcds/q2.sql; years retargeted 2001/2002 ->
    1996/1997): union the web and catalog channels, pivot each week's sales
    by day-of-week (conditional aggregation — one hash-agg, no ExpandExec),
    then self-join week w against week w+53 one year later and emit the
    per-day year-over-year ratios. Scale notes: the channel union is a
    UnionExec over two projections of the same fact scan (no shuffle); the
    week pivot is one partial+final agg keyed by d_week_seq; the
    year-over-year step joins two ALREADY-AGGREGATED frames (~weeks rows),
    broadcast-sized at any SF. Ratio rounding at 6 per the cross-engine
    policy (tpch.py)."""
    ds = _ds(spark, sf_dir)
    wscs = ds["web_sales"].select(
        F.col("ws_sold_date_sk").alias("sold_date_sk"),
        F.col("ws_ext_sales_price").alias("sales_price"),
    ).unionAll(
        ds["catalog_sales"].select("cs_sold_date_sk", "cs_ext_sales_price")
    )
    wswscs = (
        wscs.join(F.broadcast(ds["date_dim"]), F.col("sold_date_sk") == F.col("d_date_sk"))
        .groupBy("d_week_seq")
        .agg(*[
            F.round(F.sum(F.when(F.col("d_dow") == k, F.col("sales_price"))), 4).alias(f"{v}_sales")
            for k, v in _Q2_DOW.items()
        ])
    )
    weeks_of = lambda yr: (  # noqa: E731 — tiny local helper
        ds["date_dim"].filter(F.col("d_year") == yr).select("d_week_seq").distinct()
    )
    y = wswscs.join(F.broadcast(weeks_of(1996)), "d_week_seq", "left_semi")
    z = wswscs.join(F.broadcast(weeks_of(1997)), "d_week_seq", "left_semi")
    zr = z.select(
        (F.col("d_week_seq") - 53).alias("join_seq"),
        *[F.col(f"{v}_sales").alias(f"{v}_sales2") for v in _Q2_DOW.values()],
    )
    return (
        y.join(zr, F.col("d_week_seq") == F.col("join_seq"))
        .select(
            F.col("d_week_seq").alias("d_week_seq1"),
            *[
                F.round(F.col(f"{v}_sales") / F.col(f"{v}_sales2"), 6).alias(f"{v}_ratio")
                for v in _Q2_DOW.values()
            ],
        )
        .orderBy("d_week_seq1")
    )


# ---------------------------------------------------------------------------
# q12 / q20 — channel revenue rollup with class-share window ratio
# ---------------------------------------------------------------------------

def _q12_style_oracle(fact: str, prefix: str, year: int, moy: int) -> str:
    return f"""
WITH {DS_CTES}
SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       round(sum({prefix}_ext_sales_price), 4) AS itemrevenue,
       round(sum({prefix}_ext_sales_price) * 100 /
             sum(sum({prefix}_ext_sales_price)) OVER (PARTITION BY i_class), 6) AS revenueratio
FROM {fact} JOIN item ON {prefix}_item_sk = i_item_sk
            JOIN date_dim ON {prefix}_sold_date_sk = d_date_sk
WHERE i_category IN ('Sports', 'Books', 'Home') AND d_year = {year} AND d_moy = {moy}
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
"""


def _q12_style(spark: SparkSession, sf_dir: str, fact: str, prefix: str, year: int, moy: int) -> DataFrame:
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter((F.col("d_year") == year) & (F.col("d_moy") == moy))
    items = ds["item"].filter(F.col("i_category").isin("Sports", "Books", "Home"))
    agg = (
        ds[fact]
        .join(items, F.col(f"{prefix}_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(dd), F.col(f"{prefix}_sold_date_sk") == F.col("d_date_sk"))
        .groupBy("i_item_id", "i_item_desc", "i_category", "i_class", "i_current_price")
        .agg(F.sum(f"{prefix}_ext_sales_price").alias("rev"))
    )
    w = W.partitionBy("i_class")
    return (
        agg.select(
            "i_item_id", "i_item_desc", "i_category", "i_class", "i_current_price",
            F.round(F.col("rev"), 4).alias("itemrevenue"),
            F.round(F.col("rev") * 100 / F.sum("rev").over(w), 6).alias("revenueratio"),
        )
        .orderBy("i_category", "i_class", "i_item_id", "i_item_desc", "revenueratio")
    )


@register("tpcds_q12", _q12_style_oracle("web_sales", "ws", 1996, 3), tags=("tpcds", "web", "window"))
def tpcds_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q12 (reference tpcds/q12.sql; 30-day window -> one fixture
    month, categories retargeted): web-channel item revenue with each
    item's share of its class via a window over the aggregate. Plan: the
    category filter prunes item BEFORE the fact join (predicate pushdown);
    date_dim is broadcast; the share window partitions on i_class over
    already-aggregated rows — one fact-side shuffle total. i_item_id is
    unique per group, so the ORDER BY is deterministic."""
    return _q12_style(spark, sf_dir, "web_sales", "ws", 1996, 3)


@register("tpcds_q20", _q12_style_oracle("catalog_sales", "cs", 1997, 6), tags=("tpcds", "catalog", "window"))
def tpcds_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q20 (reference tpcds/q20.sql) — q12's catalog-channel twin
    (same operator shape, different channel fact + period), exercising the
    derived catalog_sales star end-to-end."""
    return _q12_style(spark, sf_dir, "catalog_sales", "cs", 1997, 6)


# ---------------------------------------------------------------------------
# q33 — manufacturer sales ACROSS all three channels
# ---------------------------------------------------------------------------

Q33_ORACLE = f"""
WITH {DS_CTES},
mf AS (SELECT DISTINCT i_brand_id FROM item WHERE i_category = 'Books'),
ss_c AS (
  SELECT i_brand_id, sum(ss_ext_sales_price) AS total_sales
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN item ON ss_item_sk = i_item_sk
  WHERE i_brand_id IN (SELECT i_brand_id FROM mf)
    AND d_year = 1996 AND d_moy = 5
  GROUP BY i_brand_id),
cs_c AS (
  SELECT i_brand_id, sum(cs_ext_sales_price) AS total_sales
  FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
                     JOIN item ON cs_item_sk = i_item_sk
  WHERE i_brand_id IN (SELECT i_brand_id FROM mf)
    AND d_year = 1996 AND d_moy = 5
  GROUP BY i_brand_id),
ws_c AS (
  SELECT i_brand_id, sum(ws_ext_sales_price) AS total_sales
  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
                 JOIN item ON ws_item_sk = i_item_sk
  WHERE i_brand_id IN (SELECT i_brand_id FROM mf)
    AND d_year = 1996 AND d_moy = 5
  GROUP BY i_brand_id)
SELECT i_brand_id, round(sum(total_sales), 4) AS total_sales
FROM (SELECT * FROM ss_c UNION ALL SELECT * FROM cs_c UNION ALL SELECT * FROM ws_c) x
GROUP BY i_brand_id
ORDER BY i_brand_id
"""


@register("tpcds_q33", Q33_ORACLE, tags=("tpcds", "crosschannel", "agg"))
def tpcds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q33 (reference tpcds/q33.sql; the address-GMT filter has no
    fixture counterpart and is dropped; grouped by i_brand_id instead of
    i_manufact_id — the derived manufact domain is only 1..3, which would
    collapse the verified output to a single row): per-brand revenue summed
    over the store + catalog + web channels for one month, restricted to
    manufacturers selling the 'Books' category. Plan: the manufacturer
    keep-list is a broadcast LEFT SEMI join against each channel fact (the
    IN-subquery of the spec); the three channel aggregates are unioned and
    re-aggregated — partial sums stay exact at 4 decimals, so only the
    final sum rounds. At 100 TB each channel contributes one fact-scan +
    one keyed shuffle; the final re-agg is over |manufacturers| rows."""
    ds = _ds(spark, sf_dir)
    mf = ds["item"].filter(F.col("i_category") == "Books").select("i_brand_id").distinct()
    dd = ds["date_dim"].filter((F.col("d_year") == 1996) & (F.col("d_moy") == 5))

    def channel(fact: str, prefix: str) -> DataFrame:
        return (
            ds[fact]
            .join(F.broadcast(dd), F.col(f"{prefix}_sold_date_sk") == F.col("d_date_sk"))
            .join(ds["item"].select("i_item_sk", "i_brand_id"),
                  F.col(f"{prefix}_item_sk") == F.col("i_item_sk"))
            .join(F.broadcast(mf), "i_brand_id", "left_semi")
            .groupBy("i_brand_id")
            .agg(F.sum(f"{prefix}_ext_sales_price").alias("total_sales"))
        )

    return (
        channel("store_sales", "ss")
        .unionAll(channel("catalog_sales", "cs"))
        .unionAll(channel("web_sales", "ws"))
        .groupBy("i_brand_id")
        .agg(F.round(F.sum("total_sales"), 4).alias("total_sales"))
        .orderBy("i_brand_id")
    )


# ---------------------------------------------------------------------------
# q77 — per-channel P&L summary with channel/id ROLLUP
# ---------------------------------------------------------------------------

Q77_ORACLE = f"""
WITH {DS_CTES},
ss_ch AS (
  SELECT s_store_sk AS id, sum(ss_ext_sales_price) AS sales, sum(ss_net_profit) AS profit
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
                   JOIN store ON ss_store_sk = s_store_sk
  WHERE d_year = 1996 AND d_moy BETWEEN 5 AND 6
  GROUP BY s_store_sk),
sr_ch AS (
  SELECT sr_store_sk AS id, sum(sr_return_amt) AS returns_amt, sum(sr_return_tax) AS profit_loss
  FROM store_returns JOIN date_dim ON sr_returned_date_sk = d_date_sk
  WHERE d_year = 1996 AND d_moy BETWEEN 5 AND 6
  GROUP BY sr_store_sk),
cs_ch AS (
  SELECT cs_call_center_sk AS id, sum(cs_ext_sales_price) AS sales, sum(cs_net_profit) AS profit
  FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
  WHERE d_year = 1996 AND d_moy BETWEEN 5 AND 6
  GROUP BY cs_call_center_sk),
cr_tot AS (
  SELECT sum(cr_return_amt) AS returns_amt, sum(cr_net_loss) AS profit_loss
  FROM catalog_returns JOIN date_dim ON cr_returned_date_sk = d_date_sk
  WHERE d_year = 1996 AND d_moy BETWEEN 5 AND 6),
ws_ch AS (
  SELECT ws_web_page_sk AS id, sum(ws_ext_sales_price) AS sales, sum(ws_net_profit) AS profit
  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE d_year = 1996 AND d_moy BETWEEN 5 AND 6
  GROUP BY ws_web_page_sk),
wr_ch AS (
  SELECT wr_web_page_sk AS id, sum(wr_return_amt) AS returns_amt, sum(wr_net_loss) AS profit_loss
  FROM web_returns JOIN date_dim ON wr_returned_date_sk = d_date_sk
  WHERE d_year = 1996 AND d_moy BETWEEN 5 AND 6
  GROUP BY wr_web_page_sk),
combined AS (
  SELECT 'store channel' AS channel, s.id, s.sales,
         coalesce(r.returns_amt, 0) AS returns_amt,
         s.profit - coalesce(r.profit_loss, 0) AS profit
  FROM ss_ch s LEFT JOIN sr_ch r ON s.id = r.id
  UNION ALL
  SELECT 'catalog channel', c.id, c.sales, cr.returns_amt, c.profit - cr.profit_loss
  FROM cs_ch c CROSS JOIN cr_tot cr
  UNION ALL
  SELECT 'web channel', w.id, w.sales,
         coalesce(wr.returns_amt, 0), w.profit - coalesce(wr.profit_loss, 0)
  FROM ws_ch w LEFT JOIN wr_ch wr ON w.id = wr.id
)
SELECT channel, id, round(sum(sales), 4) AS sales,
       round(sum(returns_amt), 4) AS returns_amt, round(sum(profit), 4) AS profit
FROM combined
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
"""


@register("tpcds_q77", Q77_ORACLE, tags=("tpcds", "crosschannel", "rollup"))
def tpcds_q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q77 (reference tpcds/q77.sql; 30-day window -> two fixture
    months): per-channel profit-and-loss — store and web returns join their
    channel sales on the channel key, catalog returns are (per the spec
    itself) a single corpus-wide total cross-joined onto every call center
    — then a (channel, id) ROLLUP produces per-id, per-channel, and grand
    total rows. Plan: six small keyed aggregates (each one fact pass), a
    three-way union of ~|stores|+|call centers|+|web pages| rows, and the
    rollup's ExpandExec runs over that tiny combined frame, never over the
    facts. The cross-joined catalog total is a 1-row broadcast. All money
    values are exact 4-decimal sums, so every rollup level rounds exactly."""
    return (
        _q77_combined(spark, sf_dir)
        .rollup("channel", "id")
        .agg(
            F.round(F.sum("sales"), 4).alias("sales"),
            F.round(F.sum("returns_amt"), 4).alias("returns_amt"),
            F.round(F.sum("profit"), 4).alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


def _q77_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q77's per-channel P&L union frame — shared by q77 (ROLLUP) and the
    v2.7 q77a (explicit union of levels)."""
    ds = _ds(spark, sf_dir)
    dd = F.broadcast(
        ds["date_dim"].filter((F.col("d_year") == 1996) & (F.col("d_moy").between(5, 6)))
    )
    ss_ch = (
        ds["store_sales"]
        .join(dd, F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy(F.col("s_store_sk").alias("id"))
        .agg(F.sum("ss_ext_sales_price").alias("sales"), F.sum("ss_net_profit").alias("profit"))
    )
    sr_ch = (
        ds["store_returns"]
        .join(dd, F.col("sr_returned_date_sk") == F.col("d_date_sk"))
        .groupBy(F.col("sr_store_sk").alias("rid"))
        .agg(F.sum("sr_return_amt").alias("returns_amt"), F.sum("sr_return_tax").alias("profit_loss"))
    )
    cs_ch = (
        ds["catalog_sales"]
        .join(dd, F.col("cs_sold_date_sk") == F.col("d_date_sk"))
        .groupBy(F.col("cs_call_center_sk").alias("id"))
        .agg(F.sum("cs_ext_sales_price").alias("sales"), F.sum("cs_net_profit").alias("profit"))
    )
    cr_tot = (
        ds["catalog_returns"]
        .join(dd, F.col("cr_returned_date_sk") == F.col("d_date_sk"))
        .agg(F.sum("cr_return_amt").alias("returns_amt"), F.sum("cr_net_loss").alias("profit_loss"))
    )
    ws_ch = (
        ds["web_sales"]
        .join(dd, F.col("ws_sold_date_sk") == F.col("d_date_sk"))
        .groupBy(F.col("ws_web_page_sk").alias("id"))
        .agg(F.sum("ws_ext_sales_price").alias("sales"), F.sum("ws_net_profit").alias("profit"))
    )
    wr_ch = (
        ds["web_returns"]
        .join(dd, F.col("wr_returned_date_sk") == F.col("d_date_sk"))
        .groupBy(F.col("wr_web_page_sk").alias("rid"))
        .agg(F.sum("wr_return_amt").alias("returns_amt"), F.sum("wr_net_loss").alias("profit_loss"))
    )
    store_part = (
        ss_ch.join(sr_ch, ss_ch["id"] == sr_ch["rid"], "left")
        .select(
            F.lit("store channel").alias("channel"), "id", "sales",
            F.coalesce("returns_amt", F.lit(0.0)).alias("returns_amt"),
            (F.col("profit") - F.coalesce("profit_loss", F.lit(0.0))).alias("profit"),
        )
    )
    catalog_part = cs_ch.crossJoin(F.broadcast(cr_tot)).select(
        F.lit("catalog channel").alias("channel"), "id", "sales", "returns_amt",
        (F.col("profit") - F.col("profit_loss")).alias("profit"),
    )
    web_part = (
        ws_ch.join(wr_ch, ws_ch["id"] == wr_ch["rid"], "left")
        .select(
            F.lit("web channel").alias("channel"), "id", "sales",
            F.coalesce("returns_amt", F.lit(0.0)).alias("returns_amt"),
            (F.col("profit") - F.coalesce("profit_loss", F.lit(0.0))).alias("profit"),
        )
    )
    return store_part.unionAll(catalog_part).unionAll(web_part)


# ---------------------------------------------------------------------------
# r4 wave 1 — inventory / warehouse / shipping queries (q21 q22 q37 q82 q39
# q40 q72 q99 q16). The derived inventory fact keys on (ship date, item,
# warehouse) with a deterministic quantity-on-hand, so every query here is
# reproducible in the DuckDB oracle.
# ---------------------------------------------------------------------------

_Q21_PIVOT = "TIMESTAMP '1997-06-15'"

Q21_ORACLE = f"""
WITH {DS_CTES}
SELECT w_warehouse_name, i_item_id,
       sum(CASE WHEN inv_date_sk < {_Q21_PIVOT} THEN inv_quantity_on_hand ELSE 0 END)::BIGINT AS inv_before,
       sum(CASE WHEN inv_date_sk >= {_Q21_PIVOT} THEN inv_quantity_on_hand ELSE 0 END)::BIGINT AS inv_after
FROM inventory JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
               JOIN item ON inv_item_sk = i_item_sk
WHERE i_current_price BETWEEN 905 AND 915
  AND inv_date_sk BETWEEN TIMESTAMP '1997-05-16' AND TIMESTAMP '1997-07-15'
GROUP BY w_warehouse_name, i_item_id
HAVING sum(CASE WHEN inv_date_sk < {_Q21_PIVOT} THEN inv_quantity_on_hand ELSE 0 END) > 0
   AND sum(CASE WHEN inv_date_sk >= {_Q21_PIVOT} THEN inv_quantity_on_hand ELSE 0 END)::DOUBLE
       / sum(CASE WHEN inv_date_sk < {_Q21_PIVOT} THEN inv_quantity_on_hand ELSE 0 END)
       BETWEEN 2.0/3.0 AND 3.0/2.0
ORDER BY w_warehouse_name, i_item_id
"""


@register("tpcds_q21", Q21_ORACLE, tags=("tpcds", "inventory", "having"))
def tpcds_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21 (reference tpcds/q21.sql; price band retargeted to the
    fixture retailprice domain 900-920): per (warehouse, item) on-hand
    inventory summed in the 30 days before vs after a pivot date, keeping
    items whose after/before ratio stayed within [2/3, 3/2]. Plan: the
    price-band filter prunes item before the join; warehouse (6 rows) is
    broadcast; one hash-agg on (warehouse, item) with both conditional
    sums in the same pass; the ratio test is a post-agg filter (HAVING).
    The before>0 guard makes the ratio well-defined in both engines."""
    ds = _ds(spark, sf_dir)
    pivot = F.expr(_Q21_PIVOT)
    items = ds["item"].filter(F.col("i_current_price").between(905, 915))
    before = F.sum(F.when(F.col("inv_date_sk") < pivot, F.col("inv_quantity_on_hand")).otherwise(0))
    after = F.sum(F.when(F.col("inv_date_sk") >= pivot, F.col("inv_quantity_on_hand")).otherwise(0))
    return (
        ds["inventory"]
        .filter(F.col("inv_date_sk").between(F.expr("TIMESTAMP '1997-05-16'"), F.expr("TIMESTAMP '1997-07-15'")))
        .join(F.broadcast(ds["warehouse"]), F.col("inv_warehouse_sk") == F.col("w_warehouse_sk"))
        .join(items, F.col("inv_item_sk") == F.col("i_item_sk"))
        .groupBy("w_warehouse_name", "i_item_id")
        .agg(before.alias("inv_before"), after.alias("inv_after"))
        .filter(
            (F.col("inv_before") > 0)
            & (F.col("inv_after") / F.col("inv_before")).between(2.0 / 3.0, 3.0 / 2.0)
        )
        .orderBy("w_warehouse_name", "i_item_id")
    )


Q22_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_desc AS i_product_name, i_brand, i_class, i_category,
       round(avg(inv_quantity_on_hand), 4) AS qoh
FROM inventory JOIN item ON inv_item_sk = i_item_sk
WHERE year(inv_date_sk) = 1997
GROUP BY ROLLUP (i_item_desc, i_brand, i_class, i_category)
ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST,
         i_class NULLS FIRST, i_category NULLS FIRST
LIMIT 100
"""


@register("tpcds_q22", Q22_ORACLE, tags=("tpcds", "inventory", "rollup"))
def tpcds_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q22 (reference tpcds/q22.sql; d_month_seq window -> one
    fixture year): average quantity-on-hand over the item ROLLUP hierarchy
    (product/brand/class/category -> 5 aggregation levels). Plan: one
    ExpandExec over the filtered inventory-item join, partial averages
    (sum+count) combine map-side, then TakeOrderedAndProject for the
    LIMIT — no global sort materializes. The full name tiebreak makes the
    LIMIT-100 row set deterministic under qoh ties."""
    ds = _ds(spark, sf_dir)
    agg = (
        ds["inventory"]
        .filter(F.year("inv_date_sk") == 1997)
        .join(ds["item"], F.col("inv_item_sk") == F.col("i_item_sk"))
        .rollup("i_item_desc", "i_brand", "i_class", "i_category")
        .agg(F.round(F.avg("inv_quantity_on_hand"), 4).alias("qoh"))
    )
    return (
        agg.select(
            F.col("i_item_desc").alias("i_product_name"), "i_brand", "i_class", "i_category", "qoh"
        )
        .orderBy(
            "qoh",
            F.col("i_product_name").asc_nulls_first(),
            F.col("i_brand").asc_nulls_first(),
            F.col("i_class").asc_nulls_first(),
            F.col("i_category").asc_nulls_first(),
        )
        .limit(100)
    )


def _q37_style_oracle(fact: str, prefix: str, lo: int, hi: int, start: str) -> str:
    return f"""
WITH {DS_CTES}
SELECT i_item_id, i_item_desc, i_current_price
FROM item JOIN inventory ON inv_item_sk = i_item_sk
          JOIN {fact} ON {prefix}_item_sk = i_item_sk
WHERE i_current_price BETWEEN {lo} AND {hi}
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND inv_date_sk BETWEEN TIMESTAMP '{start}' AND TIMESTAMP '{start}' + INTERVAL 60 DAY
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100
"""


def _q37_style(spark: SparkSession, sf_dir: str, fact: str, prefix: str, lo: int, hi: int, start: str) -> DataFrame:
    ds = _ds(spark, sf_dir)
    inv = ds["inventory"].filter(
        F.col("inv_quantity_on_hand").between(100, 500)
        & F.col("inv_date_sk").between(
            F.expr(f"TIMESTAMP '{start}'"), F.expr(f"TIMESTAMP '{start}' + INTERVAL 60 DAY")
        )
    )
    return (
        ds["item"]
        .filter(F.col("i_current_price").between(lo, hi))
        .join(inv, F.col("inv_item_sk") == F.col("i_item_sk"), "left_semi")
        .join(ds[fact], F.col(f"{prefix}_item_sk") == F.col("i_item_sk"), "left_semi")
        .select("i_item_id", "i_item_desc", "i_current_price")
        .distinct()
        .orderBy("i_item_id")
        .limit(100)
    )


@register("tpcds_q37", _q37_style_oracle("catalog_sales", "cs", 902, 912, "1996-04-01"), tags=("tpcds", "inventory", "semijoin"))
def tpcds_q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q37 (reference tpcds/q37.sql; price band retargeted to the
    fixture domain): items in a price band that had 100-500 units on hand
    during a 60-day window AND sold through the catalog channel. The spec
    writes fan-out joins + GROUP BY; since only item attributes survive,
    the Spark plan uses two LEFT SEMI joins (inventory, catalog_sales) —
    same result set, no fan-out rows shuffled. i_item_id is unique so the
    ORDER BY is total."""
    return _q37_style(spark, sf_dir, "catalog_sales", "cs", 902, 912, "1996-04-01")


@register("tpcds_q82", _q37_style_oracle("store_sales", "ss", 908, 918, "1997-08-01"), tags=("tpcds", "inventory", "semijoin"))
def tpcds_q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q82 (reference tpcds/q82.sql) — q37's store-channel twin
    (store_sales semi-join instead of catalog_sales, shifted price band and
    window), exercising inventory against the store fact."""
    return _q37_style(spark, sf_dir, "store_sales", "ss", 908, 918, "1997-08-01")


Q39_ORACLE = f"""
WITH {DS_CTES},
inv_m AS (
  SELECT inv_item_sk, month(inv_date_sk) AS m,
         avg(inv_quantity_on_hand) AS mean,
         stddev_samp(inv_quantity_on_hand) AS sd
  FROM inventory
  WHERE month(inv_date_sk) IN (3, 4)
  GROUP BY inv_item_sk, month(inv_date_sk)
),
cov AS (
  SELECT inv_item_sk, m, mean,
         CASE WHEN mean = 0 THEN NULL ELSE sd / mean END AS cov
  FROM inv_m
)
SELECT a.inv_item_sk AS i_item_sk,
       round(a.mean, 4) AS mean_mar, round(a.cov, 4) AS cov_mar,
       round(b.mean, 4) AS mean_apr, round(b.cov, 4) AS cov_apr
FROM cov a JOIN cov b ON a.inv_item_sk = b.inv_item_sk AND a.m = 3 AND b.m = 4
WHERE a.cov > 1.0
ORDER BY i_item_sk
"""


@register("tpcds_q39", Q39_ORACLE, tags=("tpcds", "inventory", "stats"))
def tpcds_q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39 (reference tpcds/q39.sql; grouped per item-month across
    years — the derived inventory is too sparse per (warehouse, item,
    month, year) for a sample stddev): per-item March/April mean and coefficient of variation
    of on-hand quantity, emitting items whose March cov exceeded 1 next to
    their April stats. Plan: one hash-agg computes avg+stddev_samp
    together (shared partial moments); the month-pair self-join runs over
    ALREADY-AGGREGATED rows (|items| scale) and AQE broadcasts the
    filtered March side. stddev_samp of a singleton group is NULL in both
    engines, which the cov>1 filter then drops — identical semantics."""
    ds = _ds(spark, sf_dir)
    inv_m = (
        ds["inventory"]
        .filter(F.month("inv_date_sk").isin(3, 4))
        .groupBy("inv_item_sk", F.month("inv_date_sk").alias("m"))
        .agg(
            F.avg("inv_quantity_on_hand").alias("mean"),
            F.stddev_samp("inv_quantity_on_hand").alias("sd"),
        )
    )
    cov = inv_m.select(
        "inv_item_sk", "m", "mean",
        F.when(F.col("mean") == 0, None).otherwise(F.col("sd") / F.col("mean")).alias("cov"),
    )
    a = cov.filter((F.col("m") == 3) & (F.col("cov") > 1.0)).select(
        F.col("inv_item_sk").alias("i_item_sk"),
        F.round("mean", 4).alias("mean_mar"),
        F.round("cov", 4).alias("cov_mar"),
    )
    b = cov.filter(F.col("m") == 4).select(
        F.col("inv_item_sk").alias("bk"),
        F.round("mean", 4).alias("mean_apr"),
        F.round("cov", 4).alias("cov_apr"),
    )
    return (
        a.join(b, a["i_item_sk"] == b["bk"])
        .select("i_item_sk", "mean_mar", "cov_mar", "mean_apr", "cov_apr")
        .orderBy("i_item_sk")
    )


_Q40_PIVOT = "TIMESTAMP '1997-06-15'"

Q40_ORACLE = f"""
WITH {DS_CTES}
SELECT w_state, i_item_id,
       round(sum(CASE WHEN cs_sold_date_sk < {_Q40_PIVOT}
                      THEN cs_ext_sales_price - coalesce(cr_return_amt, 0) ELSE 0 END), 4) AS sales_before,
       round(sum(CASE WHEN cs_sold_date_sk >= {_Q40_PIVOT}
                      THEN cs_ext_sales_price - coalesce(cr_return_amt, 0) ELSE 0 END), 4) AS sales_after
FROM catalog_sales LEFT JOIN catalog_returns
       ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
     JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
     JOIN item ON cs_item_sk = i_item_sk
WHERE i_current_price BETWEEN 905 AND 915
  AND cs_sold_date_sk BETWEEN TIMESTAMP '1997-05-16' AND TIMESTAMP '1997-07-15'
GROUP BY w_state, i_item_id
ORDER BY w_state, i_item_id
"""


@register("tpcds_q40", Q40_ORACLE, tags=("tpcds", "returns", "outerjoin"))
def tpcds_q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q40 (reference tpcds/q40.sql; price band + pivot retargeted):
    net catalog sales (sales minus matched returns) per warehouse state and
    item, split before/after a pivot date. Plan: the date window and the
    item price band both push below the returns join, so the LEFT join runs
    on the filtered fact only; returns match on (order, item) — the same
    keyed-shuffle pair; warehouse (6 rows) broadcast. Both conditional sums
    land in one hash-agg pass."""
    ds = _ds(spark, sf_dir)
    pivot = F.expr(_Q40_PIVOT)
    cs = ds["catalog_sales"].filter(
        F.col("cs_sold_date_sk").between(F.expr("TIMESTAMP '1997-05-16'"), F.expr("TIMESTAMP '1997-07-15'"))
    )
    cr = ds["catalog_returns"].select("cr_order_number", "cr_item_sk", "cr_return_amt")
    items = ds["item"].filter(F.col("i_current_price").between(905, 915)).select("i_item_sk", "i_item_id")
    net = F.col("cs_ext_sales_price") - F.coalesce(F.col("cr_return_amt"), F.lit(0.0))
    return (
        cs.join(cr, (F.col("cs_order_number") == F.col("cr_order_number")) & (F.col("cs_item_sk") == F.col("cr_item_sk")), "left")
        .join(F.broadcast(ds["warehouse"]), F.col("cs_warehouse_sk") == F.col("w_warehouse_sk"))
        .join(items, F.col("cs_item_sk") == F.col("i_item_sk"))
        .groupBy("w_state", "i_item_id")
        .agg(
            F.round(F.sum(F.when(F.col("cs_sold_date_sk") < pivot, net).otherwise(0.0)), 4).alias("sales_before"),
            F.round(F.sum(F.when(F.col("cs_sold_date_sk") >= pivot, net).otherwise(0.0)), 4).alias("sales_after"),
        )
        .orderBy("w_state", "i_item_id")
    )


Q72_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_desc, w_warehouse_name, d_week_seq,
       sum(CASE WHEN p_promo_sk IS NULL THEN 1 ELSE 0 END)::BIGINT AS no_promo,
       sum(CASE WHEN p_promo_sk IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS promo,
       count(*) AS total_cnt
FROM catalog_sales
JOIN inventory ON cs_item_sk = inv_item_sk AND inv_date_sk = cs_ship_date_sk
             AND inv_quantity_on_hand < cs_quantity * 12
JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
JOIN item ON cs_item_sk = i_item_sk
JOIN household_demographics ON cs_bill_hdemo_sk = hd_demo_sk AND hd_dep_count = 4
JOIN date_dim ON cs_sold_date_sk = d_date_sk
LEFT JOIN promotion ON cs_promo_sk = p_promo_sk AND p_channel_email = 'Y'
WHERE d_year = 1997 AND date_diff('day', cs_sold_date_sk, cs_ship_date_sk) > 5
GROUP BY i_item_desc, w_warehouse_name, d_week_seq
ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d_week_seq
LIMIT 100
"""


@register("tpcds_q72", Q72_ORACLE, tags=("tpcds", "inventory", "factfact"))
def tpcds_q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72 (reference tpcds/q72.sql; buy-potential filter mapped to
    hd_dep_count, d+5 ship lag kept): catalog lines that shipped >5 days
    after the sale where on-hand inventory at ship time could not cover
    12x the ordered quantity — the corpus's canonical fact-to-fact
    inequality join — split by promotional status. Plan: the only big-big
    join is cs><inventory, equi-keyed on (item, date) with the qoh<qty*12
    inequality as a post-join residual (NOT a cartesian); hd/date/promo/
    warehouse are broadcast; promo is a LEFT join carrying the channel
    condition so unmatched rows count as no_promo. At 100 TB the (item,
    date) shuffle is the plan's spine, exactly like stock q72."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter(F.col("hd_dep_count") == 4)
    dd = ds["date_dim"].filter(F.col("d_year") == 1997)
    promo = ds["promotion"].filter(F.col("p_channel_email") == "Y").select("p_promo_sk")
    cs = ds["catalog_sales"].filter(F.datediff(F.col("cs_ship_date_sk"), F.col("cs_sold_date_sk")) > 5)
    inv = ds["inventory"]
    return (
        cs.join(
            inv,
            (F.col("cs_item_sk") == F.col("inv_item_sk"))
            & (F.col("inv_date_sk") == F.col("cs_ship_date_sk"))
            & (F.col("inv_quantity_on_hand") < F.col("cs_quantity") * 12),
        )
        .join(F.broadcast(ds["warehouse"]), F.col("inv_warehouse_sk") == F.col("w_warehouse_sk"))
        .join(ds["item"].select("i_item_sk", "i_item_desc"), F.col("cs_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(hd), F.col("cs_bill_hdemo_sk") == F.col("hd_demo_sk"))
        .join(F.broadcast(dd.select("d_date_sk", "d_week_seq")), F.col("cs_sold_date_sk") == F.col("d_date_sk"))
        .join(F.broadcast(promo), F.col("cs_promo_sk") == F.col("p_promo_sk"), "left")
        .groupBy("i_item_desc", "w_warehouse_name", "d_week_seq")
        .agg(
            F.sum(F.when(F.col("p_promo_sk").isNull(), 1).otherwise(0)).alias("no_promo"),
            F.sum(F.when(F.col("p_promo_sk").isNotNull(), 1).otherwise(0)).alias("promo"),
            F.count(F.lit(1)).alias("total_cnt"),
        )
        .orderBy(F.desc("total_cnt"), "i_item_desc", "w_warehouse_name", "d_week_seq")
        .limit(100)
    )


def _q99_bands() -> list[tuple[str, str]]:
    return [
        ("d_30", "days <= 30"),
        ("d_31_60", "days > 30 AND days <= 60"),
        ("d_61_90", "days > 60 AND days <= 90"),
        ("d_91_120", "days > 90 AND days <= 120"),
        ("d_over_120", "days > 120"),
    ]


def _q99_oracle() -> str:
    bands = ", ".join(
        f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS {name}" for name, cond in _q99_bands()
    )
    return f"""
WITH {DS_CTES},
shipped AS (
  SELECT cs_warehouse_sk, cs_ship_mode_sk, cs_call_center_sk,
         date_diff('day', cs_sold_date_sk, cs_ship_date_sk) AS days
  FROM catalog_sales WHERE year(cs_ship_date_sk) = 1997
)
SELECT w_warehouse_name, sm_type, cc_name, {bands}
FROM shipped JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
             JOIN ship_mode ON cs_ship_mode_sk = sm_ship_mode_sk
             JOIN call_center ON cs_call_center_sk = cc_call_center_sk
GROUP BY w_warehouse_name, sm_type, cc_name
ORDER BY w_warehouse_name, sm_type, cc_name
"""


Q99_ORACLE = _q99_oracle()


@register("tpcds_q99", Q99_ORACLE, tags=("tpcds", "shipping", "bands"))
def tpcds_q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q99 (reference tpcds/q99.sql): days-to-ship distribution of
    catalog orders banded at 30/60/90/120 days, per (warehouse, ship mode,
    call center). The derived ship lag spans negatives (fixture ship dates
    are independent of order dates); those land in the <=30 band in both
    engines. Plan: one fact scan computes the lag, three bounded dims
    (6 x 4 x 5 rows) broadcast, and all five band counters share a single
    hash-agg — no Expand, no second pass."""
    ds = _ds(spark, sf_dir)
    days = F.datediff(F.col("cs_ship_date_sk"), F.col("cs_sold_date_sk"))
    shipped = (
        ds["catalog_sales"]
        .filter(F.year("cs_ship_date_sk") == 1997)
        .select("cs_warehouse_sk", "cs_ship_mode_sk", "cs_call_center_sk", days.alias("days"))
    )
    aggs = [
        F.sum(F.when(F.expr(cond), 1).otherwise(0)).alias(name) for name, cond in _q99_bands()
    ]
    return (
        shipped.join(F.broadcast(ds["warehouse"]), F.col("cs_warehouse_sk") == F.col("w_warehouse_sk"))
        .join(F.broadcast(ds["ship_mode"]), F.col("cs_ship_mode_sk") == F.col("sm_ship_mode_sk"))
        .join(F.broadcast(ds["call_center"]), F.col("cs_call_center_sk") == F.col("cc_call_center_sk"))
        .groupBy("w_warehouse_name", "sm_type", "cc_name")
        .agg(*aggs)
        .orderBy("w_warehouse_name", "sm_type", "cc_name")
    )


Q16_ORACLE = f"""
WITH {DS_CTES}
SELECT count(DISTINCT cs_order_number) AS order_count,
       round(sum(cs_ext_sales_price), 4) AS total_sales,
       round(sum(cs_net_profit), 4) AS total_net_profit
FROM catalog_sales cs1
WHERE cs_ship_date_sk BETWEEN TIMESTAMP '1997-02-01' AND TIMESTAMP '1997-04-02'
  AND EXISTS (SELECT 1 FROM catalog_sales cs2
              WHERE cs1.cs_order_number = cs2.cs_order_number
                AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
  AND NOT EXISTS (SELECT 1 FROM catalog_returns cr
                  WHERE cs1.cs_order_number = cr.cr_order_number)
"""


@register("tpcds_q16", Q16_ORACLE, tags=("tpcds", "existence", "antijoin"))
def tpcds_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q16 (reference tpcds/q16.sql; 60-day ship window retargeted):
    catalog orders shipped in the window that were fulfilled from more
    than one warehouse (EXISTS a sibling line with a different warehouse)
    and never returned (NOT EXISTS). Plan: the multi-warehouse EXISTS
    compiles to a LEFT SEMI self-join on order number with the warehouse
    inequality as residual; the returns test is a LEFT ANTI against the
    distinct returned-order list; count(DISTINCT order) + the two sums
    share one final aggregate. Same shuffle spine as tpch_q21's
    exists/not-exists pair, exercised on the catalog channel."""
    ds = _ds(spark, sf_dir)
    cs1 = ds["catalog_sales"].filter(
        F.col("cs_ship_date_sk").between(F.expr("TIMESTAMP '1997-02-01'"), F.expr("TIMESTAMP '1997-04-02'"))
    )
    cs2 = ds["catalog_sales"].select(
        F.col("cs_order_number").alias("o2"), F.col("cs_warehouse_sk").alias("w2")
    )
    cr = ds["catalog_returns"].select(F.col("cr_order_number").alias("ro"))
    return (
        cs1.join(cs2, (F.col("cs_order_number") == F.col("o2")) & (F.col("cs_warehouse_sk") != F.col("w2")), "left_semi")
        .join(cr, F.col("cs_order_number") == F.col("ro"), "left_anti")
        .agg(
            F.countDistinct("cs_order_number").alias("order_count"),
            F.round(F.sum("cs_ext_sales_price"), 4).alias("total_sales"),
            F.round(F.sum("cs_net_profit"), 4).alias("total_net_profit"),
        )
    )


# ---------------------------------------------------------------------------
# r4 wave 2 — cross-channel customer behavior (q38 q87 q97 q74 q17 q31)
# ---------------------------------------------------------------------------

Q38_ORACLE = f"""
WITH {DS_CTES},
s AS (SELECT DISTINCT ss_customer_sk AS c FROM store_sales WHERE year(ss_sold_date_sk) = 1996),
cc AS (SELECT DISTINCT cs_bill_customer_sk AS c FROM catalog_sales WHERE year(cs_sold_date_sk) = 1996),
w AS (SELECT DISTINCT ws_bill_customer_sk AS c FROM web_sales WHERE year(ws_sold_date_sk) = 1996)
SELECT count(*)::BIGINT AS hot_cust_count
FROM (SELECT c FROM s INTERSECT SELECT c FROM cc INTERSECT SELECT c FROM w) t
"""


@register("tpcds_q38", Q38_ORACLE, tags=("tpcds", "crosschannel", "intersect"))
def tpcds_q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38 (reference tpcds/q38.sql; d_month_seq window -> one
    fixture year, keyed on customer_sk — the derived name columns are
    1:1 with the sk): customers who bought through ALL THREE channels in
    the year, via set INTERSECT over per-channel distinct customer sets.
    Plan: each channel contributes one distinct-aggregate (partial
    map-side dedup); INTERSECT compiles to left-semi hash joins over the
    deduped sets — no fact-to-fact shuffle. The final count is a single
    row."""
    ds = _ds(spark, sf_dir)
    s = ds["store_sales"].filter(F.year("ss_sold_date_sk") == 1996).select(F.col("ss_customer_sk").alias("c")).distinct()
    c = ds["catalog_sales"].filter(F.year("cs_sold_date_sk") == 1996).select(F.col("cs_bill_customer_sk").alias("c")).distinct()
    w = ds["web_sales"].filter(F.year("ws_sold_date_sk") == 1996).select(F.col("ws_bill_customer_sk").alias("c")).distinct()
    return s.intersect(c).intersect(w).agg(F.count(F.lit(1)).alias("hot_cust_count"))


Q87_ORACLE = f"""
WITH {DS_CTES},
s AS (SELECT DISTINCT ss_customer_sk AS c FROM store_sales WHERE year(ss_sold_date_sk) = 1996),
cc AS (SELECT DISTINCT cs_bill_customer_sk AS c FROM catalog_sales WHERE year(cs_sold_date_sk) = 1996),
w AS (SELECT DISTINCT ws_bill_customer_sk AS c FROM web_sales WHERE year(ws_sold_date_sk) = 1996)
SELECT count(*)::BIGINT AS store_only_count
FROM (SELECT c FROM s EXCEPT SELECT c FROM cc EXCEPT SELECT c FROM w) t
"""


@register("tpcds_q87", Q87_ORACLE, tags=("tpcds", "crosschannel", "except"))
def tpcds_q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q87 (reference tpcds/q87.sql): q38's complement — customers
    who bought in the store channel but NOT catalog and NOT web that year
    (chained EXCEPT). Plan: two left-anti hash joins over per-channel
    deduped customer sets; same scale shape as q38."""
    ds = _ds(spark, sf_dir)
    s = ds["store_sales"].filter(F.year("ss_sold_date_sk") == 1996).select(F.col("ss_customer_sk").alias("c")).distinct()
    c = ds["catalog_sales"].filter(F.year("cs_sold_date_sk") == 1996).select(F.col("cs_bill_customer_sk").alias("c")).distinct()
    w = ds["web_sales"].filter(F.year("ws_sold_date_sk") == 1996).select(F.col("ws_bill_customer_sk").alias("c")).distinct()
    return s.exceptAll(c.distinct()).distinct().exceptAll(w).distinct().agg(F.count(F.lit(1)).alias("store_only_count"))


Q97_ORACLE = f"""
WITH {DS_CTES},
ssci AS (SELECT DISTINCT ss_customer_sk AS cust, ss_item_sk AS itm
         FROM store_sales WHERE year(ss_sold_date_sk) = 1996),
csci AS (SELECT DISTINCT cs_bill_customer_sk AS cust, cs_item_sk AS itm
         FROM catalog_sales WHERE year(cs_sold_date_sk) = 1996)
SELECT sum(CASE WHEN s.cust IS NOT NULL AND c.cust IS NULL THEN 1 ELSE 0 END)::BIGINT AS store_only,
       sum(CASE WHEN s.cust IS NULL AND c.cust IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS catalog_only,
       sum(CASE WHEN s.cust IS NOT NULL AND c.cust IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS store_and_catalog
FROM ssci s FULL OUTER JOIN csci c ON s.cust = c.cust AND s.itm = c.itm
"""


@register("tpcds_q97", Q97_ORACLE, tags=("tpcds", "crosschannel", "fullouter"))
def tpcds_q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q97 (reference tpcds/q97.sql): overlap of (customer, item)
    purchase pairs between the store and catalog channels — a FULL OUTER
    join of the two deduped pair sets, classified into store-only /
    catalog-only / both counts. Plan: each side dedups map-side first
    (distinct partial agg), the outer join shuffles on the composite key
    once, and the three classification counters share one final 1-row
    agg."""
    ds = _ds(spark, sf_dir)
    ssci = (
        ds["store_sales"].filter(F.year("ss_sold_date_sk") == 1996)
        .select(F.col("ss_customer_sk").alias("s_cust"), F.col("ss_item_sk").alias("s_itm")).distinct()
    )
    csci = (
        ds["catalog_sales"].filter(F.year("cs_sold_date_sk") == 1996)
        .select(F.col("cs_bill_customer_sk").alias("c_cust"), F.col("cs_item_sk").alias("c_itm")).distinct()
    )
    j = ssci.join(
        csci, (F.col("s_cust") == F.col("c_cust")) & (F.col("s_itm") == F.col("c_itm")), "full_outer"
    )
    return j.agg(
        F.sum(F.when(F.col("s_cust").isNotNull() & F.col("c_cust").isNull(), 1).otherwise(0)).alias("store_only"),
        F.sum(F.when(F.col("s_cust").isNull() & F.col("c_cust").isNotNull(), 1).otherwise(0)).alias("catalog_only"),
        F.sum(F.when(F.col("s_cust").isNotNull() & F.col("c_cust").isNotNull(), 1).otherwise(0)).alias("store_and_catalog"),
    )


Q74_ORACLE = f"""
WITH {DS_CTES},
year_total AS (
  SELECT ss_customer_sk AS customer_sk, year(ss_sold_date_sk) AS y, 's' AS channel,
         round(sum(ss_ext_sales_price), 4) AS total
  FROM store_sales WHERE year(ss_sold_date_sk) IN (1996, 1997)
  GROUP BY ss_customer_sk, year(ss_sold_date_sk)
  UNION ALL
  SELECT ws_bill_customer_sk, year(ws_sold_date_sk), 'w',
         round(sum(ws_ext_sales_price), 4)
  FROM web_sales WHERE year(ws_sold_date_sk) IN (1996, 1997)
  GROUP BY ws_bill_customer_sk, year(ws_sold_date_sk)
)
SELECT ts2.customer_sk AS customer_id
FROM year_total ts1
JOIN year_total ts2 ON ts1.customer_sk = ts2.customer_sk
JOIN year_total tw1 ON ts1.customer_sk = tw1.customer_sk
JOIN year_total tw2 ON ts1.customer_sk = tw2.customer_sk
WHERE ts1.channel = 's' AND ts1.y = 1996 AND ts2.channel = 's' AND ts2.y = 1997
  AND tw1.channel = 'w' AND tw1.y = 1996 AND tw2.channel = 'w' AND tw2.y = 1997
  AND ts1.total > 0 AND tw1.total > 0
  AND tw2.total / tw1.total > ts2.total / ts1.total
ORDER BY customer_id
"""


@register("tpcds_q74", Q74_ORACLE, tags=("tpcds", "crosschannel", "selfjoin"))
def tpcds_q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74 (reference tpcds/q74.sql; keyed on customer_sk): the
    year-over-year growth comparison — customers whose web spending grew
    FASTER than their store spending between consecutive years. One
    year_total aggregate per (customer, year, channel); the four spec
    self-joins collapse in the Spark build into a single groupBy(customer)
    with conditional sums (one shuffle instead of four joins — the
    aggregate-then-pivot form of the same query); the growth predicate
    compares ratios of 4-rounded totals, so both engines divide identical
    doubles. Scale: one keyed shuffle over each channel fact, then a
    |customers|-sized frame."""
    ds = _ds(spark, sf_dir)
    s = (
        ds["store_sales"].filter(F.year("ss_sold_date_sk").isin(1996, 1997))
        .select(F.col("ss_customer_sk").alias("customer_sk"), F.year("ss_sold_date_sk").alias("y"),
                F.lit("s").alias("channel"), F.col("ss_ext_sales_price").alias("p"))
    )
    w = (
        ds["web_sales"].filter(F.year("ws_sold_date_sk").isin(1996, 1997))
        .select(F.col("ws_bill_customer_sk").alias("customer_sk"), F.year("ws_sold_date_sk").alias("y"),
                F.lit("w").alias("channel"), F.col("ws_ext_sales_price").alias("p"))
    )
    def tot(ch: str, yr: int):
        return F.round(F.sum(F.when((F.col("channel") == ch) & (F.col("y") == yr), F.col("p"))), 4)
    per_cust = (
        s.unionAll(w)
        .groupBy("customer_sk")
        .agg(
            tot("s", 1996).alias("s1"), tot("s", 1997).alias("s2"),
            tot("w", 1996).alias("w1"), tot("w", 1997).alias("w2"),
        )
    )
    return (
        per_cust.filter(
            (F.col("s1") > 0) & (F.col("w1") > 0)
            & F.col("s2").isNotNull() & F.col("w2").isNotNull()
            & (F.col("w2") / F.col("w1") > F.col("s2") / F.col("s1"))
        )
        .select(F.col("customer_sk").alias("customer_id"))
        .orderBy("customer_id")
    )


Q17_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_id, s_state,
       count(ss_quantity)::BIGINT AS store_sales_cnt,
       round(avg(ss_quantity), 4) AS store_sales_avg,
       round(stddev_samp(ss_quantity), 4) AS store_sales_stdev,
       count(sr_return_quantity)::BIGINT AS store_returns_cnt,
       round(avg(sr_return_quantity), 4) AS store_returns_avg,
       count(cs_quantity)::BIGINT AS catalog_sales_cnt,
       round(avg(cs_quantity), 4) AS catalog_sales_avg
FROM store_sales
JOIN store_returns ON ss_ticket_number = sr_ticket_number
                  AND ss_item_sk = sr_item_sk AND ss_line_number = sr_line_number
JOIN catalog_sales ON sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
JOIN item ON ss_item_sk = i_item_sk
JOIN store ON ss_store_sk = s_store_sk
WHERE year(ss_sold_date_sk) = 1996 AND quarter(ss_sold_date_sk) = 1
  AND year(sr_returned_date_sk) = 1996 AND quarter(sr_returned_date_sk) IN (1, 2, 3)
  AND year(cs_sold_date_sk) = 1996 AND quarter(cs_sold_date_sk) IN (1, 2, 3)
GROUP BY i_item_id, s_state
ORDER BY i_item_id, s_state
LIMIT 100
"""


@register("tpcds_q17", Q17_ORACLE, tags=("tpcds", "crosschannel", "stats"))
def tpcds_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q17 (reference tpcds/q17.sql): the buy -> return -> re-buy
    funnel — store purchases in Q1 that were returned within Q1-Q3 and
    re-purchased through the catalog channel the same year, with
    count/avg/stddev statistics per (item, store state). Plan: ss><sr is
    an exact line-level match on (ticket, item, line) — one co-keyed
    shuffle pair; the returns-to-catalog hop shuffles on (customer, item);
    all statistics share one hash-agg (stddev via partial moments).
    stddev_samp of singleton groups is NULL in both engines."""
    ds = _ds(spark, sf_dir)
    ss = ds["store_sales"].filter((F.year("ss_sold_date_sk") == 1996) & (F.quarter("ss_sold_date_sk") == 1))
    sr = ds["store_returns"].filter((F.year("sr_returned_date_sk") == 1996) & F.quarter("sr_returned_date_sk").isin(1, 2, 3))
    cs = ds["catalog_sales"].filter((F.year("cs_sold_date_sk") == 1996) & F.quarter("cs_sold_date_sk").isin(1, 2, 3))
    return (
        ss.join(
            sr,
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
        )
        .join(cs, (F.col("sr_customer_sk") == F.col("cs_bill_customer_sk")) & (F.col("sr_item_sk") == F.col("cs_item_sk")))
        .join(ds["item"].select("i_item_sk", "i_item_id"), F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("i_item_id", "s_state")
        .agg(
            F.count("ss_quantity").alias("store_sales_cnt"),
            F.round(F.avg("ss_quantity"), 4).alias("store_sales_avg"),
            F.round(F.stddev_samp("ss_quantity"), 4).alias("store_sales_stdev"),
            F.count("sr_return_quantity").alias("store_returns_cnt"),
            F.round(F.avg("sr_return_quantity"), 4).alias("store_returns_avg"),
            F.count("cs_quantity").alias("catalog_sales_cnt"),
            F.round(F.avg("cs_quantity"), 4).alias("catalog_sales_avg"),
        )
        .orderBy("i_item_id", "s_state")
        .limit(100)
    )


Q31_ORACLE = f"""
WITH {DS_CTES},
ss_q AS (
  SELECT ca_state AS state, quarter(ss_sold_date_sk) AS q,
         round(sum(ss_ext_sales_price), 4) AS total
  FROM store_sales JOIN customer_address ON ss_addr_sk = ca_address_sk
  WHERE year(ss_sold_date_sk) = 1996 AND quarter(ss_sold_date_sk) IN (1, 2)
  GROUP BY ca_state, quarter(ss_sold_date_sk)),
ws_q AS (
  SELECT ca_state AS state, quarter(ws_sold_date_sk) AS q,
         round(sum(ws_ext_sales_price), 4) AS total
  FROM web_sales JOIN customer_address ON ws_bill_addr_sk = ca_address_sk
  WHERE year(ws_sold_date_sk) = 1996 AND quarter(ws_sold_date_sk) IN (1, 2)
  GROUP BY ca_state, quarter(ws_sold_date_sk))
SELECT ss1.state AS ca_state,
       round(ws2.total / ws1.total, 6) AS web_growth,
       round(ss2.total / ss1.total, 6) AS store_growth
FROM ss_q ss1 JOIN ss_q ss2 ON ss1.state = ss2.state AND ss1.q = 1 AND ss2.q = 2
     JOIN ws_q ws1 ON ss1.state = ws1.state AND ws1.q = 1
     JOIN ws_q ws2 ON ss1.state = ws2.state AND ws2.q = 2
WHERE ss1.total > 0 AND ws1.total > 0
  AND ws2.total / ws1.total > ss2.total / ss1.total
ORDER BY ca_state
"""


@register("tpcds_q31", Q31_ORACLE, tags=("tpcds", "crosschannel", "growth"))
def tpcds_q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 (reference tpcds/q31.sql; county -> derived ca_state,
    three quarters -> two): states where web sales grew faster than store
    sales from Q1 to Q2. Plan: two per-channel (state, quarter) aggregates
    — each one keyed fact shuffle after the address join — then the
    quarter alignment joins run over |states| x |quarters| rows (tiny,
    AQE-broadcast). Growth predicates compare ratios of 4-rounded totals
    (cross-engine double determinism)."""
    ds = _ds(spark, sf_dir)
    ca = ds["customer_address"].select("ca_address_sk", "ca_state")

    def chan(fact: str, date_col: str, addr_col: str, price_col: str) -> DataFrame:
        return (
            ds[fact]
            .filter((F.year(date_col) == 1996) & F.quarter(date_col).isin(1, 2))
            .join(ca, F.col(addr_col) == F.col("ca_address_sk"))
            .groupBy(F.col("ca_state").alias("state"))
            .agg(
                F.round(F.sum(F.when(F.quarter(date_col) == 1, F.col(price_col))), 4).alias("q1"),
                F.round(F.sum(F.when(F.quarter(date_col) == 2, F.col(price_col))), 4).alias("q2"),
            )
        )

    ssq = chan("store_sales", "ss_sold_date_sk", "ss_addr_sk", "ss_ext_sales_price").withColumnsRenamed(
        {"q1": "ss1", "q2": "ss2"}
    )
    wsq = chan("web_sales", "ws_sold_date_sk", "ws_bill_addr_sk", "ws_ext_sales_price").withColumnsRenamed(
        {"q1": "ws1", "q2": "ws2", "state": "wstate"}
    )
    return (
        ssq.join(wsq, F.col("state") == F.col("wstate"))
        .filter(
            (F.col("ss1") > 0) & (F.col("ws1") > 0)
            & F.col("ss2").isNotNull() & F.col("ws2").isNotNull()
            & (F.col("ws2") / F.col("ws1") > F.col("ss2") / F.col("ss1"))
        )
        .select(
            F.col("state").alias("ca_state"),
            F.round(F.col("ws2") / F.col("ws1"), 6).alias("web_growth"),
            F.round(F.col("ss2") / F.col("ss1"), 6).alias("store_growth"),
        )
        .orderBy("ca_state")
    )


# ---------------------------------------------------------------------------
# r4 wave 3 — deviation windows, returns analytics, combined-channel spend
# (q47 q57 q30 q85 q91 q8 q23 q49)
# ---------------------------------------------------------------------------

def _q47_style_oracle(fact: str, date_col: str, price_col: str, dim_join: str, dim_col: str) -> str:
    return f"""
WITH {DS_CTES},
v1 AS (
  SELECT i_brand, {dim_col}, year({date_col}) AS d_year, month({date_col}) AS d_moy,
         sum(CAST(round({price_col} * 10000) AS BIGINT)) AS sum_units
  FROM {fact} JOIN item ON i_item_sk = {fact[:1]}s_item_sk
              {dim_join}
  WHERE year({date_col}) IN (1996, 1997)
  GROUP BY i_brand, {dim_col}, year({date_col}), month({date_col})),
v2 AS (
  SELECT *,
         sum(sum_units) OVER (PARTITION BY i_brand, {dim_col}, d_year) AS tot_units,
         count(*) OVER (PARTITION BY i_brand, {dim_col}, d_year) AS n_months,
         lag(sum_units) OVER (PARTITION BY i_brand, {dim_col} ORDER BY d_year, d_moy) AS punits,
         lead(sum_units) OVER (PARTITION BY i_brand, {dim_col} ORDER BY d_year, d_moy) AS nunits
  FROM v1)
SELECT i_brand, {dim_col}, d_year, d_moy,
       ((2 * tot_units + n_months) // (2 * n_months)) / 10000.0 AS avg_monthly_sales,
       sum_units / 10000.0 AS sum_sales,
       punits / 10000.0 AS psum,
       nunits / 10000.0 AS nsum
FROM v2
WHERE d_year = 1997 AND tot_units > 0
  AND abs(10 * n_months * sum_units - 10 * tot_units) > tot_units
ORDER BY i_brand, {dim_col}, d_moy
LIMIT 100
"""


def _q47_style(spark: SparkSession, sf_dir: str, fact: str, prefix: str, date_col: str,
               price_col: str, dim: DataFrame, dim_key: str, fact_dim_key: str, dim_col: str) -> DataFrame:
    # Money travels as BIGINT ten-thousandths of a dollar from the scan
    # (exact: the price has at most 4 decimal digits), so the yearly-average
    # window and the >10% deviation predicate are order-free integer
    # arithmetic — immune to the cross-engine round(sum(double), 4) last-digit
    # ties that failed the driver's exact hash in round 6. Display columns
    # are one integer-by-constant IEEE division, identical in both engines.
    ds = _ds(spark, sf_dir)
    units = F.round(F.col(price_col) * 10000).cast("bigint")
    v1 = (
        ds[fact]
        .filter(F.year(date_col).isin(1996, 1997))
        .join(ds["item"].select("i_item_sk", "i_brand"), F.col(f"{prefix}_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(dim), F.col(fact_dim_key) == F.col(dim_key))
        .groupBy("i_brand", dim_col, F.year(date_col).alias("d_year"), F.month(date_col).alias("d_moy"))
        .agg(F.sum(units).alias("sum_units"))
    )
    w_year = W.partitionBy("i_brand", dim_col, "d_year")
    w_seq = W.partitionBy("i_brand", dim_col).orderBy("d_year", "d_moy")
    v2 = v1.select(
        "*",
        F.sum("sum_units").over(w_year).alias("tot_units"),
        F.count(F.lit(1)).over(w_year).alias("n_months"),
        F.lag("sum_units").over(w_seq).alias("punits"),
        F.lead("sum_units").over(w_seq).alias("nunits"),
    )
    return (
        v2.filter(
            (F.col("d_year") == 1997) & (F.col("tot_units") > 0)
            & (F.abs(10 * F.col("n_months") * F.col("sum_units") - 10 * F.col("tot_units"))
               > F.col("tot_units"))
        )
        .select(
            "i_brand", dim_col, "d_year", "d_moy",
            (F.expr("(2 * tot_units + n_months) div (2 * n_months)") / 10000.0).alias("avg_monthly_sales"),
            (F.col("sum_units") / 10000.0).alias("sum_sales"),
            (F.col("punits") / 10000.0).alias("psum"),
            (F.col("nunits") / 10000.0).alias("nsum"),
        )
        .orderBy("i_brand", dim_col, "d_moy")
        .limit(100)
    )


@register(
    "tpcds_q47",
    _q47_style_oracle("store_sales", "ss_sold_date_sk", "ss_sales_price",
                      "JOIN store ON ss_store_sk = s_store_sk", "s_store_name"),
    tags=("tpcds", "window", "deviation"),
)
def tpcds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 (reference tpcds/q47.sql): months where a (brand, store)
    deviated >10% from its own yearly average, with the neighboring
    months' sales via lag/lead. Plan: one (brand, store, year, month)
    hash-agg over the fact, then BOTH window families — the yearly avg
    partition and the month-sequence lag/lead — run over the aggregated
    frame (|brands x stores x 24| rows); Spark plans them as two window
    nodes sharing one sort on the common (brand, store) prefix. Money is
    exact BIGINT ten-thousandths-of-a-dollar end to end; the average uses
    integer HALF_UP division and the >10% deviation test is an integer
    cross-multiplication, so no accumulation order can flip a row."""
    ds = _ds(spark, sf_dir)
    return _q47_style(
        spark, sf_dir, "store_sales", "ss", "ss_sold_date_sk", "ss_sales_price",
        ds["store"].select("s_store_sk", "s_store_name"), "s_store_sk", "ss_store_sk", "s_store_name",
    )


@register(
    "tpcds_q57",
    _q47_style_oracle("catalog_sales", "cs_sold_date_sk", "cs_ext_sales_price",
                      "JOIN call_center ON cs_call_center_sk = cc_call_center_sk", "cc_name"),
    tags=("tpcds", "window", "deviation"),
)
def tpcds_q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q57 (reference tpcds/q57.sql) — q47's catalog twin: the same
    deviation-from-yearly-average window pair keyed by (brand, call
    center) over the catalog channel."""
    ds = _ds(spark, sf_dir)
    return _q47_style(
        spark, sf_dir, "catalog_sales", "cs", "cs_sold_date_sk", "cs_ext_sales_price",
        ds["call_center"].select("cc_call_center_sk", "cc_name"), "cc_call_center_sk",
        "cs_call_center_sk", "cc_name",
    )


Q30_ORACLE = f"""
WITH {DS_CTES},
ctr AS (
  SELECT wr_returning_customer_sk AS ctr_customer_sk, ca_state AS ctr_state,
         sum(wr_return_amt) AS ctr_total_return
  FROM web_returns JOIN customer_address ON wr_returning_addr_sk = ca_address_sk
  WHERE year(wr_returned_date_sk) = 1997
  GROUP BY wr_returning_customer_sk, ca_state),
state_avg AS (
  SELECT ctr_state, avg(ctr_total_return) * 1.2 AS cutoff
  FROM ctr GROUP BY ctr_state)
SELECT ctr_customer_sk AS c_customer_sk, ctr_state AS ca_state,
       round(ctr_total_return, 4) AS return_amt
FROM ctr JOIN state_avg USING (ctr_state)
WHERE ctr_total_return > cutoff
ORDER BY c_customer_sk, ca_state
LIMIT 100
"""


@register("tpcds_q30", Q30_ORACLE, tags=("tpcds", "returns", "subquery"))
def tpcds_q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q30 (reference tpcds/q30.sql): q1's web twin — customers
    whose web-return total exceeds 1.2x their state's average. Plan: one
    (customer, state) aggregate over the filtered returns, the per-state
    average re-aggregates that frame (tiny), and the cutoff join is
    broadcast; same correlated-aggregate decorrelation as q1, exercised
    on the web channel keyed by geography instead of store."""
    ds = _ds(spark, sf_dir)
    ca = ds["customer_address"].select("ca_address_sk", "ca_state")
    ctr = (
        ds["web_returns"]
        .filter(F.year("wr_returned_date_sk") == 1997)
        .join(ca, F.col("wr_returning_addr_sk") == F.col("ca_address_sk"))
        .groupBy(
            F.col("wr_returning_customer_sk").alias("ctr_customer_sk"),
            F.col("ca_state").alias("ctr_state"),
        )
        .agg(F.sum("wr_return_amt").alias("ctr_total_return"))
    )
    state_avg = ctr.groupBy("ctr_state").agg((F.avg("ctr_total_return") * 1.2).alias("cutoff"))
    return (
        ctr.join(F.broadcast(state_avg), "ctr_state")
        .filter(F.col("ctr_total_return") > F.col("cutoff"))
        .select(
            F.col("ctr_customer_sk").alias("c_customer_sk"),
            F.col("ctr_state").alias("ca_state"),
            F.round("ctr_total_return", 4).alias("return_amt"),
        )
        .orderBy("c_customer_sk", "ca_state")
        .limit(100)
    )


Q85_ORACLE = f"""
WITH {DS_CTES}
SELECT r_reason_desc,
       round(avg(wr_return_quantity), 4) AS avg_qty,
       round(avg(wr_return_amt), 4) AS avg_amt,
       round(avg(wr_net_loss), 4) AS avg_loss
FROM web_returns
JOIN reason ON wr_reason_sk = r_reason_sk
JOIN customer_demographics ON wr_returning_cdemo_sk = cd_demo_sk
WHERE (cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree')
   OR (cd_marital_status = 'S' AND cd_education_status = 'College')
   OR (cd_marital_status = 'D' AND cd_education_status = 'Secondary')
GROUP BY r_reason_desc
ORDER BY r_reason_desc
"""


@register("tpcds_q85", Q85_ORACLE, tags=("tpcds", "returns", "disjunction"))
def tpcds_q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q85 (reference tpcds/q85.sql; the web_sales/address legs of
    the spec have their operator shapes covered by q13/q45 — kept here are
    the reason rollup and the demographic-pair disjunction): average
    return quantity / amount / loss per return reason for three
    marital-education profiles. Plan: reason (5 rows) and the filtered
    demographics (broadcast) join the returns fact without a shuffle; the
    OR-of-pairs predicate evaluates in the scan stage; one hash-agg on
    reason."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        ((F.col("cd_marital_status") == "M") & (F.col("cd_education_status") == "Advanced Degree"))
        | ((F.col("cd_marital_status") == "S") & (F.col("cd_education_status") == "College"))
        | ((F.col("cd_marital_status") == "D") & (F.col("cd_education_status") == "Secondary"))
    )
    return (
        ds["web_returns"]
        .join(F.broadcast(ds["reason"]), F.col("wr_reason_sk") == F.col("r_reason_sk"))
        .join(F.broadcast(cd), F.col("wr_returning_cdemo_sk") == F.col("cd_demo_sk"))
        .groupBy("r_reason_desc")
        .agg(
            F.round(F.avg("wr_return_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("wr_return_amt"), 4).alias("avg_amt"),
            F.round(F.avg("wr_net_loss"), 4).alias("avg_loss"),
        )
        .orderBy("r_reason_desc")
    )


Q91_ORACLE = f"""
WITH {DS_CTES}
SELECT cc_name, cc_manager, round(sum(cr_net_loss), 4) AS returns_loss
FROM catalog_returns
JOIN call_center ON cr_call_center_sk = cc_call_center_sk
JOIN customer_demographics ON cr_returning_cdemo_sk = cd_demo_sk
JOIN household_demographics ON cr_returning_hdemo_sk = hd_demo_sk
WHERE year(cr_returned_date_sk) = 1997 AND month(cr_returned_date_sk) = 11
  AND ((cd_marital_status = 'M' AND cd_education_status = 'Primary')
    OR (cd_marital_status = 'D' AND cd_education_status = 'Advanced Degree'))
  AND hd_vehicle_count <= 2
GROUP BY cc_name, cc_manager
ORDER BY returns_loss DESC, cc_name
"""


@register("tpcds_q91", Q91_ORACLE, tags=("tpcds", "returns", "callcenter"))
def tpcds_q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q91 (reference tpcds/q91.sql; buy-potential band mapped to
    hd_vehicle_count): November catalog-return losses per call center for
    two demographic profiles. Plan: all three dims are bounded and
    broadcast; the month filter prunes the returns scan; one hash-agg on
    (cc_name, cc_manager). Sorted by loss with the name tiebreak so the
    order is total."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        ((F.col("cd_marital_status") == "M") & (F.col("cd_education_status") == "Primary"))
        | ((F.col("cd_marital_status") == "D") & (F.col("cd_education_status") == "Advanced Degree"))
    )
    hd = ds["household_demographics"].filter(F.col("hd_vehicle_count") <= 2)
    return (
        ds["catalog_returns"]
        .filter((F.year("cr_returned_date_sk") == 1997) & (F.month("cr_returned_date_sk") == 11))
        .join(F.broadcast(ds["call_center"]), F.col("cr_call_center_sk") == F.col("cc_call_center_sk"))
        .join(F.broadcast(cd), F.col("cr_returning_cdemo_sk") == F.col("cd_demo_sk"))
        .join(F.broadcast(hd), F.col("cr_returning_hdemo_sk") == F.col("hd_demo_sk"))
        .groupBy("cc_name", "cc_manager")
        .agg(F.round(F.sum("cr_net_loss"), 4).alias("returns_loss"))
        .orderBy(F.desc("returns_loss"), "cc_name")
    )


Q8_ORACLE = f"""
WITH {DS_CTES},
preferred_zips AS (
  SELECT ca_zip FROM customer_address GROUP BY ca_zip
  HAVING count(*) > (SELECT count(*)::DOUBLE / count(DISTINCT ca_zip) FROM customer_address))
SELECT s_store_name, round(sum(ss_net_profit), 4) AS net_profit
FROM store_sales
JOIN store ON ss_store_sk = s_store_sk
WHERE year(ss_sold_date_sk) = 1997 AND quarter(ss_sold_date_sk) = 1
  AND s_zip IN (SELECT ca_zip FROM preferred_zips)
GROUP BY s_store_name
ORDER BY s_store_name
"""


@register("tpcds_q8", Q8_ORACLE, tags=("tpcds", "star", "subquery"))
def tpcds_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q8 (reference tpcds/q8.sql; the literal 400-zip list becomes
    a derived preferred-zip set — zips hosting >= 3 customer addresses):
    Q1 store net profit restricted to stores in well-populated zip codes.
    The preferred set is scale-invariant: zips hosting more than the
    average number of customer addresses. Plan: the zip keep-list is a
    small aggregate semi-joined (broadcast) against the store dim BEFORE
    the fact join, so the fact scan only keeps qualifying stores; one
    final hash-agg on store name."""
    ds = _ds(spark, sf_dir)
    per_zip = ds["customer_address"].groupBy("ca_zip").agg(F.count(F.lit(1)).alias("n"))
    avg_n = ds["customer_address"].agg(
        (F.count(F.lit(1)) / F.countDistinct("ca_zip")).alias("avg_n")
    )
    zips = (
        per_zip.join(F.broadcast(avg_n))
        .filter(F.col("n") > F.col("avg_n")).select("ca_zip")
    )
    stores = ds["store"].join(F.broadcast(zips), F.col("s_zip") == F.col("ca_zip"), "left_semi")
    return (
        ds["store_sales"]
        .filter((F.year("ss_sold_date_sk") == 1997) & (F.quarter("ss_sold_date_sk") == 1))
        .join(F.broadcast(stores), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("s_store_name")
        .agg(F.round(F.sum("ss_net_profit"), 4).alias("net_profit"))
        .orderBy("s_store_name")
    )


Q23_ORACLE = f"""
WITH {DS_CTES},
frequent_ss_items AS (
  SELECT ss_item_sk AS item_sk
  FROM store_sales WHERE year(ss_sold_date_sk) IN (1996, 1997)
  GROUP BY ss_item_sk HAVING count(*) > 10),
customer_sales AS (
  SELECT ss_customer_sk, round(sum(ss_quantity * ss_sales_price), 4) AS csales
  FROM store_sales WHERE year(ss_sold_date_sk) IN (1996, 1997)
  GROUP BY ss_customer_sk),
best_ss_customer AS (
  SELECT ss_customer_sk FROM customer_sales
  WHERE csales > 0.5 * (SELECT max(csales) FROM customer_sales))
SELECT round(sum(sales), 4) AS total_sales
FROM (
  SELECT cs_ext_sales_price AS sales
  FROM catalog_sales
  WHERE year(cs_sold_date_sk) = 1997 AND quarter(cs_sold_date_sk) = 1
    AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
    AND cs_bill_customer_sk IN (SELECT ss_customer_sk FROM best_ss_customer)
  UNION ALL
  SELECT ws_ext_sales_price
  FROM web_sales
  WHERE year(ws_sold_date_sk) = 1997 AND quarter(ws_sold_date_sk) = 1
    AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
    AND ws_bill_customer_sk IN (SELECT ss_customer_sk FROM best_ss_customer)
) t
"""


@register("tpcds_q23", Q23_ORACLE, tags=("tpcds", "crosschannel", "subquery"))
def tpcds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23 (reference tpcds/q23a.sql; frequency threshold and the
    95%-of-max cutoff retargeted to fixture density): catalog + web Q1
    spending by the store channel's best customers (>50% of the max
    lifetime store spend) on frequently-bought store items. Plan: both
    keep-lists are aggregates of the store fact; the max-spend cutoff is
    a 1-row scalar broadcast into the customer filter; each channel fact
    then takes two broadcast LEFT SEMI joins and the union feeds a 1-row
    final sum — the decorrelated form of the spec's nested INs."""
    ds = _ds(spark, sf_dir)
    ss = ds["store_sales"].filter(F.year("ss_sold_date_sk").isin(1996, 1997))
    frequent = ss.groupBy(F.col("ss_item_sk").alias("item_sk")).agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 10).select("item_sk")
    csales = ss.groupBy("ss_customer_sk").agg(
        F.round(F.sum(F.col("ss_quantity") * F.col("ss_sales_price")), 4).alias("csales")
    )
    max_sales = csales.agg(F.max("csales").alias("mx"))
    best = (
        csales.join(F.broadcast(max_sales))
        .filter(F.col("csales") > 0.5 * F.col("mx"))
        .select("ss_customer_sk")
    )

    def chan(fact: str, prefix: str) -> DataFrame:
        return (
            ds[fact]
            .filter((F.year(f"{prefix}_sold_date_sk") == 1997) & (F.quarter(f"{prefix}_sold_date_sk") == 1))
            .join(F.broadcast(frequent), F.col(f"{prefix}_item_sk") == F.col("item_sk"), "left_semi")
            .join(F.broadcast(best), F.col(f"{prefix}_bill_customer_sk") == F.col("ss_customer_sk"), "left_semi")
            .select(F.col(f"{prefix}_ext_sales_price").alias("sales"))
        )

    return chan("catalog_sales", "cs").unionAll(chan("web_sales", "ws")).agg(
        F.round(F.sum("sales"), 4).alias("total_sales")
    )


def _q49_channel_oracle(sales: str, sp: str, returns: str, rp: str, date_col: str, rdate_col: str, label: str) -> str:
    return f"""
  SELECT '{label}' AS channel, s.item,
         round(coalesce(r.qty_ret, 0)::DOUBLE / s.qty_sold, 6) AS return_ratio,
         rank() OVER (ORDER BY coalesce(r.qty_ret, 0)::DOUBLE / s.qty_sold DESC, s.item) AS return_rank
  FROM (SELECT {sp}_item_sk AS item, sum({sp}_quantity)::BIGINT AS qty_sold
        FROM {sales} WHERE year({date_col}) = 1997 GROUP BY {sp}_item_sk) s
  LEFT JOIN (SELECT {rp}_item_sk AS item, sum({rp}_return_quantity)::BIGINT AS qty_ret
             FROM {returns} WHERE year({rdate_col}) = 1997 GROUP BY {rp}_item_sk) r
  USING (item)
  WHERE s.qty_sold > 0"""


Q49_ORACLE = f"""
WITH {DS_CTES},
web_ratios AS ({_q49_channel_oracle("web_sales", "ws", "web_returns", "wr", "ws_sold_date_sk", "wr_returned_date_sk", "web")}),
catalog_ratios AS ({_q49_channel_oracle("catalog_sales", "cs", "catalog_returns", "cr", "cs_sold_date_sk", "cr_returned_date_sk", "catalog")}),
store_ratios AS ({_q49_channel_oracle("store_sales", "ss", "store_returns", "sr", "ss_sold_date_sk", "sr_returned_date_sk", "store")})
SELECT channel, item, return_ratio, return_rank
FROM (SELECT * FROM web_ratios UNION ALL SELECT * FROM catalog_ratios UNION ALL SELECT * FROM store_ratios) u
WHERE return_rank <= 10
ORDER BY channel, return_rank
"""


@register("tpcds_q49", Q49_ORACLE, tags=("tpcds", "returns", "rank"))
def tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 (reference tpcds/q49.sql; per-line return matching
    replaced by per-item aggregate join — equivalent on the derived star
    where every return line originates from a sales line): the ten worst
    return ratios per channel. Plan: per channel, sales and returns each
    aggregate to |items| rows BEFORE joining (aggregate-then-join, so the
    only joins run over small frames); the rank window is global per
    channel but over already-aggregated rows, with the item tiebreak
    making ranks total; the three channels union after ranking."""
    ds = _ds(spark, sf_dir)

    def chan(sales: str, sp: str, returns: str, rp: str, date_col: str, rdate_col: str, label: str) -> DataFrame:
        s = (
            ds[sales].filter(F.year(date_col) == 1997)
            .groupBy(F.col(f"{sp}_item_sk").alias("item"))
            .agg(F.sum(f"{sp}_quantity").alias("qty_sold"))
        )
        r = (
            ds[returns].filter(F.year(rdate_col) == 1997)
            .groupBy(F.col(f"{rp}_item_sk").alias("ritem"))
            .agg(F.sum(f"{rp}_return_quantity").alias("qty_ret"))
        )
        ratio = F.coalesce(F.col("qty_ret"), F.lit(0)).cast("double") / F.col("qty_sold")
        w = W.orderBy(F.desc(ratio), "item")
        return (
            s.join(r, F.col("item") == F.col("ritem"), "left")
            .filter(F.col("qty_sold") > 0)
            .select(
                F.lit(label).alias("channel"), "item",
                F.round(ratio, 6).alias("return_ratio"),
                F.rank().over(w).alias("return_rank"),
            )
        )

    u = (
        chan("web_sales", "ws", "web_returns", "wr", "ws_sold_date_sk", "wr_returned_date_sk", "web")
        .unionAll(chan("catalog_sales", "cs", "catalog_returns", "cr", "cs_sold_date_sk", "cr_returned_date_sk", "catalog"))
        .unionAll(chan("store_sales", "ss", "store_returns", "sr", "ss_sold_date_sk", "sr_returned_date_sk", "store"))
    )
    return u.filter(F.col("return_rank") <= 10).orderBy("channel", "return_rank")


# ---------------------------------------------------------------------------
# r4 wave 4 — channel twins and remaining distinct shapes
# (q4 q26 q58 q62 q69 q75 q86 q92 q94)
# ---------------------------------------------------------------------------

Q4_ORACLE = f"""
WITH {DS_CTES},
year_total AS (
  SELECT ss_customer_sk AS customer_sk, year(ss_sold_date_sk) AS y, 's' AS channel,
         round(sum(ss_ext_sales_price), 4) AS total
  FROM store_sales WHERE year(ss_sold_date_sk) IN (1996, 1997)
  GROUP BY ss_customer_sk, year(ss_sold_date_sk)
  UNION ALL
  SELECT cs_bill_customer_sk, year(cs_sold_date_sk), 'c', round(sum(cs_ext_sales_price), 4)
  FROM catalog_sales WHERE year(cs_sold_date_sk) IN (1996, 1997)
  GROUP BY cs_bill_customer_sk, year(cs_sold_date_sk)
  UNION ALL
  SELECT ws_bill_customer_sk, year(ws_sold_date_sk), 'w', round(sum(ws_ext_sales_price), 4)
  FROM web_sales WHERE year(ws_sold_date_sk) IN (1996, 1997)
  GROUP BY ws_bill_customer_sk, year(ws_sold_date_sk)
)
SELECT s2.customer_sk AS customer_id
FROM year_total s1 JOIN year_total s2 ON s1.customer_sk = s2.customer_sk
     JOIN year_total c1 ON s1.customer_sk = c1.customer_sk
     JOIN year_total c2 ON s1.customer_sk = c2.customer_sk
     JOIN year_total w1 ON s1.customer_sk = w1.customer_sk
     JOIN year_total w2 ON s1.customer_sk = w2.customer_sk
WHERE s1.channel = 's' AND s1.y = 1996 AND s2.channel = 's' AND s2.y = 1997
  AND c1.channel = 'c' AND c1.y = 1996 AND c2.channel = 'c' AND c2.y = 1997
  AND w1.channel = 'w' AND w1.y = 1996 AND w2.channel = 'w' AND w2.y = 1997
  AND s1.total > 0 AND c1.total > 0 AND w1.total > 0
  AND c2.total / c1.total > s2.total / s1.total
  AND c2.total / c1.total > w2.total / w1.total
ORDER BY customer_id
"""


@register("tpcds_q4", Q4_ORACLE, tags=("tpcds", "crosschannel", "selfjoin"))
def tpcds_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q4 (reference tpcds/q4.sql; keyed on customer_sk): the
    three-channel year-over-year comparison — customers whose CATALOG
    spending grew faster than both their store and web spending. The
    spec's six year_total self-joins collapse into one groupBy(customer)
    with six conditional sums (q74's pattern extended to three channels);
    the three channel aggregates union BEFORE the customer shuffle, so the
    whole query is three fact scans + one keyed shuffle."""
    ds = _ds(spark, sf_dir)

    def chan(fact: str, cust: str, date: str, price: str, ch: str) -> DataFrame:
        return (
            ds[fact].filter(F.year(date).isin(1996, 1997))
            .select(F.col(cust).alias("customer_sk"), F.year(date).alias("y"),
                    F.lit(ch).alias("channel"), F.col(price).alias("p"))
        )

    u = (
        chan("store_sales", "ss_customer_sk", "ss_sold_date_sk", "ss_ext_sales_price", "s")
        .unionAll(chan("catalog_sales", "cs_bill_customer_sk", "cs_sold_date_sk", "cs_ext_sales_price", "c"))
        .unionAll(chan("web_sales", "ws_bill_customer_sk", "ws_sold_date_sk", "ws_ext_sales_price", "w"))
    )

    def tot(ch: str, yr: int):
        return F.round(F.sum(F.when((F.col("channel") == ch) & (F.col("y") == yr), F.col("p"))), 4)

    per_cust = u.groupBy("customer_sk").agg(
        tot("s", 1996).alias("s1"), tot("s", 1997).alias("s2"),
        tot("c", 1996).alias("c1"), tot("c", 1997).alias("c2"),
        tot("w", 1996).alias("w1"), tot("w", 1997).alias("w2"),
    )
    return (
        per_cust.filter(
            (F.col("s1") > 0) & (F.col("c1") > 0) & (F.col("w1") > 0)
            & F.col("s2").isNotNull() & F.col("c2").isNotNull() & F.col("w2").isNotNull()
            & (F.col("c2") / F.col("c1") > F.col("s2") / F.col("s1"))
            & (F.col("c2") / F.col("c1") > F.col("w2") / F.col("w1"))
        )
        .select(F.col("customer_sk").alias("customer_id"))
        .orderBy("customer_id")
    )


Q26_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_id,
       round(avg(cs_quantity), 4) AS agg1,
       round(avg(cs_ext_sales_price), 4) AS agg2,
       round(avg(cs_net_profit), 4) AS agg3
FROM catalog_sales
JOIN customer_demographics ON cs_bill_cdemo_sk = cd_demo_sk
JOIN item ON cs_item_sk = i_item_sk
JOIN promotion ON cs_promo_sk = p_promo_sk
WHERE cd_gender = 'F' AND cd_marital_status = 'S' AND cd_education_status = 'Advanced Degree'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND year(cs_sold_date_sk) = 1997
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
"""


@register("tpcds_q26", Q26_ORACLE, tags=("tpcds", "catalog", "agg"))
def tpcds_q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q26 (reference tpcds/q26.sql) — q7's catalog twin: average
    quantity / price / profit per item for one demographic profile under
    non-promoted channels. Plan: demographics and promotion broadcast and
    filter BEFORE the item join; one hash-agg on i_item_id."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        (F.col("cd_gender") == "F") & (F.col("cd_marital_status") == "S")
        & (F.col("cd_education_status") == "Advanced Degree")
    )
    promo = ds["promotion"].filter((F.col("p_channel_email") == "N") | (F.col("p_channel_event") == "N"))
    return (
        ds["catalog_sales"]
        .filter(F.year("cs_sold_date_sk") == 1997)
        .join(F.broadcast(cd), F.col("cs_bill_cdemo_sk") == F.col("cd_demo_sk"))
        .join(ds["item"].select("i_item_sk", "i_item_id"), F.col("cs_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(promo), F.col("cs_promo_sk") == F.col("p_promo_sk"))
        .groupBy("i_item_id")
        .agg(
            F.round(F.avg("cs_quantity"), 4).alias("agg1"),
            F.round(F.avg("cs_ext_sales_price"), 4).alias("agg2"),
            F.round(F.avg("cs_net_profit"), 4).alias("agg3"),
        )
        .orderBy("i_item_id")
        .limit(100)
    )


Q58_ORACLE = f"""
WITH {DS_CTES},
ss_items AS (
  SELECT i_item_id AS item_id, round(sum(ss_ext_sales_price) / 3, 4) AS ss_item_rev
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  WHERE year(ss_sold_date_sk) = 1997
  GROUP BY i_item_id),
cs_items AS (
  SELECT i_item_id AS item_id, round(sum(cs_ext_sales_price), 4) AS cs_item_rev
  FROM catalog_sales JOIN item ON cs_item_sk = i_item_sk
  WHERE year(cs_sold_date_sk) = 1997
  GROUP BY i_item_id),
ws_items AS (
  SELECT i_item_id AS item_id, round(sum(ws_ext_sales_price), 4) AS ws_item_rev
  FROM web_sales JOIN item ON ws_item_sk = i_item_sk
  WHERE year(ws_sold_date_sk) = 1997
  GROUP BY i_item_id)
SELECT s.item_id, s.ss_item_rev, c.cs_item_rev, w.ws_item_rev,
       round((s.ss_item_rev + c.cs_item_rev + w.ws_item_rev) / 3, 4) AS average
FROM ss_items s JOIN cs_items c ON s.item_id = c.item_id
                JOIN ws_items w ON s.item_id = w.item_id
WHERE s.ss_item_rev BETWEEN 0.9 * c.cs_item_rev AND 1.1 * c.cs_item_rev
  AND s.ss_item_rev BETWEEN 0.9 * w.ws_item_rev AND 1.1 * w.ws_item_rev
  AND c.cs_item_rev BETWEEN 0.9 * s.ss_item_rev AND 1.1 * s.ss_item_rev
  AND c.cs_item_rev BETWEEN 0.9 * w.ws_item_rev AND 1.1 * w.ws_item_rev
  AND w.ws_item_rev BETWEEN 0.9 * s.ss_item_rev AND 1.1 * s.ss_item_rev
  AND w.ws_item_rev BETWEEN 0.9 * c.cs_item_rev AND 1.1 * c.cs_item_rev
ORDER BY s.item_id
"""


@register("tpcds_q58", Q58_ORACLE, tags=("tpcds", "crosschannel", "band"))
def tpcds_q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58 (reference tpcds/q58.sql; the week-subquery date filter
    becomes one fixture year, and the store figure is weighted by 1/3
    because the derived store channel keeps ALL tickets while web/catalog
    are disjoint one-third subsets — without the weight the balance bands
    are structurally unsatisfiable): items whose revenue is BALANCED
    across all three channels — every channel within +-10% of every
    other. Plan:
    three per-item channel aggregates (one keyed shuffle each), then two
    joins over the aggregated frames with the six band predicates as
    residuals; the bands compare 4-rounded sums so the keep-set is
    engine-stable."""
    ds = _ds(spark, sf_dir)
    item = ds["item"].select("i_item_sk", "i_item_id")

    def chan(fact: str, prefix: str, out: str, scale: int = 1) -> DataFrame:
        return (
            ds[fact]
            .filter(F.year(f"{prefix}_sold_date_sk") == 1997)
            .join(item, F.col(f"{prefix}_item_sk") == F.col("i_item_sk"))
            .groupBy(F.col("i_item_id").alias(f"{out}_id"))
            .agg(F.round(F.sum(f"{prefix}_ext_sales_price") / scale, 4).alias(f"{out}_item_rev"))
        )

    s = chan("store_sales", "ss", "ss", scale=3)
    c = chan("catalog_sales", "cs", "cs")
    w = chan("web_sales", "ws", "ws")
    band = lambda a, b: F.col(a).between(0.9 * F.col(b), 1.1 * F.col(b))  # noqa: E731
    return (
        s.join(c, F.col("ss_id") == F.col("cs_id"))
        .join(w, F.col("ss_id") == F.col("ws_id"))
        .filter(
            band("ss_item_rev", "cs_item_rev") & band("ss_item_rev", "ws_item_rev")
            & band("cs_item_rev", "ss_item_rev") & band("cs_item_rev", "ws_item_rev")
            & band("ws_item_rev", "ss_item_rev") & band("ws_item_rev", "cs_item_rev")
        )
        .select(
            F.col("ss_id").alias("item_id"), "ss_item_rev", "cs_item_rev", "ws_item_rev",
            F.round((F.col("ss_item_rev") + F.col("cs_item_rev") + F.col("ws_item_rev")) / 3, 4).alias("average"),
        )
        .orderBy("item_id")
    )


def _q62_oracle() -> str:
    bands = ", ".join(
        f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS {name}" for name, cond in _q99_bands()
    )
    return f"""
WITH {DS_CTES},
shipped AS (
  SELECT ws_warehouse_sk, ws_ship_mode_sk, ws_web_page_sk,
         date_diff('day', ws_sold_date_sk, ws_ship_date_sk) AS days
  FROM web_sales WHERE year(ws_ship_date_sk) = 1997
)
SELECT w_warehouse_name, sm_type, ws_web_page_sk AS web_page,
       {bands}
FROM shipped JOIN warehouse ON ws_warehouse_sk = w_warehouse_sk
             JOIN ship_mode ON ws_ship_mode_sk = sm_ship_mode_sk
GROUP BY w_warehouse_name, sm_type, ws_web_page_sk
ORDER BY w_warehouse_name, sm_type, web_page
"""


@register("tpcds_q62", _q62_oracle(), tags=("tpcds", "shipping", "bands"))
def tpcds_q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q62 (reference tpcds/q62.sql) — q99's web twin: days-to-ship
    bands per (warehouse, ship mode, web page) over the web channel; same
    single-pass banded hash-agg with broadcast dims."""
    ds = _ds(spark, sf_dir)
    days = F.datediff(F.col("ws_ship_date_sk"), F.col("ws_sold_date_sk"))
    shipped = (
        ds["web_sales"]
        .filter(F.year("ws_ship_date_sk") == 1997)
        .select("ws_warehouse_sk", "ws_ship_mode_sk", "ws_web_page_sk", days.alias("days"))
    )
    aggs = [F.sum(F.when(F.expr(cond), 1).otherwise(0)).alias(name) for name, cond in _q99_bands()]
    return (
        shipped.join(F.broadcast(ds["warehouse"]), F.col("ws_warehouse_sk") == F.col("w_warehouse_sk"))
        .join(F.broadcast(ds["ship_mode"]), F.col("ws_ship_mode_sk") == F.col("sm_ship_mode_sk"))
        .groupBy("w_warehouse_name", "sm_type", F.col("ws_web_page_sk").alias("web_page"))
        .agg(*aggs)
        .orderBy("w_warehouse_name", "sm_type", "web_page")
    )


Q69_ORACLE = f"""
WITH {DS_CTES}
SELECT cd_gender, cd_marital_status, cd_education_status, count(*)::BIGINT AS cnt
FROM customer_dim c
JOIN customer_demographics ON cd_demo_sk = c.c_customer_sk % 60
WHERE EXISTS (SELECT 1 FROM store_sales
              WHERE ss_customer_sk = c.c_customer_sk AND year(ss_sold_date_sk) = 1997)
  AND NOT EXISTS (SELECT 1 FROM web_sales
                  WHERE ws_bill_customer_sk = c.c_customer_sk AND year(ws_sold_date_sk) = 1997)
  AND NOT EXISTS (SELECT 1 FROM catalog_sales
                  WHERE cs_bill_customer_sk = c.c_customer_sk AND year(cs_sold_date_sk) = 1997)
GROUP BY cd_gender, cd_marital_status, cd_education_status
ORDER BY cd_gender, cd_marital_status, cd_education_status
"""


@register("tpcds_q69", Q69_ORACLE, tags=("tpcds", "existence", "demographics"))
def tpcds_q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q69 (reference tpcds/q69.sql; the address leg is covered by
    q30/q31): demographic profile counts of store-ONLY shoppers — bought
    in store during the year, never through web or catalog. Plan: one
    LEFT SEMI (store) and two LEFT ANTI (web, catalog) joins against
    per-channel deduped customer keep-lists, then a broadcast demographics
    join and a small hash-agg. The keep-lists aggregate map-side so each
    channel contributes one distinct-shuffle of customer ids only."""
    ds = _ds(spark, sf_dir)
    c = ds["customer_dim"].select("c_customer_sk")
    ss_c = ds["store_sales"].filter(F.year("ss_sold_date_sk") == 1997).select(F.col("ss_customer_sk").alias("k")).distinct()
    ws_c = ds["web_sales"].filter(F.year("ws_sold_date_sk") == 1997).select(F.col("ws_bill_customer_sk").alias("k")).distinct()
    cs_c = ds["catalog_sales"].filter(F.year("cs_sold_date_sk") == 1997).select(F.col("cs_bill_customer_sk").alias("k")).distinct()
    return (
        c.join(ss_c, F.col("c_customer_sk") == F.col("k"), "left_semi")
        .join(ws_c, F.col("c_customer_sk") == F.col("k"), "left_anti")
        .join(cs_c, F.col("c_customer_sk") == F.col("k"), "left_anti")
        .join(
            F.broadcast(ds["customer_demographics"]),
            F.col("cd_demo_sk") == F.col("c_customer_sk") % 60,
        )
        .groupBy("cd_gender", "cd_marital_status", "cd_education_status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("cd_gender", "cd_marital_status", "cd_education_status")
    )


Q75_ORACLE = f"""
WITH {DS_CTES},
all_sales AS (
  SELECT year(cs_sold_date_sk) AS d_year, i_brand_id,
         sum(cs_quantity - coalesce(cr_return_quantity, 0))::BIGINT AS sales_cnt,
         round(sum(cs_ext_sales_price - coalesce(cr_return_amt, 0)), 4) AS sales_amt
  FROM catalog_sales JOIN item ON cs_item_sk = i_item_sk
  LEFT JOIN catalog_returns ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
  WHERE i_category = 'Books' AND year(cs_sold_date_sk) IN (1996, 1997)
  GROUP BY year(cs_sold_date_sk), i_brand_id
  UNION ALL
  SELECT year(ss_sold_date_sk), i_brand_id,
         sum(ss_quantity - coalesce(sr_return_quantity, 0))::BIGINT,
         round(sum(ss_ext_sales_price - coalesce(sr_return_amt, 0)), 4)
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number
        AND ss_item_sk = sr_item_sk AND ss_line_number = sr_line_number
  WHERE i_category = 'Books' AND year(ss_sold_date_sk) IN (1996, 1997)
  GROUP BY year(ss_sold_date_sk), i_brand_id
  UNION ALL
  SELECT year(ws_sold_date_sk), i_brand_id,
         sum(ws_quantity - coalesce(wr_return_quantity, 0))::BIGINT,
         round(sum(ws_ext_sales_price - coalesce(wr_return_amt, 0)), 4)
  FROM web_sales JOIN item ON ws_item_sk = i_item_sk
  LEFT JOIN web_returns ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
  WHERE i_category = 'Books' AND year(ws_sold_date_sk) IN (1996, 1997)
  GROUP BY year(ws_sold_date_sk), i_brand_id
),
by_brand AS (
  SELECT i_brand_id,
         sum(CASE WHEN d_year = 1996 THEN sales_cnt END)::BIGINT AS prev_cnt,
         sum(CASE WHEN d_year = 1997 THEN sales_cnt END)::BIGINT AS curr_cnt,
         round(sum(CASE WHEN d_year = 1996 THEN sales_amt END), 4) AS prev_amt,
         round(sum(CASE WHEN d_year = 1997 THEN sales_amt END), 4) AS curr_amt
  FROM all_sales GROUP BY i_brand_id
)
SELECT i_brand_id, prev_cnt, curr_cnt,
       curr_cnt - prev_cnt AS sales_cnt_diff,
       round(curr_amt - prev_amt, 4) AS sales_amt_diff
FROM by_brand
WHERE prev_cnt IS NOT NULL AND curr_cnt IS NOT NULL
  AND curr_cnt::DOUBLE / prev_cnt < 0.95
ORDER BY sales_cnt_diff, i_brand_id
"""


@register("tpcds_q75", Q75_ORACLE, tags=("tpcds", "crosschannel", "returns"))
def tpcds_q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 (reference tpcds/q75.sql; brand grain, category
    retargeted): brands whose NET unit sales (sales minus returned units,
    all three channels combined) declined more than 5% year-over-year.
    Plan: each channel left-joins its returns at line grain, aggregates to
    (year, brand), the union re-aggregates the tiny brand frame, and the
    year-pair join runs over |brands| rows. Decline test uses integer unit
    counts — no float drift."""
    ds = _ds(spark, sf_dir)
    item = ds["item"].filter(F.col("i_category") == "Books").select("i_item_sk", "i_brand_id")

    def chan(fact: str, rets: str, join_cond, date: str, prefix: str, rprefix: str) -> DataFrame:
        f = ds[fact].filter(F.year(date).isin(1996, 1997))
        r = ds[rets]
        return (
            f.join(item, F.col(f"{prefix}_item_sk") == F.col("i_item_sk"))
            .join(r, join_cond, "left")
            .groupBy(F.year(date).alias("d_year"), "i_brand_id")
            .agg(
                F.sum(F.col(f"{prefix}_quantity") - F.coalesce(F.col(f"{rprefix}_return_quantity"), F.lit(0))).cast("long").alias("sales_cnt"),
                F.round(F.sum(F.col(f"{prefix}_ext_sales_price") - F.coalesce(F.col(f"{rprefix}_return_amt"), F.lit(0.0))), 4).alias("sales_amt"),
            )
        )

    cs = chan(
        "catalog_sales", "catalog_returns",
        (F.col("cs_order_number") == F.col("cr_order_number")) & (F.col("cs_item_sk") == F.col("cr_item_sk")),
        "cs_sold_date_sk", "cs", "cr",
    )
    ss = chan(
        "store_sales", "store_returns",
        (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
        & (F.col("ss_item_sk") == F.col("sr_item_sk"))
        & (F.col("ss_line_number") == F.col("sr_line_number")),
        "ss_sold_date_sk", "ss", "sr",
    )
    ws = chan(
        "web_sales", "web_returns",
        (F.col("ws_order_number") == F.col("wr_order_number")) & (F.col("ws_item_sk") == F.col("wr_item_sk")),
        "ws_sold_date_sk", "ws", "wr",
    )
    # Year pivot in ONE aggregate (the q74 collapse): a year-pair self-join
    # would push the year filter below the channel union and recompute the
    # entire three-channel pipeline per side (no exchange reuse) — at scale
    # that doubles every fact scan.
    by_brand = (
        cs.unionAll(ss).unionAll(ws)
        .groupBy("i_brand_id")
        .agg(
            F.sum(F.when(F.col("d_year") == 1996, F.col("sales_cnt"))).cast("long").alias("prev_cnt"),
            F.sum(F.when(F.col("d_year") == 1997, F.col("sales_cnt"))).cast("long").alias("curr_cnt"),
            F.round(F.sum(F.when(F.col("d_year") == 1996, F.col("sales_amt"))), 4).alias("prev_amt"),
            F.round(F.sum(F.when(F.col("d_year") == 1997, F.col("sales_amt"))), 4).alias("curr_amt"),
        )
    )
    return (
        by_brand.filter(
            F.col("prev_cnt").isNotNull() & F.col("curr_cnt").isNotNull()
            & (F.col("curr_cnt").cast("double") / F.col("prev_cnt") < 0.95)
        )
        .select(
            "i_brand_id", "prev_cnt", "curr_cnt",
            (F.col("curr_cnt") - F.col("prev_cnt")).alias("sales_cnt_diff"),
            F.round(F.col("curr_amt") - F.col("prev_amt"), 4).alias("sales_amt_diff"),
        )
        .orderBy("sales_cnt_diff", "i_brand_id")
    )


Q86_ORACLE = f"""
WITH {DS_CTES}
SELECT round(sum(ws_ext_sales_price), 4) AS total_sum, i_category, i_class,
       (grouping(i_category) + grouping(i_class))::BIGINT AS lochierarchy,
       rank() OVER (
         PARTITION BY grouping(i_category) + grouping(i_class),
                      CASE WHEN grouping(i_class) = 1 THEN NULL ELSE i_category END
         ORDER BY sum(ws_ext_sales_price) DESC) AS rank_within_parent
FROM web_sales JOIN item ON ws_item_sk = i_item_sk
WHERE year(ws_sold_date_sk) = 1997
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent, i_category NULLS FIRST, i_class NULLS FIRST
"""


@register("tpcds_q86", Q86_ORACLE, tags=("tpcds", "web", "rollup", "window"))
def tpcds_q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q86 (reference tpcds/q86.sql) — q36's web twin: category/
    class ROLLUP over web revenue with a rank within each hierarchy
    parent (grouping()-derived partition keys). The rank window runs over
    the ALREADY-AGGREGATED rollup frame. Revenue sums are unique at every
    level on the fixtures, so ranks are total (plus name tiebreaks in the
    final order)."""
    ds = _ds(spark, sf_dir)
    agg = (
        ds["web_sales"]
        .filter(F.year("ws_sold_date_sk") == 1997)
        .join(ds["item"].select("i_item_sk", "i_category", "i_class"), F.col("ws_item_sk") == F.col("i_item_sk"))
        .rollup("i_category", "i_class")
        .agg(
            F.sum("ws_ext_sales_price").alias("raw_sum"),
            (F.grouping("i_category") + F.grouping("i_class")).alias("lochierarchy"),
            F.grouping("i_class").alias("g_class"),
        )
    )
    w = W.partitionBy(
        "lochierarchy", F.when(F.col("g_class") == 1, None).otherwise(F.col("i_category"))
    ).orderBy(F.desc("raw_sum"))
    return (
        agg.select(
            F.round("raw_sum", 4).alias("total_sum"), "i_category", "i_class",
            F.col("lochierarchy").cast("long").alias("lochierarchy"),
            F.rank().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.when(F.col("lochierarchy") == 0, F.col("i_category")).asc_nulls_first(),
            "rank_within_parent",
            F.col("i_category").asc_nulls_first(),
            F.col("i_class").asc_nulls_first(),
        )
    )


Q92_ORACLE = f"""
WITH {DS_CTES},
windowed AS (
  SELECT ws_item_sk, ws_ext_discount_amt
  FROM web_sales
  WHERE ws_sold_date_sk BETWEEN TIMESTAMP '1997-03-01' AND TIMESTAMP '1997-05-30'
),
item_avg AS (
  SELECT ws_item_sk AS avg_item, 1.3 * avg(ws_ext_discount_amt) AS cutoff
  FROM windowed GROUP BY ws_item_sk
)
SELECT round(sum(ws_ext_discount_amt), 4) AS excess_discount_amount
FROM windowed JOIN item_avg ON ws_item_sk = avg_item
WHERE ws_ext_discount_amt > cutoff
"""


@register("tpcds_q92", Q92_ORACLE, tags=("tpcds", "web", "subquery"))
def tpcds_q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q92 (reference tpcds/q92.sql): web "excess discount" — total
    discount on lines discounted more than 1.3x their item's average in
    the window. The correlated per-item average decorrelates to one
    aggregate + re-join of the SAME filtered scan (Catalyst would plan
    the spec's subquery identically); one 1-row final sum."""
    ds = _ds(spark, sf_dir)
    windowed = ds["web_sales"].filter(
        F.col("ws_sold_date_sk").between(F.expr("TIMESTAMP '1997-03-01'"), F.expr("TIMESTAMP '1997-05-30'"))
    ).select("ws_item_sk", "ws_ext_discount_amt")
    item_avg = windowed.groupBy(F.col("ws_item_sk").alias("avg_item")).agg(
        (F.lit(1.3) * F.avg("ws_ext_discount_amt")).alias("cutoff")
    )
    return (
        windowed.join(item_avg, F.col("ws_item_sk") == F.col("avg_item"))
        .filter(F.col("ws_ext_discount_amt") > F.col("cutoff"))
        .agg(F.round(F.sum("ws_ext_discount_amt"), 4).alias("excess_discount_amount"))
    )


Q94_ORACLE = f"""
WITH {DS_CTES}
SELECT count(DISTINCT ws_order_number) AS order_count,
       round(sum(ws_ext_sales_price), 4) AS total_sales,
       round(sum(ws_net_profit), 4) AS total_net_profit
FROM web_sales ws1
WHERE ws_ship_date_sk BETWEEN TIMESTAMP '1997-02-01' AND TIMESTAMP '1997-04-02'
  AND EXISTS (SELECT 1 FROM web_sales ws2
              WHERE ws1.ws_order_number = ws2.ws_order_number
                AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
  AND NOT EXISTS (SELECT 1 FROM web_returns wr
                  WHERE ws1.ws_order_number = wr.wr_order_number)
"""


@register("tpcds_q94", Q94_ORACLE, tags=("tpcds", "existence", "antijoin"))
def tpcds_q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q94 (reference tpcds/q94.sql) — q16's web twin: web orders
    shipped in the window, fulfilled from multiple warehouses, never
    returned; left-semi self-join + left-anti returns with one final
    1-row aggregate."""
    ds = _ds(spark, sf_dir)
    ws1 = ds["web_sales"].filter(
        F.col("ws_ship_date_sk").between(F.expr("TIMESTAMP '1997-02-01'"), F.expr("TIMESTAMP '1997-04-02'"))
    )
    ws2 = ds["web_sales"].select(F.col("ws_order_number").alias("o2"), F.col("ws_warehouse_sk").alias("w2"))
    wr = ds["web_returns"].select(F.col("wr_order_number").alias("ro"))
    return (
        ws1.join(ws2, (F.col("ws_order_number") == F.col("o2")) & (F.col("ws_warehouse_sk") != F.col("w2")), "left_semi")
        .join(wr, F.col("ws_order_number") == F.col("ro"), "left_anti")
        .agg(
            F.countDistinct("ws_order_number").alias("order_count"),
            F.round(F.sum("ws_ext_sales_price"), 4).alias("total_sales"),
            F.round(F.sum("ws_net_profit"), 4).alias("total_net_profit"),
        )
    )


# ---------------------------------------------------------------------------
# r4 wave 5 — cross-channel intersections, histograms, wide pivots
# (q14 q32 q35 q54 q66 q71 q83 q95)
# ---------------------------------------------------------------------------

Q14_ORACLE = f"""
WITH {DS_CTES},
cross_items AS (
  SELECT ss_item_sk AS item_sk FROM store_sales WHERE year(ss_sold_date_sk) = 1996
  INTERSECT
  SELECT cs_item_sk FROM catalog_sales WHERE year(cs_sold_date_sk) = 1996
  INTERSECT
  SELECT ws_item_sk FROM web_sales WHERE year(ws_sold_date_sk) = 1996),
avg_sales AS (
  SELECT avg(p) AS average_sales FROM (
    SELECT ss_ext_sales_price AS p FROM store_sales WHERE year(ss_sold_date_sk) = 1996
    UNION ALL SELECT cs_ext_sales_price FROM catalog_sales WHERE year(cs_sold_date_sk) = 1996
    UNION ALL SELECT ws_ext_sales_price FROM web_sales WHERE year(ws_sold_date_sk) = 1996) x),
united AS (
  SELECT 'store' AS channel, ss_item_sk AS item_sk, ss_ext_sales_price AS p
  FROM store_sales WHERE year(ss_sold_date_sk) = 1997
  UNION ALL
  SELECT 'catalog', cs_item_sk, cs_ext_sales_price
  FROM catalog_sales WHERE year(cs_sold_date_sk) = 1997
  UNION ALL
  SELECT 'web', ws_item_sk, ws_ext_sales_price
  FROM web_sales WHERE year(ws_sold_date_sk) = 1997)
SELECT channel, i_brand_id, round(sum(p), 4) AS sales, count(*)::BIGINT AS number_sales
FROM united JOIN item ON item_sk = i_item_sk
WHERE item_sk IN (SELECT item_sk FROM cross_items)
GROUP BY channel, i_brand_id
HAVING sum(p) > (SELECT average_sales FROM avg_sales) * 10
ORDER BY channel, i_brand_id
"""


@register("tpcds_q14", Q14_ORACLE, tags=("tpcds", "crosschannel", "intersect", "subquery"))
def tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 (reference tpcds/q14a.sql; the (brand, class, category)
    intersect key becomes item_sk — the derived item hierarchy is
    functionally dependent on item_sk so the spec's key adds nothing —
    and the HAVING cutoff is 10x the per-line average to fit brand-grain
    sums): per-channel brand revenue in 1997 restricted to items sold
    through ALL THREE channels in 1996, keeping brands above a scalar
    revenue cutoff. Plan: the cross-items INTERSECT runs over per-channel
    deduped item sets (semi-join chain); the average-sales scalar is a
    1-row broadcast; the channel union aggregates once on (channel,
    brand)."""
    ds = _ds(spark, sf_dir)

    def items_of(fact: str, item: str, date: str) -> DataFrame:
        return ds[fact].filter(F.year(date) == 1996).select(F.col(item).alias("item_sk")).distinct()

    cross_items = (
        items_of("store_sales", "ss_item_sk", "ss_sold_date_sk")
        .intersect(items_of("catalog_sales", "cs_item_sk", "cs_sold_date_sk"))
        .intersect(items_of("web_sales", "ws_item_sk", "ws_sold_date_sk"))
    )

    def prices(fact: str, item: str, date: str, price: str, yr: int, ch: str | None = None) -> DataFrame:
        d = ds[fact].filter(F.year(date) == yr)
        cols = [F.col(item).alias("item_sk"), F.col(price).alias("p")]
        if ch is not None:
            cols.insert(0, F.lit(ch).alias("channel"))
        return d.select(*cols)

    avg_sales = (
        prices("store_sales", "ss_item_sk", "ss_sold_date_sk", "ss_ext_sales_price", 1996)
        .unionAll(prices("catalog_sales", "cs_item_sk", "cs_sold_date_sk", "cs_ext_sales_price", 1996))
        .unionAll(prices("web_sales", "ws_item_sk", "ws_sold_date_sk", "ws_ext_sales_price", 1996))
        .agg(F.avg("p").alias("average_sales"))
    )
    united = (
        prices("store_sales", "ss_item_sk", "ss_sold_date_sk", "ss_ext_sales_price", 1997, "store")
        .unionAll(prices("catalog_sales", "cs_item_sk", "cs_sold_date_sk", "cs_ext_sales_price", 1997, "catalog"))
        .unionAll(prices("web_sales", "ws_item_sk", "ws_sold_date_sk", "ws_ext_sales_price", 1997, "web"))
    )
    return (
        united.join(F.broadcast(cross_items), "item_sk", "left_semi")
        .join(ds["item"].select("i_item_sk", "i_brand_id"), F.col("item_sk") == F.col("i_item_sk"))
        .groupBy("channel", "i_brand_id")
        .agg(F.sum("p").alias("raw_sales"), F.count(F.lit(1)).alias("number_sales"))
        .join(F.broadcast(avg_sales))
        .filter(F.col("raw_sales") > F.col("average_sales") * 10)
        .select("channel", "i_brand_id", F.round("raw_sales", 4).alias("sales"), "number_sales")
        .orderBy("channel", "i_brand_id")
    )


Q32_ORACLE = f"""
WITH {DS_CTES},
windowed AS (
  SELECT cs_item_sk, cs_ext_discount_amt
  FROM catalog_sales
  WHERE cs_sold_date_sk BETWEEN TIMESTAMP '1996-03-01' AND TIMESTAMP '1996-05-30'
),
item_avg AS (
  SELECT cs_item_sk AS avg_item, 1.3 * avg(cs_ext_discount_amt) AS cutoff
  FROM windowed GROUP BY cs_item_sk
)
SELECT round(sum(cs_ext_discount_amt), 4) AS excess_discount_amount
FROM windowed JOIN item_avg ON cs_item_sk = avg_item
WHERE cs_ext_discount_amt > cutoff
"""


@register("tpcds_q32", Q32_ORACLE, tags=("tpcds", "catalog", "subquery"))
def tpcds_q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q32 (reference tpcds/q32.sql) — q92's catalog twin: excess
    catalog discount vs 1.3x the per-item window average (decorrelated
    aggregate + re-join, 1-row result)."""
    ds = _ds(spark, sf_dir)
    windowed = ds["catalog_sales"].filter(
        F.col("cs_sold_date_sk").between(F.expr("TIMESTAMP '1996-03-01'"), F.expr("TIMESTAMP '1996-05-30'"))
    ).select("cs_item_sk", "cs_ext_discount_amt")
    item_avg = windowed.groupBy(F.col("cs_item_sk").alias("avg_item")).agg(
        (F.lit(1.3) * F.avg("cs_ext_discount_amt")).alias("cutoff")
    )
    return (
        windowed.join(item_avg, F.col("cs_item_sk") == F.col("avg_item"))
        .filter(F.col("cs_ext_discount_amt") > F.col("cutoff"))
        .agg(F.round(F.sum("cs_ext_discount_amt"), 4).alias("excess_discount_amount"))
    )


Q35_ORACLE = f"""
WITH {DS_CTES}
SELECT cd_gender, cd_marital_status, count(*)::BIGINT AS cnt,
       round(avg(hd_dep_count), 4) AS avg_dep,
       max(hd_dep_count) AS max_dep,
       sum(hd_dep_count)::BIGINT AS sum_dep
FROM customer_dim c
JOIN customer_demographics ON cd_demo_sk = c.c_customer_sk % 60
JOIN household_demographics ON hd_demo_sk = c.c_customer_sk % 100
WHERE EXISTS (SELECT 1 FROM store_sales
              WHERE ss_customer_sk = c.c_customer_sk AND year(ss_sold_date_sk) = 1997)
  AND (EXISTS (SELECT 1 FROM web_sales
               WHERE ws_bill_customer_sk = c.c_customer_sk AND year(ws_sold_date_sk) = 1997)
    OR EXISTS (SELECT 1 FROM catalog_sales
               WHERE cs_bill_customer_sk = c.c_customer_sk AND year(cs_sold_date_sk) = 1997))
GROUP BY cd_gender, cd_marital_status
ORDER BY cd_gender, cd_marital_status
"""


@register("tpcds_q35", Q35_ORACLE, tags=("tpcds", "existence", "demographics"))
def tpcds_q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q35 (reference tpcds/q35.sql): demographic statistics of
    customers who shopped in store AND through at least one remote
    channel (web OR catalog) in the year. The OR-of-EXISTS compiles to
    one LEFT SEMI against the UNION of the two remote keep-lists — the
    standard decorrelation that avoids a disjunctive join condition; dep
    statistics aggregate from the broadcast household dim."""
    ds = _ds(spark, sf_dir)
    c = ds["customer_dim"].select("c_customer_sk")
    ss_c = ds["store_sales"].filter(F.year("ss_sold_date_sk") == 1997).select(F.col("ss_customer_sk").alias("k")).distinct()
    remote = (
        ds["web_sales"].filter(F.year("ws_sold_date_sk") == 1997).select(F.col("ws_bill_customer_sk").alias("k"))
        .unionAll(ds["catalog_sales"].filter(F.year("cs_sold_date_sk") == 1997).select(F.col("cs_bill_customer_sk").alias("k")))
        .distinct()
    )
    return (
        c.join(ss_c, F.col("c_customer_sk") == F.col("k"), "left_semi")
        .join(remote, F.col("c_customer_sk") == F.col("k"), "left_semi")
        .join(F.broadcast(ds["customer_demographics"]), F.col("cd_demo_sk") == F.col("c_customer_sk") % 60)
        .join(F.broadcast(ds["household_demographics"]), F.col("hd_demo_sk") == F.col("c_customer_sk") % 100)
        .groupBy("cd_gender", "cd_marital_status")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("hd_dep_count"), 4).alias("avg_dep"),
            F.max("hd_dep_count").alias("max_dep"),
            F.sum("hd_dep_count").alias("sum_dep"),
        )
        .orderBy("cd_gender", "cd_marital_status")
    )


Q54_ORACLE = f"""
WITH {DS_CTES},
my_customers AS (
  SELECT DISTINCT cust FROM (
    SELECT cs_bill_customer_sk AS cust, cs_item_sk AS itm, cs_sold_date_sk AS d FROM catalog_sales
    UNION ALL
    SELECT ws_bill_customer_sk, ws_item_sk, ws_sold_date_sk FROM web_sales) u
  JOIN item ON itm = i_item_sk
  WHERE i_category = 'Books' AND year(d) = 1997 AND month(d) = 6),
my_revenue AS (
  SELECT ss_customer_sk, round(sum(ss_sales_price), 4) AS revenue
  FROM store_sales
  WHERE ss_customer_sk IN (SELECT cust FROM my_customers)
    AND year(ss_sold_date_sk) = 1997 AND month(ss_sold_date_sk) IN (7, 8, 9)
  GROUP BY ss_customer_sk)
SELECT CAST(floor(revenue / 50) AS BIGINT) AS segment,
       count(*)::BIGINT AS num_customers,
       CAST(floor(revenue / 50) AS BIGINT) * 50 AS segment_base
FROM my_revenue
GROUP BY CAST(floor(revenue / 50) AS BIGINT)
ORDER BY segment
"""


@register("tpcds_q54", Q54_ORACLE, tags=("tpcds", "crosschannel", "histogram"))
def tpcds_q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 (reference tpcds/q54.sql): revenue-segment histogram —
    customers who bought Books remotely (catalog or web) in June, bucketed
    by their store spending over the following quarter into $50 segments.
    Plan: the remote-buyer keep-list dedups map-side and broadcast
    semi-joins the store fact; one (customer) aggregate then a tiny
    histogram re-aggregate on the derived segment key. floor() of
    4-rounded revenue is engine-stable away from exact bucket edges, and
    fixture revenues are never exact multiples of 50 at 4 decimals."""
    ds = _ds(spark, sf_dir)
    remote = (
        ds["catalog_sales"].select(F.col("cs_bill_customer_sk").alias("cust"), F.col("cs_item_sk").alias("itm"), F.col("cs_sold_date_sk").alias("d"))
        .unionAll(ds["web_sales"].select("ws_bill_customer_sk", "ws_item_sk", "ws_sold_date_sk"))
    )
    books = ds["item"].filter(F.col("i_category") == "Books").select("i_item_sk")
    my_customers = (
        remote.filter((F.year("d") == 1997) & (F.month("d") == 6))
        .join(books, F.col("itm") == F.col("i_item_sk"), "left_semi")
        .select("cust")
        .distinct()
    )
    my_revenue = (
        ds["store_sales"]
        .filter((F.year("ss_sold_date_sk") == 1997) & F.month("ss_sold_date_sk").isin(7, 8, 9))
        .join(F.broadcast(my_customers), F.col("ss_customer_sk") == F.col("cust"), "left_semi")
        .groupBy("ss_customer_sk")
        .agg(F.round(F.sum("ss_sales_price"), 4).alias("revenue"))
    )
    segment = F.floor(F.col("revenue") / 50).cast("long")
    return (
        my_revenue.groupBy(segment.alias("segment"))
        .agg(F.count(F.lit(1)).alias("num_customers"))
        .select("segment", "num_customers", (F.col("segment") * 50).alias("segment_base"))
        .orderBy("segment")
    )


_Q66_MONTHS = {1: "jan", 2: "feb", 3: "mar", 4: "apr", 5: "may", 6: "jun",
               7: "jul", 8: "aug", 9: "sep", 10: "oct", 11: "nov", 12: "dec"}


def _q66_oracle() -> str:
    cols = ", ".join(
        f"round(sum(CASE WHEN month(sold_date) = {m} THEN p END), 4) AS {name}_sales"
        for m, name in _Q66_MONTHS.items()
    )
    return f"""
WITH {DS_CTES},
united AS (
  SELECT 'web' AS channel, ws_warehouse_sk AS wh, ws_sold_date_sk AS sold_date,
         ws_ext_sales_price AS p
  FROM web_sales WHERE year(ws_sold_date_sk) = 1997
  UNION ALL
  SELECT 'catalog', cs_warehouse_sk, cs_sold_date_sk, cs_ext_sales_price
  FROM catalog_sales WHERE year(cs_sold_date_sk) = 1997)
SELECT w_warehouse_name, channel, {cols}
FROM united JOIN warehouse ON wh = w_warehouse_sk
GROUP BY w_warehouse_name, channel
ORDER BY w_warehouse_name, channel
"""


@register("tpcds_q66", _q66_oracle(), tags=("tpcds", "crosschannel", "pivot"))
def tpcds_q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 (reference tpcds/q66.sql; the spec's 24 sales+net
    columns reduce to the 12 monthly sales columns per channel row — same
    conditional-pivot shape, half the width): monthly warehouse shipping
    volume pivot for the web and catalog channels. Plan: the channel
    union is two projections of the fact scan; all 12 month columns
    compute in ONE hash-agg pass (conditional aggregation, no Expand,
    no per-month re-scan); warehouse is broadcast."""
    ds = _ds(spark, sf_dir)
    united = (
        ds["web_sales"].filter(F.year("ws_sold_date_sk") == 1997)
        .select(F.lit("web").alias("channel"), F.col("ws_warehouse_sk").alias("wh"),
                F.col("ws_sold_date_sk").alias("sold_date"), F.col("ws_ext_sales_price").alias("p"))
        .unionAll(
            ds["catalog_sales"].filter(F.year("cs_sold_date_sk") == 1997)
            .select(F.lit("catalog"), "cs_warehouse_sk", "cs_sold_date_sk", "cs_ext_sales_price")
        )
    )
    aggs = [
        F.round(F.sum(F.when(F.month("sold_date") == m, F.col("p"))), 4).alias(f"{name}_sales")
        for m, name in _Q66_MONTHS.items()
    ]
    return (
        united.join(F.broadcast(ds["warehouse"]), F.col("wh") == F.col("w_warehouse_sk"))
        .groupBy("w_warehouse_name", "channel")
        .agg(*aggs)
        .orderBy("w_warehouse_name", "channel")
    )


Q71_ORACLE = f"""
WITH {DS_CTES},
united AS (
  SELECT ss_item_sk AS item_sk, ss_ext_sales_price AS p, ss_sold_time_sk AS time_sk
  FROM store_sales WHERE year(ss_sold_date_sk) = 1997 AND month(ss_sold_date_sk) = 11
  UNION ALL
  SELECT cs_item_sk, cs_ext_sales_price, cs_sold_time_sk
  FROM catalog_sales WHERE year(cs_sold_date_sk) = 1997 AND month(cs_sold_date_sk) = 11
  UNION ALL
  SELECT ws_item_sk, ws_ext_sales_price, ws_sold_time_sk
  FROM web_sales WHERE year(ws_sold_date_sk) = 1997 AND month(ws_sold_date_sk) = 11)
SELECT i_brand_id, t_hour, round(sum(p), 4) AS ext_price
FROM united
JOIN item ON item_sk = i_item_sk
JOIN time_dim ON time_sk = t_time_sk
WHERE i_manager_id <= 4 AND (t_hour BETWEEN 7 AND 8 OR t_hour BETWEEN 17 AND 18)
GROUP BY i_brand_id, t_hour
ORDER BY t_hour, ext_price DESC, i_brand_id
"""


@register("tpcds_q71", Q71_ORACLE, tags=("tpcds", "crosschannel", "timeband"))
def tpcds_q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q71 (reference tpcds/q71.sql; minute grain coarsened to
    hour — the derived time_dim would make per-minute groups singleton):
    breakfast- and dinner-hour brand revenue across all three channels
    for one manager's items in November. Plan: the three channel
    projections union before any join; the manager filter prunes item
    BEFORE the fact join and the hour filter prunes the broadcast
    time_dim; one (brand, hour) hash-agg."""
    ds = _ds(spark, sf_dir)

    def chan(fact: str, item: str, price: str, time: str, date: str) -> DataFrame:
        return (
            ds[fact]
            .filter((F.year(date) == 1997) & (F.month(date) == 11))
            .select(F.col(item).alias("item_sk"), F.col(price).alias("p"), F.col(time).alias("time_sk"))
        )

    united = (
        chan("store_sales", "ss_item_sk", "ss_ext_sales_price", "ss_sold_time_sk", "ss_sold_date_sk")
        .unionAll(chan("catalog_sales", "cs_item_sk", "cs_ext_sales_price", "cs_sold_time_sk", "cs_sold_date_sk"))
        .unionAll(chan("web_sales", "ws_item_sk", "ws_ext_sales_price", "ws_sold_time_sk", "ws_sold_date_sk"))
    )
    items = ds["item"].filter(F.col("i_manager_id") <= 4).select("i_item_sk", "i_brand_id")
    td = ds["time_dim"].filter(
        F.col("t_hour").between(7, 8) | F.col("t_hour").between(17, 18)
    ).select("t_time_sk", "t_hour")
    return (
        united.join(items, F.col("item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(td), F.col("time_sk") == F.col("t_time_sk"))
        .groupBy("i_brand_id", "t_hour")
        .agg(F.round(F.sum("p"), 4).alias("ext_price"))
        .orderBy("t_hour", F.desc("ext_price"), "i_brand_id")
    )


Q83_ORACLE = f"""
WITH {DS_CTES},
common_dates AS (
  SELECT sr_returned_date_sk AS d FROM store_returns
  INTERSECT SELECT cr_returned_date_sk FROM catalog_returns
  INTERSECT SELECT wr_returned_date_sk FROM web_returns),
sr_items AS (
  SELECT i_item_id AS item_id, sum(sr_return_quantity)::BIGINT AS sr_item_qty
  FROM store_returns JOIN item ON sr_item_sk = i_item_sk
  WHERE sr_returned_date_sk IN (SELECT d FROM common_dates)
  GROUP BY i_item_id),
cr_items AS (
  SELECT i_item_id AS item_id, sum(cr_return_quantity)::BIGINT AS cr_item_qty
  FROM catalog_returns JOIN item ON cr_item_sk = i_item_sk
  WHERE cr_returned_date_sk IN (SELECT d FROM common_dates)
  GROUP BY i_item_id),
wr_items AS (
  SELECT i_item_id AS item_id, sum(wr_return_quantity)::BIGINT AS wr_item_qty
  FROM web_returns JOIN item ON wr_item_sk = i_item_sk
  WHERE wr_returned_date_sk IN (SELECT d FROM common_dates)
  GROUP BY i_item_id)
SELECT s.item_id, sr_item_qty, cr_item_qty, wr_item_qty,
       round(sr_item_qty::DOUBLE / ((sr_item_qty + cr_item_qty + wr_item_qty) / 3.0) * 100, 4) AS sr_dev,
       round((sr_item_qty + cr_item_qty + wr_item_qty) / 3.0, 4) AS average
FROM sr_items s JOIN cr_items c ON s.item_id = c.item_id
                JOIN wr_items w ON s.item_id = w.item_id
ORDER BY s.item_id
LIMIT 100
"""


@register("tpcds_q83", Q83_ORACLE, tags=("tpcds", "returns", "intersect"))
def tpcds_q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q83 (reference tpcds/q83.sql; the d_week_seq date-translation
    subqueries become a direct INTERSECT of return dates): per-item return
    quantities on days when ALL THREE channels processed returns, with
    each channel's share of the three-channel average. Plan: the common
    dates INTERSECT over three small distinct sets broadcasts into each
    channel's return scan; three per-item aggregates join at |items|
    scale."""
    ds = _ds(spark, sf_dir)
    item = ds["item"].select("i_item_sk", "i_item_id")
    common = (
        ds["store_returns"].select(F.col("sr_returned_date_sk").alias("d")).distinct()
        .intersect(ds["catalog_returns"].select(F.col("cr_returned_date_sk").alias("d")).distinct())
        .intersect(ds["web_returns"].select(F.col("wr_returned_date_sk").alias("d")).distinct())
    )

    def chan(rets: str, item_col: str, qty: str, date: str, out: str) -> DataFrame:
        return (
            ds[rets]
            .join(F.broadcast(common), F.col(date) == F.col("d"), "left_semi")
            .join(item, F.col(item_col) == F.col("i_item_sk"))
            .groupBy(F.col("i_item_id").alias(f"{out}_id"))
            .agg(F.sum(qty).cast("long").alias(f"{out}_item_qty"))
        )

    s = chan("store_returns", "sr_item_sk", "sr_return_quantity", "sr_returned_date_sk", "sr")
    c = chan("catalog_returns", "cr_item_sk", "cr_return_quantity", "cr_returned_date_sk", "cr")
    w = chan("web_returns", "wr_item_sk", "wr_return_quantity", "wr_returned_date_sk", "wr")
    total = F.col("sr_item_qty") + F.col("cr_item_qty") + F.col("wr_item_qty")
    return (
        s.join(c, F.col("sr_id") == F.col("cr_id"))
        .join(w, F.col("sr_id") == F.col("wr_id"))
        .select(
            F.col("sr_id").alias("item_id"), "sr_item_qty", "cr_item_qty", "wr_item_qty",
            F.round(F.col("sr_item_qty").cast("double") / (total / 3.0) * 100, 4).alias("sr_dev"),
            F.round(total / 3.0, 4).alias("average"),
        )
        .orderBy("item_id")
        .limit(100)
    )


Q95_ORACLE = f"""
WITH {DS_CTES}
SELECT count(DISTINCT ws_order_number) AS order_count,
       round(sum(ws_ext_sales_price), 4) AS total_sales,
       round(sum(ws_net_profit), 4) AS total_net_profit
FROM web_sales ws1
WHERE ws_ship_date_sk BETWEEN TIMESTAMP '1997-02-01' AND TIMESTAMP '1997-04-02'
  AND EXISTS (SELECT 1 FROM web_sales ws2
              WHERE ws1.ws_order_number = ws2.ws_order_number
                AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
  AND EXISTS (SELECT 1 FROM web_returns wr
              WHERE ws1.ws_order_number = wr.wr_order_number)
"""


@register("tpcds_q95", Q95_ORACLE, tags=("tpcds", "existence", "semijoin"))
def tpcds_q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 (reference tpcds/q95.sql) — q94 with the returns test
    FLIPPED to EXISTS: multi-warehouse web orders in the window that WERE
    (at least partly) returned; two left-semi joins feeding the 1-row
    aggregate."""
    ds = _ds(spark, sf_dir)
    ws1 = ds["web_sales"].filter(
        F.col("ws_ship_date_sk").between(F.expr("TIMESTAMP '1997-02-01'"), F.expr("TIMESTAMP '1997-04-02'"))
    )
    ws2 = ds["web_sales"].select(F.col("ws_order_number").alias("o2"), F.col("ws_warehouse_sk").alias("w2"))
    wr = ds["web_returns"].select(F.col("wr_order_number").alias("ro"))
    return (
        ws1.join(ws2, (F.col("ws_order_number") == F.col("o2")) & (F.col("ws_warehouse_sk") != F.col("w2")), "left_semi")
        .join(wr, F.col("ws_order_number") == F.col("ro"), "left_semi")
        .agg(
            F.countDistinct("ws_order_number").alias("order_count"),
            F.round(F.sum("ws_ext_sales_price"), 4).alias("total_sales"),
            F.round(F.sum("ws_net_profit"), 4).alias("total_net_profit"),
        )
    )


# ---------------------------------------------------------------------------
# r4 wave 6 — signed-union P&L, geography rollups, funnel chains, income
# bands (q5 q18 q25 q78 q81 q84)
# ---------------------------------------------------------------------------

Q5_ORACLE = f"""
WITH {DS_CTES},
ssr AS (
  SELECT sk AS id, round(sum(sales_price), 4) AS sales, round(sum(return_amt), 4) AS returns_amt,
         round(sum(profit) - sum(net_loss), 4) AS profit
  FROM (
    SELECT ss_store_sk AS sk, ss_ext_sales_price AS sales_price, ss_net_profit AS profit,
           0.0 AS return_amt, 0.0 AS net_loss
    FROM store_sales WHERE year(ss_sold_date_sk) = 1997 AND month(ss_sold_date_sk) = 8
    UNION ALL
    SELECT sr_store_sk, 0.0, 0.0, sr_return_amt, sr_return_tax
    FROM store_returns WHERE year(sr_returned_date_sk) = 1997 AND month(sr_returned_date_sk) = 8) x
  GROUP BY sk),
csr AS (
  SELECT sk AS id, round(sum(sales_price), 4) AS sales, round(sum(return_amt), 4) AS returns_amt,
         round(sum(profit) - sum(net_loss), 4) AS profit
  FROM (
    SELECT cs_call_center_sk AS sk, cs_ext_sales_price, cs_net_profit, 0.0, 0.0
    FROM catalog_sales WHERE year(cs_sold_date_sk) = 1997 AND month(cs_sold_date_sk) = 8
    UNION ALL
    SELECT cr_call_center_sk, 0.0, 0.0, cr_return_amt, cr_net_loss
    FROM catalog_returns WHERE year(cr_returned_date_sk) = 1997 AND month(cr_returned_date_sk) = 8
  ) x(sk, sales_price, profit, return_amt, net_loss)
  GROUP BY sk),
wsr AS (
  SELECT sk AS id, round(sum(sales_price), 4) AS sales, round(sum(return_amt), 4) AS returns_amt,
         round(sum(profit) - sum(net_loss), 4) AS profit
  FROM (
    SELECT ws_web_page_sk AS sk, ws_ext_sales_price, ws_net_profit, 0.0, 0.0
    FROM web_sales WHERE year(ws_sold_date_sk) = 1997 AND month(ws_sold_date_sk) = 8
    UNION ALL
    SELECT wr_web_page_sk, 0.0, 0.0, wr_return_amt, wr_net_loss
    FROM web_returns WHERE year(wr_returned_date_sk) = 1997 AND month(wr_returned_date_sk) = 8
  ) x(sk, sales_price, profit, return_amt, net_loss)
  GROUP BY sk)
SELECT channel, id, round(sum(sales), 4) AS sales, round(sum(returns_amt), 4) AS returns_amt,
       round(sum(profit), 4) AS profit
FROM (
  SELECT 'store channel' AS channel, * FROM ssr
  UNION ALL SELECT 'catalog channel', * FROM csr
  UNION ALL SELECT 'web channel', * FROM wsr) u
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
"""


@register("tpcds_q5", Q5_ORACLE, tags=("tpcds", "crosschannel", "rollup"))
def tpcds_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q5 (reference tpcds/q5.sql): per-channel P&L via the SIGNED
    UNION pattern — sales and returns rows union into one stream per
    channel (returns carry zero sales and vice versa) BEFORE a single
    per-id aggregate, unlike q77 which joins separately-aggregated sides.
    The (channel, id) ROLLUP then runs over the tiny combined frame.
    Plan: 6 filtered scans, 3 union-aggregates, one Expand over ~|ids|
    rows."""
    return (
        _q5_combined(spark, sf_dir)
        .rollup("channel", "id")
        .agg(
            F.round(F.sum("sales"), 4).alias("sales"),
            F.round(F.sum("returns_amt"), 4).alias("returns_amt"),
            F.round(F.sum("profit"), 4).alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


def _q5_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5's signed-union per-channel P&L frame — shared by q5 (ROLLUP) and
    the v2.7 q5a (explicit union of levels)."""
    ds = _ds(spark, sf_dir)

    def chan(sales: DataFrame, returns: DataFrame, label: str) -> DataFrame:
        u = sales.unionAll(returns)
        return (
            u.groupBy("sk")
            .agg(
                F.round(F.sum("sales_price"), 4).alias("sales"),
                F.round(F.sum("return_amt"), 4).alias("returns_amt"),
                F.round(F.sum("profit") - F.sum("net_loss"), 4).alias("profit"),
            )
            .select(F.lit(label).alias("channel"), F.col("sk").alias("id"), "sales", "returns_amt", "profit")
        )

    def in_aug(df: DataFrame, col: str) -> DataFrame:
        return df.filter((F.year(col) == 1997) & (F.month(col) == 8))

    z = F.lit(0.0)
    ssr = chan(
        in_aug(ds["store_sales"], "ss_sold_date_sk").select(
            F.col("ss_store_sk").alias("sk"), F.col("ss_ext_sales_price").alias("sales_price"),
            F.col("ss_net_profit").alias("profit"), z.alias("return_amt"), z.alias("net_loss")),
        in_aug(ds["store_returns"], "sr_returned_date_sk").select(
            F.col("sr_store_sk").alias("sk"), z.alias("sales_price"), z.alias("profit"),
            F.col("sr_return_amt").alias("return_amt"), F.col("sr_return_tax").alias("net_loss")),
        "store channel",
    )
    csr = chan(
        in_aug(ds["catalog_sales"], "cs_sold_date_sk").select(
            F.col("cs_call_center_sk").alias("sk"), F.col("cs_ext_sales_price").alias("sales_price"),
            F.col("cs_net_profit").alias("profit"), z.alias("return_amt"), z.alias("net_loss")),
        in_aug(ds["catalog_returns"], "cr_returned_date_sk").select(
            F.col("cr_call_center_sk").alias("sk"), z.alias("sales_price"), z.alias("profit"),
            F.col("cr_return_amt").alias("return_amt"), F.col("cr_net_loss").alias("net_loss")),
        "catalog channel",
    )
    wsr = chan(
        in_aug(ds["web_sales"], "ws_sold_date_sk").select(
            F.col("ws_web_page_sk").alias("sk"), F.col("ws_ext_sales_price").alias("sales_price"),
            F.col("ws_net_profit").alias("profit"), z.alias("return_amt"), z.alias("net_loss")),
        in_aug(ds["web_returns"], "wr_returned_date_sk").select(
            F.col("wr_web_page_sk").alias("sk"), z.alias("sales_price"), z.alias("profit"),
            F.col("wr_return_amt").alias("return_amt"), F.col("wr_net_loss").alias("net_loss")),
        "web channel",
    )
    return ssr.unionAll(csr).unionAll(wsr)


Q18_ORACLE = f"""
WITH {DS_CTES},
units AS (
  SELECT ca_state, ca_city,
         CAST(round(cs_quantity) AS BIGINT) * 10000 AS qu,
         CAST(round(cs_ext_sales_price * 10000) AS BIGINT) AS pu,
         CAST(round(cs_net_profit * 10000) AS BIGINT) AS pru,
         CAST(round(hd_dep_count) AS BIGINT) * 10000 AS du
  FROM catalog_sales
JOIN customer_dim ON cs_bill_customer_sk = c_customer_sk
JOIN customer_address ON c_current_addr_sk = ca_address_sk
JOIN household_demographics ON cs_bill_hdemo_sk = hd_demo_sk
JOIN customer_demographics ON cs_bill_cdemo_sk = cd_demo_sk
WHERE cd_gender = 'F' AND cd_education_status = 'Primary'
  AND year(cs_sold_date_sk) = 1997)
SELECT ca_state, ca_city,
       (CASE WHEN sum(qu) >= 0 THEN (2 * sum(qu) + count(qu)) // (2 * count(qu)) ELSE -((2 * -sum(qu) + count(qu)) // (2 * count(qu))) END) / 10000.0 AS agg1,
       (CASE WHEN sum(pu) >= 0 THEN (2 * sum(pu) + count(pu)) // (2 * count(pu)) ELSE -((2 * -sum(pu) + count(pu)) // (2 * count(pu))) END) / 10000.0 AS agg2,
       (CASE WHEN sum(pru) >= 0 THEN (2 * sum(pru) + count(pru)) // (2 * count(pru)) ELSE -((2 * -sum(pru) + count(pru)) // (2 * count(pru))) END) / 10000.0 AS agg3,
       (CASE WHEN sum(du) >= 0 THEN (2 * sum(du) + count(du)) // (2 * count(du)) ELSE -((2 * -sum(du) + count(du)) // (2 * count(du))) END) / 10000.0 AS agg4
FROM units
GROUP BY ROLLUP (ca_state, ca_city)
ORDER BY ca_state NULLS FIRST, ca_city NULLS FIRST
LIMIT 100
"""


@register("tpcds_q18", Q18_ORACLE, tags=("tpcds", "catalog", "rollup"))
def tpcds_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q18 (reference tpcds/q18.sql; the spec's cd numeric columns
    map to the derived hd_dep_count): average catalog order statistics
    over the customer-geography ROLLUP (state, city). Plan: demographics
    broadcast-filter before the customer/address joins; the rollup Expand
    runs AFTER the per-row join output is reduced to the four averaged
    columns; deterministic ORDER with NULLS FIRST at both levels."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter((F.col("cd_gender") == "F") & (F.col("cd_education_status") == "Primary"))
    return (
        ds["catalog_sales"]
        .filter(F.year("cs_sold_date_sk") == 1997)
        .join(F.broadcast(cd), F.col("cs_bill_cdemo_sk") == F.col("cd_demo_sk"))
        .join(ds["customer_dim"].select("c_customer_sk", "c_current_addr_sk"), F.col("cs_bill_customer_sk") == F.col("c_customer_sk"))
        .join(ds["customer_address"].select("ca_address_sk", "ca_state", "ca_city"), F.col("c_current_addr_sk") == F.col("ca_address_sk"))
        .join(F.broadcast(ds["household_demographics"]), F.col("cs_bill_hdemo_sk") == F.col("hd_demo_sk"))
        .select(
            "ca_state", "ca_city",
            (F.round(F.col("cs_quantity")).cast("bigint") * 10000).alias("qu"),
            F.round(F.col("cs_ext_sales_price") * 10000).cast("bigint").alias("pu"),
            F.round(F.col("cs_net_profit") * 10000).cast("bigint").alias("pru"),
            (F.round(F.col("hd_dep_count")).cast("bigint") * 10000).alias("du"),
        )
        .rollup("ca_state", "ca_city")
        .agg(
            # round(avg, 4) as sign-safe integer HALF_UP over exact unit
            # sums (profit can be negative; floor-div vs trunc-div must not
            # split) — the q47/q57 money discipline.
            (F.expr('(CASE WHEN sum(qu) >= 0 THEN (2 * sum(qu) + count(qu)) div (2 * count(qu)) ELSE -((2 * -sum(qu) + count(qu)) div (2 * count(qu))) END)') / 10000.0).alias("agg1"),
            (F.expr('(CASE WHEN sum(pu) >= 0 THEN (2 * sum(pu) + count(pu)) div (2 * count(pu)) ELSE -((2 * -sum(pu) + count(pu)) div (2 * count(pu))) END)') / 10000.0).alias("agg2"),
            (F.expr('(CASE WHEN sum(pru) >= 0 THEN (2 * sum(pru) + count(pru)) div (2 * count(pru)) ELSE -((2 * -sum(pru) + count(pru)) div (2 * count(pru))) END)') / 10000.0).alias("agg3"),
            (F.expr('(CASE WHEN sum(du) >= 0 THEN (2 * sum(du) + count(du)) div (2 * count(du)) ELSE -((2 * -sum(du) + count(du)) div (2 * count(du))) END)') / 10000.0).alias("agg4"),
        )
        .orderBy(F.col("ca_state").asc_nulls_first(), F.col("ca_city").asc_nulls_first())
        .limit(100)
    )


Q25_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_id, s_store_name,
       round(sum(ss_net_profit), 4) AS store_sales_profit,
       round(sum(sr_return_tax), 4) AS store_returns_loss,
       round(sum(cs_net_profit), 4) AS catalog_sales_profit
FROM store_sales
JOIN store_returns ON ss_ticket_number = sr_ticket_number
                  AND ss_item_sk = sr_item_sk AND ss_line_number = sr_line_number
JOIN catalog_sales ON sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
JOIN item ON ss_item_sk = i_item_sk
JOIN store ON ss_store_sk = s_store_sk
WHERE year(ss_sold_date_sk) = 1996 AND month(ss_sold_date_sk) = 4
  AND year(sr_returned_date_sk) = 1996 AND month(sr_returned_date_sk) BETWEEN 4 AND 10
  AND year(cs_sold_date_sk) = 1996 AND month(cs_sold_date_sk) BETWEEN 4 AND 10
GROUP BY i_item_id, s_store_name
ORDER BY i_item_id, s_store_name
LIMIT 100
"""


@register("tpcds_q25", Q25_ORACLE, tags=("tpcds", "crosschannel", "funnel"))
def tpcds_q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q25 (reference tpcds/q25.sql) — q17's profit-sum variant on
    a month-grain window: the same buy -> return -> catalog-rebuy chain
    (line-grain ss><sr match, (customer, item) hop to catalog) but
    summing store profit, return loss, and catalog profit per (item,
    store)."""
    ds = _ds(spark, sf_dir)
    ss = ds["store_sales"].filter((F.year("ss_sold_date_sk") == 1996) & (F.month("ss_sold_date_sk") == 4))
    sr = ds["store_returns"].filter((F.year("sr_returned_date_sk") == 1996) & F.month("sr_returned_date_sk").between(4, 10))
    cs = ds["catalog_sales"].filter((F.year("cs_sold_date_sk") == 1996) & F.month("cs_sold_date_sk").between(4, 10))
    return (
        ss.join(
            sr,
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
        )
        .join(cs, (F.col("sr_customer_sk") == F.col("cs_bill_customer_sk")) & (F.col("sr_item_sk") == F.col("cs_item_sk")))
        .join(ds["item"].select("i_item_sk", "i_item_id"), F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("i_item_id", "s_store_name")
        .agg(
            F.round(F.sum("ss_net_profit"), 4).alias("store_sales_profit"),
            F.round(F.sum("sr_return_tax"), 4).alias("store_returns_loss"),
            F.round(F.sum("cs_net_profit"), 4).alias("catalog_sales_profit"),
        )
        .orderBy("i_item_id", "s_store_name")
        .limit(100)
    )


Q78_ORACLE = f"""
WITH {DS_CTES},
ss AS (
  SELECT ss_customer_sk AS cust, ss_item_sk AS itm,
         sum(ss_quantity)::BIGINT AS ss_qty, round(sum(ss_ext_sales_price), 4) AS ss_amt
  FROM store_sales LEFT JOIN store_returns
    ON ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
   AND ss_line_number = sr_line_number
  WHERE sr_ticket_number IS NULL AND year(ss_sold_date_sk) = 1997
  GROUP BY ss_customer_sk, ss_item_sk),
ws AS (
  SELECT ws_bill_customer_sk AS cust, ws_item_sk AS itm,
         sum(ws_quantity)::BIGINT AS ws_qty
  FROM web_sales LEFT JOIN web_returns
    ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
  WHERE wr_order_number IS NULL AND year(ws_sold_date_sk) = 1997
  GROUP BY ws_bill_customer_sk, ws_item_sk),
cs AS (
  SELECT cs_bill_customer_sk AS cust, cs_item_sk AS itm,
         sum(cs_quantity)::BIGINT AS cs_qty
  FROM catalog_sales LEFT JOIN catalog_returns
    ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
  WHERE cr_order_number IS NULL AND year(cs_sold_date_sk) = 1997
  GROUP BY cs_bill_customer_sk, cs_item_sk)
SELECT ss.cust AS customer_sk, ss.itm AS item_sk, ss_qty, ss_amt,
       coalesce(ws_qty, 0) + coalesce(cs_qty, 0) AS other_chan_qty,
       round(ss_qty::DOUBLE / (coalesce(ws_qty, 0) + coalesce(cs_qty, 0)), 2) AS ratio
FROM ss LEFT JOIN ws ON ss.cust = ws.cust AND ss.itm = ws.itm
        LEFT JOIN cs ON ss.cust = cs.cust AND ss.itm = cs.itm
WHERE coalesce(ws_qty, 0) + coalesce(cs_qty, 0) > 0
ORDER BY customer_sk, item_sk
LIMIT 100
"""


@register("tpcds_q78", Q78_ORACLE, tags=("tpcds", "crosschannel", "antijoin"))
def tpcds_q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 (reference tpcds/q78.sql): per (customer, item) UNRETURNED
    volumes — each channel drops its returned lines via a left join whose
    match is REQUIRED NULL (anti-join by null filter, the spec's exact
    formulation), then the store frame left-joins the two remote frames
    and keeps pairs with any remote activity. Plan: three null-filtered
    left joins at line grain, three (customer, item) aggregates, two
    joins over aggregated frames on the composite key."""
    ds = _ds(spark, sf_dir)
    ss = (
        ds["store_sales"].filter(F.year("ss_sold_date_sk") == 1997)
        .join(
            ds["store_returns"].select("sr_ticket_number", "sr_item_sk", "sr_line_number"),
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
            "left",
        )
        .filter(F.col("sr_ticket_number").isNull())
        .groupBy(F.col("ss_customer_sk").alias("cust"), F.col("ss_item_sk").alias("itm"))
        .agg(F.sum("ss_quantity").cast("long").alias("ss_qty"), F.round(F.sum("ss_ext_sales_price"), 4).alias("ss_amt"))
    )
    ws = (
        ds["web_sales"].filter(F.year("ws_sold_date_sk") == 1997)
        .join(
            ds["web_returns"].select("wr_order_number", "wr_item_sk").distinct(),
            (F.col("ws_order_number") == F.col("wr_order_number")) & (F.col("ws_item_sk") == F.col("wr_item_sk")),
            "left",
        )
        .filter(F.col("wr_order_number").isNull())
        .groupBy(F.col("ws_bill_customer_sk").alias("wcust"), F.col("ws_item_sk").alias("witm"))
        .agg(F.sum("ws_quantity").cast("long").alias("ws_qty"))
    )
    cs = (
        ds["catalog_sales"].filter(F.year("cs_sold_date_sk") == 1997)
        .join(
            ds["catalog_returns"].select("cr_order_number", "cr_item_sk").distinct(),
            (F.col("cs_order_number") == F.col("cr_order_number")) & (F.col("cs_item_sk") == F.col("cr_item_sk")),
            "left",
        )
        .filter(F.col("cr_order_number").isNull())
        .groupBy(F.col("cs_bill_customer_sk").alias("ccust"), F.col("cs_item_sk").alias("citm"))
        .agg(F.sum("cs_quantity").cast("long").alias("cs_qty"))
    )
    other = F.coalesce(F.col("ws_qty"), F.lit(0)) + F.coalesce(F.col("cs_qty"), F.lit(0))
    return (
        ss.join(ws, (F.col("cust") == F.col("wcust")) & (F.col("itm") == F.col("witm")), "left")
        .join(cs, (F.col("cust") == F.col("ccust")) & (F.col("itm") == F.col("citm")), "left")
        .filter(other > 0)
        .select(
            F.col("cust").alias("customer_sk"), F.col("itm").alias("item_sk"), "ss_qty", "ss_amt",
            other.alias("other_chan_qty"),
            F.round(F.col("ss_qty").cast("double") / other, 2).alias("ratio"),
        )
        .orderBy("customer_sk", "item_sk")
        .limit(100)
    )


Q81_ORACLE = f"""
WITH {DS_CTES},
ctr AS (
  SELECT cr_returning_customer_sk AS ctr_customer_sk, ca_state AS ctr_state,
         sum(cr_return_amt) AS ctr_total_return
  FROM catalog_returns JOIN customer_address ON cr_returning_customer_sk = ca_address_sk
  WHERE year(cr_returned_date_sk) = 1997
  GROUP BY cr_returning_customer_sk, ca_state),
state_avg AS (
  SELECT ctr_state, avg(ctr_total_return) * 1.2 AS cutoff
  FROM ctr GROUP BY ctr_state)
SELECT ctr_customer_sk AS c_customer_sk, ctr_state AS ca_state,
       round(ctr_total_return, 4) AS return_amt
FROM ctr JOIN state_avg USING (ctr_state)
WHERE ctr_total_return > cutoff
ORDER BY c_customer_sk, ca_state
LIMIT 100
"""


@register("tpcds_q81", Q81_ORACLE, tags=("tpcds", "returns", "subquery"))
def tpcds_q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q81 (reference tpcds/q81.sql) — the catalog member of the
    q1/q30 family: catalog returners above 1.2x their state's average
    return total (addresses are 1:1 with customers in the derived star,
    so the returning customer key doubles as the address key)."""
    ds = _ds(spark, sf_dir)
    ca = ds["customer_address"].select("ca_address_sk", "ca_state")
    ctr = (
        ds["catalog_returns"]
        .filter(F.year("cr_returned_date_sk") == 1997)
        .join(ca, F.col("cr_returning_customer_sk") == F.col("ca_address_sk"))
        .groupBy(
            F.col("cr_returning_customer_sk").alias("ctr_customer_sk"),
            F.col("ca_state").alias("ctr_state"),
        )
        .agg(F.sum("cr_return_amt").alias("ctr_total_return"))
    )
    state_avg = ctr.groupBy("ctr_state").agg((F.avg("ctr_total_return") * 1.2).alias("cutoff"))
    return (
        ctr.join(F.broadcast(state_avg), "ctr_state")
        .filter(F.col("ctr_total_return") > F.col("cutoff"))
        .select(
            F.col("ctr_customer_sk").alias("c_customer_sk"),
            F.col("ctr_state").alias("ca_state"),
            F.round("ctr_total_return", 4).alias("return_amt"),
        )
        .orderBy("c_customer_sk", "ca_state")
        .limit(100)
    )


Q84_ORACLE = f"""
WITH {DS_CTES}
SELECT c.c_customer_sk AS customer_id, c.c_last_name AS customer_name
FROM customer_dim c
JOIN household_demographics ON hd_demo_sk = c.c_customer_sk % 100
JOIN income_band ON hd_income_band_sk = ib_income_band_sk
JOIN customer_address ON c.c_current_addr_sk = ca_address_sk
WHERE ca_state = 'ST_2'
  AND ib_lower_bound >= 25000 AND ib_upper_bound <= 70000
  AND c.c_customer_sk IN (SELECT sr_customer_sk FROM store_returns)
ORDER BY customer_id
LIMIT 100
"""


@register("tpcds_q84", Q84_ORACLE, tags=("tpcds", "dimension", "incomeband"))
def tpcds_q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q84 (reference tpcds/q84.sql; city filter mapped to the
    derived state, income bounds retargeted to the derived 20-band
    ladder): customers in a state within an income-band range who have
    returned store merchandise. Plan: the dimension chain (customer ->
    household -> income_band -> address) is all broadcast joins; the
    returns membership is a LEFT SEMI against the deduped returner list —
    no fact row ever widens."""
    ds = _ds(spark, sf_dir)
    ib = ds["income_band"].filter((F.col("ib_lower_bound") >= 25000) & (F.col("ib_upper_bound") <= 70000))
    ca = ds["customer_address"].filter(F.col("ca_state") == "ST_2").select("ca_address_sk")
    returners = ds["store_returns"].select(F.col("sr_customer_sk").alias("rk")).distinct()
    return (
        ds["customer_dim"]
        .join(F.broadcast(ds["household_demographics"]), F.col("hd_demo_sk") == F.col("c_customer_sk") % 100)
        .join(F.broadcast(ib), F.col("hd_income_band_sk") == F.col("ib_income_band_sk"))
        .join(ca, F.col("c_current_addr_sk") == F.col("ca_address_sk"), "left_semi")
        .join(returners, F.col("c_customer_sk") == F.col("rk"), "left_semi")
        .select(F.col("c_customer_sk").alias("customer_id"), F.col("c_last_name").alias("customer_name"))
        .orderBy("customer_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# r4 wave 7 — completing the 99-query corpus. These are the suite's own
# channel/dimension twins of shapes verified above (the real TPC-DS is
# full of such template pairs); each runs with distinct constants and its
# own oracle.
# ---------------------------------------------------------------------------

Q10_ORACLE = f"""
WITH {DS_CTES}
SELECT cd_education_status, cd_marital_status, count(*)::BIGINT AS cnt
FROM customer_dim c
JOIN customer_demographics ON cd_demo_sk = c.c_customer_sk % 60
JOIN customer_address ON c.c_current_addr_sk = ca_address_sk
WHERE ca_state IN ('ST_0', 'ST_3', 'ST_5')
  AND EXISTS (SELECT 1 FROM store_sales
              WHERE ss_customer_sk = c.c_customer_sk
                AND year(ss_sold_date_sk) = 1997 AND quarter(ss_sold_date_sk) IN (1, 2))
  AND (EXISTS (SELECT 1 FROM web_sales
               WHERE ws_bill_customer_sk = c.c_customer_sk
                 AND year(ws_sold_date_sk) = 1997 AND quarter(ws_sold_date_sk) IN (1, 2))
    OR EXISTS (SELECT 1 FROM catalog_sales
               WHERE cs_bill_customer_sk = c.c_customer_sk
                 AND year(cs_sold_date_sk) = 1997 AND quarter(cs_sold_date_sk) IN (1, 2)))
GROUP BY cd_education_status, cd_marital_status
ORDER BY cd_education_status, cd_marital_status
"""


@register("tpcds_q10", Q10_ORACLE, tags=("tpcds", "existence", "demographics"))
def tpcds_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10 (reference tpcds/q10.sql) — q35's county-restricted
    half-year variant: education/marital profile counts of multi-channel
    shoppers in three states over H1; same semi-join decorrelation with
    the added broadcast address filter."""
    ds = _ds(spark, sf_dir)
    ca = ds["customer_address"].filter(F.col("ca_state").isin("ST_0", "ST_3", "ST_5")).select("ca_address_sk")
    c = (
        ds["customer_dim"].select("c_customer_sk", "c_current_addr_sk")
        .join(F.broadcast(ca), F.col("c_current_addr_sk") == F.col("ca_address_sk"), "left_semi")
    )
    def h1(df: DataFrame, date: str, key: str) -> DataFrame:
        return (
            df.filter((F.year(date) == 1997) & F.quarter(date).isin(1, 2))
            .select(F.col(key).alias("k")).distinct()
        )
    ss_c = h1(ds["store_sales"], "ss_sold_date_sk", "ss_customer_sk")
    remote = (
        h1(ds["web_sales"], "ws_sold_date_sk", "ws_bill_customer_sk")
        .unionAll(h1(ds["catalog_sales"], "cs_sold_date_sk", "cs_bill_customer_sk"))
        .distinct()
    )
    return (
        c.join(ss_c, F.col("c_customer_sk") == F.col("k"), "left_semi")
        .join(remote, F.col("c_customer_sk") == F.col("k"), "left_semi")
        .join(F.broadcast(ds["customer_demographics"]), F.col("cd_demo_sk") == F.col("c_customer_sk") % 60)
        .groupBy("cd_education_status", "cd_marital_status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("cd_education_status", "cd_marital_status")
    )


Q11_ORACLE = f"""
WITH {DS_CTES},
year_total AS (
  SELECT ss_customer_sk AS customer_sk, year(ss_sold_date_sk) AS y, 's' AS channel,
         round(sum(ss_ext_sales_price), 4) AS total
  FROM store_sales WHERE year(ss_sold_date_sk) IN (1995, 1996)
  GROUP BY ss_customer_sk, year(ss_sold_date_sk)
  UNION ALL
  SELECT ws_bill_customer_sk, year(ws_sold_date_sk), 'w', round(sum(ws_ext_sales_price), 4)
  FROM web_sales WHERE year(ws_sold_date_sk) IN (1995, 1996)
  GROUP BY ws_bill_customer_sk, year(ws_sold_date_sk)
)
SELECT ts2.customer_sk AS customer_id,
       round((tw2.total - tw1.total) / tw1.total, 6) AS web_growth,
       round((ts2.total - ts1.total) / ts1.total, 6) AS store_growth
FROM year_total ts1 JOIN year_total ts2 ON ts1.customer_sk = ts2.customer_sk
     JOIN year_total tw1 ON ts1.customer_sk = tw1.customer_sk
     JOIN year_total tw2 ON ts1.customer_sk = tw2.customer_sk
WHERE ts1.channel = 's' AND ts1.y = 1995 AND ts2.channel = 's' AND ts2.y = 1996
  AND tw1.channel = 'w' AND tw1.y = 1995 AND tw2.channel = 'w' AND tw2.y = 1996
  AND ts1.total > 0 AND tw1.total > 0
  AND (tw2.total - tw1.total) / tw1.total > (ts2.total - ts1.total) / ts1.total
ORDER BY customer_id
"""


@register("tpcds_q11", Q11_ORACLE, tags=("tpcds", "crosschannel", "selfjoin"))
def tpcds_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11 (reference tpcds/q11.sql) — the q74 family member using
    the spec's SUBTRACTION growth form ((y2-y1)/y1) over 1995/1996 and
    emitting both growth rates; same collapse of the four self-joins into
    one conditional aggregate per customer."""
    ds = _ds(spark, sf_dir)
    s = (
        ds["store_sales"].filter(F.year("ss_sold_date_sk").isin(1995, 1996))
        .select(F.col("ss_customer_sk").alias("customer_sk"), F.year("ss_sold_date_sk").alias("y"),
                F.lit("s").alias("channel"), F.col("ss_ext_sales_price").alias("p"))
    )
    w = (
        ds["web_sales"].filter(F.year("ws_sold_date_sk").isin(1995, 1996))
        .select(F.col("ws_bill_customer_sk").alias("customer_sk"), F.year("ws_sold_date_sk").alias("y"),
                F.lit("w").alias("channel"), F.col("ws_ext_sales_price").alias("p"))
    )
    def tot(ch: str, yr: int):
        return F.round(F.sum(F.when((F.col("channel") == ch) & (F.col("y") == yr), F.col("p"))), 4)
    per_cust = s.unionAll(w).groupBy("customer_sk").agg(
        tot("s", 1995).alias("s1"), tot("s", 1996).alias("s2"),
        tot("w", 1995).alias("w1"), tot("w", 1996).alias("w2"),
    )
    wg = (F.col("w2") - F.col("w1")) / F.col("w1")
    sg = (F.col("s2") - F.col("s1")) / F.col("s1")
    return (
        per_cust.filter(
            (F.col("s1") > 0) & (F.col("w1") > 0)
            & F.col("s2").isNotNull() & F.col("w2").isNotNull() & (wg > sg)
        )
        .select(
            F.col("customer_sk").alias("customer_id"),
            F.round(wg, 6).alias("web_growth"),
            F.round(sg, 6).alias("store_growth"),
        )
        .orderBy("customer_id")
    )


Q29_ORACLE = f"""
WITH {DS_CTES}
SELECT i_item_id, s_store_name,
       sum(ss_quantity)::BIGINT AS store_sales_quantity,
       sum(sr_return_quantity)::BIGINT AS store_returns_quantity,
       sum(cs_quantity)::BIGINT AS catalog_sales_quantity
FROM store_sales
JOIN store_returns ON ss_ticket_number = sr_ticket_number
                  AND ss_item_sk = sr_item_sk AND ss_line_number = sr_line_number
JOIN catalog_sales ON sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
JOIN item ON ss_item_sk = i_item_sk
JOIN store ON ss_store_sk = s_store_sk
WHERE year(ss_sold_date_sk) = 1998 AND month(ss_sold_date_sk) = 2
  AND year(sr_returned_date_sk) = 1998 AND month(sr_returned_date_sk) BETWEEN 2 AND 5
  AND year(cs_sold_date_sk) IN (1998, 1999, 2000)
GROUP BY i_item_id, s_store_name
ORDER BY i_item_id, s_store_name
LIMIT 100
"""


@register("tpcds_q29", Q29_ORACLE, tags=("tpcds", "crosschannel", "funnel"))
def tpcds_q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q29 (reference tpcds/q29.sql) — the quantity-sum member of
    the q17/q25 funnel family, with the spec's 3-year catalog re-purchase
    window."""
    ds = _ds(spark, sf_dir)
    ss = ds["store_sales"].filter((F.year("ss_sold_date_sk") == 1998) & (F.month("ss_sold_date_sk") == 2))
    sr = ds["store_returns"].filter((F.year("sr_returned_date_sk") == 1998) & F.month("sr_returned_date_sk").between(2, 5))
    cs = ds["catalog_sales"].filter(F.year("cs_sold_date_sk").isin(1998, 1999, 2000))
    return (
        ss.join(
            sr,
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
        )
        .join(cs, (F.col("sr_customer_sk") == F.col("cs_bill_customer_sk")) & (F.col("sr_item_sk") == F.col("cs_item_sk")))
        .join(ds["item"].select("i_item_sk", "i_item_id"), F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .groupBy("i_item_id", "s_store_name")
        .agg(
            F.sum("ss_quantity").cast("long").alias("store_sales_quantity"),
            F.sum("sr_return_quantity").cast("long").alias("store_returns_quantity"),
            F.sum("cs_quantity").cast("long").alias("catalog_sales_quantity"),
        )
        .orderBy("i_item_id", "s_store_name")
        .limit(100)
    )


Q46_ORACLE = f"""
WITH {DS_CTES},
dn AS (
  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
         round(sum(ss_coupon_amt), 4) AS amt, round(sum(ss_net_profit), 4) AS profit
  FROM store_sales
  JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
  JOIN customer_address ON ss_addr_sk = ca_address_sk
  WHERE (hd_dep_count = 4 OR hd_vehicle_count = 3) AND year(ss_sold_date_sk) = 1997
  GROUP BY ss_ticket_number, ss_customer_sk, ca_city)
SELECT c.c_customer_sk, dn.bought_city, dn.ss_ticket_number, dn.amt, dn.profit
FROM dn JOIN customer_dim c ON dn.ss_customer_sk = c.c_customer_sk
        JOIN customer_address cur ON c.c_current_addr_sk = cur.ca_address_sk
WHERE cur.ca_city <> dn.bought_city
ORDER BY c.c_customer_sk, dn.ss_ticket_number
LIMIT 100
"""


@register("tpcds_q46", Q46_ORACLE, tags=("tpcds", "star", "perticket"))
def tpcds_q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46 (reference tpcds/q46.sql) — q68's OR-profile sibling:
    per-ticket coupon/profit totals for dep=4-or-vehicles=3 households
    whose purchase city differs from their current city (the every-7th-
    order address perturbation in the derived star makes the inequality
    non-vacuous)."""
    ds = _ds(spark, sf_dir)
    hd = ds["household_demographics"].filter((F.col("hd_dep_count") == 4) | (F.col("hd_vehicle_count") == 3))
    sale_ca = ds["customer_address"].select(F.col("ca_address_sk").alias("sale_addr"), F.col("ca_city").alias("bought_city"))
    dn = (
        ds["store_sales"]
        .filter(F.year("ss_sold_date_sk") == 1997)
        .join(F.broadcast(hd), F.col("ss_hdemo_sk") == F.col("hd_demo_sk"))
        .join(sale_ca, F.col("ss_addr_sk") == F.col("sale_addr"))
        .groupBy("ss_ticket_number", "ss_customer_sk", "bought_city")
        .agg(F.round(F.sum("ss_coupon_amt"), 4).alias("amt"), F.round(F.sum("ss_net_profit"), 4).alias("profit"))
    )
    cur = ds["customer_address"].select(F.col("ca_address_sk").alias("cur_addr"), F.col("ca_city").alias("cur_city"))
    return (
        dn.join(ds["customer_dim"].select("c_customer_sk", "c_current_addr_sk"), F.col("ss_customer_sk") == F.col("c_customer_sk"))
        .join(cur, F.col("c_current_addr_sk") == F.col("cur_addr"))
        .filter(F.col("cur_city") != F.col("bought_city"))
        .select("c_customer_sk", "bought_city", "ss_ticket_number", "amt", "profit")
        .orderBy("c_customer_sk", "ss_ticket_number")
        .limit(100)
    )


Q48_ORACLE = f"""
WITH {DS_CTES}
SELECT sum(ss_quantity)::BIGINT AS total_quantity
FROM store_sales
JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
JOIN customer_address ON ss_addr_sk = ca_address_sk
WHERE year(ss_sold_date_sk) = 1997
  AND ((cd_marital_status = 'M' AND cd_education_status = 'Primary'
        AND ss_sales_price BETWEEN 10000 AND 40000)
    OR (cd_marital_status = 'D' AND cd_education_status = 'Secondary'
        AND ss_sales_price BETWEEN 20000 AND 60000)
    OR (cd_marital_status = 'S' AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price BETWEEN 30000 AND 80000))
  AND ((ca_state IN ('ST_0', 'ST_1') AND ss_net_profit BETWEEN 0 AND 20000)
    OR (ca_state IN ('ST_2', 'ST_3') AND ss_net_profit BETWEEN 5000 AND 40000)
    OR (ca_state IN ('ST_4', 'ST_5') AND ss_net_profit BETWEEN 10000 AND 60000))
"""


@register("tpcds_q48", Q48_ORACLE, tags=("tpcds", "star", "disjunction"))
def tpcds_q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q48 (reference tpcds/q48.sql) — q13's quantity-only sibling:
    one scalar sum under two independent OR-of-band groups (demographic x
    price, geography x profit); both disjunctions evaluate as scan-stage
    residuals after broadcast dim joins."""
    ds = _ds(spark, sf_dir)
    cd_band = (
        ((F.col("cd_marital_status") == "M") & (F.col("cd_education_status") == "Primary") & F.col("ss_sales_price").between(10000, 40000))
        | ((F.col("cd_marital_status") == "D") & (F.col("cd_education_status") == "Secondary") & F.col("ss_sales_price").between(20000, 60000))
        | ((F.col("cd_marital_status") == "S") & (F.col("cd_education_status") == "Advanced Degree") & F.col("ss_sales_price").between(30000, 80000))
    )
    ca_band = (
        (F.col("ca_state").isin("ST_0", "ST_1") & F.col("ss_net_profit").between(0, 20000))
        | (F.col("ca_state").isin("ST_2", "ST_3") & F.col("ss_net_profit").between(5000, 40000))
        | (F.col("ca_state").isin("ST_4", "ST_5") & F.col("ss_net_profit").between(10000, 60000))
    )
    return (
        ds["store_sales"]
        .filter(F.year("ss_sold_date_sk") == 1997)
        .join(F.broadcast(ds["customer_demographics"]), F.col("ss_cdemo_sk") == F.col("cd_demo_sk"))
        .join(ds["customer_address"], F.col("ss_addr_sk") == F.col("ca_address_sk"))
        .filter(cd_band & ca_band)
        .agg(F.sum("ss_quantity").cast("long").alias("total_quantity"))
    )


def _q56_style_oracle(category: str, year: int, moy: int) -> str:
    return f"""
WITH {DS_CTES},
cat_ids AS (SELECT DISTINCT i_item_id FROM item WHERE i_category = '{category}'),
ss_c AS (
  SELECT i_item_id, sum(ss_ext_sales_price) AS total_sales
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  WHERE i_item_id IN (SELECT i_item_id FROM cat_ids)
    AND year(ss_sold_date_sk) = {year} AND month(ss_sold_date_sk) = {moy}
  GROUP BY i_item_id),
cs_c AS (
  SELECT i_item_id, sum(cs_ext_sales_price) AS total_sales
  FROM catalog_sales JOIN item ON cs_item_sk = i_item_sk
  WHERE i_item_id IN (SELECT i_item_id FROM cat_ids)
    AND year(cs_sold_date_sk) = {year} AND month(cs_sold_date_sk) = {moy}
  GROUP BY i_item_id),
ws_c AS (
  SELECT i_item_id, sum(ws_ext_sales_price) AS total_sales
  FROM web_sales JOIN item ON ws_item_sk = i_item_sk
  WHERE i_item_id IN (SELECT i_item_id FROM cat_ids)
    AND year(ws_sold_date_sk) = {year} AND month(ws_sold_date_sk) = {moy}
  GROUP BY i_item_id)
SELECT i_item_id, round(sum(total_sales), 4) AS total_sales
FROM (SELECT * FROM ss_c UNION ALL SELECT * FROM cs_c UNION ALL SELECT * FROM ws_c) x
GROUP BY i_item_id
ORDER BY total_sales, i_item_id
LIMIT 100
"""


def _q56_style(spark: SparkSession, sf_dir: str, category: str, year: int, moy: int) -> DataFrame:
    ds = _ds(spark, sf_dir)
    cat_ids = ds["item"].filter(F.col("i_category") == category).select("i_item_id").distinct()
    item = ds["item"].select("i_item_sk", "i_item_id")

    def chan(fact: str, prefix: str) -> DataFrame:
        return (
            ds[fact]
            .filter((F.year(f"{prefix}_sold_date_sk") == year) & (F.month(f"{prefix}_sold_date_sk") == moy))
            .join(item, F.col(f"{prefix}_item_sk") == F.col("i_item_sk"))
            .join(F.broadcast(cat_ids), "i_item_id", "left_semi")
            .groupBy("i_item_id")
            .agg(F.sum(f"{prefix}_ext_sales_price").alias("total_sales"))
        )

    return (
        chan("store_sales", "ss")
        .unionAll(chan("catalog_sales", "cs"))
        .unionAll(chan("web_sales", "ws"))
        .groupBy("i_item_id")
        .agg(F.round(F.sum("total_sales"), 4).alias("total_sales"))
        .orderBy("total_sales", "i_item_id")
        .limit(100)
    )


@register("tpcds_q56", _q56_style_oracle("Home", 1996, 9), tags=("tpcds", "crosschannel", "agg"))
def tpcds_q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q56 (reference tpcds/q56.sql) — q33's item-grain sibling:
    three-channel revenue per item id for one category-month, unioned and
    re-aggregated (the spec's GMT-offset address filter has no fixture
    counterpart and is dropped, as in q33)."""
    return _q56_style(spark, sf_dir, "Home", 1996, 9)


@register("tpcds_q60", _q56_style_oracle("Music", 1997, 8), tags=("tpcds", "crosschannel", "agg"))
def tpcds_q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q60 (reference tpcds/q60.sql) — the q56 template over a
    different category/period (the suite itself ships q33/q56/q60 as one
    template family)."""
    return _q56_style(spark, sf_dir, "Music", 1997, 8)


Q63_ORACLE = f"""
WITH {DS_CTES},
v1 AS (
  SELECT i_manager_id, month(ss_sold_date_sk) AS d_moy,
         sum(CAST(round(ss_sales_price * 10000) AS BIGINT)) AS sum_units
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  WHERE year(ss_sold_date_sk) = 1997 AND i_category IN ('Books', 'Music')
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


@register("tpcds_q63", Q63_ORACLE, tags=("tpcds", "star", "window"))
def tpcds_q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q63 (reference tpcds/q63.sql) — the manager-grain member of
    the q53/q89 deviation-window family: months where a manager's
    category sales strayed >10% from their yearly average (QUALIFY in the
    oracle, a post-window filter in the Spark build). Money is exact BIGINT
    ten-thousandths-of-a-dollar end to end (the q47/q57 discipline): the
    average uses integer HALF_UP division and the >10% deviation test is an
    integer cross-multiplication, so no accumulation order or round()
    last-digit tie can flip a row."""
    ds = _ds(spark, sf_dir)
    items = ds["item"].filter(F.col("i_category").isin("Books", "Music")).select("i_item_sk", "i_manager_id")
    v1 = (
        ds["store_sales"]
        .filter(F.year("ss_sold_date_sk") == 1997)
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
            & (F.abs(10 * F.col("n_months") * F.col("sum_units") - 10 * F.col("tot_units"))
               > F.col("tot_units"))
        )
        .select(
            "i_manager_id", "d_moy",
            (F.col("sum_units") / 10000.0).alias("sum_sales"),
            (F.expr("(2 * tot_units + n_months) div (2 * n_months)") / 10000.0).alias("avg_monthly_sales"),
        )
        .orderBy("i_manager_id", "d_moy")
        .limit(100)
    )


Q64_ORACLE = f"""
WITH {DS_CTES},
cs_ui AS (
  SELECT cs_item_sk AS item_sk
  FROM catalog_sales LEFT JOIN catalog_returns
    ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
  GROUP BY cs_item_sk
  HAVING sum(cs_ext_sales_price) > 2 * sum(coalesce(cr_return_amt, 0))),
cross_sales AS (
  SELECT ss_item_sk AS item_sk, year(ss_sold_date_sk) AS syear,
         count(*)::BIGINT AS cnt, round(sum(ss_ext_sales_price), 4) AS s1
  FROM store_sales
  JOIN store_returns ON ss_ticket_number = sr_ticket_number
                    AND ss_item_sk = sr_item_sk AND ss_line_number = sr_line_number
  WHERE ss_item_sk IN (SELECT item_sk FROM cs_ui)
    AND year(ss_sold_date_sk) IN (1996, 1997)
  GROUP BY ss_item_sk, year(ss_sold_date_sk))
SELECT cs1.item_sk AS item_sk, i_item_desc,
       cs1.cnt AS cnt_1996, cs1.s1 AS sales_1996,
       cs2.cnt AS cnt_1997, cs2.s1 AS sales_1997
FROM cross_sales cs1 JOIN cross_sales cs2
  ON cs1.item_sk = cs2.item_sk AND cs1.syear = 1996 AND cs2.syear = 1997
JOIN item ON cs1.item_sk = i_item_sk
WHERE cs2.cnt <= cs1.cnt
ORDER BY item_sk
"""


@register("tpcds_q64", Q64_ORACLE, tags=("tpcds", "crosschannel", "returns", "selfjoin"))
def tpcds_q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 (reference tpcds/q64.sql, REDUCED: the spec's 18-way
    dimension join — income bands, two address hops, two demographic hops
    — exercises joins verified individually in q84/q46/q18; kept here is
    its structural core, which no other query covers): items whose
    catalog revenue more than doubles their matched catalog refunds
    (cs_ui keep-list over a returns left-join aggregate), restricted to
    RETURNED store lines, aggregated per (item, year) and self-joined
    across consecutive years keeping items whose returned-sale count did
    not grow. Plan: one returns-matched aggregate per year pair over the
    line-grain ss><sr join, the cs_ui HAVING keep-list broadcast, and the
    year self-join over |items| rows."""
    ds = _ds(spark, sf_dir)
    cs_ui = (
        ds["catalog_sales"]
        .join(
            ds["catalog_returns"].select("cr_order_number", "cr_item_sk", "cr_return_amt"),
            (F.col("cs_order_number") == F.col("cr_order_number")) & (F.col("cs_item_sk") == F.col("cr_item_sk")),
            "left",
        )
        .groupBy(F.col("cs_item_sk").alias("item_sk"))
        .agg(
            F.sum("cs_ext_sales_price").alias("sales"),
            F.sum(F.coalesce(F.col("cr_return_amt"), F.lit(0.0))).alias("refunds"),
        )
        .filter(F.col("sales") > 2 * F.col("refunds"))
        .select("item_sk")
    )
    cross_sales = (
        ds["store_sales"]
        .filter(F.year("ss_sold_date_sk").isin(1996, 1997))
        .join(
            ds["store_returns"].select("sr_ticket_number", "sr_item_sk", "sr_line_number"),
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
        )
        .join(F.broadcast(cs_ui), F.col("ss_item_sk") == F.col("item_sk"), "left_semi")
        .groupBy(F.col("ss_item_sk").alias("item_sk"), F.year("ss_sold_date_sk").alias("syear"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("ss_ext_sales_price"), 4).alias("s1"))
    )
    cs1 = cross_sales.filter(F.col("syear") == 1996).select(
        "item_sk", F.col("cnt").alias("cnt_1996"), F.col("s1").alias("sales_1996")
    )
    cs2 = cross_sales.filter(F.col("syear") == 1997).select(
        F.col("item_sk").alias("i2"), F.col("cnt").alias("cnt_1997"), F.col("s1").alias("sales_1997")
    )
    return (
        cs1.join(cs2, F.col("item_sk") == F.col("i2"))
        .filter(F.col("cnt_1997") <= F.col("cnt_1996"))
        .join(ds["item"].select("i_item_sk", "i_item_desc"), F.col("item_sk") == F.col("i_item_sk"))
        .select("item_sk", "i_item_desc", "cnt_1996", "sales_1996", "cnt_1997", "sales_1997")
        .orderBy("item_sk")
    )


Q76_ORACLE = f"""
WITH {DS_CTES},
united AS (
  SELECT 'store' AS channel, 'promo' AS col_name,
         CASE WHEN ss_ticket_number % 11 = 0 THEN NULL ELSE ss_promo_sk END AS nullable_key,
         year(ss_sold_date_sk) AS d_year, ss_item_sk AS item_sk, ss_ext_sales_price AS p
  FROM store_sales
  UNION ALL
  SELECT 'web', 'page',
         CASE WHEN ws_order_number % 7 = 0 THEN NULL ELSE ws_web_page_sk END,
         year(ws_sold_date_sk), ws_item_sk, ws_ext_sales_price
  FROM web_sales
  UNION ALL
  SELECT 'catalog', 'warehouse',
         CASE WHEN cs_order_number % 5 = 0 THEN NULL ELSE cs_warehouse_sk END,
         year(cs_sold_date_sk), cs_item_sk, cs_ext_sales_price
  FROM catalog_sales)
SELECT channel, col_name, d_year, i_category,
       count(*)::BIGINT AS sales_cnt, round(sum(p), 4) AS sales_amt
FROM united JOIN item ON item_sk = i_item_sk
WHERE nullable_key IS NULL
GROUP BY channel, col_name, d_year, i_category
ORDER BY channel, col_name, d_year, i_category
"""


@register("tpcds_q76", Q76_ORACLE, tags=("tpcds", "crosschannel", "nullkeys"))
def tpcds_q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q76 (reference tpcds/q76.sql; the derived channel facts are
    NOT NULL by construction, so the spec's null-key population is derived
    INLINE — a deterministic modulus nulls one channel key per channel,
    identically in both engines): counts and revenue of sales rows with a
    missing dimension key, per channel/year/category — the data-quality
    audit shape. Plan: three projections union before one item join and a
    single hash-agg; the IS NULL filter prunes each scan to the null
    slice first."""
    ds = _ds(spark, sf_dir)
    ss = ds["store_sales"].select(
        F.lit("store").alias("channel"), F.lit("promo").alias("col_name"),
        F.when(F.col("ss_ticket_number") % 11 == 0, None).otherwise(F.col("ss_promo_sk")).alias("nullable_key"),
        F.year("ss_sold_date_sk").alias("d_year"), F.col("ss_item_sk").alias("item_sk"),
        F.col("ss_ext_sales_price").alias("p"),
    )
    ws = ds["web_sales"].select(
        F.lit("web"), F.lit("page"),
        F.when(F.col("ws_order_number") % 7 == 0, None).otherwise(F.col("ws_web_page_sk")),
        F.year("ws_sold_date_sk"), F.col("ws_item_sk"), F.col("ws_ext_sales_price"),
    )
    cs = ds["catalog_sales"].select(
        F.lit("catalog"), F.lit("warehouse"),
        F.when(F.col("cs_order_number") % 5 == 0, None).otherwise(F.col("cs_warehouse_sk")),
        F.year("cs_sold_date_sk"), F.col("cs_item_sk"), F.col("cs_ext_sales_price"),
    )
    return (
        ss.unionAll(ws).unionAll(cs)
        .filter(F.col("nullable_key").isNull())
        .join(ds["item"].select("i_item_sk", "i_category"), F.col("item_sk") == F.col("i_item_sk"))
        .groupBy("channel", "col_name", "d_year", "i_category")
        .agg(F.count(F.lit(1)).alias("sales_cnt"), F.round(F.sum("p"), 4).alias("sales_amt"))
        .orderBy("channel", "col_name", "d_year", "i_category")
    )


Q80_ORACLE = f"""
WITH {DS_CTES},
promo_ok AS (SELECT p_promo_sk FROM promotion WHERE p_channel_email = 'N'),
ssr AS (
  SELECT i_item_id AS id,
         round(sum(ss_ext_sales_price), 4) AS sales,
         round(sum(coalesce(sr_return_amt, 0)), 4) AS returns_amt,
         round(sum(ss_net_profit - coalesce(sr_return_tax, 0)), 4) AS profit
  FROM store_sales
  LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number
        AND ss_item_sk = sr_item_sk AND ss_line_number = sr_line_number
  JOIN item ON ss_item_sk = i_item_sk
  WHERE year(ss_sold_date_sk) = 1997 AND month(ss_sold_date_sk) = 9
    AND ss_promo_sk IN (SELECT p_promo_sk FROM promo_ok)
  GROUP BY i_item_id),
csr AS (
  SELECT i_item_id AS id,
         round(sum(cs_ext_sales_price), 4) AS sales,
         round(sum(coalesce(cr_return_amt, 0)), 4) AS returns_amt,
         round(sum(cs_net_profit - coalesce(cr_net_loss, 0)), 4) AS profit
  FROM catalog_sales
  LEFT JOIN catalog_returns ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
  JOIN item ON cs_item_sk = i_item_sk
  WHERE year(cs_sold_date_sk) = 1997 AND month(cs_sold_date_sk) = 9
    AND cs_promo_sk IN (SELECT p_promo_sk FROM promo_ok)
  GROUP BY i_item_id),
wsr AS (
  SELECT i_item_id AS id,
         round(sum(ws_ext_sales_price), 4) AS sales,
         round(sum(coalesce(wr_return_amt, 0)), 4) AS returns_amt,
         round(sum(ws_net_profit - coalesce(wr_net_loss, 0)), 4) AS profit
  FROM web_sales
  LEFT JOIN web_returns ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
  JOIN item ON ws_item_sk = i_item_sk
  WHERE year(ws_sold_date_sk) = 1997 AND month(ws_sold_date_sk) = 9
  GROUP BY i_item_id)
SELECT channel, id, round(sum(sales), 4) AS sales,
       round(sum(returns_amt), 4) AS returns_amt, round(sum(profit), 4) AS profit
FROM (
  SELECT 'store channel' AS channel, * FROM ssr
  UNION ALL SELECT 'catalog channel', * FROM csr
  UNION ALL SELECT 'web channel', * FROM wsr) u
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100
"""


@register("tpcds_q80", Q80_ORACLE, tags=("tpcds", "crosschannel", "rollup", "returns"))
def tpcds_q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q80 (reference tpcds/q80.sql; web promo leg dropped — the
    derived web fact carries no promo key, and the promo semi-join is
    verified on the store/catalog legs): ITEM-grain per-channel P&L with
    line-matched returns and a non-promoted filter, rolled up over
    (channel, item). Unlike q5 (signed union) and q77 (join of
    aggregates), each channel here left-joins returns AT LINE GRAIN
    before aggregating — the third of the spec's three P&L formulations.
    Plan: three line-grain left joins, three item aggregates, Expand over
    the union of |items| rows."""
    return (
        _q80_combined(spark, sf_dir)
        .rollup("channel", "id")
        .agg(
            F.round(F.sum("sales"), 4).alias("sales"),
            F.round(F.sum("returns_amt"), 4).alias("returns_amt"),
            F.round(F.sum("profit"), 4).alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
        .limit(100)
    )


def _q80_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q80's item-grain per-channel P&L union frame — shared by q80
    (ROLLUP) and the v2.7 q80a (explicit union of levels)."""
    ds = _ds(spark, sf_dir)
    promo_ok = ds["promotion"].filter(F.col("p_channel_email") == "N").select("p_promo_sk")
    item = ds["item"].select("i_item_sk", "i_item_id")

    def month9(df: DataFrame, col: str) -> DataFrame:
        return df.filter((F.year(col) == 1997) & (F.month(col) == 9))

    ssr = (
        month9(ds["store_sales"], "ss_sold_date_sk")
        .join(F.broadcast(promo_ok), F.col("ss_promo_sk") == F.col("p_promo_sk"), "left_semi")
        .join(
            ds["store_returns"].select("sr_ticket_number", "sr_item_sk", "sr_line_number", "sr_return_amt", "sr_return_tax"),
            (F.col("ss_ticket_number") == F.col("sr_ticket_number"))
            & (F.col("ss_item_sk") == F.col("sr_item_sk"))
            & (F.col("ss_line_number") == F.col("sr_line_number")),
            "left",
        )
        .join(item, F.col("ss_item_sk") == F.col("i_item_sk"))
        .groupBy(F.col("i_item_id").alias("id"))
        .agg(
            F.round(F.sum("ss_ext_sales_price"), 4).alias("sales"),
            F.round(F.sum(F.coalesce(F.col("sr_return_amt"), F.lit(0.0))), 4).alias("returns_amt"),
            F.round(F.sum(F.col("ss_net_profit") - F.coalesce(F.col("sr_return_tax"), F.lit(0.0))), 4).alias("profit"),
        )
        .select(F.lit("store channel").alias("channel"), "id", "sales", "returns_amt", "profit")
    )
    csr = (
        month9(ds["catalog_sales"], "cs_sold_date_sk")
        .join(F.broadcast(promo_ok), F.col("cs_promo_sk") == F.col("p_promo_sk"), "left_semi")
        .join(
            ds["catalog_returns"].select("cr_order_number", "cr_item_sk", "cr_return_amt", "cr_net_loss"),
            (F.col("cs_order_number") == F.col("cr_order_number")) & (F.col("cs_item_sk") == F.col("cr_item_sk")),
            "left",
        )
        .join(item, F.col("cs_item_sk") == F.col("i_item_sk"))
        .groupBy(F.col("i_item_id").alias("id"))
        .agg(
            F.round(F.sum("cs_ext_sales_price"), 4).alias("sales"),
            F.round(F.sum(F.coalesce(F.col("cr_return_amt"), F.lit(0.0))), 4).alias("returns_amt"),
            F.round(F.sum(F.col("cs_net_profit") - F.coalesce(F.col("cr_net_loss"), F.lit(0.0))), 4).alias("profit"),
        )
        .select(F.lit("catalog channel").alias("channel"), "id", "sales", "returns_amt", "profit")
    )
    wsr = (
        month9(ds["web_sales"], "ws_sold_date_sk")
        .join(
            ds["web_returns"].select("wr_order_number", "wr_item_sk", "wr_return_amt", "wr_net_loss"),
            (F.col("ws_order_number") == F.col("wr_order_number")) & (F.col("ws_item_sk") == F.col("wr_item_sk")),
            "left",
        )
        .join(item, F.col("ws_item_sk") == F.col("i_item_sk"))
        .groupBy(F.col("i_item_id").alias("id"))
        .agg(
            F.round(F.sum("ws_ext_sales_price"), 4).alias("sales"),
            F.round(F.sum(F.coalesce(F.col("wr_return_amt"), F.lit(0.0))), 4).alias("returns_amt"),
            F.round(F.sum(F.col("ws_net_profit") - F.coalesce(F.col("wr_net_loss"), F.lit(0.0))), 4).alias("profit"),
        )
        .select(F.lit("web channel").alias("channel"), "id", "sales", "returns_amt", "profit")
    )
    return ssr.unionAll(csr).unionAll(wsr)


# ---------------------------------------------------------------------------
# r4 wave 8 — TPC-DS v2.7 "a"-variants (reference ships them as a separate
# corpus: sql/core/src/test/resources/tpcds-v2.7.0/). Each reformulates a
# verified query into a different PLAN: rollups become explicit
# union-of-levels (multi-pass aggregates instead of one ExpandExec),
# OR-of-EXISTS becomes a union of semi-join branches. Results are
# intentionally comparable to their base queries.
# ---------------------------------------------------------------------------

Q22A_ORACLE = f"""
WITH {DS_CTES},
inv AS (
  SELECT i_item_desc, i_brand, i_class, i_category, inv_quantity_on_hand AS q
  FROM inventory JOIN item ON inv_item_sk = i_item_sk
  WHERE year(inv_date_sk) = 1997)
SELECT * FROM (
  SELECT i_item_desc AS i_product_name, i_brand, i_class, i_category,
         round(avg(q), 4) AS qoh
  FROM inv GROUP BY i_item_desc, i_brand, i_class, i_category
  UNION ALL
  SELECT i_item_desc, i_brand, i_class, NULL, round(avg(q), 4)
  FROM inv GROUP BY i_item_desc, i_brand, i_class
  UNION ALL
  SELECT i_item_desc, i_brand, NULL, NULL, round(avg(q), 4)
  FROM inv GROUP BY i_item_desc, i_brand
  UNION ALL
  SELECT i_item_desc, NULL, NULL, NULL, round(avg(q), 4)
  FROM inv GROUP BY i_item_desc
  UNION ALL
  SELECT NULL, NULL, NULL, NULL, round(avg(q), 4) FROM inv
) u
ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST,
         i_class NULLS FIRST, i_category NULLS FIRST
LIMIT 100
"""


@register("tpcds_q22a", Q22A_ORACLE, tags=("tpcds", "v27", "inventory", "union"))
def tpcds_q22a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q22a (reference tpcds-v2.7.0/q22a.sql): q22's rollup
    expressed as an explicit UNION of the five aggregation levels — the
    multi-pass formulation engines without ExpandExec use. Plan contrast
    with q22 (worth knowing at 100 TB): the Expand form scans once but
    shuffles 5x rows; this form scans the joined input five times (or
    once if cached) with each aggregate's shuffle carrying only its own
    grain. Same result set, verified against the same ordering."""
    ds = _ds(spark, sf_dir)
    inv = (
        ds["inventory"]
        .filter(F.year("inv_date_sk") == 1997)
        .join(ds["item"], F.col("inv_item_sk") == F.col("i_item_sk"))
        .select("i_item_desc", "i_brand", "i_class", "i_category", F.col("inv_quantity_on_hand").alias("q"))
    )
    levels = [
        ("i_item_desc", "i_brand", "i_class", "i_category"),
        ("i_item_desc", "i_brand", "i_class"),
        ("i_item_desc", "i_brand"),
        ("i_item_desc",),
        (),
    ]
    parts = []
    all_cols = ("i_item_desc", "i_brand", "i_class", "i_category")
    for lv in levels:
        agg = inv.groupBy(*lv).agg(F.round(F.avg("q"), 4).alias("qoh")) if lv else inv.agg(F.round(F.avg("q"), 4).alias("qoh"))
        parts.append(
            agg.select(
                *[(F.col(c) if c in lv else F.lit(None).cast("string")).alias(c) for c in all_cols],
                "qoh",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return (
        u.select(F.col("i_item_desc").alias("i_product_name"), "i_brand", "i_class", "i_category", "qoh")
        .orderBy(
            "qoh",
            F.col("i_product_name").asc_nulls_first(),
            F.col("i_brand").asc_nulls_first(),
            F.col("i_class").asc_nulls_first(),
            F.col("i_category").asc_nulls_first(),
        )
        .limit(100)
    )


Q27A_ORACLE = f"""
WITH {DS_CTES},
base AS (
  SELECT i_item_id, s_state, CAST(round(ss_quantity) AS BIGINT) AS q,
         CAST(round(ss_sales_price * 10000) AS BIGINT) AS pu
  FROM store_sales
  JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
  JOIN item ON ss_item_sk = i_item_sk
  JOIN store ON ss_store_sk = s_store_sk
  WHERE cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
    AND year(ss_sold_date_sk) = 1997)
SELECT * FROM (
  SELECT i_item_id, s_state, 0 AS g_state,
         ((2 * 10000 * sum(q) + count(*)) // (2 * count(*))) / 10000.0 AS agg1,
         ((2 * sum(pu) + count(*)) // (2 * count(*))) / 10000.0 AS agg2
  FROM base GROUP BY i_item_id, s_state
  UNION ALL
  SELECT i_item_id, NULL, 1,
         ((2 * 10000 * sum(q) + count(*)) // (2 * count(*))) / 10000.0,
         ((2 * sum(pu) + count(*)) // (2 * count(*))) / 10000.0
  FROM base GROUP BY i_item_id
  UNION ALL
  SELECT NULL, NULL, 1,
         ((2 * 10000 * sum(q) + count(*)) // (2 * count(*))) / 10000.0,
         ((2 * sum(pu) + count(*)) // (2 * count(*))) / 10000.0
  FROM base
) u
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100
"""


@register("tpcds_q27a", Q27A_ORACLE, tags=("tpcds", "v27", "union"))
def tpcds_q27a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q27a (reference tpcds-v2.7.0/q27a.sql): q27's rollup
    levels as explicit unioned aggregates carrying the grouping() flag as
    a literal per branch — exercising multi-pass aggregation against
    q27's single-Expand plan."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        (F.col("cd_gender") == "M") & (F.col("cd_marital_status") == "S")
        & (F.col("cd_education_status") == "College")
    )
    base = (
        ds["store_sales"]
        .filter(F.year("ss_sold_date_sk") == 1997)
        .join(F.broadcast(cd), F.col("ss_cdemo_sk") == F.col("cd_demo_sk"))
        .join(ds["item"].select("i_item_sk", "i_item_id"), F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .select(
            "i_item_id", "s_state",
            F.round(F.col("ss_quantity")).cast("bigint").alias("q"),
            F.round(F.col("ss_sales_price") * 10000).cast("bigint").alias("pu"),
        )
    )
    # round(avg, 4) as exact integer HALF_UP division (the q47/q57 money
    # discipline): avg(q) over integer quantities and avg(p) over BIGINT
    # ten-thousandths — round(avg(double), 4) tied at sf0.1 strict.
    agg1 = (F.expr("cast(2 * 10000 * sum(q) + count(*) as bigint) div cast(2 * count(*) as bigint)") / 10000.0).alias("agg1")
    agg2 = (F.expr("cast(2 * sum(pu) + count(*) as bigint) div cast(2 * count(*) as bigint)") / 10000.0).alias("agg2")
    lvl1 = base.groupBy("i_item_id", "s_state").agg(
        agg1, agg2
    ).select("i_item_id", "s_state", F.lit(0).alias("g_state"), "agg1", "agg2")
    lvl2 = base.groupBy("i_item_id").agg(
        agg1, agg2
    ).select("i_item_id", F.lit(None).cast("string").alias("s_state"), F.lit(1).alias("g_state"), "agg1", "agg2")
    lvl3 = base.agg(
        agg1, agg2
    ).select(
        F.lit(None).cast("string").alias("i_item_id"), F.lit(None).cast("string").alias("s_state"),
        F.lit(1).alias("g_state"), "agg1", "agg2",
    )
    return (
        lvl1.unionAll(lvl2).unionAll(lvl3)
        .orderBy(F.col("i_item_id").asc_nulls_first(), F.col("s_state").asc_nulls_first())
        .limit(100)
    )


Q10A_ORACLE = f"""
WITH {DS_CTES},
active AS (
  SELECT c FROM (
    SELECT ws_bill_customer_sk AS c FROM web_sales
    WHERE year(ws_sold_date_sk) = 1997 AND quarter(ws_sold_date_sk) IN (1, 2)
    UNION
    SELECT cs_bill_customer_sk FROM catalog_sales
    WHERE year(cs_sold_date_sk) = 1997 AND quarter(cs_sold_date_sk) IN (1, 2)) u)
SELECT cd_education_status, cd_marital_status, count(*)::BIGINT AS cnt
FROM customer_dim c
JOIN customer_demographics ON cd_demo_sk = c.c_customer_sk % 60
JOIN customer_address ON c.c_current_addr_sk = ca_address_sk
WHERE ca_state IN ('ST_0', 'ST_3', 'ST_5')
  AND EXISTS (SELECT 1 FROM store_sales
              WHERE ss_customer_sk = c.c_customer_sk
                AND year(ss_sold_date_sk) = 1997 AND quarter(ss_sold_date_sk) IN (1, 2))
  AND c.c_customer_sk IN (SELECT c FROM active)
GROUP BY cd_education_status, cd_marital_status
ORDER BY cd_education_status, cd_marital_status
"""


@register("tpcds_q10a", Q10A_ORACLE, tags=("tpcds", "v27", "existence"))
def tpcds_q10a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q10a (reference tpcds-v2.7.0/q10a.sql): q10 with the
    OR-of-EXISTS rewritten as a UNION of the two remote-channel customer
    sets followed by a single IN — the decorrelated form v2.7 adopted
    (and the same plan our q10 build already produces; registering both
    pins that the two formulations agree)."""
    return tpcds_q10(spark, sf_dir)


Q35A_ORACLE = f"""
WITH {DS_CTES},
remote AS (
  SELECT c FROM (
    SELECT ws_bill_customer_sk AS c FROM web_sales WHERE year(ws_sold_date_sk) = 1997
    UNION
    SELECT cs_bill_customer_sk FROM catalog_sales WHERE year(cs_sold_date_sk) = 1997) u)
SELECT cd_gender, cd_marital_status, count(*)::BIGINT AS cnt,
       round(avg(hd_dep_count), 4) AS avg_dep,
       max(hd_dep_count) AS max_dep,
       sum(hd_dep_count)::BIGINT AS sum_dep
FROM customer_dim c
JOIN customer_demographics ON cd_demo_sk = c.c_customer_sk % 60
JOIN household_demographics ON hd_demo_sk = c.c_customer_sk % 100
WHERE EXISTS (SELECT 1 FROM store_sales
              WHERE ss_customer_sk = c.c_customer_sk AND year(ss_sold_date_sk) = 1997)
  AND c.c_customer_sk IN (SELECT c FROM remote)
GROUP BY cd_gender, cd_marital_status
ORDER BY cd_gender, cd_marital_status
"""


@register("tpcds_q35a", Q35A_ORACLE, tags=("tpcds", "v27", "existence"))
def tpcds_q35a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q35a (reference tpcds-v2.7.0/q35a.sql): q35's
    OR-of-EXISTS as an explicit channel UNION + IN, verifying the two
    formulations produce identical statistics."""
    return tpcds_q35(spark, sf_dir)


def _q36a_style_oracle(fact: str, prefix: str, dim_join: str, extra_where: str) -> str:
    base = f"""
  SELECT i_category, i_class, {prefix}_ext_sales_price AS p
  FROM {fact} JOIN item ON {prefix}_item_sk = i_item_sk {dim_join}
  WHERE year({prefix}_sold_date_sk) = 1997{extra_where}"""
    return f"""
WITH {DS_CTES},
base AS ({base}),
levels AS (
  SELECT i_category, i_class, 0 AS lochierarchy, round(sum(p), 4) AS total_sum
  FROM base GROUP BY i_category, i_class
  UNION ALL
  SELECT i_category, NULL, 1, round(sum(p), 4) FROM base GROUP BY i_category
  UNION ALL
  SELECT NULL, NULL, 2, round(sum(p), 4) FROM base)
SELECT total_sum, i_category, i_class, lochierarchy::BIGINT AS lochierarchy,
       rank() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN lochierarchy = 0 THEN i_category END
         ORDER BY total_sum DESC) AS rank_within_parent
FROM levels
ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent, i_category NULLS FIRST, i_class NULLS FIRST
"""


def _q36a_style(spark: SparkSession, sf_dir: str, fact: str, prefix: str,
                with_store: bool, extra_filter) -> DataFrame:
    ds = _ds(spark, sf_dir)
    base = (
        ds[fact]
        .filter(F.year(f"{prefix}_sold_date_sk") == 1997)
        .join(ds["item"].select("i_item_sk", "i_category", "i_class"),
              F.col(f"{prefix}_item_sk") == F.col("i_item_sk"))
    )
    if with_store:
        base = base.join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
    if extra_filter is not None:
        base = base.filter(extra_filter)
    base = base.select("i_category", "i_class", F.col(f"{prefix}_ext_sales_price").alias("p"))
    lvl0 = base.groupBy("i_category", "i_class").agg(F.round(F.sum("p"), 4).alias("total_sum")).select(
        "i_category", "i_class", F.lit(0).alias("lochierarchy"), "total_sum")
    lvl1 = base.groupBy("i_category").agg(F.round(F.sum("p"), 4).alias("total_sum")).select(
        "i_category", F.lit(None).cast("string").alias("i_class"), F.lit(1).alias("lochierarchy"), "total_sum")
    lvl2 = base.agg(F.round(F.sum("p"), 4).alias("total_sum")).select(
        F.lit(None).cast("string").alias("i_category"), F.lit(None).cast("string").alias("i_class"),
        F.lit(2).alias("lochierarchy"), "total_sum")
    levels = lvl0.unionByName(lvl1).unionByName(lvl2)
    w = W.partitionBy(
        "lochierarchy", F.when(F.col("lochierarchy") == 0, F.col("i_category"))
    ).orderBy(F.desc("total_sum"))
    return (
        levels.select(
            "total_sum", "i_category", "i_class",
            F.col("lochierarchy").cast("long").alias("lochierarchy"),
            F.rank().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.when(F.col("lochierarchy") == 0, F.col("i_category")).asc_nulls_first(),
            "rank_within_parent",
            F.col("i_category").asc_nulls_first(),
            F.col("i_class").asc_nulls_first(),
        )
    )


@register(
    "tpcds_q36a",
    _q36a_style_oracle("store_sales", "ss", "JOIN store ON ss_store_sk = s_store_sk",
                       " AND s_state IN ('ST_0', 'ST_1', 'ST_2', 'ST_3')"),
    tags=("tpcds", "v27", "union", "window"),
)
def tpcds_q36a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q36a (reference tpcds-v2.7.0/q36a.sql): q36's
    category/class ROLLUP as an explicit three-level UNION, with the same
    rank-within-parent window over the combined frame — multi-pass
    aggregation where q36 uses one ExpandExec."""
    return _q36a_style(
        spark, sf_dir, "store_sales", "ss", True,
        F.col("s_state").isin("ST_0", "ST_1", "ST_2", "ST_3"),
    )


@register(
    "tpcds_q86a",
    _q36a_style_oracle("web_sales", "ws", "", ""),
    tags=("tpcds", "v27", "union", "window"),
)
def tpcds_q86a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q86a (reference tpcds-v2.7.0/q86a.sql) — q86's web
    rollup in the union-of-levels formulation."""
    return _q36a_style(spark, sf_dir, "web_sales", "ws", False, None)


Q14B_ORACLE = f"""
WITH {DS_CTES},
cross_items AS (
  SELECT ss_item_sk AS item_sk FROM store_sales WHERE year(ss_sold_date_sk) = 1996
  INTERSECT
  SELECT cs_item_sk FROM catalog_sales WHERE year(cs_sold_date_sk) = 1996
  INTERSECT
  SELECT ws_item_sk FROM web_sales WHERE year(ws_sold_date_sk) = 1996),
this_year AS (
  SELECT i_brand_id, i_class, round(sum(ss_ext_sales_price), 4) AS sales,
         count(*)::BIGINT AS number_sales
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  WHERE ss_item_sk IN (SELECT item_sk FROM cross_items)
    AND year(ss_sold_date_sk) = 1997 AND month(ss_sold_date_sk) = 12
  GROUP BY i_brand_id, i_class),
last_year AS (
  SELECT i_brand_id, i_class, round(sum(ss_ext_sales_price), 4) AS sales,
         count(*)::BIGINT AS number_sales
  FROM store_sales JOIN item ON ss_item_sk = i_item_sk
  WHERE ss_item_sk IN (SELECT item_sk FROM cross_items)
    AND year(ss_sold_date_sk) = 1996 AND month(ss_sold_date_sk) = 12
  GROUP BY i_brand_id, i_class)
SELECT t.i_brand_id, t.i_class,
       t.sales AS ty_sales, t.number_sales AS ty_count,
       l.sales AS ly_sales, l.number_sales AS ly_count
FROM this_year t JOIN last_year l
  ON t.i_brand_id = l.i_brand_id AND t.i_class = l.i_class
WHERE t.sales > l.sales
ORDER BY t.i_brand_id, t.i_class
"""


@register("tpcds_q14b", Q14B_ORACLE, tags=("tpcds", "crosschannel", "intersect", "selfjoin"))
def tpcds_q14b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14b (reference tpcds/q14b.sql; the week_seq date-translation
    subqueries become same-month-prior-year): December store sales of
    three-channel items compared brand-by-brand against the prior
    December, keeping groups that GREW. Same cross_items INTERSECT
    keep-list as q14(a); the year-pair comparison joins two aggregates of
    the same grain — q14a's scalar cutoff replaced by the self-join
    threshold."""
    ds = _ds(spark, sf_dir)

    def items_of(fact: str, item: str, date: str) -> DataFrame:
        return ds[fact].filter(F.year(date) == 1996).select(F.col(item).alias("item_sk")).distinct()

    cross_items = (
        items_of("store_sales", "ss_item_sk", "ss_sold_date_sk")
        .intersect(items_of("catalog_sales", "cs_item_sk", "cs_sold_date_sk"))
        .intersect(items_of("web_sales", "ws_item_sk", "ws_sold_date_sk"))
    )
    item = ds["item"].select("i_item_sk", "i_brand_id", "i_class")

    def december(yr: int, sales_alias: str, cnt_alias: str) -> DataFrame:
        return (
            ds["store_sales"]
            .filter((F.year("ss_sold_date_sk") == yr) & (F.month("ss_sold_date_sk") == 12))
            .join(F.broadcast(cross_items), F.col("ss_item_sk") == F.col("item_sk"), "left_semi")
            .join(item, F.col("ss_item_sk") == F.col("i_item_sk"))
            .groupBy("i_brand_id", "i_class")
            .agg(
                F.round(F.sum("ss_ext_sales_price"), 4).alias(sales_alias),
                F.count(F.lit(1)).alias(cnt_alias),
            )
        )

    ty = december(1997, "ty_sales", "ty_count")
    ly = december(1996, "ly_sales", "ly_count").withColumnsRenamed(
        {"i_brand_id": "lb", "i_class": "lc"}
    )
    return (
        ty.join(ly, (F.col("i_brand_id") == F.col("lb")) & (F.col("i_class") == F.col("lc")))
        .filter(F.col("ty_sales") > F.col("ly_sales"))
        .select("i_brand_id", "i_class", "ty_sales", "ty_count", "ly_sales", "ly_count")
        .orderBy("i_brand_id", "i_class")
    )


Q51A_ORACLE = f"""
WITH {DS_CTES},
monthly AS (
  SELECT ss_item_sk AS item_sk, d_month_seq AS month_seq,
         round(sum(CASE WHEN ss_promo_sk % 2 = 1 THEN ss_ext_sales_price END), 4) AS promo_m,
         round(sum(CASE WHEN ss_promo_sk % 2 = 0 THEN ss_ext_sales_price END), 4) AS store_m
  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE d_year IN (1999, 2000)
  GROUP BY ss_item_sk, d_month_seq),
y AS (
  SELECT item_sk, month_seq,
         round(sum(coalesce(promo_m, 0)) OVER (
           PARTITION BY item_sk ORDER BY month_seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS promo_cumulative,
         round(sum(coalesce(store_m, 0)) OVER (
           PARTITION BY item_sk ORDER BY month_seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS store_cumulative
  FROM monthly)
SELECT item_sk, month_seq, promo_cumulative, store_cumulative
FROM y WHERE promo_cumulative > store_cumulative
ORDER BY item_sk, month_seq
LIMIT 100
"""


@register("tpcds_q51a", Q51A_ORACLE, tags=("tpcds", "v27", "window"))
def tpcds_q51a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q51a (reference tpcds-v2.7.0/q51a.sql): q51's
    promo-vs-store cumulative race reformulated as v2.7 does — ONE fact
    scan with conditional channel sums replaces the two windowed CTEs +
    FULL OUTER month alignment (every month either side sold in is a row
    of the single frame, so the join disappears), and both cumulative
    windows share one (item) sort. The plan contrast with q51 is the
    point: one scan + one window sort vs two scans + join + two window
    sorts. Cumulative sums of non-negative sales are monotone, so the
    base query's gap-filling running max is the identity here."""
    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter(F.col("d_year").isin(1999, 2000)).select("d_date_sk", "d_month_seq")
    monthly = (
        ds["store_sales"]
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .groupBy(F.col("ss_item_sk").alias("item_sk"), F.col("d_month_seq").alias("month_seq"))
        .agg(
            F.round(F.sum(F.when(F.col("ss_promo_sk") % 2 == 1, F.col("ss_ext_sales_price"))), 4).alias("promo_m"),
            F.round(F.sum(F.when(F.col("ss_promo_sk") % 2 == 0, F.col("ss_ext_sales_price"))), 4).alias("store_m"),
        )
    )
    w = W.partitionBy("item_sk").orderBy("month_seq").rowsBetween(W.unboundedPreceding, 0)
    return (
        monthly.select(
            "item_sk", "month_seq",
            F.round(F.sum(F.coalesce(F.col("promo_m"), F.lit(0.0))).over(w), 4).alias("promo_cumulative"),
            F.round(F.sum(F.coalesce(F.col("store_m"), F.lit(0.0))).over(w), 4).alias("store_cumulative"),
        )
        .filter(F.col("promo_cumulative") > F.col("store_cumulative"))
        .orderBy("item_sk", "month_seq")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q18a — q18's (state, city) rollup as an explicit union of levels
# (TPC-DS v2.7, reference tpcds-v2.7.0/q18a.sql)
# ---------------------------------------------------------------------------

_Q18A_AVG = "(CASE WHEN sum({u}) >= 0 THEN (2 * sum({u}) + count({u})) // (2 * count({u})) ELSE -((2 * -sum({u}) + count({u})) // (2 * count({u}))) END) / 10000.0"

Q18A_ORACLE = f"""
WITH {DS_CTES},
units AS (
  SELECT ca_state, ca_city,
         CAST(round(cs_quantity) AS BIGINT) * 10000 AS qu,
         CAST(round(cs_ext_sales_price * 10000) AS BIGINT) AS pu,
         CAST(round(cs_net_profit * 10000) AS BIGINT) AS pru,
         CAST(round(hd_dep_count) AS BIGINT) * 10000 AS du
  FROM catalog_sales
JOIN customer_dim ON cs_bill_customer_sk = c_customer_sk
JOIN customer_address ON c_current_addr_sk = ca_address_sk
JOIN household_demographics ON cs_bill_hdemo_sk = hd_demo_sk
JOIN customer_demographics ON cs_bill_cdemo_sk = cd_demo_sk
WHERE cd_gender = 'F' AND cd_education_status = 'Primary'
  AND year(cs_sold_date_sk) = 1997),
lv AS (
  SELECT ca_state, ca_city, 0 AS lochierarchy,
         {_Q18A_AVG.format(u='qu')} AS agg1, {_Q18A_AVG.format(u='pu')} AS agg2,
         {_Q18A_AVG.format(u='pru')} AS agg3, {_Q18A_AVG.format(u='du')} AS agg4
  FROM units GROUP BY ca_state, ca_city
  UNION ALL
  SELECT ca_state, NULL, 1,
         {_Q18A_AVG.format(u='qu')}, {_Q18A_AVG.format(u='pu')},
         {_Q18A_AVG.format(u='pru')}, {_Q18A_AVG.format(u='du')}
  FROM units GROUP BY ca_state
  UNION ALL
  SELECT NULL, NULL, 2,
         {_Q18A_AVG.format(u='qu')}, {_Q18A_AVG.format(u='pu')},
         {_Q18A_AVG.format(u='pru')}, {_Q18A_AVG.format(u='du')}
  FROM units)
SELECT ca_state, ca_city, lochierarchy::BIGINT AS lochierarchy,
       agg1, agg2, agg3, agg4
FROM lv
ORDER BY lochierarchy, ca_state NULLS FIRST, ca_city NULLS FIRST
LIMIT 100
"""

# div for floor division AND a double divisor: `/ 10000.0` inside F.expr
# would type as DECIMAL (the Arrow decimal->double hazard the hygiene gate
# rejects); q18 itself divides a Column by a Python float, which is double.
_Q18A_AVG_SPARK = _Q18A_AVG.replace("//", "div").replace("/ 10000.0", "/ cast(10000 as double)")


@register("tpcds_q18a", Q18A_ORACLE, tags=("tpcds", "v27", "union", "catalog"))
def tpcds_q18a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q18a (reference tpcds-v2.7.0/q18a.sql): q18's geography
    ROLLUP re-expressed as an explicit union of per-level aggregates, each
    level re-averaging the RAW unit rows (the variant's defining property
    — level aggregates are not derivable from level 0 for AVG). Averages
    are the q18 sign-safe integer HALF_UP form over exact ten-thousandth
    units; an explicit lochierarchy column replaces grouping()."""
    ds = _ds(spark, sf_dir)
    cd = ds["customer_demographics"].filter(
        (F.col("cd_gender") == "F") & (F.col("cd_education_status") == "Primary")
    )
    units = (
        ds["catalog_sales"]
        .filter(F.year("cs_sold_date_sk") == 1997)
        .join(F.broadcast(cd), F.col("cs_bill_cdemo_sk") == F.col("cd_demo_sk"))
        .join(ds["customer_dim"].select("c_customer_sk", "c_current_addr_sk"),
              F.col("cs_bill_customer_sk") == F.col("c_customer_sk"))
        .join(ds["customer_address"].select("ca_address_sk", "ca_state", "ca_city"),
              F.col("c_current_addr_sk") == F.col("ca_address_sk"))
        .join(F.broadcast(ds["household_demographics"]), F.col("cs_bill_hdemo_sk") == F.col("hd_demo_sk"))
        .select(
            "ca_state", "ca_city",
            (F.round(F.col("cs_quantity")).cast("bigint") * 10000).alias("qu"),
            F.round(F.col("cs_ext_sales_price") * 10000).cast("bigint").alias("pu"),
            F.round(F.col("cs_net_profit") * 10000).cast("bigint").alias("pru"),
            (F.round(F.col("hd_dep_count")).cast("bigint") * 10000).alias("du"),
        )
    )

    def level(grouped, state_col, city_col, lh: int) -> DataFrame:
        return grouped.agg(
            *[
                (F.expr(_Q18A_AVG_SPARK.format(u=u))).alias(f"agg{i + 1}")
                for i, u in enumerate(("qu", "pu", "pru", "du"))
            ]
        ).select(
            state_col.alias("ca_state"), city_col.alias("ca_city"),
            F.lit(lh).alias("lochierarchy"), "agg1", "agg2", "agg3", "agg4",
        )

    lv0 = level(units.groupBy("ca_state", "ca_city"), F.col("ca_state"), F.col("ca_city"), 0)
    lv1 = level(units.groupBy("ca_state"), F.col("ca_state"), F.lit(None).cast("string"), 1)
    lv2 = level(units.groupBy(), F.lit(None).cast("string"), F.lit(None).cast("string"), 2)
    return (
        lv0.unionByName(lv1).unionByName(lv2)
        .select("ca_state", "ca_city", F.col("lochierarchy").cast("long"), "agg1", "agg2", "agg3", "agg4")
        .orderBy("lochierarchy", F.col("ca_state").asc_nulls_first(), F.col("ca_city").asc_nulls_first())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q70a — q70's (state, city) rollup as a union of levels with the
# rank-within-parent window (TPC-DS v2.7, reference tpcds-v2.7.0/q70a.sql)
# ---------------------------------------------------------------------------

Q70A_ORACLE = f"""
WITH {DS_CTES},
top_states AS (
  SELECT s_state FROM (
    SELECT s.s_state,
           rank() OVER (ORDER BY sum(ss.ss_net_profit) DESC, s.s_state) AS r
    FROM store_sales ss JOIN store s ON ss.ss_store_sk = s.s_store_sk
    GROUP BY s.s_state
  ) t WHERE r <= 5
),
base AS (
  SELECT s.s_state, s.s_city, ss.ss_net_profit AS p
  FROM store_sales ss JOIN store s ON ss.ss_store_sk = s.s_store_sk
  WHERE s.s_state IN (SELECT s_state FROM top_states)
),
lv AS (
  SELECT s_state, s_city, 0 AS lochierarchy, round(sum(p), 4) AS total_sum
  FROM base GROUP BY s_state, s_city
  UNION ALL
  SELECT s_state, NULL, 1, round(sum(p), 4) FROM base GROUP BY s_state
  UNION ALL
  SELECT NULL, NULL, 2, round(sum(p), 4) FROM base)
SELECT total_sum, s_state AS state, s_city AS city,
       lochierarchy::BIGINT AS lochierarchy,
       rank() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN lochierarchy = 0 THEN s_state END
         ORDER BY total_sum DESC) AS rank_within_parent
FROM lv
ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN s_state END NULLS FIRST,
         rank_within_parent, state NULLS FIRST, city NULLS FIRST
"""


@register("tpcds_q70a", Q70A_ORACLE, tags=("tpcds", "v27", "union", "window"))
def tpcds_q70a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q70a (reference tpcds-v2.7.0/q70a.sql): q70's
    state/city ROLLUP over the top-5-profit states as an explicit
    three-level union, ranked within parent like q36a — the v2.7
    formulation that trades one ExpandExec for three scans of the reduced
    base (here: three aggregates of ONE narrowed join output)."""
    ds = _ds(spark, sf_dir)
    joined = ds["store_sales"].join(
        F.broadcast(ds["store"].select("s_store_sk", "s_state", "s_city")),
        F.col("ss_store_sk") == F.col("s_store_sk"),
    )
    per_state = joined.groupBy("s_state").agg(F.sum("ss_net_profit").alias("p"))
    top = (
        per_state.select(
            "s_state", F.rank().over(W.orderBy(F.desc("p"), F.col("s_state"))).alias("r")
        )
        .filter(F.col("r") <= 5)
        .select("s_state")
    )
    base = joined.join(F.broadcast(top), "s_state", "left_semi").select(
        "s_state", "s_city", F.col("ss_net_profit").alias("p")
    )
    lv0 = base.groupBy("s_state", "s_city").agg(F.round(F.sum("p"), 4).alias("total_sum")).select(
        "s_state", "s_city", F.lit(0).alias("lochierarchy"), "total_sum")
    lv1 = base.groupBy("s_state").agg(F.round(F.sum("p"), 4).alias("total_sum")).select(
        "s_state", F.lit(None).cast("string").alias("s_city"), F.lit(1).alias("lochierarchy"), "total_sum")
    lv2 = base.agg(F.round(F.sum("p"), 4).alias("total_sum")).select(
        F.lit(None).cast("string").alias("s_state"), F.lit(None).cast("string").alias("s_city"),
        F.lit(2).alias("lochierarchy"), "total_sum")
    lv = lv0.unionByName(lv1).unionByName(lv2)
    w = W.partitionBy(
        "lochierarchy", F.when(F.col("lochierarchy") == 0, F.col("s_state"))
    ).orderBy(F.desc("total_sum"))
    return (
        lv.select(
            "total_sum",
            F.col("s_state").alias("state"),
            F.col("s_city").alias("city"),
            F.col("lochierarchy").cast("long").alias("lochierarchy"),
            F.rank().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.when(F.col("lochierarchy") == 0, F.col("state")).asc_nulls_first(),
            "rank_within_parent",
            F.col("state").asc_nulls_first(),
            F.col("city").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# q77a — q77's (channel, id) rollup as an explicit union of levels
# (TPC-DS v2.7, reference tpcds-v2.7.0/q77a.sql)
# ---------------------------------------------------------------------------

_Q77_COMBINED_SQL = Q77_ORACLE[: Q77_ORACLE.index(")\nSELECT channel") + 2]

Q77A_ORACLE = f"""{_Q77_COMBINED_SQL}, lv AS (
  SELECT channel, id, 0 AS lochierarchy,
         round(sum(sales), 4) AS sales, round(sum(returns_amt), 4) AS returns_amt,
         round(sum(profit), 4) AS profit
  FROM combined GROUP BY channel, id
  UNION ALL
  SELECT channel, NULL, 1, round(sum(sales), 4), round(sum(returns_amt), 4), round(sum(profit), 4)
  FROM combined GROUP BY channel
  UNION ALL
  SELECT NULL, NULL, 2, round(sum(sales), 4), round(sum(returns_amt), 4), round(sum(profit), 4)
  FROM combined)
SELECT channel, id, lochierarchy::BIGINT AS lochierarchy, sales, returns_amt, profit
FROM lv
ORDER BY lochierarchy, channel NULLS FIRST, id NULLS FIRST
"""


@register("tpcds_q77a", Q77A_ORACLE, tags=("tpcds", "v27", "union", "crosschannel"))
def tpcds_q77a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q77a (reference tpcds-v2.7.0/q77a.sql): q77's
    (channel, id) ROLLUP over the per-channel P&L union as an explicit
    three-level union — the shared combined frame (_q77_combined) is built
    once and re-aggregated per level, so the six fact passes are not
    repeated (the v2.7 file re-expands them; the DataFrame form names the
    common subplan instead)."""
    combined = _q77_combined(spark, sf_dir)

    def lv(grouped, ch, i, lh: int) -> DataFrame:
        return grouped.agg(
            F.round(F.sum("sales"), 4).alias("sales"),
            F.round(F.sum("returns_amt"), 4).alias("returns_amt"),
            F.round(F.sum("profit"), 4).alias("profit"),
        ).select(
            ch.alias("channel"), i.alias("id"), F.lit(lh).alias("lochierarchy"),
            "sales", "returns_amt", "profit",
        )

    out = (
        lv(combined.groupBy("channel", "id"), F.col("channel"), F.col("id"), 0)
        .unionByName(lv(combined.groupBy("channel"), F.col("channel"), F.lit(None).cast("long"), 1))
        .unionByName(lv(combined.groupBy(), F.lit(None).cast("string"), F.lit(None).cast("long"), 2))
    )
    return (
        out.select("channel", "id", F.col("lochierarchy").cast("long"), "sales", "returns_amt", "profit")
        .orderBy("lochierarchy", F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# q5a — q5's (channel, id) rollup as an explicit union of levels
# (TPC-DS v2.7, reference tpcds-v2.7.0/q5a.sql)
# ---------------------------------------------------------------------------

_Q5_CTES_SQL = Q5_ORACLE[: Q5_ORACLE.index("\nSELECT channel")]

Q5A_ORACLE = f"""{_Q5_CTES_SQL},
combined AS (
  SELECT 'store channel' AS channel, * FROM ssr
  UNION ALL SELECT 'catalog channel', * FROM csr
  UNION ALL SELECT 'web channel', * FROM wsr),
lv AS (
  SELECT channel, id, 0 AS lochierarchy,
         round(sum(sales), 4) AS sales, round(sum(returns_amt), 4) AS returns_amt,
         round(sum(profit), 4) AS profit
  FROM combined GROUP BY channel, id
  UNION ALL
  SELECT channel, NULL, 1, round(sum(sales), 4), round(sum(returns_amt), 4), round(sum(profit), 4)
  FROM combined GROUP BY channel
  UNION ALL
  SELECT NULL, NULL, 2, round(sum(sales), 4), round(sum(returns_amt), 4), round(sum(profit), 4)
  FROM combined)
SELECT channel, id, lochierarchy::BIGINT AS lochierarchy, sales, returns_amt, profit
FROM lv
ORDER BY lochierarchy, channel NULLS FIRST, id NULLS FIRST
"""


@register("tpcds_q5a", Q5A_ORACLE, tags=("tpcds", "v27", "union", "crosschannel"))
def tpcds_q5a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q5a (reference tpcds-v2.7.0/q5a.sql): q5's
    (channel, id) ROLLUP over the signed-union P&L as an explicit
    three-level union, re-aggregating the shared combined frame
    (_q5_combined) per level — one subplan, three bounded aggregates."""
    combined = _q5_combined(spark, sf_dir)

    def lv(grouped, ch, i, lh: int) -> DataFrame:
        return grouped.agg(
            F.round(F.sum("sales"), 4).alias("sales"),
            F.round(F.sum("returns_amt"), 4).alias("returns_amt"),
            F.round(F.sum("profit"), 4).alias("profit"),
        ).select(
            ch.alias("channel"), i.alias("id"), F.lit(lh).alias("lochierarchy"),
            "sales", "returns_amt", "profit",
        )

    out = (
        lv(combined.groupBy("channel", "id"), F.col("channel"), F.col("id"), 0)
        .unionByName(lv(combined.groupBy("channel"), F.col("channel"), F.lit(None).cast("long"), 1))
        .unionByName(lv(combined.groupBy(), F.lit(None).cast("string"), F.lit(None).cast("long"), 2))
    )
    return (
        out.select("channel", "id", F.col("lochierarchy").cast("long"), "sales", "returns_amt", "profit")
        .orderBy("lochierarchy", F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# q80a — q80's (channel, item) rollup as an explicit union of levels
# (TPC-DS v2.7, reference tpcds-v2.7.0/q80a.sql)
# ---------------------------------------------------------------------------

_Q80_CTES_SQL = Q80_ORACLE[: Q80_ORACLE.index("\nSELECT channel")]

Q80A_ORACLE = f"""{_Q80_CTES_SQL},
combined AS (
  SELECT 'store channel' AS channel, * FROM ssr
  UNION ALL SELECT 'catalog channel', * FROM csr
  UNION ALL SELECT 'web channel', * FROM wsr),
lv AS (
  SELECT channel, id, 0 AS lochierarchy,
         round(sum(sales), 4) AS sales, round(sum(returns_amt), 4) AS returns_amt,
         round(sum(profit), 4) AS profit
  FROM combined GROUP BY channel, id
  UNION ALL
  SELECT channel, NULL, 1, round(sum(sales), 4), round(sum(returns_amt), 4), round(sum(profit), 4)
  FROM combined GROUP BY channel
  UNION ALL
  SELECT NULL, NULL, 2, round(sum(sales), 4), round(sum(returns_amt), 4), round(sum(profit), 4)
  FROM combined)
SELECT channel, id, lochierarchy::BIGINT AS lochierarchy, sales, returns_amt, profit
FROM lv
ORDER BY lochierarchy, channel NULLS FIRST, id NULLS FIRST
LIMIT 100
"""


@register("tpcds_q80a", Q80A_ORACLE, tags=("tpcds", "v27", "union", "crosschannel"))
def tpcds_q80a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q80a (reference tpcds-v2.7.0/q80a.sql): q80's
    (channel, item) ROLLUP over the line-matched P&L as an explicit
    three-level union over the shared combined frame (_q80_combined)."""
    combined = _q80_combined(spark, sf_dir)

    def lv(grouped, ch, i, lh: int) -> DataFrame:
        return grouped.agg(
            F.round(F.sum("sales"), 4).alias("sales"),
            F.round(F.sum("returns_amt"), 4).alias("returns_amt"),
            F.round(F.sum("profit"), 4).alias("profit"),
        ).select(
            ch.alias("channel"), i.alias("id"), F.lit(lh).alias("lochierarchy"),
            "sales", "returns_amt", "profit",
        )

    out = (
        lv(combined.groupBy("channel", "id"), F.col("channel"), F.col("id"), 0)
        .unionByName(lv(combined.groupBy("channel"), F.col("channel"), F.lit(None).cast("string"), 1))
        .unionByName(lv(combined.groupBy(), F.lit(None).cast("string"), F.lit(None).cast("string"), 2))
    )
    return (
        out.select("channel", "id", F.col("lochierarchy").cast("long"), "sales", "returns_amt", "profit")
        .orderBy("lochierarchy", F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q67a — q67's 8-column rollup as an explicit 9-level union
# (TPC-DS v2.7, reference tpcds-v2.7.0/q67a.sql). Both sides are GENERATED
# by one loop over the rollup prefixes, so the nine levels cannot drift.
# ---------------------------------------------------------------------------

_Q67_COLS: tuple[tuple[str, str], ...] = (
    ("i_category", "VARCHAR"), ("i_class", "VARCHAR"), ("i_brand", "VARCHAR"),
    ("i_item_desc", "VARCHAR"), ("d_year", "INTEGER"), ("d_qoy", "INTEGER"),
    ("d_moy", "INTEGER"), ("s_store_name", "VARCHAR"),
)


def _q67a_oracle_sql() -> str:
    base = """
base AS MATERIALIZED (
  SELECT i.i_category, i.i_class, i.i_brand, i.i_item_desc,
         d.d_year, d.d_qoy, d.d_moy, s.s_store_name,
         CAST(round(ss.ss_sales_price * 10000) AS BIGINT) * ss.ss_quantity AS u
  FROM store_sales ss
  JOIN date_dim d ON ss.ss_sold_date_sk = d.d_date_sk
  JOIN item i ON ss.ss_item_sk = i.i_item_sk
  JOIN store s ON ss.ss_store_sk = s.s_store_sk
  WHERE d.d_year = 2000
)"""
    levels = []
    for k in range(len(_Q67_COLS), -1, -1):
        sel = [
            (name if j < k else f"CAST(NULL AS {typ})") + f" AS {name}"
            for j, (name, typ) in enumerate(_Q67_COLS)
        ]
        grp = ", ".join(name for name, _ in _Q67_COLS[:k])
        levels.append(
            "  SELECT " + ", ".join(sel) + ", sum(u) / 10000.0 AS sumsales FROM base"
            + (f" GROUP BY {grp}" if grp else "")
        )
    union = "\n  UNION ALL\n".join(levels)
    return f"""
WITH {DS_CTES},{base},
agg AS (
{union}
)
SELECT * FROM (
  SELECT i_category, i_class, i_brand, i_item_desc AS i_product_name,
         d_year, d_qoy, d_moy, s_store_name AS s_store_id, sumsales,
         rank() OVER (PARTITION BY i_category ORDER BY sumsales DESC) AS rk
  FROM agg
) t
WHERE rk <= 10
ORDER BY i_category NULLS FIRST, rk, i_class NULLS FIRST, i_brand NULLS FIRST,
         i_product_name NULLS FIRST, d_year NULLS FIRST, d_qoy NULLS FIRST,
         d_moy NULLS FIRST, s_store_id NULLS FIRST
"""


Q67A_ORACLE = _q67a_oracle_sql()


@register("tpcds_q67a", Q67A_ORACLE, tags=("tpcds", "v27", "union", "window"))
def tpcds_q67a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q67a (reference tpcds-v2.7.0/q67a.sql): q67's 8-column
    ROLLUP as an explicit NINE-level union — the v2.7 formulation trades
    the single ExpandExec (9x row fan-out through one shuffle) for nine
    aggregates over a shared base; on a real cluster the named common
    subplan is scanned once and each level is a map-side-combined
    hash-agg, which can beat the Expand when the fact is wide. Both the
    Spark levels and the oracle's are generated by one loop over the
    rollup prefixes, so the formulations cannot drift. sumsales stays an
    exact BIGINT ten-thousandths sum divided once at display (the q67
    integer-unit discipline)."""
    from sol_spark.operators.dedup import local_checkpoint, release_result

    ds = _ds(spark, sf_dir)
    dd = ds["date_dim"].filter(F.col("d_year") == 2000)
    base = (
        ds["store_sales"]
        .join(F.broadcast(dd), F.col("ss_sold_date_sk") == F.col("d_date_sk"))
        .join(ds["item"], F.col("ss_item_sk") == F.col("i_item_sk"))
        .join(F.broadcast(ds["store"]), F.col("ss_store_sk") == F.col("s_store_sk"))
        .select(
            *[name for name, _ in _Q67_COLS],
            (F.round(F.col("ss_sales_price") * 10000).cast("bigint") * F.col("ss_quantity")).alias("u"),
        )
    )
    # r11 optimization round: HIERARCHICAL re-aggregation instead of nine
    # passes over the wide base. The finest (8-key) level is materialized
    # once with its EXACT BIGINT ten-thousandths sum, and every coarser
    # level aggregates the finest level's integer sums (integer addition
    # is associative, so sum-of-sums is bit-identical to a direct base
    # aggregate — the same discipline that lets the oracle's textual
    # re-expansion match); /10000.0 happens once per output row. The base
    # join streams straight into the finest aggregate (no base
    # checkpoint), and the other eight aggregates run over the
    # group-count-sized finest frame instead of the fact slice (guide
    # §2.3 — aggregate before you shuffle; plans/r11/tpcds_q67a_*.txt).
    spark_type = {"VARCHAR": "string", "INTEGER": "int"}
    all_keys = [name for name, _ in _Q67_COLS]
    finest = local_checkpoint(
        base.groupBy(*all_keys).agg(F.sum("u").cast("bigint").alias("su"))
    )
    levels = []
    for k in range(len(_Q67_COLS), -1, -1):
        keep = [name for name, _ in _Q67_COLS[:k]]
        if k == len(_Q67_COLS):
            lvl_su = finest
        else:
            grouped = finest.groupBy(*keep) if keep else finest.groupBy()
            lvl_su = grouped.agg(F.sum("su").cast("bigint").alias("su"))
        lvl = lvl_su.select(
            *[
                (F.col(name) if j < k else F.lit(None).cast(spark_type[typ])).alias(name)
                for j, (name, typ) in enumerate(_Q67_COLS)
            ],
            (F.col("su") / 10000.0).alias("sumsales"),
        )
        levels.append(lvl)
    agg = levels[0]
    for lvl in levels[1:]:
        agg = agg.unionByName(lvl)
    w = W.partitionBy("i_category").orderBy(F.desc("sumsales"))
    out = (
        agg.select(
            "i_category", "i_class", "i_brand",
            F.col("i_item_desc").alias("i_product_name"),
            "d_year", "d_qoy", "d_moy",
            F.col("s_store_name").alias("s_store_id"),
            "sumsales",
        )
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 10)
        .orderBy(
            F.col("i_category").asc_nulls_first(), "rk",
            F.col("i_class").asc_nulls_first(), F.col("i_brand").asc_nulls_first(),
            F.col("i_product_name").asc_nulls_first(), F.col("d_year").asc_nulls_first(),
            F.col("d_qoy").asc_nulls_first(), F.col("d_moy").asc_nulls_first(),
            F.col("s_store_id").asc_nulls_first(),
        )
    )
    out = local_checkpoint(out)
    release_result(finest)
    return out


# ---------------------------------------------------------------------------
# q14a — q14's per-channel brand report with the v2.7 union-of-levels
# hierarchy rollup (reference tpcds-v2.7.0/q14a.sql)
# ---------------------------------------------------------------------------

_Q14A_RESULTS_SQL = Q14_ORACLE[Q14_ORACLE.index("WITH") : Q14_ORACLE.index("\nSELECT channel")]

Q14A_ORACLE = f"""{_Q14A_RESULTS_SQL},
results AS (
  SELECT channel, i_brand_id, i_class, i_category_id,
         round(sum(p), 4) AS sum_sales, count(*)::BIGINT AS number_sales
  FROM united JOIN item ON item_sk = i_item_sk
  WHERE item_sk IN (SELECT item_sk FROM cross_items)
  GROUP BY channel, i_brand_id, i_class, i_category_id
  HAVING sum(p) > (SELECT average_sales FROM avg_sales) * 10),
lv AS (
  SELECT channel, i_brand_id, i_class, i_category_id, sum_sales, number_sales
  FROM results
  UNION ALL
  SELECT channel, i_brand_id, i_class, NULL,
         round(sum(sum_sales), 4), sum(number_sales)
  FROM results GROUP BY channel, i_brand_id, i_class
  UNION ALL
  SELECT channel, i_brand_id, NULL, NULL,
         round(sum(sum_sales), 4), sum(number_sales)
  FROM results GROUP BY channel, i_brand_id
  UNION ALL
  SELECT channel, NULL, NULL, NULL,
         round(sum(sum_sales), 4), sum(number_sales)
  FROM results GROUP BY channel
  UNION ALL
  SELECT NULL, NULL, NULL, NULL,
         round(sum(sum_sales), 4), sum(number_sales)
  FROM results)
SELECT channel, i_brand_id, i_class, i_category_id,
       sum_sales, number_sales::BIGINT AS number_sales
FROM lv
ORDER BY channel NULLS FIRST, i_brand_id NULLS FIRST, i_class NULLS FIRST,
         i_category_id NULLS FIRST
LIMIT 100
"""


@register("tpcds_q14a", Q14A_ORACLE, tags=("tpcds", "v27", "union", "crosschannel"))
def tpcds_q14a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS v2.7 q14a (reference tpcds-v2.7.0/q14a.sql): q14's
    cross-channel brand report extended down the item hierarchy — the
    HAVING-filtered (channel, brand, class, category) level-0 aggregate is
    then rolled up through four more levels as an explicit union, each
    level SUMMING level-0 totals (unlike q18a's averages, sums are exactly
    derivable from the finer level, which is what the v2.7 file does).
    Reuses q14's cross_items INTERSECT keep-list and scalar sales cutoff."""
    ds = _ds(spark, sf_dir)

    def items_of(fact: str, item: str, date: str) -> DataFrame:
        return ds[fact].filter(F.year(date) == 1996).select(F.col(item).alias("item_sk")).distinct()

    cross_items = (
        items_of("store_sales", "ss_item_sk", "ss_sold_date_sk")
        .intersect(items_of("catalog_sales", "cs_item_sk", "cs_sold_date_sk"))
        .intersect(items_of("web_sales", "ws_item_sk", "ws_sold_date_sk"))
    )

    def prices(fact: str, item: str, date: str, price: str, yr: int, ch: str | None = None) -> DataFrame:
        d = ds[fact].filter(F.year(date) == yr)
        cols = [F.col(item).alias("item_sk"), F.col(price).alias("p")]
        if ch is not None:
            cols.insert(0, F.lit(ch).alias("channel"))
        return d.select(*cols)

    avg_sales = (
        prices("store_sales", "ss_item_sk", "ss_sold_date_sk", "ss_ext_sales_price", 1996)
        .unionAll(prices("catalog_sales", "cs_item_sk", "cs_sold_date_sk", "cs_ext_sales_price", 1996))
        .unionAll(prices("web_sales", "ws_item_sk", "ws_sold_date_sk", "ws_ext_sales_price", 1996))
        .agg(F.avg("p").alias("average_sales"))
    )
    united = (
        prices("store_sales", "ss_item_sk", "ss_sold_date_sk", "ss_ext_sales_price", 1997, "store")
        .unionAll(prices("catalog_sales", "cs_item_sk", "cs_sold_date_sk", "cs_ext_sales_price", 1997, "catalog"))
        .unionAll(prices("web_sales", "ws_item_sk", "ws_sold_date_sk", "ws_ext_sales_price", 1997, "web"))
    )
    results = (
        united.join(F.broadcast(cross_items), "item_sk", "left_semi")
        .join(ds["item"].select("i_item_sk", "i_brand_id", "i_class", "i_category_id"),
              F.col("item_sk") == F.col("i_item_sk"))
        .groupBy("channel", "i_brand_id", "i_class", "i_category_id")
        .agg(F.sum("p").alias("raw_sales"), F.count(F.lit(1)).alias("number_sales"))
        .crossJoin(F.broadcast(avg_sales))
        .filter(F.col("raw_sales") > F.col("average_sales") * 10)
        .select(
            "channel", "i_brand_id", "i_class", "i_category_id",
            F.round(F.col("raw_sales"), 4).alias("sum_sales"), "number_sales",
        )
    )

    def lv(keys: list[str]) -> DataFrame:
        grouped = results.groupBy(*keys) if keys else results.groupBy()
        nulls = {
            "i_brand_id": F.lit(None).cast("int"),
            "i_class": F.lit(None).cast("string"),
            "i_category_id": F.lit(None).cast("bigint"),
            "channel": F.lit(None).cast("string"),
        }
        return grouped.agg(
            F.round(F.sum("sum_sales"), 4).alias("sum_sales"),
            F.sum("number_sales").alias("number_sales"),
        ).select(
            *[
                (F.col(c) if c in keys else nulls[c]).alias(c)
                for c in ("channel", "i_brand_id", "i_class", "i_category_id")
            ],
            "sum_sales", "number_sales",
        )

    out = results.select("channel", "i_brand_id", "i_class", "i_category_id", "sum_sales", "number_sales")
    for keys in (["channel", "i_brand_id", "i_class"], ["channel", "i_brand_id"], ["channel"], []):
        out = out.unionByName(lv(keys))
    return (
        out.select(
            "channel", "i_brand_id", "i_class", "i_category_id",
            "sum_sales", F.col("number_sales").cast("long").alias("number_sales"),
        )
        .orderBy(
            F.col("channel").asc_nulls_first(), F.col("i_brand_id").asc_nulls_first(),
            F.col("i_class").asc_nulls_first(), F.col("i_category_id").asc_nulls_first(),
        )
        .limit(100)
    )
