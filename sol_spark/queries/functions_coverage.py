"""Scalar-function surface coverage (SURVEY §2.8).

The reference registers ~275 scalar functions
(/root/reference/sql/catalyst/src/main/scala/org/apache/spark/sql/catalyst/analysis/FunctionRegistry.scala:190-500),
all stock Catalyst expressions. Modern PySpark is a superset, so "coverage"
here means *verified behavior*, not reimplementation: each query below
evaluates a family of functions over fixture rows and hash-matches a DuckDB
oracle (names differ per engine where noted — e.g. Spark ``sha2(x,256)`` vs
DuckDB ``sha256``, Spark ``get_json_object`` vs DuckDB
``json_extract_string``).

Everything is a pure projection: whole-stage-codegen'd, zero shuffles,
trivially scale-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sol_spark.registry import register
from sol_spark.tables import load_tables

FN_MATH_ORACLE = """
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS abs_v,
       CAST(ceil(p_retailprice) AS BIGINT) AS ceil_v,
       CAST(floor(p_retailprice) AS BIGINT) AS floor_v,
       round(sqrt(p_retailprice), 6) AS sqrt_v,
       round(ln(p_retailprice + 1), 6) AS ln_v,
       round(log10(p_retailprice + 1), 6) AS log10_v,
       round(pow(p_size, 2), 2) AS pow_v,
       p_size % 7 AS mod_v,
       CAST(sign(p_retailprice - 1000.0) AS INTEGER) AS sign_v,
       round(sin(p_size), 6) AS sin_v,
       round(atan2(p_size, 3.0), 6) AS atan2_v,
       greatest(p_size, 25) AS greatest_v,
       least(p_size, 25) AS least_v
FROM part ORDER BY p_partkey
"""


@register("fn_math", FN_MATH_ORACLE, tags=("functions", "math"))
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math expression family (FunctionRegistry.scala:217-270)."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_v"),
        F.ceil("p_retailprice").cast("bigint").alias("ceil_v"),
        F.floor("p_retailprice").cast("bigint").alias("floor_v"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_v"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("ln_v"),
        F.round(F.log10(F.col("p_retailprice") + 1), 6).alias("log10_v"),
        F.round(F.pow("p_size", F.lit(2)), 2).alias("pow_v"),
        (F.col("p_size") % 7).alias("mod_v"),
        F.signum(F.col("p_retailprice") - 1000.0).cast("int").alias("sign_v"),
        F.round(F.sin("p_size"), 6).alias("sin_v"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(3.0)), 6).alias("atan2_v"),
        F.greatest("p_size", F.lit(25)).alias("greatest_v"),
        F.least("p_size", F.lit(25)).alias("least_v"),
    ).orderBy("p_partkey")


FN_STRING_ORACLE = """
SELECT p_partkey,
       lower(p_name) AS lower_v,
       upper(p_brand) AS upper_v,
       length(p_name) AS len_v,
       substr(p_name, 1, 4) AS substr_v,
       trim('  ' || p_name || ' ') AS trim_v,
       lpad(p_brand, 12, '*') AS lpad_v,
       rpad(p_brand, 12, '#') AS rpad_v,
       replace(p_name, ' ', '_') AS replace_v,
       reverse(p_brand) AS reverse_v,
       concat_ws('|', p_brand, p_type) AS concat_ws_v,
       instr(p_name, 'e') AS instr_v,
       repeat(p_type, 2) AS repeat_v,
       translate(p_name, 'aeiou', 'AEIOU') AS translate_v,
       levenshtein(p_brand, 'Brand#1') AS lev_v,
       left(p_name, 3) AS left_v,
       right(p_name, 3) AS right_v,
       contains(p_name, 'gear') AS contains_v,
       starts_with(p_name, 'small') AS starts_v,
       regexp_extract(p_brand, '#([0-9]+)', 1) AS re_extract_v,
       regexp_replace(p_name, '[aeiou]', '.', 'g') AS re_replace_v
FROM part ORDER BY p_partkey
"""


@register("fn_string", FN_STRING_ORACLE, tags=("functions", "string"))
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression family (FunctionRegistry.scala:312-374)."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lower_v"),
        F.upper("p_brand").alias("upper_v"),
        F.length("p_name").alias("len_v"),
        F.substring("p_name", 1, 4).alias("substr_v"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trim_v"),
        F.lpad("p_brand", 12, "*").alias("lpad_v"),
        F.rpad("p_brand", 12, "#").alias("rpad_v"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("replace_v"),
        F.reverse("p_brand").alias("reverse_v"),
        F.concat_ws("|", "p_brand", "p_type").alias("concat_ws_v"),
        F.instr("p_name", "e").alias("instr_v"),
        F.repeat("p_type", 2).alias("repeat_v"),
        F.translate("p_name", "aeiou", "AEIOU").alias("translate_v"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("lev_v"),
        F.substring("p_name", 1, 3).alias("left_v"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("right_v"),
        F.contains("p_name", F.lit("gear")).alias("contains_v"),
        F.startswith("p_name", F.lit("small")).alias("starts_v"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("re_extract_v"),
        F.regexp_replace("p_name", "[aeiou]", ".").alias("re_replace_v"),
    ).orderBy("p_partkey")


FN_DATETIME_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS year_v,
       month(o_orderdate) AS month_v,
       day(o_orderdate) AS day_v,
       quarter(o_orderdate) AS quarter_v,
       dayofyear(o_orderdate) AS doy_v,
       weekofyear(o_orderdate) AS woy_v,
       date_trunc('month', o_orderdate) AS trunc_month_v,
       date_trunc('week', o_orderdate) AS trunc_week_v,
       o_orderdate + INTERVAL 30 DAY AS plus30_v,
       last_day(o_orderdate) AS last_day_v,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_ts_v,
       strftime(o_orderdate, '%Y-%m-%d') AS fmt_v
FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
"""


@register("fn_datetime", FN_DATETIME_ORACLE, tags=("functions", "datetime"))
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime expression family (FunctionRegistry.scala:375-409).
    Note engine-name drift: Spark unix_timestamp == DuckDB epoch;
    Spark date_format == DuckDB strftime; last_day returns DATE in both...
    cast to timestamp for schema agreement."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("year_v"),
        F.month("o_orderdate").alias("month_v"),
        F.dayofmonth("o_orderdate").alias("day_v"),
        F.quarter("o_orderdate").alias("quarter_v"),
        F.dayofyear("o_orderdate").alias("doy_v"),
        F.weekofyear("o_orderdate").alias("woy_v"),
        F.date_trunc("month", "o_orderdate").alias("trunc_month_v"),
        F.date_trunc("week", "o_orderdate").alias("trunc_week_v"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("plus30_v"),
        F.last_day("o_orderdate").cast("timestamp").alias("last_day_v"),
        F.unix_timestamp("o_orderdate").alias("unix_ts_v"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("fmt_v"),
    ).orderBy("o_orderkey")


FN_COND_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS case_v,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS coalesce_v,
       c_acctbal IS NULL AS isnull_v,
       c_nationkey IN (1, 2, 3) AS in_v,
       (c_acctbal > 0 AND c_nationkey < 10) OR c_mktsegment = 'MACHINERY' AS bool_v,
       if(c_acctbal > 5000, 1, 0) AS if_v,
       round(coalesce(NULLIF(c_acctbal, 0.0), -1.0), 2) AS nvl_v
FROM customer ORDER BY c_custkey
"""


@register("fn_conditional", FN_COND_ORACLE, tags=("functions", "conditional"))
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family (FunctionRegistry.scala:192-216,469-489)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg").when(F.col("c_acctbal") < 5000, "mid").otherwise("high").alias("case_v"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("coalesce_v"),
        F.isnull("c_acctbal").alias("isnull_v"),
        F.col("c_nationkey").isin(1, 2, 3).alias("in_v"),
        (((F.col("c_acctbal") > 0) & (F.col("c_nationkey") < 10)) | (F.col("c_mktsegment") == "MACHINERY")).alias(
            "bool_v"
        ),
        F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("if_v"),
        F.round(F.nvl(F.nullif("c_acctbal", F.lit(0.0)), F.lit(-1.0)), 2).alias("nvl_v"),
    ).orderBy("c_custkey")


FN_JSON_HASH_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k') AS json_k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS json_k_int,
       md5(event_type) AS md5_v,
       sha256(event_type) AS sha256_v
FROM events WHERE event_id % 50 = 0 ORDER BY event_id
"""


@register("fn_json_hash", FN_JSON_HASH_ORACLE, tags=("functions", "json", "hash"))
def fn_json_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + cryptographic hashes (FunctionRegistry.scala:435-452,491-493).
    get_json_object == DuckDB json_extract_string; sha2(x,256) == sha256."""
    t = load_tables(spark, sf_dir)
    e = t["events"].filter(F.col("event_id") % 50 == 0)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("json_k"),
        F.get_json_object("props", "$.k").cast("bigint").alias("json_k_int"),
        F.md5("event_type").alias("md5_v"),
        F.sha2("event_type", 256).alias("sha256_v"),
    ).orderBy("event_id")


FN_ARRAY_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 60), ' '))), ',') AS sorted_prefix_tokens,
       list_contains(string_split(text, ' '), 'spark') AS has_spark
FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id
"""


@register("fn_array", FN_ARRAY_ORACLE, tags=("functions", "array"))
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection family (FunctionRegistry.scala:410-433) + the
    higher-order functions modern Spark adds (2.4 predates transform/filter
    lambdas — free upgrade, SURVEY §2.8 note)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") % 20 == 0)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.array_join(F.array_sort(F.array_distinct(F.split(F.substring("text", 1, 60), " "))), ",").alias(
            "sorted_prefix_tokens"
        ),
        F.array_contains(toks, "spark").alias("has_spark"),
    ).orderBy("doc_id")


FN_HIGHER_ORDER_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tk
  FROM documents WHERE doc_id % 25 = 0
)
SELECT doc_id,
       CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT) AS total_len,
       CAST(len(list_filter(tk, x -> length(x) > 4)) AS BIGINT) AS n_long,
       CAST(list_max(list_transform(tk, x -> length(x))) AS BIGINT) AS max_len,
       CASE WHEN len(list_filter(tk, x -> x = 'spark')) > 0 THEN true ELSE false END AS has_spark,
       len(list_filter(tk, x -> length(x) <= 3)) = len(tk) AS all_short
FROM t ORDER BY doc_id
"""


@register("fn_higher_order", FN_HIGHER_ORDER_ORACLE, tags=("functions", "array", "higher_order"))
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions: transform / filter / aggregate /
    exists / forall (Spark 2.4.0 predates these — the free modern upgrade
    noted in SURVEY §2.8; DuckDB mirrors them as list_* lambdas).
    Two-step projection keeps split() out of the lambdas (see
    operators/dedup.py on CollapseProject)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", F.expr("split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')").alias("tk"))
        .select(
            "doc_id",
            F.expr("CAST(aggregate(transform(tk, x -> length(x)), 0, (acc, v) -> acc + v) AS BIGINT)").alias("total_len"),
            F.expr("CAST(size(filter(tk, x -> length(x) > 4)) AS BIGINT)").alias("n_long"),
            F.expr("CAST(array_max(transform(tk, x -> length(x))) AS BIGINT)").alias("max_len"),
            F.expr("exists(tk, x -> x = 'spark')").alias("has_spark"),
            F.expr("forall(tk, x -> length(x) <= 3)").alias("all_short"),
        )
        .orderBy("doc_id")
    )


FN_WIN_VALUE_ORACLE = """
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price,
       nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_orderkey
"""


@register("win_first_last_nth", FN_WIN_VALUE_ORACLE, tags=("window",))
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an unbounded frame
    (offset-frame processors, reference WindowFunctionFrame.scala:65-350).
    Frame is explicit UNBOUNDED..UNBOUNDED: the SQL-default frame for
    last_value (..CURRENT ROW) is a classic cross-engine trap."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_orderkey")
    )


NULL_SAFE_JOIN_ORACLE = """
WITH a AS (
  SELECT event_id, nullif(user_id % 7, 3) AS k FROM events WHERE event_id < 500
), b AS (
  SELECT nullif(c_custkey % 7, 3) AS k, count(*) AS n_cust
  FROM customer GROUP BY 1
)
SELECT a.event_id, a.k, b.n_cust
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY a.event_id
"""


@register("fn_null_safe_join", NULL_SAFE_JOIN_ORACLE, tags=("functions", "join", "conditional"))
def fn_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality `<=>` (reference registry comparison ops incl.
    EqualNullSafe, SURVEY §2.8): NULL keys MATCH under <=>, unlike `=`.
    The oracle spells it IS NOT DISTINCT FROM. Planner note: <=> still
    hash-partitions (it is an equi-key), so this stays a hash join, not BNLJ."""
    t = load_tables(spark, sf_dir)
    a = (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select("event_id", F.nullif(F.col("user_id") % 7, F.lit(3)).alias("k"))
    )
    b = (
        t["customer"]
        .select(F.nullif(F.col("c_custkey") % 7, F.lit(3)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select("event_id", a["k"].alias("k"), "n_cust")
        .orderBy("event_id")
    )


FN_MAP_ORACLE = """
SELECT p_partkey,
       p_brand AS elem_brand,
       CAST(NULL AS VARCHAR) AS elem_missing,
       2 AS msize,
       'brand,type' AS keys_v,
       p_brand || '|' || p_type AS vals_join,
       CAST(p_size AS VARCHAR) AS sm_a,
       true AS contains_v,
       p_name AS mc_extra
FROM part ORDER BY p_partkey
"""


@register("fn_map", FN_MAP_ORACLE, tags=("functions", "map"))
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map expression family (FunctionRegistry.scala:410-433: map, map_keys,
    map_values, map_entries-adjacent ops, element_at, size, str_to_map at
    :261, map_concat). The oracle computes each expected value directly, so
    the map round-trip itself is what is verified."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    sm = F.str_to_map(
        F.concat(F.lit("a:"), F.col("p_size").cast("string"), F.lit(",b:"), F.col("p_partkey").cast("string")),
        F.lit(","),
        F.lit(":"),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, F.lit("brand")).alias("elem_brand"),
        F.element_at(m, F.lit("nope")).alias("elem_missing"),
        F.size(m).alias("msize"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_v"),
        F.concat_ws("|", F.map_values(m)).alias("vals_join"),
        F.element_at(sm, F.lit("a")).alias("sm_a"),
        F.map_contains_key(m, F.lit("brand")).alias("contains_v"),
        F.element_at(
            F.map_concat(m, F.create_map(F.lit("extra"), F.col("p_name"))), F.lit("extra")
        ).alias("mc_extra"),
    ).orderBy("p_partkey")


FN_URL_ORACLE = """
SELECT p_partkey,
       'https' AS proto_v,
       'shop.example.com' AS host_v,
       '/' || replace(p_type, ' ', '-') || '/item' AS path_v,
       'id=' || p_partkey || '&size=' || p_size AS query_v,
       CAST(p_partkey AS VARCHAR) AS qid_v
FROM part ORDER BY p_partkey
"""


@register("fn_url", FN_URL_ORACLE, tags=("functions", "string", "url"))
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url family (FunctionRegistry.scala string section, ParseUrl
    expression). URLs are built from fixture columns; the oracle recomputes
    each component with plain string ops."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    url = F.concat(
        F.lit("https://shop.example.com/"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("-")),
        F.lit("/item?id="),
        F.col("p_partkey").cast("string"),
        F.lit("&size="),
        F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto_v"),
        F.parse_url(url, F.lit("HOST")).alias("host_v"),
        F.parse_url(url, F.lit("PATH")).alias("path_v"),
        F.parse_url(url, F.lit("QUERY")).alias("query_v"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("qid_v"),
    ).orderBy("p_partkey")


FN_XPATH_ORACLE = """
SELECT p_partkey,
       p_brand AS xs_brand,
       p_size AS xi_size,
       'a,b' AS xl_tags,
       true AS xb_has_brand
FROM part ORDER BY p_partkey
"""


@register("fn_xpath", FN_XPATH_ORACLE, tags=("functions", "xpath"))
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xpath_* family (FunctionRegistry.scala string section, xpath
    expressions). XML docs are assembled from fixture columns; the oracle
    recomputes the extracted values directly."""
    t = load_tables(spark, sf_dir)
    p = t["part"].withColumn(
        "xml",
        F.concat(
            F.lit("<item><brand>"),
            F.col("p_brand"),
            F.lit("</brand><size>"),
            F.col("p_size").cast("string"),
            F.lit("</size><tags><t>a</t><t>b</t></tags></item>"),
        ),
    )
    return p.select(
        "p_partkey",
        F.xpath_string("xml", F.lit("item/brand")).alias("xs_brand"),
        F.xpath_int("xml", F.lit("item/size")).alias("xi_size"),
        F.array_join(F.xpath("xml", F.lit("item/tags/t/text()")), ",").alias("xl_tags"),
        F.xpath_boolean("xml", F.lit("item/brand")).alias("xb_has_brand"),
    ).orderBy("p_partkey")


FN_BITWISE_ORACLE = """
SELECT p_partkey,
       hex(p_partkey) AS hex_v,
       bin(CAST(p_partkey AS BIGINT)) AS bin_v,
       p_size << 2 AS shl_v,
       p_partkey >> 1 AS shr_v,
       p_size & 5 AS band_v,
       p_size | 9 AS bor_v,
       xor(p_size, 3) AS bxor_v,
       bit_count(p_size) AS bcount_v,
       ~p_size AS bnot_v
FROM part ORDER BY p_partkey
"""


@register("fn_bitwise", FN_BITWISE_ORACLE, tags=("functions", "math", "bitwise"))
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise / base-conversion family (FunctionRegistry.scala:217-270:
    hex, bin, shiftleft/shiftright, and/or/xor/not, bit_count)."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    return p.select(
        "p_partkey",
        F.hex("p_partkey").alias("hex_v"),
        F.bin("p_partkey").alias("bin_v"),
        F.shiftleft("p_size", 2).alias("shl_v"),
        F.shiftright("p_partkey", 1).alias("shr_v"),
        F.col("p_size").bitwiseAND(F.lit(5)).alias("band_v"),
        F.col("p_size").bitwiseOR(F.lit(9)).alias("bor_v"),
        F.col("p_size").bitwiseXOR(F.lit(3)).alias("bxor_v"),
        F.bit_count("p_size").alias("bcount_v"),
        F.bitwise_not(F.col("p_size")).alias("bnot_v"),
    ).orderBy("p_partkey")


FN_DATETIME_ARITH_ORACLE = """
SELECT o_orderkey,
       o_orderdate + INTERVAL 3 MONTH AS addm_v,
       date_diff('month', date_trunc('month', o_orderdate),
                 date_trunc('month', o_orderdate + INTERVAL 100 DAY)) AS mbetween_v,
       o_orderdate + (CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                           ELSE (8 - isodow(o_orderdate)) % 7 END) * INTERVAL 1 DAY
           AS next_mon_v,
       date_diff('day', DATE '1995-01-01', o_orderdate) AS ddiff_v,
       CAST(make_date(2024, month(o_orderdate), 1) AS TIMESTAMP) AS mk_v,
       dayofweek(o_orderdate) + 1 AS dow_v,
       isodow(o_orderdate) - 1 AS weekday_v
FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
"""


@register("fn_datetime_arith", FN_DATETIME_ARITH_ORACLE, tags=("functions", "datetime"))
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime arithmetic family (FunctionRegistry.scala:375-409:
    add_months, months_between, next_day, datediff, make_date, dayofweek,
    weekday). Cross-engine notes: DuckDB interval constants compare with
    1 month == 30 days, so `INTERVAL 3 MONTH` and `INTERVAL 90 DAY` in one
    query are deduplicated into ONE constant (v1.0.0) — hence +100 days
    here; months_between is fractional in Spark, so
    it is applied to month-truncated dates where it is integral and equals
    DuckDB date_diff('month'); next_day (strictly-after semantics) is
    spelled as an isodow offset in the oracle; Spark dayofweek is 1=Sunday
    vs DuckDB 0=Sunday."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("addm_v"),
        F.months_between(
            F.date_trunc("month", F.date_add("o_orderdate", 100)),
            F.date_trunc("month", F.col("o_orderdate")),
        ).cast("bigint").alias("mbetween_v"),
        F.next_day("o_orderdate", "Monday").cast("timestamp").alias("next_mon_v"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias("ddiff_v"),
        F.make_date(F.lit(2024), F.month("o_orderdate"), F.lit(1)).cast("timestamp").alias("mk_v"),
        F.dayofweek("o_orderdate").alias("dow_v"),
        F.weekday("o_orderdate").alias("weekday_v"),
    ).orderBy("o_orderkey")


FN_ARRAY_OPS_ORACLE = """
SELECT p_partkey,
       array_to_string([sz + 2], ',') AS inter_v,
       array_to_string(list_sort(list_distinct([sz, sz + 1, sz + 2, sz + 4])), ',') AS union_v,
       array_to_string([sz, sz + 1], ',') AS except_v,
       true AS overlap_v,
       array_to_string([sz + 1, sz + 2], ',') AS slice_v,
       array_to_string(generate_series(sz, sz + 3), ',') AS seq_v,
       array_to_string([sz, sz + 1, sz + 2, sz + 2, sz + 4], ',') AS flat_v,
       array_to_string(list_transform([sz, sz + 1, sz + 2], x -> 2 * x), ',') AS zip_v,
       2 AS pos_v,
       sz AS min_v,
       sz + 4 AS max_v,
       array_to_string([sz, sz], ',') AS repeat_v
FROM (SELECT p_partkey, CAST(p_size AS BIGINT) AS sz FROM part)
ORDER BY p_partkey
"""


@register("fn_array_ops", FN_ARRAY_OPS_ORACLE, tags=("functions", "array"))
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set/positional operations (FunctionRegistry.scala:410-433:
    array_intersect/union/except, arrays_overlap, slice, sequence, flatten,
    array_position/min/max/repeat; zip_with as the post-2.4 lambda upgrade).
    Arrays are built from fixture ints so every expected value is
    deterministic; the oracle computes each result directly. Array results
    are emitted as joined strings: raw array columns round-trip through
    pandas as list-vs-numpy depending on the session's Arrow setting, which
    breaks engine-neutral comparison (observed under a vanilla session)."""
    t = load_tables(spark, sf_dir)
    p = t["part"].select("p_partkey", F.col("p_size").cast("bigint").alias("sz"))
    a = F.array(F.col("sz"), F.col("sz") + 1, F.col("sz") + 2)
    b = F.array(F.col("sz") + 2, F.col("sz") + 4)
    return p.select(
        "p_partkey",
        F.array_join(F.array_intersect(a, b), ",").alias("inter_v"),
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("union_v"),
        F.array_join(F.array_except(a, b), ",").alias("except_v"),
        F.arrays_overlap(a, b).alias("overlap_v"),
        F.array_join(F.slice(a, 2, 2), ",").alias("slice_v"),
        F.array_join(F.sequence(F.col("sz"), F.col("sz") + 3), ",").alias("seq_v"),
        F.array_join(F.flatten(F.array(a, b)), ",").alias("flat_v"),
        F.array_join(F.zip_with(a, a, lambda x, y: x + y), ",").alias("zip_v"),
        F.array_position(a, F.col("sz") + 1).alias("pos_v"),
        F.array_min(a).alias("min_v"),
        F.array_max(b).alias("max_v"),
        F.array_join(F.array_repeat(F.col("sz"), 2), ",").alias("repeat_v"),
    ).orderBy("p_partkey")


FN_TRY_ARITH_ORACLE = """
SELECT p_partkey,
       CAST(NULL AS BIGINT) AS add_of_v,
       CAST(p_size AS BIGINT) + 1 AS add_ok_v,
       CAST(NULL AS DOUBLE) AS div0_v,
       CAST(p_size AS DOUBLE) / 4 AS div_ok_v,
       CAST(NULL AS BIGINT) AS mul_of_v,
       CAST(NULL AS INTEGER) AS elem_oob_v
FROM part ORDER BY p_partkey
"""


@register("fn_try_arith", FN_TRY_ARITH_ORACLE, tags=("functions", "math", "ansi"))
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* error-safe arithmetic (the modern, explicit face of the
    reference's 2.4 silent-overflow cast semantics, SURVEY §7 hard-parts
    note): overflow, divide-by-zero, and out-of-bounds element access
    return NULL instead of failing — per-value expected results in the
    oracle."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    big = F.lit(9223372036854775807).cast("bigint")
    return p.select(
        "p_partkey",
        F.try_add(big, F.lit(1).cast("bigint")).alias("add_of_v"),
        F.try_add(F.col("p_size").cast("bigint"), F.lit(1).cast("bigint")).alias("add_ok_v"),
        F.try_divide(F.col("p_size").cast("double"), F.lit(0.0)).alias("div0_v"),
        F.try_divide(F.col("p_size").cast("double"), F.lit(4.0)).alias("div_ok_v"),
        F.try_multiply(big, F.lit(3).cast("bigint")).alias("mul_of_v"),
        F.try_element_at(F.array(F.col("p_size")), F.lit(99)).alias("elem_oob_v"),
    ).orderBy("p_partkey")


FN_JSON_STRUCT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS from_json_k,
       '{"et":"' || event_type || '","v":' || round(value, 2) || '}' AS to_json_v,
       json_extract_string(props, '$.k') AS tuple_k,
       'STRUCT<k: BIGINT>' AS schema_v,
       CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS variant_k2
FROM events WHERE event_id % 50 = 0 ORDER BY event_id
"""


@register("fn_json_struct", FN_JSON_STRUCT_ORACLE, tags=("functions", "json"))
def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured JSON family (FunctionRegistry.scala:491-493: from_json,
    to_json, json_tuple, schema_of_json) plus the Spark-4 VARIANT path
    (parse_json + variant_get) — the modern semi-structured column type the
    reference era handled as strings. The oracle recomputes each value with
    DuckDB's json functions."""
    t = load_tables(spark, sf_dir)
    e = t["events"].filter(F.col("event_id") % 50 == 0)
    return e.select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("from_json_k"),
        F.to_json(
            F.struct(
                F.col("event_type").alias("et"), F.round("value", 2).alias("v")
            )
        ).alias("to_json_v"),
        F.json_tuple("props", "k").alias("tuple_k"),
        F.schema_of_json(F.lit('{"k": 1}')).alias("schema_v"),
        (
            F.try_variant_get(F.parse_json("props"), "$.k", "bigint") * 2
        ).alias("variant_k2"),
    ).orderBy("event_id")


FN_STRING_MISC_ORACLE = """
SELECT p_partkey,
       ascii(p_name) AS ascii_v,
       chr(65 + (p_size % 26)) AS chr_v,
       base64(encode(p_brand)) AS b64_v,
       p_brand AS b64_rt_v,
       bit_length(p_name) AS bitlen_v,
       strlen(p_name) AS octlen_v,
       array_to_string(list_transform(string_split(lower(p_type), ' '),
                       x -> upper(x[1:1]) || x[2:]), ' ') AS initcap_v,
       array_to_string(string_split(p_type, ' ')[1:2], ' ') AS subidx_v,
       substr(p_brand, 1, 1) || 'XX' || substr(p_brand, 4) AS overlay_v,
       format('{:,}', p_partkey * 1000 + p_size) AS fmtnum_v,
       repeat(' ', 3) || p_brand AS space_v,
       p_brand AS elt_v
FROM part ORDER BY p_partkey
"""


@register("fn_string_misc", FN_STRING_MISC_ORACLE, tags=("functions", "string"))
def fn_string_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family (FunctionRegistry.scala:312-374: ascii, chr,
    base64/unbase64 round-trip, bit/octet_length, initcap, substring_index,
    overlay, format_number, space, elt). DuckDB lacks initcap and
    substring_index — the oracle emulates them with split/transform."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    return p.select(
        "p_partkey",
        F.ascii("p_name").alias("ascii_v"),
        F.char(F.lit(65) + F.col("p_size") % 26).alias("chr_v"),
        F.base64(F.col("p_brand").cast("binary")).alias("b64_v"),
        F.unbase64(F.base64(F.col("p_brand").cast("binary"))).cast("string").alias("b64_rt_v"),
        F.bit_length("p_name").alias("bitlen_v"),
        F.octet_length("p_name").alias("octlen_v"),
        F.initcap(F.lower("p_type")).alias("initcap_v"),
        F.substring_index("p_type", " ", 2).alias("subidx_v"),
        F.overlay("p_brand", F.lit("XX"), 2).alias("overlay_v"),
        F.format_number(F.col("p_partkey") * 1000 + F.col("p_size"), 0).alias("fmtnum_v"),
        F.concat(F.expr("space(3)"), F.col("p_brand")).alias("space_v"),
        F.expr("elt(2, 'zz', p_brand)").alias("elt_v"),
    ).orderBy("p_partkey")


FN_REGEXP_ORACLE = """
SELECT p_partkey,
       len(regexp_extract_all(p_name, '[aeiou]+')) AS re_count_v,
       CASE WHEN regexp_extract(p_name, '[0-9]+') = '' THEN ''
            ELSE regexp_extract(p_name, '[0-9]+') END AS re_substr_v,
       regexp_matches(p_name, 'ee|oo') AS rlike_v,
       array_to_string(regexp_extract_all(p_brand, '[0-9]'), '') AS re_all_v,
       strpos(p_name, regexp_extract(p_name, '[aeiou]')) AS re_instr_v
FROM part ORDER BY p_partkey
"""


@register("fn_regexp", FN_REGEXP_ORACLE, tags=("functions", "string", "regexp"))
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern regexp family (regexp_count, regexp_substr, rlike,
    regexp_extract_all, regexp_instr — Spark 3.4+ additions over the
    reference's regexp_extract/replace/like registry section). DuckDB
    spells some differently (regexp_matches, len(regexp_extract_all),
    strpos emulation for instr)."""
    t = load_tables(spark, sf_dir)
    p = t["part"]
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]+")).alias("re_count_v"),
        F.coalesce(F.regexp_substr("p_name", F.lit("[0-9]+")), F.lit("")).alias("re_substr_v"),
        F.col("p_name").rlike("ee|oo").alias("rlike_v"),
        F.array_join(F.regexp_extract_all("p_brand", F.lit("[0-9]"), 0), "").alias("re_all_v"),
        F.regexp_instr("p_name", F.lit("[aeiou]")).alias("re_instr_v"),
    ).orderBy("p_partkey")


FN_SCALAR_EXTRA_ORACLE = """
SELECT p_partkey,
       list_position(string_split('STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO', ','),
                     string_split(p_type, ' ')[1]) AS fis_v,
       lower(to_hex(p_partkey)) AS conv_hex_v,
       CAST(factorial(CAST(p_partkey % 10 AS INT)) AS BIGINT) AS fact_v,
       round(sqrt(p_retailprice * p_retailprice + 9.0), 6) AS hypot_v,
       round(degrees(p_retailprice / 1000.0), 6) AS degrees_v,
       round(radians(p_retailprice / 10.0), 6) AS radians_v,
       instr(p_name, 'a') AS locate_v
FROM part
ORDER BY p_partkey
"""


@register("fn_scalar_extra", FN_SCALAR_EXTRA_ORACLE, tags=("functions",))
def fn_scalar_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function stragglers with cross-engine oracles: find_in_set
    (registry :332), conv base-10->16 (:219), factorial (:230), hypot
    (:237; oracle emulates via sqrt(a^2+b^2) — algebraically equal, rounded
    at 6 because hypot's overflow-safe algorithm differs in the last ulp),
    degrees/radians (:226-227), locate (:345). Engine-local functions with
    no DuckDB analog (soundex, sentences, crc32, bround, rint, reflect,
    width_bucket) are pinned in tests/test_functions_misc.py instead."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .select(
            "p_partkey",
            F.expr(
                "find_in_set(split(p_type, ' ')[0], 'STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO')"
            ).cast("int").alias("fis_v"),
            F.lower(F.conv(F.col("p_partkey").cast("string"), 10, 16)).alias("conv_hex_v"),
            F.factorial((F.col("p_partkey") % 10).cast("int")).cast("bigint").alias("fact_v"),
            F.round(F.hypot(F.col("p_retailprice"), F.lit(3.0)), 6).alias("hypot_v"),
            F.round(F.degrees(F.col("p_retailprice") / 1000.0), 6).alias("degrees_v"),
            F.round(F.radians(F.col("p_retailprice") / 10.0), 6).alias("radians_v"),
            F.locate("a", F.col("p_name")).cast("int").alias("locate_v"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Spark 4 bitmap aggregate family: bitmap_bucket_number / bitmap_bit_position
# / bitmap_construct_agg / bitmap_count — the roaring-bitmap-style exact
# distinct-count primitive (the mergeable exact path next to HLL's
# approximate one). Oracle mirrors the documented bucket arithmetic.
# ---------------------------------------------------------------------------

# Non-positive keys follow Spark's TRUNCATING div/mod (probed on literal
# keys, pinned in tests/test_r8_wave1_ops.py): bucket = trunc(x / 32768) =
# -((-x) // 32768), position = (-x) % 32768 — NOT the "bucket 0, position
# |x|" shorthand the r7 oracle claimed, which agrees only on (-32768, 0]
# and silently diverges below (r7 ADVICE item 3; the fixture's o_orderkey
# >= 0 never exercised the branch, so the wave test pins it on literals).
FN_BITMAP_ORACLE = """
SELECT CASE WHEN o_orderkey >= 1 THEN (o_orderkey - 1) // 32768 + 1
            ELSE -((-o_orderkey) // 32768) END AS bucket,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT CASE WHEN o_orderkey >= 1 THEN (o_orderkey - 1) % 32768
                           ELSE (-o_orderkey) % 32768 END)::BIGINT AS n_distinct_positions
FROM orders
GROUP BY 1 ORDER BY bucket
"""


@register("fn_bitmap", FN_BITMAP_ORACLE, tags=("functions", "bitmap", "spark4"))
def fn_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 bitmap function family over the order keys:
    bitmap_bucket_number shards the key space into 32768-bit buckets,
    bitmap_bit_position places each key in its bucket, and
    bitmap_count(bitmap_construct_agg(...)) counts distinct positions per
    bucket EXACTLY from the packed bitmap — the mergeable exact
    distinct-count layout (per-bucket bitmaps OR together across
    partitions/days, cf. sketch_bitmap_distinct for the applied form).
    The oracle mirrors the bucket arithmetic ((x-1) div 32768 + 1 /
    (x-1) mod 32768 for positive keys; non-positives use truncating
    div/mod — bucket trunc(x/32768), position (-x) mod 32768 — probed
    against Spark's actual edge behavior on literal negative keys and
    pinned in tests/test_r8_wave1_ops.py) with a plain COUNT DISTINCT, so
    the bitmap path's exactness is value-verified, not assumed.

    Scale shape: one hash-agg keyed on the bucket; each group's state is
    a fixed 4 KB bitmap regardless of row count — the property that makes
    the exact path viable at 100 TB where a count-distinct state would
    grow with cardinality."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            F.expr("bitmap_bucket_number(o_orderkey)").alias("bucket"),
            F.expr("bitmap_bit_position(o_orderkey)").alias("pos"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bitmap_count(bitmap_construct_agg(pos))").cast("long").alias("n_distinct_positions"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Spark 4 VARIANT type: parse_json / variant_get / try_variant_get /
# schema_of_variant / is_variant_null — the open semi-structured column
# type (shredded binary JSON). The query round-trips typed row data
# through JSON text into VARIANT and extracts it back with typed paths;
# the oracle computes every expected value directly from the base
# columns, so the round-trip's losslessness is value-verified.
# ---------------------------------------------------------------------------

FN_VARIANT_ORACLE = """
SELECT o_orderkey,
       o_orderkey AS v_key,
       o_custkey AS v_nested_cust,
       o_orderpriority AS v_tag1,
       CAST(round(o_totalprice * 100) AS BIGINT) AS v_cents,
       CAST(NULL AS VARCHAR) AS v_missing,
       CAST(NULL AS BIGINT) AS v_badcast,
       (o_orderkey % 3 = 0) AS v_is_null,
       'OBJECT<cents: BIGINT, k: BIGINT, maybe: ' ||
         CASE WHEN o_orderkey % 3 = 0 THEN 'VOID' ELSE 'BIGINT' END ||
         ', nested: OBJECT<c: BIGINT>, tags: ARRAY<STRING>>' AS v_schema
FROM orders
ORDER BY o_orderkey
"""


@register("fn_variant", FN_VARIANT_ORACLE, tags=("functions", "variant", "spark4"))
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT family: each order row is serialized to JSON text
    (to_json over a nested struct), parsed into a VARIANT with parse_json,
    and read back through TYPED paths — variant_get for scalar/array/
    nested-object access, try_variant_get returning NULL on an impossible
    cast (priority string as BIGINT) instead of raising, is_variant_null
    distinguishing a JSON null VALUE from an absent path, and
    schema_of_variant reporting the per-row inferred shape (VOID where the
    value is a JSON null). The oracle computes every expected value from
    the base columns, so the text -> VARIANT -> typed-value round trip is
    verified lossless; money rides as BIGINT cents (a JSON double would
    re-enter the cross-engine float minefield for nothing).

    Scale shape: pure per-row projection — whole-stage codegen, no
    shuffle; VARIANT's binary encoding is exactly the shredded-JSON
    layout a 100 TB semi-structured column wants (parse once, push typed
    paths down instead of re-parsing text per query)."""
    t = load_tables(spark, sf_dir)
    v = t["orders"].select(
        "o_orderkey",
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"),
                    F.struct(F.col("o_custkey").alias("c")).alias("nested"),
                    F.array(F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tags"),
                    F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
                    F.when(F.col("o_orderkey") % 3 != 0, F.col("o_orderkey")).alias("maybe"),
                ),
                # keep the JSON null VALUE in the text (to_json drops null
                # fields by default, which would turn the is_variant_null
                # probe into an absent-path probe)
                {"ignoreNullFields": "false"},
            )
        ).alias("v"),
    )
    return v.select(
        "o_orderkey",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("v_key"),
        F.expr("variant_get(v, '$.nested.c', 'bigint')").alias("v_nested_cust"),
        F.expr("variant_get(v, '$.tags[1]', 'string')").alias("v_tag1"),
        F.expr("variant_get(v, '$.cents', 'bigint')").alias("v_cents"),
        F.expr("variant_get(v, '$.absent', 'string')").alias("v_missing"),
        F.expr("try_variant_get(v, '$.tags[1]', 'bigint')").alias("v_badcast"),
        F.expr("is_variant_null(variant_get(v, '$.maybe'))").alias("v_is_null"),
        F.expr("schema_of_variant(v)").alias("v_schema"),
    ).orderBy("o_orderkey")
