"""Data-layout operators: multi-dimensional clustering (Z-order) for
file-skipping at scale.

At 100 TB, scan cost is dominated by how many files a filter must open.
Range-partitioning by ONE key gives perfect skipping on that key and none on
any other; interleaving the bits of two keys (Morton / Z-order curve) gives
~sqrt skipping on BOTH — the technique behind Delta/Iceberg OPTIMIZE ZORDER,
here as a plain column expression + repartitionByRange, no table format
needed. The curve value is pure integer arithmetic (div/mod/×), identical in
Spark and DuckDB, so the mapping itself is oracle-verifiable row-by-row;
the file-skipping effect is asserted by tests/test_plans.py with
input_file_name() over a box query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sol_spark.registry import register
from sol_spark.tables import load_tables

Z_BITS = 16  # bits per dimension -> 32-bit curve value


def _interleave_terms(x: str, y: str) -> str:
    """SQL for the Morton value of (x, y): bit i of x lands at position 2i,
    bit i of y at 2i+1. Written with div/mod/multiply only — no shift
    operators — so the SAME string is valid Spark SQL and DuckDB SQL."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_expr(x_sql: str, y_sql: str) -> Column:
    """Morton curve value for two non-negative integer SQL expressions
    (low 16 bits of each), as a Spark Column."""
    spark_sql = _interleave_terms(
        f"(({x_sql}) % {1 << Z_BITS})", f"(({y_sql}) % {1 << Z_BITS})"
    ).replace("//", " div ")
    return F.expr(spark_sql)


LAYOUT_ZORDER_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       {_interleave_terms(f"(l_partkey % {1 << Z_BITS})", f"(l_suppkey % {1 << Z_BITS})")} AS zval
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("layout_zorder", LAYOUT_ZORDER_ORACLE, tags=("layout", "scale"))
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order curve value per lineitem row over (l_partkey, l_suppkey):
    the write path is `df.repartitionByRange(N, zval).sortWithinPartitions
    (zval).write...` — each output file then covers a compact rectangle in
    (partkey, suppkey) space and parquet min/max stats skip files for
    filters on EITHER key. The expression is 64 div/mod terms, fully
    codegen'd; zero shuffle in this query (the shuffle belongs to the
    write's repartitionByRange, costed once at layout time and amortized
    over every subsequent scan)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            zorder_expr("l_partkey", "l_suppkey").alias("zval"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Zone-map skipping audit: measured file-skipping under three layouts
# ---------------------------------------------------------------------------

AUDIT_FILES = 64          # logical files per layout (ntile buckets)
BOX_PK_LO, BOX_PK_HI = 0, 49   # box predicate: l_partkey in [0, 49]
BOX_SK_LO, BOX_SK_HI = 0, 4    # and l_suppkey in [0, 4]

_ZV = _interleave_terms(f"(l_partkey % {1 << Z_BITS})", f"(l_suppkey % {1 << Z_BITS})")

LAYOUT_SKIPPING_ORACLE = f"""
WITH base AS MATERIALIZED (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, {_ZV} AS zval
  FROM lineitem
), laid AS (
  SELECT 'natural' AS layout,
         ntile({AUDIT_FILES}) OVER (ORDER BY l_orderkey, l_linenumber) AS f,
         l_partkey, l_suppkey
  FROM base
  UNION ALL
  SELECT 'linear_partkey',
         ntile({AUDIT_FILES}) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber),
         l_partkey, l_suppkey
  FROM base
  UNION ALL
  SELECT 'zorder',
         ntile({AUDIT_FILES}) OVER (ORDER BY zval, l_orderkey, l_linenumber),
         l_partkey, l_suppkey
  FROM base
), zone AS (
  SELECT layout, f, count(*) AS n_rows,
         min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
         min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi,
         sum(CASE WHEN l_partkey BETWEEN {BOX_PK_LO} AND {BOX_PK_HI}
                   AND l_suppkey BETWEEN {BOX_SK_LO} AND {BOX_SK_HI}
                  THEN 1 ELSE 0 END) AS n_match,
         sum(CASE WHEN l_suppkey BETWEEN {BOX_SK_LO} AND {BOX_SK_HI}
                  THEN 1 ELSE 0 END) AS n_match_sk
  FROM laid GROUP BY layout, f
), graded AS (
  SELECT 'box_both_keys' AS predicate, layout, n_rows,
         n_match,
         CASE WHEN pk_lo <= {BOX_PK_HI} AND pk_hi >= {BOX_PK_LO}
               AND sk_lo <= {BOX_SK_HI} AND sk_hi >= {BOX_SK_LO}
              THEN 1 ELSE 0 END AS must_read
  FROM zone
  UNION ALL
  SELECT 'suppkey_only', layout, n_rows,
         n_match_sk,
         CASE WHEN sk_lo <= {BOX_SK_HI} AND sk_hi >= {BOX_SK_LO}
              THEN 1 ELSE 0 END
  FROM zone
)
SELECT predicate, layout,
       count(*) AS n_files,
       (sum(must_read))::BIGINT AS files_read,
       ((10000 * (count(*) - sum(must_read))) // count(*))::BIGINT AS skip_bp,
       (sum(CASE WHEN must_read = 1 THEN n_rows ELSE 0 END))::BIGINT AS rows_scanned,
       (sum(n_match))::BIGINT AS rows_matched
FROM graded GROUP BY predicate, layout ORDER BY predicate, layout
"""


@register("layout_skipping_audit", LAYOUT_SKIPPING_ORACLE, tags=("layout", "scale"))
def layout_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured zone-map effectiveness: the same lineitem rows are laid
    out three ways — natural (orderkey) order, linear sort by l_partkey,
    and the Z-order curve — cut into {AUDIT_FILES} equal logical files
    (ntile), and a two-dimensional box predicate is graded against each
    file's min/max stats exactly the way a parquet reader prunes
    row-groups: a file is read iff its [min, max] envelope on BOTH keys
    overlaps the box. The output is the skipping scorecard (files read,
    skip %, rows scanned vs rows actually matching) that justifies
    layout_zorder's write cost: linear sort skips near-perfectly on its
    own key and not at all on the other; Z-order skips ~sqrt on both;
    natural order skips nothing. This is the audit a table owner runs
    BEFORE an OPTIMIZE ZORDER, on a sample, to price the rewrite.

    Scale shape: one scan builds all three layouts via ntile windows
    (the audit's global sorts stand in for the write-path
    repartitionByRange, costed once); zone stats and grading are two
    hash aggregates over |files| rows. Nothing here depends on corpus
    width — at 100 TB the same audit runs on a 0.1% sample with the
    real file size as the bucket width."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    base = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        zorder_expr("l_partkey", "l_suppkey").alias("zval"),
    )
    layouts = {
        "natural": ["l_orderkey", "l_linenumber"],
        "linear_partkey": ["l_partkey", "l_orderkey", "l_linenumber"],
        "zorder": ["zval", "l_orderkey", "l_linenumber"],
    }
    laid = None
    for name, order in layouts.items():
        part = base.select(
            F.lit(name).alias("layout"),
            F.ntile(AUDIT_FILES).over(W.orderBy(*order)).alias("f"),
            "l_partkey", "l_suppkey",
        )
        laid = part if laid is None else laid.unionByName(part)
    in_box = (
        F.col("l_partkey").between(BOX_PK_LO, BOX_PK_HI)
        & F.col("l_suppkey").between(BOX_SK_LO, BOX_SK_HI)
    )
    in_sk = F.col("l_suppkey").between(BOX_SK_LO, BOX_SK_HI)
    zone = laid.groupBy("layout", "f").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("pk_lo"), F.max("l_partkey").alias("pk_hi"),
        F.min("l_suppkey").alias("sk_lo"), F.max("l_suppkey").alias("sk_hi"),
        F.sum(F.when(in_box, 1).otherwise(0)).alias("n_match"),
        F.sum(F.when(in_sk, 1).otherwise(0)).alias("n_match_sk"),
    )
    sk_overlap = (F.col("sk_lo") <= BOX_SK_HI) & (F.col("sk_hi") >= BOX_SK_LO)
    pk_overlap = (F.col("pk_lo") <= BOX_PK_HI) & (F.col("pk_hi") >= BOX_PK_LO)
    graded = zone.select(
        F.lit("box_both_keys").alias("predicate"), "layout", "n_rows",
        F.col("n_match").alias("n_match"),
        F.when(pk_overlap & sk_overlap, 1).otherwise(0).alias("must_read"),
    ).unionByName(
        zone.select(
            F.lit("suppkey_only").alias("predicate"), "layout", "n_rows",
            F.col("n_match_sk").alias("n_match"),
            F.when(sk_overlap, 1).otherwise(0).alias("must_read"),
        )
    )
    return (
        graded.groupBy("predicate", "layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("must_read").cast("long").alias("files_read"),
            F.expr("(10000 * (count(*) - sum(must_read))) div count(*)").cast("long").alias("skip_bp"),
            F.sum(F.when(F.col("must_read") == 1, F.col("n_rows")).otherwise(0)).cast("long").alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        )
        .orderBy("predicate", "layout")
    )
