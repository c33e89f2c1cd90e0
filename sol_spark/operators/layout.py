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
