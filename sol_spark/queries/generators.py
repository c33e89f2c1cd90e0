"""Table-generating (lateral-view) operators: explode / posexplode / stack.

Reference: GenerateExec
(/root/reference/sql/core/src/main/scala/org/apache/spark/sql/execution/GenerateExec.scala:58);
function registrations at
/root/reference/sql/catalyst/src/main/scala/org/apache/spark/sql/catalyst/analysis/FunctionRegistry.scala:194-212.

Scale: generators are narrow (no shuffle) — each input row expands in place
inside the same whole-stage-codegen'd task, so fan-out cost is linear and
partition-local. The oracles bound output with key filters, not samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sol_spark.registry import register
from sol_spark.tables import load_tables

POSEXPLODE_ORACLE = """
SELECT doc_id, i AS pos, toks[i + 1] AS tok
FROM (
  SELECT doc_id, toks, unnest(range(len(toks))) AS i
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents WHERE doc_id < 50) d
) s
ORDER BY doc_id, pos
"""


@register("gen_posexplode_tokens", POSEXPLODE_ORACLE, tags=("generator",))
def gen_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode == LATERAL VIEW with ordinality: token stream with stable
    positions (the tokenization primitive every text pipeline starts with)."""
    t = load_tables(spark, sf_dir)
    toks = F.split(F.expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), " ")
    return (
        t["documents"]
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


STACK_ORACLE = """
SELECT l_orderkey, l_linenumber, metric, val
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
) u
WHERE l_orderkey < 300
ORDER BY l_orderkey, l_linenumber, metric
"""


@register("gen_stack_unpivot", STACK_ORACLE, tags=("generator",))
def gen_stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, ...) == UNPIVOT: wide metrics to long (orderkey, metric, val)
    rows. Spark plans one Generate over the row — a single scan, vs the
    oracle's 3-scan UNION ALL formulation."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, 'discount', l_discount) AS (metric, val)"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


EXPLODE_AGG_ORACLE = """
WITH toks AS (
  SELECT doc_id, u.tok
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents) d,
       unnest(d.toks) AS u(tok)
)
SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs
FROM toks
GROUP BY tok
HAVING count(*) >= 100
ORDER BY tok
"""


@register("gen_explode_wordcount", EXPLODE_AGG_ORACLE, tags=("generator", "agg"))
def gen_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical explode -> groupBy wordcount (corpus vocabulary with
    document frequency). Generate is partition-local; the single shuffle is
    the final hash-aggregate on token."""
    t = load_tables(spark, sf_dir)
    toks = F.split(F.expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), " ")
    return (
        t["documents"]
        .select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n") >= 100)
        .orderBy("tok")
    )


UNPIVOT_API_ORACLE = """
SELECT c_custkey, metric, val
FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey', c_nationkey::DOUBLE FROM customer
) u
WHERE c_custkey < 200
ORDER BY c_custkey, metric
"""


@register("gen_unpivot_api", UNPIVOT_API_ORACLE, tags=("generator",))
def gen_unpivot_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.unpivot (melt) — the API twin of the stack() generator
    (same Expand-based physical plan, reference ExpandExec.scala:37)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 200)
        .withColumn("nationkey", F.col("c_nationkey").cast("double"))
        .withColumnRenamed("c_acctbal", "acctbal")
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .orderBy("c_custkey", "metric")
    )


INLINE_ORACLE = """
SELECT p_partkey, u.s.k AS k, u.s.v AS v
FROM (
  SELECT p_partkey,
         [{'k': 'size', 'v': p_size}, {'k': 'mod7', 'v': p_partkey % 7}] AS arr
  FROM part WHERE p_partkey <= 500
), unnest(arr) AS u(s)
ORDER BY p_partkey, k
"""


@register("gen_inline", INLINE_ORACLE, tags=("generator",))
def gen_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array<struct>) generator (reference GenerateExec.scala:58;
    registry :199) — explodes an array of structs into columns directly,
    one row per struct, no intermediate map."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.expr(
                "inline(array("
                "named_struct('k', 'size', 'v', p_size), "
                "named_struct('k', 'mod7', 'v', p_partkey % 7)))"
            ),
        )
        .orderBy("p_partkey", "k")
    )


# ---------------------------------------------------------------------------
# variant_explode — the Spark 4 VARIANT-side generator (the lateral TVF
# that unnests a semi-structured value into (pos, key, value) rows),
# completing the VARIANT surface next to fn_variant's scalar paths.
# ---------------------------------------------------------------------------

GEN_VARIANT_EXPLODE_ORACLE = """
WITH n AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 50 = 0
)
SELECT o_orderkey, pos, key, val FROM (
  SELECT o_orderkey, 0 AS pos, 'cents' AS key,
         CAST(round(o_totalprice * 100) AS BIGINT)::VARCHAR AS val
  FROM orders WHERE o_orderkey % 50 = 0
  UNION ALL
  SELECT o_orderkey, 1, 'k', o_orderkey::VARCHAR FROM orders WHERE o_orderkey % 50 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'tags',
         '["' || o_orderstatus || '","' || o_orderpriority || '"]'
  FROM orders WHERE o_orderkey % 50 = 0
) u
ORDER BY o_orderkey, pos
"""


@register("gen_variant_explode", GEN_VARIANT_EXPLODE_ORACLE, tags=("functions", "variant", "generator", "spark4"))
def gen_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 variant_explode: each order row serializes to JSON, parses
    into a VARIANT, and the LATERAL TVF unnests the object into
    (pos, key, value) rows — object keys come back in lexicographic
    binary-encoding order (cents, k, tags), values re-serialized with
    to_json for a type-stable string column. The oracle constructs the
    expected exploded rows directly from the base columns, so the
    VARIANT encode -> explode -> decode path is verified lossless,
    including the canonical JSON rendering of the nested array.

    Scale shape: a generator over a per-row ternary object — GenerateExec
    fan-out 3x, no shuffle, codegen'd serialization."""
    t = load_tables(spark, sf_dir)
    t["orders"].filter(F.col("o_orderkey") % 50 == 0).selectExpr(
        "o_orderkey",
        "parse_json(to_json(named_struct("
        "'cents', CAST(round(o_totalprice * 100) AS BIGINT), "
        "'k', o_orderkey, "
        "'tags', array(o_orderstatus, o_orderpriority)))) AS vj",
    ).createOrReplaceTempView("v_variant_explode")
    return spark.sql(
        """
        SELECT o_orderkey, o.pos, o.key, to_json(o.value) AS val
        FROM v_variant_explode t, LATERAL variant_explode(t.vj) AS o
        ORDER BY o_orderkey, o.pos
        """
    ).selectExpr(
        "o_orderkey", "cast(pos as int) pos", "key",
        # object members render as canonical JSON: strip the quotes from
        # plain scalars so the oracle can build values from base columns
        "CASE WHEN key = 'tags' THEN val ELSE regexp_replace(val, '\"', '') END AS val",
    )
