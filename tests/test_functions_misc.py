"""Nondeterministic / sketch functions that cannot hash-match a DuckDB
oracle (reference FunctionRegistry.scala:435-452 misc section;
CountMinSketchAgg.scala:47; HyperLogLog sketches): verified here by their
invariants instead.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sol_spark.tables import load_tables


def test_uuid_and_ids(spark, sf_dir):
    """uuid() distinct per row + RFC shape; monotonically_increasing_id is
    distinct and ascending within a partition; spark_partition_id bounded."""
    t = load_tables(spark, sf_dir)
    df = t["part"].select(
        F.expr("uuid()").alias("u"),
        F.monotonically_increasing_id().alias("mid"),
        F.spark_partition_id().alias("pid"),
    )
    n = df.count()
    assert df.select("u").distinct().count() == n
    assert df.select("mid").distinct().count() == n
    sample = df.limit(5).collect()
    for r in sample:
        assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", r["u"])
        assert 0 <= r["pid"] < spark.sparkContext.defaultParallelism + 64


def test_input_file_name(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    row = t["part"].select(F.input_file_name().alias("f")).first()
    assert "part" in row["f"] and row["f"].endswith(".parquet")


def test_count_min_sketch_deterministic(spark, sf_dir):
    """count_min_sketch (reference CountMinSketchAgg.scala:47) emits a
    binary sketch; with a fixed seed it must be byte-identical across runs
    (mergeable partial aggregation is what makes it scale)."""
    t = load_tables(spark, sf_dir)

    def build():
        return t["lineitem"].agg(
            F.count_min_sketch("l_returnflag", F.lit(0.01), F.lit(0.95), F.lit(42)).alias("cms")
        ).collect()[0]["cms"]

    a, b = build(), build()
    assert a is not None and len(a) > 0
    assert bytes(a) == bytes(b)


def test_hll_sketch_estimate_accuracy(spark, sf_dir):
    """Datasketches HLL (post-2.4 upgrade of the reference's HLL++
    HyperLogLogPlusPlus.scala:52): estimate within 5% of exact, and
    hll_union_agg merges per-group sketches to the same ballpark."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    exact = li.select("l_partkey").distinct().count()
    est = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e")
    ).collect()[0]["e"]
    assert abs(est - exact) / exact < 0.05

    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(merged - exact) / exact < 0.05


def test_df_stat_api(spark, sf_dir):
    """DataFrameStatFunctions (reference sql/core/.../DataFrameStatFunctions
    + StatFunctions.scala): approxQuantile (Greenwald-Khanna), corr/cov,
    crosstab, freqItems, stratified sampleBy — each checked against exact
    or invariant expectations."""
    from pyspark.sql import functions as F

    li = load_tables(spark, sf_dir)["lineitem"]

    q = li.stat.approxQuantile("l_quantity", [0.5], 0.02)[0]
    exact = li.selectExpr("percentile(l_quantity, 0.5) AS m").collect()[0]["m"]
    assert abs(q - exact) <= 0.02 * 50 + 1  # quantity in [1, 50]

    c = li.stat.corr("l_quantity", "l_extendedprice")
    c2 = li.agg(F.corr("l_quantity", "l_extendedprice")).collect()[0][0]
    assert abs(c - c2) < 1e-9

    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    total = sum(sum(int(v) for v in r[1:]) for r in ct.collect())
    assert total == li.count()

    fi = li.stat.freqItems(["l_returnflag"], 0.4).collect()[0][0]
    assert set(fi) <= {"A", "N", "R"} and len(fi) >= 1

    strata = li.stat.sampleBy("l_returnflag", {"A": 0.2, "N": 0.2, "R": 0.2}, seed=7)
    again = li.stat.sampleBy("l_returnflag", {"A": 0.2, "N": 0.2, "R": 0.2}, seed=7)
    assert strata.count() == again.count()  # seeded determinism
    assert 0 < strata.count() < li.count()


def test_crypto_and_hash_functions(spark, sf_dir):
    """aes_encrypt/aes_decrypt round-trip (values are engine-specific so
    the invariant is decrypt(encrypt(x)) == x), and xxhash64/murmur3 hash
    determinism across two evaluations — the partition-key hashes every
    shuffle depends on."""
    from pyspark.sql import functions as F

    p = load_tables(spark, sf_dir)["part"].select("p_partkey", "p_name").limit(100)
    key = "0123456789abcdef"
    rt = p.select(
        "p_name",
        F.aes_decrypt(
            F.aes_encrypt(F.col("p_name").cast("binary"), F.lit(key)), F.lit(key)
        ).cast("string").alias("back"),
    )
    assert all(r.p_name == r.back for r in rt.collect())

    h1 = p.select(F.xxhash64("p_name").alias("h"), F.hash("p_name").alias("m")).collect()
    h2 = p.select(F.xxhash64("p_name").alias("h"), F.hash("p_name").alias("m")).collect()
    assert h1 == h2
    n_names = p.select("p_name").distinct().count()
    assert len({r.h for r in h1}) == n_names  # collision-free on this corpus


def test_engine_local_scalar_functions(spark):
    """Scalar functions with no DuckDB analog, pinned against hand-computed
    values (reference registrations: soundex/sentences FunctionRegistry.scala
    :360,:358; crc32 :436; bround :221; rint :244; reflect :448;
    width_bucket added post-2.4). Complements the oracle-checked
    fn_scalar_extra family."""
    row = spark.range(1).select(
        F.soundex(F.lit("Robert")).alias("sdx"),
        F.sentences(F.lit("Hi there. How are you")).alias("sent"),
        F.crc32(F.lit("ABC").cast("binary")).alias("crc"),
        F.bround(F.lit(2.5)).alias("br25"),
        F.bround(F.lit(3.5)).alias("br35"),
        F.round(F.lit(2.5)).alias("r25"),
        F.expr("rint(2.5)").alias("ri25"),
        F.expr("rint(3.5)").alias("ri35"),
        F.expr("reflect('java.lang.String', 'valueOf', 7)").alias("refl"),
        F.width_bucket(F.lit(5.3), F.lit(0.2), F.lit(10.6), F.lit(5)).alias("wb"),
    ).collect()[0]
    assert row.sdx == "R163"
    assert [list(s) for s in row.sent] == [["Hi", "there"], ["How", "are", "you"]]
    assert row.crc == 2743272264
    # bround/rint are HALF_EVEN (banker's); round is HALF_UP.
    assert (row.br25, row.br35, row.r25) == (2.0, 4.0, 3.0)
    assert (row.ri25, row.ri35) == (2.0, 4.0)
    assert row.refl == "7"
    assert row.wb == 3


def test_parameterized_sql(spark, sf_dir):
    """Parameterized SQL (Spark 3.4+ named markers; the safe-injection
    upgrade over string interpolation in the reference's SparkSession.sql):
    both named-arg and df-reference templating must resolve and agree with
    the literal formulation."""
    t = load_tables(spark, sf_dir)
    got = spark.sql(
        "SELECT count(*) AS n FROM {li} WHERE l_quantity > :minq",
        li=t["lineitem"],
        args={"minq": 40},
    ).collect()[0]["n"]
    want = t["lineitem"].filter(F.col("l_quantity") > 40).count()
    assert got == want > 0


def test_udtf_polymorphic_analyze(spark):
    """Polymorphic Python UDTF (Spark 4): the static analyze() hook derives
    the output schema from the argument type at plan time — the UDTF
    counterpart of schema inference. Splits a string column into one row
    per character with the column's own name preserved."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, lit, udtf
    from pyspark.sql.types import IntegerType, StringType, StructType

    @udtf
    class Chars:
        @staticmethod
        def analyze(s: AnalyzeArgument) -> AnalyzeResult:
            assert s.dataType == StringType()
            return AnalyzeResult(
                StructType().add("pos", IntegerType()).add("ch", StringType())
            )

        def eval(self, s: str):
            for i, c in enumerate(s):
                yield i, c

    spark.udtf.register("chars_poly", Chars)
    rows = spark.sql("SELECT * FROM chars_poly('abc')").collect()
    assert [(r.pos, r.ch) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_arrow_optimized_python_udf(spark, sf_dir):
    """Arrow-optimized scalar Python UDF (useArrow=True, Spark 3.5+): plans
    as ArrowEvalPython — Arrow-batch transfer instead of per-row pickling —
    the sanctioned form when a scalar Python escape is unavoidable (the
    plan-hygiene sweep bans the BatchEvalPython row path corpus-wide)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from sol_spark.plans import explain_formatted
    from sol_spark.tables import load_tables

    @F.udf(returnType=LongType(), useArrow=True)
    def clamp100(x):
        return min(x, 100)

    df = load_tables(spark, sf_dir)["customer"].select(clamp100("c_custkey").alias("c"))
    assert "ArrowEvalPython" in explain_formatted(df)
    assert df.agg(F.max("c")).collect()[0][0] == 100


def test_parquet_compression_codecs(spark, tmp_path):
    """Write-path codec options (reference ParquetOptions.scala): snappy /
    zstd / gzip / none round-trip, codec visible in the part-file suffix.
    At 100 TB, zstd typically halves storage vs snappy at similar scan
    speed — the option surface must actually reach the writer."""
    import os

    from pyspark.sql import functions as F

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    for codec, suffix in [
        ("snappy", ".snappy.parquet"),
        ("zstd", ".zstd.parquet"),
        ("gzip", ".gz.parquet"),
        ("none", ".parquet"),
    ]:
        out = str(tmp_path / codec)
        df.coalesce(1).write.option("compression", codec).mode("overwrite").parquet(out)
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files and files[0].endswith(suffix), (codec, files)
        assert spark.read.parquet(out).count() == 1000


def test_analyze_table_stats_feed_cbo(spark, sf_dir, tmp_path):
    """ANALYZE TABLE ... COMPUTE STATISTICS (reference AnalyzeTableCommand /
    DetermineTableStats): collected rowCount/sizeInBytes appear in the
    catalog and in the optimized plan's statistics — the numbers the
    cost-based optimizer uses for broadcast decisions and join reordering
    on tables whose file size misrepresents their post-filter cardinality."""
    from sol_spark.tables import load_tables

    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    load_tables(spark, sf_dir)["nation"].write.mode("overwrite").saveAsTable("cbo_nation")
    try:
        spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_nation").collect()
        }
        stats = desc.get("Statistics", "")
        assert "rows" in stats  # e.g. "2581 bytes, 25 rows"
        # The optimizer consumes the row count only under CBO.
        old = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            plan_stats = (
                spark.table("cbo_nation")._jdf.queryExecution().optimizedPlan().stats().toString()
            )
            assert "rowCount" in plan_stats
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_sql_variables_and_scripting(spark, sf_dir):
    """Spark 4 SQL surface: session variables (DECLARE/SET VARIABLE — the
    engine-level replacement for client-side string templating) and SQL
    scripting (BEGIN...END blocks with local variables). Both execute
    through the same Catalyst pipeline as any query."""
    from sol_spark.tables import load_tables

    load_tables(spark, sf_dir)  # registers the fixture views
    spark.sql("DECLARE OR REPLACE VARIABLE qty_min INT DEFAULT 40")
    spark.sql("SET VARIABLE qty_min = 45")
    got = spark.sql("SELECT count(*) AS n FROM lineitem WHERE l_quantity > qty_min").collect()[0]["n"]
    want = spark.sql("SELECT count(*) AS n FROM lineitem WHERE l_quantity > 45").collect()[0]["n"]
    assert got == want > 0

    row = spark.sql(
        """
        BEGIN
          DECLARE k INT DEFAULT 7;
          SELECT k * k AS sq;
        END
        """
    ).collect()[0]
    assert row[0] == 49


def test_string_collations(spark):
    """Spark 4 collation surface (absent in the reference's 2.4 era):
    case-insensitive comparison, grouping, and sort under UTF8_LCASE /
    UNICODE_CI, and collation() introspection. A collated groupBy must
    merge case variants; binary (default) must not."""
    rows = [("Apple",), ("apple",), ("APPLE",), ("banana",)]
    df = spark.createDataFrame(rows, "s string")
    df.createOrReplaceTempView("coll_probe")
    binary = spark.sql("SELECT count(DISTINCT s) AS n FROM coll_probe").collect()[0]["n"]
    lcase = spark.sql(
        "SELECT count(DISTINCT s COLLATE UTF8_LCASE) AS n FROM coll_probe"
    ).collect()[0]["n"]
    assert (binary, lcase) == (4, 2)
    grouped = spark.sql(
        "SELECT s COLLATE UTF8_LCASE AS k, count(*) AS c FROM coll_probe GROUP BY k ORDER BY c DESC"
    ).collect()
    assert sorted(r["c"] for r in grouped) == [1, 3]
    assert spark.sql("SELECT 'STRASSE' COLLATE UNICODE_CI = 'strasse' AS eq").collect()[0]["eq"]
    name = spark.sql("SELECT collation('x' COLLATE UNICODE_CI) AS c").collect()[0]["c"]
    assert name.endswith("UNICODE_CI")


def test_sql_pipe_syntax(spark, sf_dir):
    """Spark 4 SQL pipe syntax (|>) — the linear query form — must produce
    the same plan/result as the nested-SELECT equivalent on a real
    aggregate over the fixture."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("pipe_orders")
    piped = spark.sql(
        "FROM pipe_orders "
        "|> WHERE o_orderstatus = 'O' "
        "|> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS total GROUP BY o_orderpriority "
        "|> ORDER BY o_orderpriority"
    ).collect()
    classic = spark.sql(
        "SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total "
        "FROM pipe_orders WHERE o_orderstatus = 'O' "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ).collect()
    assert [(r["o_orderpriority"], r["n"], r["total"]) for r in piped] == [
        (r["o_orderpriority"], r["n"], r["total"]) for r in classic
    ]
    assert len(piped) == 5


def test_udtf_dynamic_schema_analyze(spark):
    """Spark 4 polymorphic UDTF: the static analyze() method computes the
    output schema from the ARGUMENTS at plan time (here: n columns wide),
    so one UDTF serves any width — the table-function analog of schema
    inference. Complements the fixed-schema udtf_chunk registered query."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitWords:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            fields = [StructField(f"w{i}", StringType()) for i in range(n.value)]
            return AnalyzeResult(StructType(fields))

        def eval(self, text: str, n: int):
            toks = (text.split() + [None] * n)[:n]
            yield tuple(toks)

    spark.udtf.register("split_words_dyn", SplitWords)
    two = spark.sql("SELECT * FROM split_words_dyn('alpha beta gamma', 2)").collect()
    four = spark.sql("SELECT * FROM split_words_dyn('alpha beta gamma', 4)").collect()
    assert [r.asDict() for r in two] == [{"w0": "alpha", "w1": "beta"}]
    assert [r.asDict() for r in four] == [
        {"w0": "alpha", "w1": "beta", "w2": "gamma", "w3": None}
    ]
