"""Source/sink round-trips and plan-level storage behaviors (SURVEY §2.1).
Round-trip equality is the oracle here: write -> read must reproduce the
input row-set exactly (csv/json modulo type widening, asserted per-format).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sol_spark.sources.io import read_table, write_bucketed, write_table
from sol_spark.tables import load_tables


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="solspark_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_tables(spark, sf_dir)["nation"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, nation, tmpdir, fmt):
    path = os.path.join(tmpdir, f"rt_{fmt}")
    write_table(nation, path, fmt, header="true")
    schema = "n_nationkey int, n_name string, n_regionkey int" if fmt in ("json", "csv") else None
    back = read_table(spark, path, fmt, schema=schema, header="true")
    assert _rows(back) == _rows(nation)


def test_csv_schema_inference(spark, nation, tmpdir):
    path = os.path.join(tmpdir, "rt_csv_infer")
    write_table(nation, path, "csv", header="true")
    back = read_table(spark, path, "csv", header="true", inferSchema="true")
    assert [f.dataType.simpleString() for f in back.schema.fields] == ["int", "string", "int"]
    assert _rows(back) == _rows(nation)


def test_csv_malformed_modes(spark, tmpdir):
    """FailureSafeParser modes: PERMISSIVE nulls bad fields, DROPMALFORMED
    drops the row, FAILFAST raises."""
    path = os.path.join(tmpdir, "bad_csv")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.csv"), "w") as f:
        f.write("1,alpha\nnot_an_int,beta\n3,gamma\n")
    schema = "id int, name string"
    permissive = spark.read.schema(schema).csv(path, mode="PERMISSIVE")
    assert permissive.count() == 3
    assert permissive.filter(F.col("id").isNull()).count() == 1
    dropped = spark.read.schema(schema).csv(path, mode="DROPMALFORMED")
    # collect(), not count(): count() prunes every column, so the parser
    # never sees the malformed field and nothing gets dropped
    assert len(dropped.collect()) == 2
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        spark.read.schema(schema).csv(path, mode="FAILFAST").collect()


def test_text_format_line_per_row(spark, tmpdir):
    path = os.path.join(tmpdir, "rt_text")
    df = spark.createDataFrame([("line one",), ("line two",)], "value string")
    write_table(df, path, "text")
    back = read_table(spark, path, "text")
    assert _rows(back) == _rows(df)


def test_partitioned_write_prunes(spark, nation, tmpdir):
    """partitionBy -> directory keys; a filter on the partition column must
    show up as PartitionFilters (pruning before file listing), and the
    pruned read must touch only matching partitions."""
    path = os.path.join(tmpdir, "part_nation")
    write_table(nation, path, "parquet", partition_by=["n_regionkey"])
    back = read_table(spark, path, "parquet").filter(F.col("n_regionkey") == 2)
    from sol_spark.plans import explain_formatted

    plan = explain_formatted(back)
    assert "PartitionFilters" in plan
    assert back.count() == nation.filter(F.col("n_regionkey") == 2).count()
    # physical layout: one directory per region key
    assert any(d.startswith("n_regionkey=") for d in os.listdir(path))


def test_bucketed_join_no_shuffle(spark, sf_dir, tmpdir):
    """Two tables bucketed on the same key joined WITHOUT an Exchange on
    either side — write-time shuffle amortized across every later join."""
    t = load_tables(spark, sf_dir)
    try:
        write_bucketed(t["orders"], "orders_b", ["o_orderkey"], 8)
        write_bucketed(
            t["lineitem"].select("l_orderkey", "l_quantity"), "lineitem_b", ["l_orderkey"], 8
        )
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        # disable broadcast so the test observes the bucketed SMJ path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            from sol_spark.plans import explain_formatted

            plan = explain_formatted(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        assert "Exchange" not in plan
        assert joined.count() == t["orders"].join(
            t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_streaming_file_sink_exactly_once(spark, sf_dir, tmpdir):
    """File-stream sink: output parquet carries the _spark_metadata manifest
    (exactly-once across restarts); re-reading the sink directory returns
    exactly the committed rows."""
    from sol_spark.streaming.pipelines import events_stream

    stream, src_tmp = events_stream(spark, sf_dir, n_files=3)
    out = os.path.join(tmpdir, "sink_out")
    ckpt = os.path.join(tmpdir, "sink_ckpt")
    try:
        q = (
            stream.select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        assert os.path.isdir(os.path.join(out, "_spark_metadata"))
        back = spark.read.parquet(out)
        n_src = load_tables(spark, sf_dir)["events"].count()
        assert back.count() == n_src
        assert back.select(F.sum("event_id")).first()[0] == load_tables(spark, sf_dir)[
            "events"
        ].select(F.sum("event_id")).first()[0]
    finally:
        shutil.rmtree(src_tmp, ignore_errors=True)


def test_rate_source_produces_rows(spark):
    """Rate source (debug/test source, reference RateStreamProvider.scala):
    bounded run via one micro-batch into a memory sink."""
    from sol_spark.streaming.pipelines import run_stream_to_memory

    stream = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    import time
    import uuid

    name = f"rate_{uuid.uuid4().hex[:6]}"
    q = stream.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table(name).count() == 0:
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table(name)
    assert got.count() > 0
    assert [f.name for f in got.schema.fields] == ["timestamp", "value"]


def test_jdbc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    """JDBC source/sink (reference JdbcRelationProvider.scala:24) against
    the embedded Derby engine that ships with Spark: write the nation dim
    over JDBC, read it back BOTH single-stream and with a partitioned read
    (partitionColumn/bounds/numPartitions — the parallel-scan path a real
    warehouse extract uses), and require identical row sets."""
    from sol_spark.tables import load_tables

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    nation = load_tables(spark, sf_dir)["nation"]
    nation.write.jdbc(url, "NATION", mode="overwrite", properties=props)

    plain = spark.read.jdbc(url, "NATION", properties=props)
    parallel = spark.read.jdbc(
        url,
        "NATION",
        column="N_NATIONKEY",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
        properties=props,
    )
    assert parallel.rdd.getNumPartitions() == 4
    want = sorted(map(tuple, nation.collect()))
    assert sorted(map(tuple, plain.collect())) == want
    assert sorted(map(tuple, parallel.collect())) == want


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """INSERT OVERWRITE with partitionOverwriteMode=dynamic must rewrite
    ONLY the partitions present in the incoming data — at 100 TB a daily
    backfill touches one day's directory, not the whole table."""
    from pyspark.sql import functions as F

    from sol_spark.tables import load_tables

    out = str(tmp_path / "events_dyn")
    ev = load_tables(spark, sf_dir)["events"].select("event_id", "value", "event_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    before = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out).groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert len(before) >= 2

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = spark.createDataFrame(
            [(10**9, 1.0, "purchase")], "event_id bigint, value double, event_type string"
        )
        patch.write.partitionBy("event_type").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    after = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out).groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert after["purchase"] == 1  # overwritten partition
    for k, v in before.items():
        if k != "purchase":
            assert after[k] == v  # untouched partitions survive


def test_save_as_table_and_insert_into(spark, sf_dir):
    """Managed-table round trip through the session catalog (the reference's
    InsertIntoHadoopFsRelationCommand + SessionCatalog path): saveAsTable
    creates, insertInto appends, SQL reads the union."""
    from sol_spark.tables import load_tables

    nation = load_tables(spark, sf_dir)["nation"].select("n_nationkey", "n_name")
    spark.sql("DROP TABLE IF EXISTS t_nation")
    try:
        nation.write.saveAsTable("t_nation")
        nation.limit(5).write.insertInto("t_nation")
        n = spark.sql("SELECT count(*) AS n FROM t_nation").collect()[0]["n"]
        assert n == nation.count() + 5
        assert "t_nation" in {t.name for t in spark.catalog.listTables()}
    finally:
        spark.sql("DROP TABLE IF EXISTS t_nation")


def test_python_data_source(spark, sf_dir):
    """Python DataSource API (the modern extension point the reference era
    served with Scala DataSource V1/V2, JdbcRelationProvider.scala:24 et
    al.): a custom partitioned batch source registered and read via
    spark.read.format — partitions are read in parallel, schema declared."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class RangeSquares(DataSource):
        @classmethod
        def name(cls):
            return "range_squares"

        def schema(self):
            return "i bigint, sq bigint"

        def reader(self, schema):
            return RangeSquaresReader(self.options)

    class RangeSquaresReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.n_parts = int(options.get("parts", 4))

        def partitions(self):
            step = self.n // self.n_parts
            return [
                InputPartition((p * step, self.n if p == self.n_parts - 1 else (p + 1) * step))
                for p in range(self.n_parts)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, i * i)

    spark.dataSource.register(RangeSquares)
    df = spark.read.format("range_squares").option("n", 100).option("parts", 4).load()
    assert df.rdd.getNumPartitions() == 4
    rows = sorted((r.i, r.sq) for r in df.collect())
    assert rows == [(i, i * i) for i in range(100)]


def test_ignore_corrupt_files(spark, sf_dir, tmp_path):
    """Corrupt-file resilience: at fleet scale some files WILL be truncated
    or bit-rotted; spark.sql.files.ignoreCorruptFiles=true must skip them
    and return the healthy rows (and the default strict mode must fail
    loudly instead of silently under-reading)."""
    import os

    import pytest as _pt

    from pyspark.sql import functions as F

    from sol_spark.tables import load_tables

    out = str(tmp_path / "mixed")
    load_tables(spark, sf_dir)["nation"].coalesce(1).write.parquet(out)
    with open(os.path.join(out, "part-corrupt.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    key = "spark.sql.files.ignoreCorruptFiles"
    spark.conf.set(key, "false")
    try:
        with _pt.raises(Exception):
            spark.read.schema("n_nationkey bigint, n_name string").parquet(out).count()
        spark.conf.set(key, "true")
        n = spark.read.schema("n_nationkey bigint, n_name string").parquet(out).count()
        assert n == 25
    finally:
        spark.conf.set(key, "false")


def test_parquet_schema_evolution(spark, sf_dir, tmp_path):
    """Schema evolution on read: files written before a column existed must
    coexist with newer files — mergeSchema=true unions the schemas (missing
    values null); default reads settle on one file schema. The long-lived-
    table reality at fleet scale."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, v1 string").write.parquet(out)
    spark.createDataFrame(
        [(2, "b", 99.0)], "id bigint, v1 string, v2 double"
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "v1", "v2"}
    rows = {r.id: r.v2 for r in merged.collect()}
    assert rows[2] == 99.0 and rows[1] is None


def test_nested_column_pruning(spark, sf_dir, tmp_path):
    """Nested-schema pruning: selecting one struct leaf must prune the
    parquet ReadSchema to that leaf, not materialize the whole struct —
    the difference between reading 1 field and 100 at telemetry scale."""
    from pyspark.sql import functions as F

    from sol_spark.plans import explain_formatted

    out = str(tmp_path / "nested")
    df = spark.range(100).select(
        "id",
        F.struct(
            F.col("id").alias("a"),
            (F.col("id") * 2).alias("b"),
            F.lit("x").alias("c"),
        ).alias("payload"),
    )
    df.write.parquet(out)
    q = spark.read.parquet(out).select("id", F.col("payload.b").alias("b"))
    plan = explain_formatted(q)
    read_schema = plan.split("ReadSchema")[1][:300].replace(" ", "")
    assert "payload:struct<b:bigint>" in read_schema  # only the leaf survives
    assert q.agg(F.sum("b")).collect()[0][0] == sum(2 * i for i in range(100))


def test_kafka_contract_missing_package(spark):
    """Kafka connector contract (reference external/kafka-0-10-sql/.../
    KafkaSourceProvider.scala:44): the plan surface is stock
    `readStream.format("kafka")`; this environment has no spark-sql-kafka
    package or broker (documented non-goal, README). Assert the failure is
    Spark's own missing-data-source error — i.e. our option plumbing reaches
    the resolver and the gap is the package, not our code. On a real
    cluster, `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`
    enables the identical call."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as exc:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:9092")
            .option("subscribe", "events")
            .load()
        )
    msg = str(exc.value)
    assert "kafka" in msg.lower()
    # Spark names the deployment artifact in the error, proving resolution
    # got as far as the provider lookup.
    assert "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg


def test_socket_source_roundtrip(spark):
    """Socket debug source (reference sql/core/.../streaming/sources/
    socket.scala): read lines from a local TCP server into a memory sink.
    Debug-only source (no offsets, not fault-tolerant) — same caveat as the
    reference's class doc."""
    import socket
    import threading
    import time
    import uuid

    lines = [b"alpha\n", b"beta\n", b"gamma\n"]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        srv.settimeout(30)
        try:
            conn, _ = srv.accept()
            with conn:
                for ln in lines:
                    conn.sendall(ln)
                # Keep the connection open until the query has consumed.
                stop.wait(timeout=30)
        except OSError:
            pass

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", str(port))
        .load()
    )
    assert [f.name for f in stream.schema.fields] == ["value"]
    name = f"sock_{uuid.uuid4().hex[:6]}"
    q = stream.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table(name).count() < len(lines):
            time.sleep(0.5)
    finally:
        stop.set()
        q.stop()
        srv.close()
    got = {r.value for r in spark.table(name).collect()}
    assert got == {"alpha", "beta", "gamma"}


def test_console_sink_completes(spark, sf_dir):
    """Console debug sink (reference sql/core/.../streaming/console.scala):
    AvailableNow-bounded run of a file stream into the console sink must
    complete cleanly (output goes to driver stdout; we assert lifecycle)."""
    from sol_spark.streaming.pipelines import events_stream

    stream, tmp = events_stream(spark, sf_dir)
    try:
        q = (
            stream.writeStream.format("console")
            .option("numRows", "5")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.lastProgress is not None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_rdd_scan_createdataframe(spark):
    """ExternalRDD/RDDScan (reference ExistingRDD.scala:99,169; SURVEY §2.1
    row previously declared 'subsumed'): createDataFrame over an existing
    RDD must plan as a scan of that RDD and agree with the same data built
    directly. The engine stays DataFrame-first; this pins the ingress path
    for legacy RDD producers."""
    rdd = spark.sparkContext.parallelize([(i, f"r{i % 3}") for i in range(100)], 8)
    df = spark.createDataFrame(rdd, "id bigint, tag string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    got = df.groupBy("tag").count().collect()
    assert {r.tag: r["count"] for r in got} == {"r0": 34, "r1": 33, "r2": 33}


def test_python_data_source_streaming(spark):
    """Streaming Python DataSource (Spark 4: SimpleDataSourceStreamReader —
    the micro-batch extension point; reference-era streaming sources were
    Scala MicroBatchReaders, KafkaMicroBatchReader.scala:57): a custom
    offset-tracked source emits rows per batch; offsets resume
    monotonically and the sink accumulates exactly the emitted range."""
    import time
    import uuid

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class CounterStream(DataSource):
        @classmethod
        def name(cls):
            return "counter_stream"

        def schema(self):
            return "v bigint"

        def simpleStreamReader(self, schema):
            return CounterReader(self.options)

    class CounterReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.step = int(options.get("step", 10))
            self.cap = int(options.get("cap", 50))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            if pos >= self.cap:
                return iter([]), start
            new_pos = min(pos + self.step, self.cap)
            return iter([(i,) for i in range(pos, new_pos)]), {"pos": new_pos}

        def readBetweenOffsets(self, start, end):
            return iter([(i,) for i in range(start["pos"], end["pos"])])

    spark.dataSource.register(CounterStream)
    name = f"pyds_{uuid.uuid4().hex[:6]}"
    q = (
        spark.readStream.format("counter_stream")
        .option("step", "10")
        .option("cap", "50")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < 50:
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(r.v for r in spark.table(name).collect())
    assert got == list(range(50))  # exactly once, in offset order


def test_avro_contract_missing_package(spark, tmp_path):
    """Avro format contract (reference external/avro/.../AvroFileFormat.scala):
    like Kafka, Avro is an external module since Spark 2.4 and the package is
    not shipped in this environment. Assert the failure is Spark's own
    missing-data-source error naming the avro deployment route — option
    plumbing reaches the resolver; on a real cluster
    `--packages org.apache.spark:spark-avro_2.13:<ver>` enables the
    identical call."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as exc:
        spark.range(3).write.format("avro").mode("overwrite").save(str(tmp_path / "a"))
    msg = str(exc.value)
    assert "avro" in msg.lower()
    assert "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg


def test_xml_roundtrip_and_expressions(spark, tmp_path):
    """XML source/sink (built-in since Spark 4; reference-era Spark needed
    the external spark-xml package): write rows under a custom rowTag, read
    them back with schema inference, and exercise the from_xml/to_xml
    expression pair on a nested fragment."""
    from pyspark.sql import functions as F

    df = spark.range(5).selectExpr(
        "id", "concat('name_', id) AS name", "cast(id * 1.5 as double) AS score"
    )
    path = str(tmp_path / "xml_out")
    df.coalesce(1).write.format("xml").option("rootTag", "rows").option("rowTag", "row").save(path)
    back = spark.read.format("xml").option("rowTag", "row").load(path)
    assert sorted((r["id"], r["name"], r["score"]) for r in back.collect()) == [
        (i, f"name_{i}", i * 1.5) for i in range(5)
    ]
    # expression pair: parse a fragment, re-serialize it
    row = spark.sql(
        "SELECT from_xml('<r><a>7</a><b>x</b></r>', 'a INT, b STRING') AS s"
    ).select("s.a", "s.b", F.expr("to_xml(s)").alias("x")).collect()[0]
    assert (row["a"], row["b"]) == (7, "x")
    assert "<a>7</a>" in row["x"]


def test_small_file_compaction_bin_packing(spark, sf_dir, tmp_path):
    """Lakehouse small-file maintenance: a fragmented write (many tiny
    files) is compacted by a repartitionByRange rewrite with
    maxRecordsPerFile bounding file size — the nightly OPTIMIZE analog.
    Asserts the fragment count collapses, every compacted file respects
    the record cap, range partitioning keeps key clustering (each output
    file covers a disjoint key range), and the row set is unchanged."""
    import os

    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    frag = str(tmp_path / "fragmented")
    src.repartition(64).write.parquet(frag)  # simulate drip ingestion
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag >= 32

    cap = 4000
    compact = str(tmp_path / "compacted")
    (
        spark.read.parquet(frag)
        .repartitionByRange(4, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.option("maxRecordsPerFile", cap)
        .parquet(compact)
    )
    files = [f for f in os.listdir(compact) if f.endswith(".parquet")]
    assert len(files) < n_frag / 4
    per_file = (
        spark.read.parquet(compact)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
        )
        .collect()
    )
    assert all(r["n"] <= cap for r in per_file)
    # disjoint key ranges across files (clustering preserved)
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2
    assert spark.read.parquet(compact).count() == src.count()
