"""Multimodal plumbing tests: batch shape, schema stability, codec stub.
The value-level correctness of each operator is oracle-verified via the
registry (operators/multimodal.py); these cover what SQL can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sol_spark.operators import multimodal as M


def test_media_table_schema(spark, sf_dir):
    df = M.media_table(spark, sf_dir)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["content"] == "binary"
    assert schema["meta"].startswith("struct<width:int,height:int,sample_rate:int")
    row = df.first()
    assert len(row.content) == M.MEDIA_BYTES


def test_arrow_batch_size_bounded(spark, sf_dir):
    """mapInPandas must see batches no larger than
    spark.sql.execution.arrow.maxRecordsPerBatch — the property that bounds
    executor memory for 100 MB media payloads."""
    limit = 32
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(limit))
    try:

        def probe(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame({"n": [len(pdf)]})

        sizes = [
            r.n
            for r in M.media_table(spark, sf_dir)
            .repartition(2)
            .mapInPandas(probe, schema="n bigint")
            .collect()
        ]
        assert sizes and max(sizes) <= limit
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")


def test_codec_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        M.decode_media_real(b"\x00" * 8, "image")


def test_frame_sample_fanout_count(spark, sf_dir):
    """Row fan-out: frames == N_FRAMES x video rows, and the modality filter
    runs before the Python boundary (no non-video media crosses)."""
    media = M.media_table(spark, sf_dir)
    n_videos = media.filter(F.col("modality") == "video").count()
    frames = M.mm_frame_sample(spark, sf_dir)
    assert frames.count() == n_videos * M.N_FRAMES


def test_map_in_arrow_roundtrip(spark, sf_dir):
    """mapInArrow: the RecordBatch-level sibling of mapInPandas (skips the
    pandas conversion entirely — the lowest-overhead Python boundary for
    binary/media columns). Per-batch byte-length computation must equal the
    JVM-side octet_length."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from sol_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text").limit(200)

    def add_len(batches):
        for batch in batches:
            ids = batch.column("doc_id")
            lens = pa.compute.binary_length(batch.column("text"))
            yield pa.RecordBatch.from_arrays([ids, lens], names=["doc_id", "n"])

    got = {
        r["doc_id"]: r["n"]
        for r in docs.mapInArrow(add_len, "doc_id bigint, n int").collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.octet_length("text").alias("n")).collect()
    }
    assert got == want
