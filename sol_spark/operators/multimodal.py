"""Multimodal (image/audio/video) column operators.

Model: media is an opaque ``binary`` column + a typed metadata struct —
exactly how a 100 TB training-data lake stores it (parquet binary chunks,
metadata pushed to the footer for pruning). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages: the
executor streams record batches through a pandas iterator, so peak memory
is one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition — the shape that survives 100 MB media rows.

The image/audio codec libraries are NOT in this container, so the actual
codec call is stubbed (``decode_media_real`` raises NotImplementedError;
see the try-import gates). Everything around the stub is real and
oracle-verified: the fixture-derived media table is deterministic
(content = unhex(repeat(md5(text), 4)), 64 bytes), so a DuckDB oracle
reproduces every byte-level result via hex arithmetic — the pandas UDFs are
hash-checked against it, proving the binary -> Arrow -> numpy plumbing
delivers exactly the bytes written.

Reference basis: the pandas-UDF execution path is the reference's
ArrowEvalPythonExec / FlatMapGroupsInPandasExec
(/root/reference/sql/core/src/main/scala/org/apache/spark/sql/execution/python/ArrowEvalPythonExec.scala:61,
FlatMapGroupsInPandasExec.scala:49); binary columns are BinaryType
(/root/reference/sql/catalyst/src/main/scala/org/apache/spark/sql/types/BinaryType.scala:32).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sol_spark.registry import register
from sol_spark.tables import load_tables

if TYPE_CHECKING:
    import pandas as pd

# Real codecs, gated: absent in this container, present on a real cluster.
try:  # pragma: no cover
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_media_real(content: bytes, modality: str):  # pragma: no cover
    """STUB: the actual codec call (PIL / soundfile / pyav). Not available
    in this environment; on a real cluster, branch per modality here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "media codecs not installed in this environment; "
            "the deterministic fake decoder below exercises the same plumbing"
        )
    raise NotImplementedError("real decode intentionally out of scope")


# ---------------------------------------------------------------------------
# Media table synthesis (deterministic, reproducible in the oracle)
# ---------------------------------------------------------------------------

MEDIA_BYTES = 64  # 4 x 16-byte md5 digests

_MODALITY = "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
# Typed metadata derived from the first content bytes (hex positions 1-4).
_WIDTH = "CAST(conv(substring(md5(text), 1, 2), 16, 10) AS INT) + 1"
_HEIGHT = "CAST(conv(substring(md5(text), 3, 2), 16, 10) AS INT) + 1"
_SAMPLE_RATE = "8000 + 100 * (CAST(conv(substring(md5(text), 5, 2), 16, 10) AS INT) % 5)"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (media_id, modality, content binary, meta struct).

    At scale this is the storage schema: binary payload + a metadata struct
    whose fields are plain columns (prunable, filterable without decoding).
    """
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        F.col("doc_id").alias("media_id"),
        F.expr(_MODALITY).alias("modality"),
        F.unhex(F.repeat(F.md5(F.col("text")), 4)).alias("content"),
        F.struct(
            F.expr(_WIDTH).alias("width"),
            F.expr(_HEIGHT).alias("height"),
            F.expr(_SAMPLE_RATE).alias("sample_rate"),
            F.lit(MEDIA_BYTES).alias("n_bytes"),
        ).alias("meta"),
    )


# Oracle-side byte extraction: content byte i == hex pair (2i+1, 2i+2) of
# repeat(md5(text), 4).
_ORACLE_BYTES_CTE = f"""
media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         repeat(md5(text), 4) AS hx
  FROM documents
),
bytes AS (
  SELECT media_id, modality, p.i,
         ('0x' || substr(hx, 2 * p.i + 1, 2))::INT AS byte
  FROM media, (SELECT unnest(range({MEDIA_BYTES})) AS i) p
)
"""


# ---------------------------------------------------------------------------
# Feature extraction (decode stand-in) — mapInPandas, byte-exact oracle
# ---------------------------------------------------------------------------

MM_FEATURES_ORACLE = f"""
WITH {_ORACLE_BYTES_CTE}
SELECT media_id, modality, count(*) AS n_bytes,
       CAST(sum(byte) AS BIGINT) AS byte_sum,
       CAST(min(byte) AS BIGINT) AS byte_min, CAST(max(byte) AS BIGINT) AS byte_max
FROM bytes
GROUP BY media_id, modality
ORDER BY media_id
"""


@register("mm_decode_features", MM_FEATURES_ORACLE, tags=("llm", "multimodal", "pandas_udf"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media content via mapInPandas: the
    'decode' reads the raw payload (numpy view over Arrow buffers) and emits
    per-item statistics. The real codec call is stubbed (decode_media_real);
    the byte plumbing is what this verifies."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            arrs = [np.frombuffer(c, dtype=np.uint8) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(a) for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                    "byte_min": [int(a.min()) for a in arrs],
                    "byte_max": [int(a.max()) for a in arrs],
                }
            )

    media = media_table(spark, sf_dir)
    return media.mapInPandas(
        extract,
        schema="media_id bigint, modality string, n_bytes bigint, byte_sum bigint, byte_min bigint, byte_max bigint",
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# Frame sampling (video): one row in -> N frame rows out
# ---------------------------------------------------------------------------

FRAME_BYTES = 8
N_FRAMES = MEDIA_BYTES // FRAME_BYTES

MM_FRAMES_ORACLE = f"""
WITH {_ORACLE_BYTES_CTE}
SELECT media_id, i // {FRAME_BYTES} AS frame_idx, CAST(sum(byte) AS BIGINT) AS frame_sum
FROM bytes
WHERE modality = 'video'
GROUP BY media_id, i // {FRAME_BYTES}
ORDER BY media_id, frame_idx
"""


@register("mm_frame_sample", MM_FRAMES_ORACLE, tags=("llm", "multimodal", "pandas_udf"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: mapInPandas fan-out — each video row yields
    {N_FRAMES} frame rows ({FRAME_BYTES}-byte slices). The filter on
    modality happens BEFORE the Python boundary (JVM-side, prunable);
    only video payloads cross into Arrow."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(content, dtype=np.uint8)
                for k in range(len(arr) // FRAME_BYTES):
                    ids.append(mid)
                    idxs.append(k)
                    sums.append(int(arr[k * FRAME_BYTES : (k + 1) * FRAME_BYTES].sum()))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sum": sums})

    media = media_table(spark, sf_dir).filter(F.col("modality") == "video")
    return media.mapInPandas(
        sample, schema="media_id bigint, frame_idx bigint, frame_sum bigint"
    ).orderBy("media_id", "frame_idx")


# ---------------------------------------------------------------------------
# Resize (image): metadata-struct plumbing through Arrow
# ---------------------------------------------------------------------------

MM_RESIZE_ORACLE = f"""
WITH {_ORACLE_BYTES_CTE},
meta AS (
  SELECT media_id,
         ('0x' || substr(hx, 1, 2))::INT + 1 AS width,
         ('0x' || substr(hx, 3, 2))::INT + 1 AS height
  FROM media WHERE modality = 'image'
)
SELECT media_id, width, height,
       greatest(width // 2, 1) AS out_w, greatest(height // 2, 1) AS out_h
FROM meta
ORDER BY media_id
"""


@register("mm_resize_stub", MM_RESIZE_ORACLE, tags=("llm", "multimodal", "pandas_udf"))
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: the UDF consumes the typed metadata struct (arrives
    in pandas as per-row dicts via Arrow) and computes output dims; the
    pixel-level resample is the stubbed codec call (decode_media_real).
    Verifies struct columns survive the Arrow boundary bit-exact."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            meta = list(pdf["meta"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "out_w": [max(m["width"] // 2, 1) for m in meta],
                    "out_h": [max(m["height"] // 2, 1) for m in meta],
                }
            )

    media = media_table(spark, sf_dir).filter(F.col("modality") == "image").select("media_id", "meta")
    return media.mapInPandas(
        resize, schema="media_id bigint, width int, height int, out_w int, out_h int"
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# Fixed-size chunking — pure JVM binary slicing, no Python at all
# ---------------------------------------------------------------------------

CHUNK_BYTES = 24  # 64-byte payloads -> chunks of 24/24/16

MM_CHUNK_ORACLE = f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         repeat(md5(text), 4) AS hx
  FROM documents
),
chunks AS (
  SELECT media_id, modality, p.i AS chunk_idx,
         substr(hx, {2 * CHUNK_BYTES} * p.i + 1, {2 * CHUNK_BYTES}) AS chunk_hex
  FROM media, (SELECT unnest(range(CAST(ceil({MEDIA_BYTES} / {CHUNK_BYTES}.0) AS INT))) AS i) p
)
SELECT media_id, modality, chunk_idx,
       length(chunk_hex) // 2 AS n_bytes,
       chunk_hex
FROM chunks
ORDER BY media_id, chunk_idx
"""


@register("mm_chunk_bytes", MM_CHUNK_ORACLE, tags=("llm", "multimodal"))
def mm_chunk_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each media blob into fixed-size byte chunks — the storage-page
    sharding step before uploading or embedding large media (a 100 MB video
    becomes N bounded rows instead of one unbounded one).

    Scale shape: sequence+posexplode computes offsets and `substring` slices
    the binary ENTIRELY JVM-side (BinaryType passthrough, zero Python, zero
    shuffle — a pure generator projection Catalyst pipelines into the scan).
    The oracle reproduces every chunk byte-for-byte via hex arithmetic."""
    media = media_table(spark, sf_dir)
    n_chunks = F.expr(f"CAST(ceil(length(content) / {CHUNK_BYTES}.0) AS INT)")
    return (
        media.select(
            "media_id",
            "modality",
            "content",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_i"),
        )
        .select(
            "media_id",
            "modality",
            "chunk_idx",
            F.expr(f"substring(content, chunk_idx * {CHUNK_BYTES} + 1, {CHUNK_BYTES})").alias("_chunk"),
        )
        .select(
            "media_id",
            "modality",
            "chunk_idx",
            F.length("_chunk").alias("n_bytes"),
            F.lower(F.hex("_chunk")).alias("chunk_hex"),
        )
        .orderBy("media_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# Integrity audit: per-media checksum, size-vs-metadata consistency, and
# magic-byte sanity — the validation table a 100 TB media lake computes at
# ingest, entirely JVM-side (no decode, no Python).
# ---------------------------------------------------------------------------

MM_INTEGRITY_ORACLE = f"""
WITH {_ORACLE_BYTES_CTE}
SELECT m.media_id, m.modality,
       md5(m.hx) AS content_checksum,
       (length(m.hx) // 2)::BIGINT AS n_bytes_actual,
       CASE WHEN length(m.hx) // 2 = {MEDIA_BYTES} THEN 1 ELSE 0 END AS ok_size,
       CASE WHEN ('0x' || substr(m.hx, 1, 2))::INT % 7 = m.media_id % 7 THEN 1 ELSE 0 END AS ok_magic
FROM media m
ORDER BY m.media_id
"""


@register("mm_integrity_audit", MM_INTEGRITY_ORACLE, tags=("llm", "multimodal", "quality"))
def mm_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media integrity table: checksum over the payload (hex-level, so
    both engines hash the same string), actual byte length vs the
    metadata's declared size, and a magic-byte style consistency probe
    (first byte mod 7 vs the id-derived expectation — standing in for the
    format-signature check a real lake runs against JPEG/RIFF headers).
    Everything is binary/column arithmetic in the scan stage — the audit
    costs one pass and never decodes. A production lake partitions the
    failures into a quarantine table; here the flags are the verified
    output."""
    media = media_table(spark, sf_dir)
    hx = F.hex(F.col("content")).alias("hx")
    first_byte = F.expr("CAST(conv(substring(hex(content), 1, 2), 16, 10) AS INT)")
    return (
        media.select(
            "media_id", "modality", F.col("content"),
            F.length("content").alias("n_bytes_actual"),
        )
        .select(
            "media_id", "modality",
            F.md5(F.lower(F.hex("content"))).alias("content_checksum"),
            F.col("n_bytes_actual").cast("long").alias("n_bytes_actual"),
            F.when(F.col("n_bytes_actual") == MEDIA_BYTES, 1).otherwise(0).alias("ok_size"),
            F.when(first_byte % 7 == F.col("media_id") % 7, 1).otherwise(0).alias("ok_magic"),
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup over binary payloads (banded signature join)
# ---------------------------------------------------------------------------

PHASH_BITS = 60
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS
PHASH_HAMMING_MAX = 3
_PHASH_DUP_STRIDE = 10  # every 10th item re-ingested under a new id
_PHASH_DUP_OFFSET = 1_000_000

MM_PHASH_DEDUP_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS media_id, md5(text) AS hx FROM documents
), corpus AS (
  SELECT media_id, hx FROM base
  UNION ALL
  SELECT media_id + {_PHASH_DUP_OFFSET}, hx FROM base WHERE media_id % {_PHASH_DUP_STRIDE} = 0
), sig AS (
  SELECT media_id, ('0x' || substr(hx, 1, {PHASH_BITS // 4}))::BIGINT AS sig FROM corpus
), bands AS (
  SELECT media_id, sig, b.b,
         (sig >> ({PHASH_BAND_BITS} * b.b)) & {2**PHASH_BAND_BITS - 1} AS band_key
  FROM sig, (SELECT unnest(range({PHASH_BANDS})) AS b) b
), cand AS (
  SELECT DISTINCT a.media_id AS id_a, c.media_id AS id_b, a.sig AS sa, c.sig AS sb
  FROM bands a JOIN bands c ON a.b = c.b AND a.band_key = c.band_key
  WHERE a.media_id < c.media_id
)
SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {PHASH_HAMMING_MAX}
ORDER BY id_a, id_b
"""


@register("mm_phash_dedup", MM_PHASH_DEDUP_ORACLE, tags=("llm", "multimodal", "dedup", "pandas_udf"))
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection over BINARY media payloads: a {PHASH_BITS}-bit
    perceptual signature per item, banded into {PHASH_BANDS} keys for
    candidate generation, confirmed by hamming distance — the image-dedup
    pipeline (pHash/PDQ) with the same banded-LSH scale shape as
    dedup_simhash, applied to the multimodal corpus. The signature is
    computed FROM THE RAW BYTES inside an Arrow-batched mapInPandas (the
    place a real pipeline calls the DCT after decode; here the stub
    signature is the payload's leading bits, per the module's documented
    codec-stub discipline — the byte plumbing, banding, and confirm join
    are what this verifies). The fixture corpus contains no binary-level
    near-dups, so every {_PHASH_DUP_STRIDE}th item is re-ingested under a
    new id by construction in BOTH engines, making the positive path
    value-verified (the text_split_doc_pairs seam discipline).

    Scale shape: signatures are one row per item; the candidate join is
    equi on (band, band_key), never all-pairs; hamming confirm is
    bit_count(xor) on two bigints."""
    media = media_table(spark, sf_dir).select("media_id", "content")
    dup = media.where(F.col("media_id") % _PHASH_DUP_STRIDE == 0).select(
        (F.col("media_id") + _PHASH_DUP_OFFSET).alias("media_id"), "content"
    )
    corpus = media.unionAll(dup)

    def signature(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            # "decode" stub: a real pipeline decodes and DCT-hashes here;
            # the deterministic stand-in takes the payload's leading
            # PHASH_BITS bits (content bytes are hex-derived, so this is
            # the first 15 hex chars).
            sigs = [int(bytes(c)[: PHASH_BITS // 8 + 1].hex()[: PHASH_BITS // 4], 16) for c in pdf["content"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "sig": sigs})

    sig = corpus.mapInPandas(signature, "media_id bigint, sig bigint")
    band_keys = F.array(
        *[
            F.shiftright("sig", PHASH_BAND_BITS * b).bitwiseAND(F.lit(2**PHASH_BAND_BITS - 1))
            for b in range(PHASH_BANDS)
        ]
    )
    bands = sig.select("media_id", "sig", F.posexplode(band_keys).alias("b", "band_key"))
    a = bands.select(F.col("media_id").alias("id_a"), F.col("sig").alias("sa"), "b", "band_key")
    c = bands.select(F.col("media_id").alias("id_b"), F.col("sig").alias("sb"), "b", "band_key")
    return (
        a.join(c, ["b", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .where(F.col("hamming") <= PHASH_HAMMING_MAX)
        .distinct()
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Composed multimodal ingestion pipeline (integrity gate -> exact-signature
# dedup -> chunk/byte manifest), per modality
# ---------------------------------------------------------------------------

_PIPE_CHUNKS_PER = -(-MEDIA_BYTES // CHUNK_BYTES)  # ceil, a plan-time constant

MM_PIPELINE_ORACLE = f"""
WITH media AS (
  SELECT doc_id AS media_id,
         {_MODALITY} AS modality,
         repeat(md5(text), 4) AS hx
  FROM documents
),
flagged AS (
  SELECT media_id, modality, hx,
         CASE WHEN ('0x' || substr(hx, 1, 2))::INT % 7 = media_id % 7
              THEN 1 ELSE 0 END AS ok_magic
  FROM media
),
inflow AS (
  SELECT modality, count(*)::BIGINT AS n_in,
         sum(1 - ok_magic)::BIGINT AS n_failed
  FROM flagged GROUP BY modality
),
kept AS (
  SELECT modality,
         count(*)::BIGINT AS n_passed,
         count(DISTINCT substr(hx, 1, 15))::BIGINT AS n_kept
  FROM flagged WHERE ok_magic = 1 GROUP BY modality
)
SELECT i.modality, i.n_in, i.n_failed, k.n_passed,
       (k.n_passed - k.n_kept)::BIGINT AS n_dup_dropped,
       k.n_kept,
       (k.n_kept * {_PIPE_CHUNKS_PER})::BIGINT AS n_chunks,
       (k.n_kept * {MEDIA_BYTES})::BIGINT AS kept_bytes
FROM inflow i JOIN kept k ON k.modality = i.modality
ORDER BY i.modality
"""


@register("pipeline_multimodal_corpus", MM_PIPELINE_ORACLE, tags=("llm", "multimodal", "pipeline"))
def pipeline_multimodal_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed media-ingestion pipeline as ONE plan, mirroring
    pipeline_rag_corpus for binary columns: integrity gate (the magic-byte
    probe from mm_integrity_audit — the deliberately-strict stand-in for a
    real format-signature check) -> exact-signature dedup (distinct
    60-bit payload prefix per modality; near-dup would swap in
    mm_phash_dedup's banded join) -> chunk/byte manifest with
    {CHUNK_BYTES}-byte chunks. The output is the per-modality accounting
    table an ingest job publishes: inflow, quarantine, duplicate drops,
    kept media, and downstream chunk/byte volumes — every stage's flow is
    explicit so a 100 TB run can be reconciled end to end.

    Scale shape: a single scan computes flags and signatures (no decode,
    pure column arithmetic on the binary/hex payload); the only
    aggregation is per-modality with a distinct-signature count — a
    two-level hash-agg, no windows, no joins except the 3-row manifest
    stitch."""
    media = media_table(spark, sf_dir)
    first_byte = F.expr("CAST(conv(substring(hex(content), 1, 2), 16, 10) AS INT)")
    flagged = media.select(
        "media_id", "modality",
        F.expr("substring(lower(hex(content)), 1, 15)").alias("sig"),
        F.when(first_byte % 7 == F.col("media_id") % 7, 1).otherwise(0).alias("ok_magic"),
    )
    inflow = flagged.groupBy("modality").agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        F.sum(1 - F.col("ok_magic")).cast("long").alias("n_failed"),
    )
    kept = (
        flagged.filter(F.col("ok_magic") == 1)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_passed"),
            F.countDistinct("sig").cast("long").alias("n_kept"),
        )
    )
    return (
        inflow.join(kept, "modality")
        .select(
            "modality", "n_in", "n_failed", "n_passed",
            (F.col("n_passed") - F.col("n_kept")).cast("long").alias("n_dup_dropped"),
            "n_kept",
            (F.col("n_kept") * _PIPE_CHUNKS_PER).cast("long").alias("n_chunks"),
            (F.col("n_kept") * MEDIA_BYTES).cast("long").alias("kept_bytes"),
        )
        .orderBy("modality")
    )
