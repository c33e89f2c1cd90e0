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


# ---------------------------------------------------------------------------
# Balanced shard assignment (serpentine LPT) for training-data output files
# ---------------------------------------------------------------------------

BALANCE_SHARDS = 16   # output shards; at 100 TB set to the writer task count
BALANCE_RANK_SHARDS = 16  # parallelism of the two-pass within-size rank

SHARD_BALANCE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents
), assigned AS (
  SELECT n_chars,
         CASE WHEN ((rnk - 1) // {BALANCE_SHARDS}) % 2 = 0
              THEN (rnk - 1) % {BALANCE_SHARDS}
              ELSE {BALANCE_SHARDS - 1} - (rnk - 1) % {BALANCE_SHARDS} END AS shard
  FROM ranked
), agg AS (
  SELECT shard, count(*) AS n_docs, sum(n_chars) AS total_chars
  FROM assigned GROUP BY shard
)
SELECT shard, n_docs,
       total_chars::BIGINT AS total_chars,
       ((10000 * total_chars) // (sum(total_chars) OVER ()))::BIGINT AS share_bp
FROM agg ORDER BY shard
"""


@register("layout_shard_balance", SHARD_BALANCE_ORACLE, tags=("layout", "llm", "scale"))
def layout_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output-shard assignment for training-data writes: documents
    are dealt onto {BALANCE_SHARDS} shards in descending size order with a
    serpentine (boustrophedon) deal — the parallel analog of LPT scheduling.
    Round-robin alone biases the first shard +1 large doc per block; the
    serpentine reversal cancels that, so shard totals differ by at most one
    block's spread. The readout is the per-shard scorecard (docs, chars,
    share in basis points) a writer checks before `partitionBy(shard)` —
    the straggler-file audit for a 100 TB tokenizer run whose doc-length
    distribution is heavy-tailed.

    Scale shape: the global size rank is NEVER a single-task window. It
    decomposes exactly as rank = #(larger docs) + within-size rank:
      - #(larger): a per-size histogram (bounded by max doc length, tiny)
        with an exclusive suffix sum over itself, broadcast back;
      - within-size rank: the text_pack_sequences two-pass prefix count over
        (n_chars, shard = doc_id % {BALANCE_RANK_SHARDS}) — shard-local
        row_number plus broadcast per-shard offsets.
    Everything after the rank is integer div/mod, and the final aggregate
    is {BALANCE_SHARDS} rows."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "n_chars")
    # exclusive count of strictly larger docs, per distinct size (tiny frame)
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w_larger = W.orderBy(F.col("n_chars").desc()).rowsBetween(W.unboundedPreceding, -1)
    larger = hist.select(
        "n_chars", F.coalesce(F.sum("cnt").over(w_larger), F.lit(0)).alias("n_larger")
    )
    # within-size rank by doc_id, two-pass over (n_chars, rshard)
    sharded = docs.withColumn("rshard", F.pmod("doc_id", F.lit(BALANCE_RANK_SHARDS)))
    w_local = W.partitionBy("n_chars", "rshard").orderBy("doc_id")
    local = sharded.withColumn("local_rn", F.row_number().over(w_local))
    shard_tot = sharded.groupBy("n_chars", "rshard").agg(F.count(F.lit(1)).alias("tot"))
    w_off = W.partitionBy("n_chars").orderBy("rshard").rowsBetween(W.unboundedPreceding, -1)
    offs = shard_tot.select(
        "n_chars", "rshard", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off")
    )
    ranked = (
        local.join(F.broadcast(offs), ["n_chars", "rshard"])
        .join(F.broadcast(larger), "n_chars")
        .select(
            "n_chars",
            (F.col("n_larger") + F.col("off") + F.col("local_rn") - 1).alias("rnk0"),
        )
    )
    block_even = (F.col("rnk0") / BALANCE_SHARDS).cast("bigint") % 2 == 0
    pos = F.pmod("rnk0", F.lit(BALANCE_SHARDS))
    assigned = ranked.select(
        "n_chars",
        F.when(block_even, pos).otherwise(F.lit(BALANCE_SHARDS - 1) - pos).alias("shard"),
    )
    agg = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    return (
        agg.select(
            "shard",
            "n_docs",
            F.col("total_chars").cast("long").alias("total_chars"),
            ((10000 * F.col("total_chars")) / F.sum("total_chars").over(W.partitionBy()))
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Shard manifest with order-free content fingerprints (reproducibility)
# ---------------------------------------------------------------------------

MANIFEST_SHARDS = 16
_MANIFEST_FP_MOD = 10 ** 12  # per-doc hash term; sums stay far inside BIGINT

SHARD_MANIFEST_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, n_chars,
         ((('0x' || substr(md5('sh' || doc_id::VARCHAR), 1, 8))::BIGINT
           % {MANIFEST_SHARDS} + {MANIFEST_SHARDS}) % {MANIFEST_SHARDS}) AS shard,
         ('0x' || substr(md5('fp' || doc_id::VARCHAR), 1, 12))::BIGINT % {_MANIFEST_FP_MOD} AS fp
  FROM documents
)
SELECT shard,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       min(doc_id)::BIGINT AS min_doc_id,
       max(doc_id)::BIGINT AS max_doc_id,
       sum(fp)::BIGINT AS content_fingerprint
FROM assigned GROUP BY shard ORDER BY shard
"""


@register("layout_shard_manifest", SHARD_MANIFEST_ORACLE, tags=("layout", "llm", "scale", "audit"))
def layout_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducibility manifest for a {MANIFEST_SHARDS}-way hash-sharded
    training-data write: per shard, row/byte totals, the id envelope, and
    an ORDER-FREE content fingerprint (sum of per-doc 48-bit md5 terms) —
    the receipt two independent pipeline runs compare to prove they wrote
    the same corpus without re-reading either copy. A commutative sum is
    the right fingerprint at scale: it is partition-order- and
    task-retry-insensitive, unlike a concatenated digest (any two
    differing corpora collide with probability ~ shard_count / 2^48).

    Scale shape: one projection + one {MANIFEST_SHARDS}-row hash-agg,
    fully map-side combined; the manifest is what partitionBy(shard)
    writers emit per file in the real system."""
    t = load_tables(spark, sf_dir)
    assigned = t["documents"].select(
        "doc_id", "n_chars",
        F.expr(
            f"pmod(CAST(conv(substring(md5(concat('sh', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT), {MANIFEST_SHARDS})"
        ).alias("shard"),
        F.expr(
            f"CAST(conv(substring(md5(concat('fp', CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT) % {_MANIFEST_FP_MOD}"
        ).alias("fp"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
            F.sum("fp").cast("long").alias("content_fingerprint"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Compaction planning: pack small "files" into target-size groups with a
# sequential (order-preserving) fill — the OPTIMIZE/compact planning query
# a lakehouse maintenance job runs nightly.
# ---------------------------------------------------------------------------

COMPACT_TARGET_ROWS = 4096   # target rows per compacted output file
COMPACT_WASTE_BP_MAX = 10000

COMPACTION_PLAN_ORACLE = f"""
WITH files AS (
  -- one "file" per (ship-month, return-flag): the small-file population a
  -- partitioned daily ingest actually produces
  SELECT date_trunc('month', l_shipdate) AS part_month, l_returnflag AS flag,
         count(*)::BIGINT AS n_rows
  FROM lineitem GROUP BY 1, 2
),
seq AS (
  SELECT *,
         sum(n_rows) OVER (ORDER BY part_month, flag
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM files
),
binned AS (
  -- order-preserving sequential fill: a file joins the group its cumulative
  -- row count lands in (cum-1 keeps an exact-boundary file in the group it
  -- fills rather than opening the next one)
  SELECT *, ((cum - 1) // {COMPACT_TARGET_ROWS})::BIGINT AS grp FROM seq
)
SELECT grp,
       count(*)::BIGINT AS n_files,
       sum(n_rows)::BIGINT AS n_rows,
       min(part_month) AS first_month,
       max(part_month) AS last_month,
       CASE WHEN sum(n_rows) >= {COMPACT_TARGET_ROWS}
            THEN 0
            ELSE ((10000 * ({COMPACT_TARGET_ROWS} - sum(n_rows))) // {COMPACT_TARGET_ROWS})
       END::BIGINT AS underfill_bp
FROM binned
GROUP BY grp ORDER BY grp
"""


@register("layout_compaction_plan", COMPACTION_PLAN_ORACLE, tags=("layout", "warehouse", "maintenance"))
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: the (ship-month, return-flag) grain
    stands in for a partitioned ingest's small-file population; files are
    packed into target-size output groups by an ORDER-PRESERVING
    sequential fill (cumulative rows div target — the bucket rule that
    keeps each compacted file a contiguous month range, so partition
    pruning on the compacted layout still works; the verify-skill lesson:
    order-preserving buckets, never mod). The readout per planned output
    file: member count, rows, covered month range, and integer-bp
    underfill. Because input files are never split, an interior group may
    underfill by strictly less than the next group's straddling first
    file (tested); a real compactor uses underfill_bp to decide whether
    the straddle is worth a row-level rewrite.

    Scale shape: the file inventory is a metadata-scale hash-agg (in a
    real lakehouse it reads the manifest, not the data); the fill is one
    running-sum window over |files| rows ordered by the partition key.
    The data itself is never shuffled — this is the PLANNING query; the
    rewrite it emits is a separate repartitionByRange job per group."""
    t = load_tables(spark, sf_dir)
    files = (
        t["lineitem"]
        .groupBy(
            F.date_trunc("month", "l_shipdate").alias("part_month"),
            F.col("l_returnflag").alias("flag"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    binned = files.select(
        "*",
        F.expr(f"(sum(n_rows) OVER (ORDER BY part_month, flag "
               f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) div {COMPACT_TARGET_ROWS}")
        .alias("grp"),
    )
    return (
        binned.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("part_month").alias("first_month"),
            F.max("part_month").alias("last_month"),
            F.when(F.sum("n_rows") >= COMPACT_TARGET_ROWS, F.lit(0))
            .otherwise(
                F.expr(f"(10000 * ({COMPACT_TARGET_ROWS} - sum(n_rows))) div {COMPACT_TARGET_ROWS}")
            )
            .cast("long").alias("underfill_bp"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# Hilbert curve: the OTHER multi-dimensional clustering curve (Iceberg's
# OPTIMIZE supports both). Z-order takes long jumps at power-of-two
# boundaries, splitting some query boxes across distant curve ranges;
# Hilbert is continuous (every step moves to an adjacent cell), which
# typically reads fewer files for the same box predicate. The mapping is
# the classic per-level quadrant fold (Wikipedia xy2d): at each level s,
# the quadrant digit is (3*rx) XOR ry and the frame rotates/reflects —
# expressed here with div/mod/CASE only, unrolled once per level, so the
# SAME arithmetic runs in Spark (chained projections) and DuckDB
# (chained CTEs) and is oracle-verifiable row-by-row.
# ---------------------------------------------------------------------------

H_SIDE = 1 << Z_BITS  # 16 bits per dimension, same domain as the Z curve


def _hilbert_step_sql(s: int) -> tuple[str, str, str]:
    """(d_increment, x_new, y_new) SQL for one level, over columns hx/hy.

    rx/ry are the level-s bits; the quadrant digit (3*rx) XOR ry over
    bits is the polynomial 3*rx + ry - 2*rx*ry; the rotation keeps
    (hx, hy) when ry=1, swaps when ry=0 & rx=0, and reflects-then-swaps
    (x -> side-1-x) when ry=0 & rx=1."""
    rx = f"((hx // {s}) % 2)"
    ry = f"((hy // {s}) % 2)"
    dq = f"{s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    x_new = (
        f"CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 0 THEN hy ELSE {H_SIDE - 1} - hy END"
    )
    y_new = (
        f"CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 0 THEN hx ELSE {H_SIDE - 1} - hx END"
    )
    return dq, x_new, y_new


def hilbert_df(base: DataFrame, x_sql: str, y_sql: str, out: str = "hval") -> DataFrame:
    """Append the Hilbert curve value of two non-negative integer SQL
    expressions (low 16 bits of each) as column ``out`` — one chained
    projection per level, all codegen'd integer arithmetic."""
    df = base.select(
        "*",
        F.expr(f"({x_sql}) % {H_SIDE}").alias("hx"),
        F.expr(f"({y_sql}) % {H_SIDE}").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
    )
    s = H_SIDE // 2
    while s > 0:
        dq, x_new, y_new = _hilbert_step_sql(s)
        df = df.select(
            *[c for c in df.columns if c not in ("hx", "hy", "hd")],
            F.expr(x_new.replace("//", " div ")).alias("hx"),
            F.expr(y_new.replace("//", " div ")).alias("hy"),
            (F.col("hd") + F.expr(dq.replace("//", " div "))).cast("long").alias("hd"),
        )
        s //= 2
    return df.withColumnRenamed("hd", out).drop("hx", "hy")


def _hilbert_oracle_chain(x_sql: str, y_sql: str) -> str:
    """The identical fold as chained DuckDB CTEs; yields CTE text whose
    final relation h{levels} carries lineitem keys + hd."""
    steps = [
        f"h0 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,"
        f" ({x_sql}) % {H_SIDE} AS hx, ({y_sql}) % {H_SIDE} AS hy, 0::BIGINT AS hd FROM lineitem)"
    ]
    s, i = H_SIDE // 2, 0
    while s > 0:
        dq, x_new, y_new = _hilbert_step_sql(s)
        steps.append(
            f"h{i + 1} AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,"
            f" {x_new} AS hx, {y_new} AS hy, (hd + {dq})::BIGINT AS hd FROM h{i})"
        )
        s //= 2
        i += 1
    return ",\n".join(steps), f"h{i}"


_H_CTES, _H_LAST = _hilbert_oracle_chain("l_partkey", "l_suppkey")

LAYOUT_HILBERT_ORACLE = f"""
WITH {_H_CTES}
SELECT l_orderkey, l_linenumber, hd AS hval
FROM {_H_LAST}
ORDER BY l_orderkey, l_linenumber
"""


@register("layout_hilbert", LAYOUT_HILBERT_ORACLE, tags=("layout", "scale"))
def layout_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert curve value per lineitem row over (l_partkey, l_suppkey) —
    the write path is the same repartitionByRange + sortWithinPartitions
    as layout_zorder with hval in place of zval. Same integer-only
    unrolled fold on both engines ({Z_BITS} levels of div/mod/CASE), so
    the mapping is verified row-by-row; layout_curve_ab is the standing
    A/B that prices Hilbert's continuity against Z-order's cheaper
    expression on the SAME zone-map grading."""
    t = load_tables(spark, sf_dir)
    base = t["lineitem"].select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    return (
        hilbert_df(base, "l_partkey", "l_suppkey")
        .select("l_orderkey", "l_linenumber", F.col("hval"))
        .orderBy("l_orderkey", "l_linenumber")
    )


LAYOUT_CURVE_AB_ORACLE = f"""
WITH {_H_CTES},
base AS MATERIALIZED (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, hd AS hval,
         {_ZV} AS zval
  FROM {_H_LAST}
), laid AS (
  SELECT 'hilbert' AS layout,
         ntile({AUDIT_FILES}) OVER (ORDER BY hval, l_orderkey, l_linenumber) AS f,
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
  SELECT 'box_both_keys' AS predicate, layout, n_rows, n_match,
         CASE WHEN pk_lo <= {BOX_PK_HI} AND pk_hi >= {BOX_PK_LO}
               AND sk_lo <= {BOX_SK_HI} AND sk_hi >= {BOX_SK_LO}
              THEN 1 ELSE 0 END AS must_read
  FROM zone
  UNION ALL
  SELECT 'suppkey_only', layout, n_rows, n_match_sk,
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


@register("layout_curve_ab", LAYOUT_CURVE_AB_ORACLE, tags=("layout", "scale"))
def layout_curve_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs Hilbert, graded head-to-head on the SAME zone-map
    methodology as layout_skipping_audit (same {AUDIT_FILES} logical
    files, same box and single-key predicates, same min/max overlap
    rule a parquet reader applies). This is the standing physical-design
    A/B the two curve operators exist to answer: Hilbert's continuity
    (every curve step is an adjacent cell — no Z-shaped jumps) buys
    tighter file envelopes for the same write cost, vs Z-order's cheaper
    64-term expression; the scorecard prices that trade per predicate
    the way tpcds_q67 vs q67a prices ExpandExec vs unioned hash-aggs.

    Scale shape: one scan computes BOTH curve values (codegen'd integer
    folds), the audit's global ntile sorts stand in for the write-path
    repartitionByRange (costed once on a sample at 100 TB), and grading
    is two hash-aggs over |files| rows."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    base = hilbert_df(
        t["lineitem"].select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        "l_partkey",
        "l_suppkey",
    ).withColumn("zval", zorder_expr("l_partkey", "l_suppkey"))
    laid = None
    for name, order in (("hilbert", "hval"), ("zorder", "zval")):
        part = base.select(
            F.lit(name).alias("layout"),
            F.ntile(AUDIT_FILES).over(W.orderBy(order, "l_orderkey", "l_linenumber")).alias("f"),
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
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("must_read").cast("long").alias("files_read"),
            F.expr("(10000 * (count(*) - sum(must_read))) div count(*)")
            .cast("long").alias("skip_bp"),
            F.sum(F.when(F.col("must_read") == 1, F.col("n_rows")).otherwise(0))
            .cast("long").alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        )
        .orderBy("predicate", "layout")
    )
