"""Grouped-map and cogrouped pandas operators (typed object-op parity).

Reference: FlatMapGroupsInPandasExec / FlatMapCoGroupsInPandas — the Arrow
execution of MapGroupsExec / CoGroupExec
(/root/reference/sql/core/src/main/scala/org/apache/spark/sql/execution/objects.scala:68-445,
/root/reference/sql/core/.../execution/python/FlatMapGroupsInPandasExec.scala:49).

These are the extension points where per-group imperative logic (model
scoring, tokenizer calls, per-user sessionization) plugs in. Both queries
here compute something SQL can also express, so the Arrow boundary itself
is oracle-verified — the production use is the non-SQL payload.

Scale: applyInPandas shuffles once on the group key and holds ONE group in
memory per call — groups must fit in an executor (events per user_id do;
a power-law key would need salting first).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sol_spark.registry import register
from sol_spark.tables import load_tables

ZSCORE_ORACLE = """
SELECT event_id, event_type,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
FROM events
ORDER BY event_id
"""


@register("pd_grouped_zscore", ZSCORE_ORACLE, tags=("pandas_udf", "groupedmap"))
def pd_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via applyInPandas grouped-map: one group = one
    pandas frame; numpy ddof=1 matches SQL stddev_samp. The oracle is the
    window-function formulation of the same math."""

    def zscore(pdf):  # noqa: ANN001
        import numpy as np

        v = pdf["value"].to_numpy(dtype="float64")
        mu = v.mean()
        sd = v.std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["z"] = np.round((v - mu) / sd, 4)
        return out

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, schema="event_id bigint, event_type string, z double")
        .orderBy("event_id")
    )


COGROUP_ORACLE = """
WITH p AS (
  SELECT user_id, count(*) AS n_purchases, round(sum(value), 2) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), v AS (
  SELECT user_id, count(*) AS n_views FROM events WHERE event_type = 'view' GROUP BY user_id
)
SELECT coalesce(p.user_id, v.user_id) AS user_id,
       coalesce(n_purchases, 0) AS n_purchases,
       coalesce(purchase_value, 0.0) AS purchase_value,
       coalesce(n_views, 0) AS n_views
FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
ORDER BY user_id
"""


@register("pd_cogroup_user_funnel", COGROUP_ORACLE, tags=("pandas_udf", "cogroup"))
def pd_cogroup_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup(...).applyInPandas: purchases and views cogrouped per user,
    merged in pandas (the CoGroupExec path). Either side may be empty for a
    key — the full-outer semantics the oracle mirrors with FULL JOIN."""

    def funnel(key, purchases, views):  # noqa: ANN001
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_purchases": [len(purchases)],
                "purchase_value": [round(float(purchases["value"].sum()), 2) if len(purchases) else 0.0],
                "n_views": [len(views)],
            }
        )

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "value")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "value")
    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(funnel, schema="user_id bigint, n_purchases bigint, purchase_value double, n_views bigint")
        .orderBy("user_id")
    )


WAVG_ORACLE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("pd_grouped_wavg", WAVG_ORACLE, tags=("pandas_udf", "udaf"))
def pd_grouped_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via a GROUPED_AGG pandas UDF (reference UserDefinedAggregateFunction,
    sql/core/.../expressions/udaf.scala:32, Arrow path
    AggregateInPandasExec.scala:42): quantity-weighted average price per
    return flag. Partial aggregation does NOT apply to pandas UDAFs — the
    whole group's columns stream to Python — so at scale keep group counts
    high-cardinality or pre-aggregate; the oracle is the relational
    formulation."""
    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


UDTF_CHUNK_ORACLE = """
SELECT doc_id, i AS pos, array_to_string(tk[(i*5 + 1):(i*5 + 5)], ' ') AS chunk
FROM (
  SELECT doc_id, string_split(text, ' ') AS tk
  FROM documents WHERE doc_id % 50 = 0
), unnest(generate_series(0, (len(tk) - 1) // 5)) AS g(i)
ORDER BY doc_id, pos
"""


@register("udtf_chunk", UDTF_CHUNK_ORACLE, tags=("udtf", "pandas_udf"))
def udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (table function): 1 row -> N token-chunk rows. The
    reference only passes UDTFs through to Hive (SURVEY §2.10,
    GenerateExec.scala:58 for built-in generators); modern PySpark makes
    them first-class. The oracle reproduces the fan-out with unnest, so
    the UDTF row-expansion contract itself is hash-verified. Scale note:
    UDTFs run row-at-a-time in Python — fine for low-volume expansion,
    use explode/mapInPandas for hot paths (design rule, README)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, chunk string")
    class ChunkTokens:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = text.split(" ")
            for i in range(0, len(toks), 5):
                yield doc_id, i // 5, " ".join(toks[i : i + 5])

    spark.udtf.register("chunk_tokens", ChunkTokens)
    t = load_tables(spark, sf_dir)
    t["documents"].filter(F.col("doc_id") % 50 == 0).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT s.doc_id, s.pos, s.chunk "
        "FROM udtf_docs d, LATERAL chunk_tokens(d.doc_id, d.text) s "
        "ORDER BY s.doc_id, s.pos"
    )


ARROW_BATCH_ORACLE = """
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_ws
FROM documents ORDER BY doc_id
"""


@register("pd_map_in_arrow", ARROW_BATCH_ORACLE, tags=("udf", "arrow"))
def pd_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow registered end-to-end (not just unit-tested): per-batch
    pyarrow.compute kernels — utf8_length and whitespace token counts —
    with zero pandas materialization. The RecordBatch path is the lowest-
    overhead Python escape (no Series boxing); at 100 TB batches stream
    through the Python worker at Arrow speed and the plan stays a single
    partition-local MapInArrow node (no shuffle). Reference surface:
    Dataset.mapPartitions (objects.scala) — this is its vectorized modern
    form."""
    from sol_spark.tables import load_tables

    t = load_tables(spark, sf_dir)

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            doc_id = b.column("doc_id")
            text = b.column("text")
            n_chars = pc.utf8_length(text)
            n_ws = pc.list_value_length(pc.split_pattern(text, " "))
            yield pa.RecordBatch.from_arrays(
                [doc_id, pc.cast(n_chars, pa.int64()), pc.cast(n_ws, pa.int64())],
                ["doc_id", "n_chars", "n_ws"],
            )

    return (
        t["documents"]
        .select("doc_id", "text")
        .mapInArrow(stats, "doc_id bigint, n_chars bigint, n_ws bigint")
        .orderBy("doc_id")
    )
