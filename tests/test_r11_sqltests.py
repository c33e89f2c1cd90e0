"""Round-11 golden pins the value-hash batteries in
sol_spark/queries/sqltests_subquery.py cannot carry: AnalysisException
cells the reference's .out files record as errors, and the coercion cells
where Spark and DuckDB GENUINELY diverge (a cross-engine oracle would be
wrong on one side by construction — the Spark outcome is pinned here and
the divergence documented).

Reference inputs: typeCoercion/native/{booleanEquality,binaryComparison,
widenSetOperationTypes,windowFrameCoercion}.sql and
subquery/in-subquery/in-multiple-columns.sql + in-limit.sql."""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException


# --- booleanEquality.sql: the string cell diverges, the temporal error ---


def test_boolean_eq_string_is_spark_only_coercion(spark):
    """`true = CAST(1 AS STRING)` is TRUE in Spark (the string casts to
    boolean) but FALSE in DuckDB (boolean casts to VARCHAR 'true') — a
    genuine dialect divergence, so the cell is pinned per-engine instead
    of oracle-paired."""
    assert spark.sql("SELECT true = CAST(1 AS STRING) AS v").first().v is True
    import duckdb

    assert duckdb.sql("SELECT true = CAST(1 AS STRING) AS v").fetchone()[0] is False


@pytest.mark.parametrize(
    "rhs", ["CAST('2017-12-11 09:30:00' AS TIMESTAMP)", "DATE '2017-12-11'"]
)
def test_boolean_eq_temporal_raises(spark, rhs):
    """booleanEquality.sql: boolean = timestamp/date has no coercion path —
    the golden .out records the analysis error."""
    with pytest.raises(AnalysisException):
        spark.sql(f"SELECT true = {rhs}").collect()


# --- binaryComparison.sql: binary-vs-string is Spark-only coercion -------


def test_binary_lt_string_spark_casts_string_to_binary(spark):
    """`x'11' < 'a'` is TRUE in Spark (the string side casts to BINARY,
    0x11 < 0x61) but FALSE in DuckDB (which resolves the mixed compare the
    other way) — a genuine dialect divergence, pinned per-engine; the
    binary-vs-binary cells agree and are oracle-paired in
    sqltests_coercion_widen."""
    assert spark.sql("SELECT x'11' < 'a' AS v").first().v is True
    import duckdb

    assert duckdb.sql("SELECT x'11' < 'a' AS v").fetchone()[0] is False


# --- widenSetOperationTypes.sql: the incompatible cells ------------------


@pytest.mark.parametrize(
    "rhs",
    [
        "CAST('2' AS BINARY)",
        "CAST(1 AS BOOLEAN)",
        "TIMESTAMP '2017-12-11 09:30:00'",
        "DATE '2017-12-11'",
    ],
)
def test_union_tinyint_incompatible_raises(spark, rhs):
    """widenSetOperationTypes.sql: numeric UNION binary/boolean/temporal
    has no common type — INCOMPATIBLE_COLUMN_TYPE, exactly what the
    golden .out records."""
    with pytest.raises(AnalysisException):
        spark.sql(f"SELECT CAST(1 AS TINYINT) UNION SELECT {rhs}").collect()


# --- windowFrameCoercion.sql: RANGE frame key-type rules ------------------


@pytest.mark.parametrize(
    "key", ["CAST(1 AS STRING)", "CAST(1 AS BOOLEAN)", "CAST('1' AS BINARY)"]
)
def test_range_frame_non_numeric_key_raises(spark, key):
    """windowFrameCoercion.sql: a RANGE frame with a numeric offset needs
    an orderable+arithmetic key type; string/boolean/binary keys raise
    SPECIFIED_WINDOW_FRAME_UNACCEPTED_TYPE (the numeric and DATE cells are
    oracle-paired in sqltests_coercion_widen)."""
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT COUNT(*) OVER (PARTITION BY 1 ORDER BY"
            f" {key} DESC RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING)"
        ).collect()


def test_default_frame_allows_any_orderable_key(spark):
    """Without an explicit RANGE offset the default frame accepts any
    orderable key (boolean shown) — the coercion rule is about the
    offset arithmetic, not the ordering."""
    row = spark.sql(
        "SELECT COUNT(*) OVER (PARTITION BY 1 ORDER BY CAST(1 AS BOOLEAN)) AS v"
    ).first()
    assert row.v == 1


# --- in-multiple-columns.sql: arity mismatch ------------------------------


def test_row_value_in_arity_mismatch_raises(spark):
    """(a, b) IN (single-column subquery) is IN_SUBQUERY_LENGTH_MISMATCH —
    the negative case of the row-value IN family whose positive forms are
    oracle-paired in sqltests_in_cte_multicol."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT 1 WHERE (1, 2) IN (SELECT 1)").collect()


# --- in-limit.sql: the determinization note is real -----------------------


def test_unordered_limit_subquery_is_nondeterministic_shape(spark):
    """The reference's in-limit TC 01.02 takes `LIMIT 2` of an UNORDERED
    subquery — membership then depends on physical row order, which a
    value-hash oracle cannot pin (the battery adds a total ORDER BY).
    This pin proves the determinized form is a superset-stable rewrite:
    with the total order, the LIMIT-2 set is exactly {16, 16} -> {16}."""
    rows = spark.sql(
        "SELECT v FROM (SELECT CAST(c AS BIGINT) AS v FROM VALUES (16, 19),"
        " (16, 119), (12, 219) AS t(c, d) WHERE c >= 12"
        " ORDER BY c NULLS FIRST, d LIMIT 2) z ORDER BY v"
    ).collect()
    assert [r.v for r in rows] == [12, 16]
