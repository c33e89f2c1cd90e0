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


# --- sql-compatibility-functions.sql: Spark-only sugar + arity error ------


def test_cast_alias_functions_spark_sugar(spark):
    """The Hive cast-alias functions (boolean(x), int(x), ...) are
    Spark-only RuntimeReplaceable sugar — DuckDB has no such functions,
    so the cells are pinned here; the portable ifnull/nullif/nvl/nvl2
    surface is oracle-paired in sqltests_compat_functions."""
    row = spark.sql(
        "SELECT boolean(1) AS b, tinyint(1) AS t, smallint(1) AS s,"
        " int(1) AS i, bigint(1) AS l, float(1) AS f, double(1) AS d,"
        " string(1) AS st, date('2014-04-04') AS dt"
    ).first()
    assert row.b is True and row.t == 1 and row.s == 1 and row.i == 1
    assert row.l == 1 and row.f == 1.0 and row.d == 1.0 and row.st == "1"
    assert str(row.dt) == "2014-04-04"


def test_cast_alias_arity_error(spark):
    """string(1, 2): the cast aliases take exactly one argument — the
    golden .out records the analysis error."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT string(1, 2)").collect()


# --- subquery/negative-cases/invalid-correlation.sql ----------------------

_NEG_T = (
    "WITH t1 AS (SELECT 1 AS t1a, 2 AS t1b, 3 AS t1c),"
    " t2 AS (SELECT 1 AS t2a, 0 AS t2b, 1 AS t2c),"
    " t3 AS (SELECT 3 AS t3a, 1 AS t3b, 2 AS t3c)"
)


@pytest.mark.parametrize(
    "label,q",
    [
        ("tc0101_nonagg_column",
         "SELECT t1a, t2b FROM t1, t2 WHERE t1b = t2c AND t2b ="
         " (SELECT max(avg) FROM (SELECT t2b, avg(t2b) avg FROM t2"
         " WHERE t2a = t1.t1b))"),
        ("tc0102_outer_scope_two_up",
         "SELECT * FROM t1 WHERE t1a IN (SELECT min(t2a) FROM t2 GROUP BY"
         " t2c HAVING t2c IN (SELECT max(t3c) FROM t3 GROUP BY t3b"
         " HAVING t3b > t2b))"),
        ("tc0103_mixed_refs_in_agg",
         "SELECT t1a FROM t1 GROUP BY 1 HAVING EXISTS (SELECT 1 FROM t2"
         " WHERE t2a < min(t1a + t2a))"),
        ("tc0104_mixed_refs_nested",
         "SELECT t1a FROM t1 WHERE t1a IN (SELECT t2a FROM t2 WHERE EXISTS"
         " (SELECT 1 FROM t3 GROUP BY 1 HAVING min(t2a + t3a) > 1))"),
    ],
)
def test_invalid_correlation_raises(spark, label, q):
    """invalid-correlation.sql: correlation shapes the analyzer must
    REJECT — a non-aggregate subquery column escaping its aggregation, an
    outer reference reaching two scopes up into a HAVING, and
    local+outer references mixed under one aggregate expression. Each is
    an AnalysisException, exactly what the golden .out records."""
    with pytest.raises(AnalysisException):
        spark.sql(f"{_NEG_T} {q}").collect()


# --- subquery/negative-cases/subq-input-typecheck.sql ---------------------


@pytest.mark.parametrize(
    "label,q",
    [
        ("scalar_subq_two_columns",
         "SELECT (SELECT max(t2b), min(t2b) FROM t2 WHERE t2b > 0"
         " GROUP BY t2b) FROM t1"),
        ("in_subq_two_columns",
         "SELECT * FROM t1 WHERE t1a IN (SELECT t2a, t2b FROM t2"
         " WHERE t1a = t2a)"),
        ("row_value_in_one_column",
         "SELECT * FROM t1 WHERE (t1a, t1b) IN (SELECT t2a FROM t2"
         " WHERE t1a = t2a)"),
    ],
)
def test_subquery_input_typecheck_raises(spark, label, q):
    """subq-input-typecheck.sql: a scalar subquery must return one
    column and IN-subquery arity must match the probe row — each
    violation is an AnalysisException."""
    with pytest.raises(AnalysisException):
        spark.sql(f"{_NEG_T} {q}").collect()


# --- booleanEquality.sql: boolean = numeric is ANSI-session-dependent -----


@pytest.mark.parametrize(
    "t", ["TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE"]
)
def test_boolean_eq_numeric_per_mode(spark, t):
    """`true = CAST(1 AS <numeric>)` coerces and returns TRUE under
    legacy mode (the engine profile) but raises BINARY_OP_DIFF_TYPES
    under ANSI (the driver's vanilla session) — session-dependent, so the
    whole boolean=numeric matrix is pinned per mode here instead of
    oracle-paired (DuckDB agrees with the legacy answer for ints)."""
    q = f"SELECT (true = CAST(1 AS {t})) AS v, (CAST(1 AS {t}) = true) AS w"
    prior = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        row = spark.sql(q).first()
        assert row.v is True and row.w is True
        spark.conf.set("spark.sql.ansi.enabled", "true")
        with pytest.raises(AnalysisException):
            spark.sql(q).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)


# --- check_oracle --changed-since fast path (r10 verdict ask #7) ----------


def test_changed_since_selects_only_defining_modules():
    """--changed-since maps changed files to the queries their defining
    module registers, and falls back to a FULL sweep (None) the moment a
    non-query file is in the diff — helper-module edits must never
    silently narrow the sweep."""
    import importlib.util
    import os
    import sys as _sys
    from unittest import mock

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod", os.path.join(repo, "scripts", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from sol_spark.registry import all_queries

    specs = all_queries()

    def fake_diff(changed_files):
        cp = mock.Mock()
        cp.stdout = "\n".join(changed_files)
        return cp

    # Case 1: only a query-defining module changed -> exactly its names.
    with mock.patch("subprocess.run", return_value=fake_diff(
        ["sol_spark/queries/ssb.py"]
    )):
        names = mod._changed_query_names("HEAD~1", specs)
    assert names is not None
    assert names == {n for n in specs if n.startswith("ssb_")}

    # Case 2: a helper module in the diff -> full sweep (None).
    with mock.patch("subprocess.run", return_value=fake_diff(
        ["sol_spark/queries/ssb.py", "sol_spark/session.py"]
    )):
        assert mod._changed_query_names("HEAD~1", specs) is None

    # Case 3: non-.py files are ignored entirely.
    with mock.patch("subprocess.run", return_value=fake_diff(
        ["COVERAGE.md"]
    )):
        assert mod._changed_query_names("HEAD~1", specs) == set()


# --- function-registry gap audit: cells with no DuckDB analog -------------


def test_soundex_and_luhn_pins(spark):
    """soundex and luhn_check have no DuckDB analog (and a hand-derived
    SQL oracle would re-implement the whole algorithm) — pinned against
    the published reference values instead: Robert -> R163 (the canonical
    soundex example) and the classic Luhn test number 79927398713."""
    row = spark.sql(
        "SELECT soundex('Robert') AS s1, soundex('Rupert') AS s2,"
        " soundex('Tymczak') AS s3,"
        " luhn_check('79927398713') AS ok, luhn_check('79927398714') AS bad"
    ).first()
    assert row.s1 == "R163" and row.s2 == "R163" and row.s3 == "T522"
    assert row.ok is True and row.bad is False
