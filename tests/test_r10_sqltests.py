"""Golden pins mined from the reference's sql-tests corpus that a
value-hash oracle CANNOT carry: negative cases the reference's .out files
record as errors, Spark-dialect sugar equivalences, output-order-only
semantics, and decimal typing (DecimalType outputs are banned from
registered queries corpus-wide). Companion to the oracle-paired
sqltests_* batteries in sol_spark/queries/sqltests.py.

Reference inputs: sql-tests/inputs/limit.sql,
typeCoercion/native/division.sql, group-analytics.sql,
order-by-nulls-ordering.sql, tablesample-negative.sql."""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException, ParseException

from sol_spark.queries.sqltests import _CS_SPARK, _NO_SPARK, _TD_SPARK


def _sql(spark, q):
    return spark.sql(q)


# --- limit.sql negative checks -------------------------------------------


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT * FROM range(5) LIMIT -1",  # must be non-negative
        "SELECT * FROM range(5) LIMIT id > 3",  # must be foldable
        "SELECT * FROM range(5) LIMIT true",  # must be integer
        "SELECT * FROM range(5) LIMIT 'a'",
    ],
)
def test_limit_negative_cases_raise(spark, bad):
    """limit.sql: LIMIT must be a non-negative foldable integer — each
    violation is an AnalysisException, exactly what the golden .out
    records."""
    with pytest.raises(AnalysisException):
        _sql(spark, bad).collect()


def test_tablesample_negative_rows_raises(spark):
    """tablesample-negative.sql: TABLESAMPLE (-1 ROWS) is rejected at
    parse/analysis time."""
    with pytest.raises((AnalysisException, ParseException)):
        _sql(spark, "SELECT * FROM range(5) TABLESAMPLE (-1 ROWS)").collect()


# --- typeCoercion/native/division.sql: illegal cells + decimal typing -----


@pytest.mark.parametrize(
    "lhs",
    [
        "CAST(1 AS BOOLEAN)",
        "CAST('1' AS BINARY)",
        "CAST('2017-12-11 09:30:00.0' AS TIMESTAMP)",
        "CAST('2017-12-11' AS DATE)",
    ],
)
def test_division_illegal_operand_raises(spark, lhs):
    """division.sql: boolean/binary/timestamp/date operands do not coerce
    to a divisible type — AnalysisException, matching the golden."""
    with pytest.raises(AnalysisException):
        _sql(spark, f"SELECT {lhs} / CAST(1 AS INT)").collect()


def test_division_decimal_keeps_decimal_type(spark):
    """division.sql decimal rows (excluded from the oracle battery because
    DecimalType output columns are banned corpus-wide): decimal/decimal
    division STAYS decimal — Spark's one division that does not widen to
    double — and decimal/integral also yields decimal."""
    row = _sql(
        spark,
        "SELECT CAST(1 AS DECIMAL(10, 0)) / CAST(2 AS DECIMAL(10, 0)) AS a,"
        " CAST(1 AS DECIMAL(10, 0)) / CAST(2 AS INT) AS b",
    )
    types = dict(row.dtypes)
    assert types["a"].startswith("decimal"), types
    assert types["b"].startswith("decimal"), types
    got = row.collect()[0]
    assert float(got["a"]) == 0.5 and float(got["b"]) == 0.5


def test_division_string_operands_mode_dependent(spark):
    """division.sql string cells: under the engine profile (ANSI off,
    matching the reference's pre-ANSI golden) string operands implicitly
    cast to DOUBLE; under ANSI they are analysis errors. Excluded from
    the oracle battery for exactly this session-dependence — pinned here
    per mode."""
    q = (
        "SELECT CAST(CAST('1' AS STRING) / CAST(2 AS INT) AS DOUBLE) AS a,"
        " CAST(CAST(1 AS INT) / CAST('2' AS STRING) AS DOUBLE) AS b,"
        " CAST(CAST('1' AS STRING) / CAST('2' AS STRING) AS DOUBLE) AS c"
    )
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    got = _sql(spark, q).collect()[0]
    assert (got["a"], got["b"], got["c"]) == (0.5, 0.5, 0.5)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(AnalysisException):
            _sql(spark, "SELECT CAST('1' AS STRING) / CAST('2' AS STRING)").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


# --- group-analytics.sql: Spark-only sugar == portable spelling -----------


def test_with_cube_sugar_equals_portable_cube(spark):
    """group-analytics.sql: `GROUP BY a + b, b WITH CUBE` (Spark sugar,
    no DuckDB equivalent — the oracle battery uses the portable form)
    must produce exactly the portable GROUP BY CUBE(a + b, b) result."""
    sugar = _sql(
        spark,
        f"WITH testData AS ({_TD_SPARK})"
        " SELECT a + b AS k, b, SUM(a - b) AS s FROM testData GROUP BY a + b, b WITH CUBE",
    ).collect()
    portable = _sql(
        spark,
        f"WITH testData AS ({_TD_SPARK})"
        " SELECT a + b AS k, b, SUM(a - b) AS s FROM testData GROUP BY CUBE(a + b, b)",
    ).collect()
    key = lambda r: (r["k"] is None, r["k"], r["b"] is None, r["b"], r["s"])  # noqa: E731
    assert sorted(sugar, key=key) == sorted(portable, key=key)


def test_select_alias_resolves_inside_cube(spark):
    """group-analytics.sql: SELECT aliases are usable in CUBE/ROLLUP —
    GROUP BY CUBE(k1, k2) with k1 = a + b, k2 = b equals the expression
    spelling."""
    aliased = _sql(
        spark,
        f"WITH testData AS ({_TD_SPARK})"
        " SELECT a + b AS k1, b AS k2, SUM(a - b) AS s FROM testData GROUP BY CUBE(k1, k2)",
    ).collect()
    expr = _sql(
        spark,
        f"WITH testData AS ({_TD_SPARK})"
        " SELECT a + b AS k1, b AS k2, SUM(a - b) AS s FROM testData GROUP BY CUBE(a + b, b)",
    ).collect()
    key = lambda r: (r["k1"] is None, r["k1"], r["k2"] is None, r["k2"], r["s"])  # noqa: E731
    assert sorted(aliased, key=key) == sorted(expr, key=key)


def test_grouping_without_groupsets_raises(spark):
    """group-analytics.sql: GROUPING()/GROUPING_ID() in HAVING without
    CUBE/ROLLUP/GROUPING SETS is an analysis error."""
    for fn in ("GROUPING(course)", "GROUPING_ID(course)"):
        with pytest.raises(AnalysisException):
            _sql(
                spark,
                f"WITH courseSales AS ({_CS_SPARK})"
                f" SELECT course, year FROM courseSales GROUP BY course, year HAVING {fn} > 0",
            ).collect()


# --- order-by-nulls-ordering.sql Q7/Q8: output-order-only semantics -------


def test_order_by_nulls_first_last_placement(spark):
    """order-by-nulls-ordering.sql Q7/Q8: plain ORDER BY col3 ASC NULLS
    FIRST puts the two NULL-col3 rows first, NULLS LAST puts them last —
    pure output order, invisible to the row-sorted value hash, so pinned
    here positionally."""
    base = f"WITH spark_10747 AS ({_NO_SPARK}) SELECT col2, col3 FROM spark_10747"
    first = _sql(spark, base + " ORDER BY col3 ASC NULLS FIRST, col2").collect()
    last = _sql(spark, base + " ORDER BY col3 NULLS LAST, col2").collect()
    assert [r["col3"] for r in first[:2]] == [None, None]
    assert [r["col2"] for r in first[:2]] == [10, 13]  # col2 tiebreak
    assert [r["col3"] for r in last[-2:]] == [None, None]
    assert [r["col3"] for r in first[2:]] == [r["col3"] for r in last[:-2]]
    # ASC default is NULLS FIRST in Spark (the golden's implicit check).
    default = _sql(spark, base + " ORDER BY col3, col2").collect()
    assert [r["col2"] for r in default] == [r["col2"] for r in first]


# --- binaryComparison.sql flavor: string<->numeric comparison coercion ----


def test_string_numeric_comparison_coerces(spark):
    """typeCoercion promoteStrings/binaryComparison flavor: a numeric
    compared to a numeric-looking string coerces and compares by VALUE
    ('1' = 1 true, '09' = 9 true — not lexicographic), while NULL
    comparisons stay NULL (filtered out by WHERE)."""
    got = _sql(
        spark,
        "SELECT '1' = 1 AS a, '09' = 9 AS b, 2 > '10' AS c,"
        " CAST(NULL AS STRING) = 1 AS d",
    ).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (True, True, False, None)


# --- group-by.sql: analysis errors ----------------------------------------


def test_group_by_ungrouped_column_raises(spark):
    """group-by.sql: selecting an ungrouped, unaggregated column is an
    analysis error, both with no GROUP BY at all and with a mismatched
    derived expression (a + 2 against GROUP BY a + 1)."""
    td = "(VALUES (1, 1), (2, 2)) AS testData(a, b)"
    with pytest.raises(AnalysisException):
        _sql(spark, f"SELECT a, COUNT(b) FROM {td}").collect()
    with pytest.raises(AnalysisException):
        _sql(spark, f"SELECT a + 2, COUNT(b) FROM {td} GROUP BY a + 1").collect()


def test_group_by_aggregate_in_group_by_raises(spark):
    """group-by.sql: an aggregate function cannot appear in GROUP BY
    (directly or smuggled through a SELECT alias)."""
    td = "(VALUES (1, 1), (2, 2)) AS testData(a, b)"
    with pytest.raises(AnalysisException):
        _sql(spark, f"SELECT COUNT(b) AS k FROM {td} GROUP BY k").collect()


def test_group_by_aliases_flag(spark):
    """group-by.sql: `set spark.sql.groupByAliases=false` turns the
    SELECT-alias-in-GROUP-BY resolution off — the same query flips from
    valid to AnalysisException."""
    td = "(VALUES (1, 1), (2, 2)) AS testData(a, b)"
    q = f"SELECT a AS k, COUNT(b) FROM {td} GROUP BY k"
    assert _sql(spark, q).count() == 2
    spark.conf.set("spark.sql.groupByAliases", "false")
    try:
        with pytest.raises(AnalysisException):
            _sql(spark, q).collect()
    finally:
        spark.conf.unset("spark.sql.groupByAliases")


# --- cte.sql: name-resolution precedence (Spark-dialect; DuckDB shadows) ---


def test_cte_resolution_precedence(spark):
    """cte.sql: a CTE's self-reference resolves to the BASE table (no
    infinite loop — `WITH s AS (SELECT 1 FROM s) SELECT * FROM s` reads
    the view s), forward references across sibling CTEs are invalid, and
    a later CTE sees the earlier one, not the base table. DuckDB CTEs
    shadow differently, so these are Spark-dialect pins, not oracle
    rows."""
    spark.sql("SELECT 0 AS id UNION ALL SELECT 1 UNION ALL SELECT 2").createOrReplaceTempView(
        "cte_t"
    )
    spark.sql("SELECT 0 AS id UNION ALL SELECT 1").createOrReplaceTempView("cte_t2")
    try:
        # Self-reference hits the base view: 3 rows of literal 1.
        got = _sql(spark, "WITH cte_t AS (SELECT 1 AS one FROM cte_t) SELECT * FROM cte_t").collect()
        assert [r["one"] for r in got] == [1, 1, 1]
        # Cross/forward reference between sibling CTEs is an error.
        with pytest.raises(AnalysisException):
            _sql(
                spark,
                "WITH s1 AS (SELECT 1 FROM s2), s2 AS (SELECT 1 FROM s1)"
                " SELECT * FROM s1, s2",
            ).collect()
        # A later CTE references the previous CTE, not the base table:
        # t1 = cte_t2 (2 rows), t2 = SELECT 2 FROM t1 (2 rows) -> 4 rows.
        got = _sql(
            spark,
            "WITH t1 AS (SELECT * FROM cte_t2), t2 AS (SELECT 2 AS two FROM t1)"
            " SELECT * FROM t1 CROSS JOIN t2",
        ).collect()
        assert len(got) == 4
        assert {(r["id"], r["two"]) for r in got} == {(0, 2), (1, 2)}
    finally:
        spark.catalog.dropTempView("cte_t")
        spark.catalog.dropTempView("cte_t2")


# --- window.sql: invalid frames -------------------------------------------


@pytest.mark.parametrize(
    "frame",
    [
        "ROWS BETWEEN UNBOUNDED FOLLOWING AND 1 FOLLOWING",  # inverted
        "RANGE BETWEEN 1 FOLLOWING AND 1 PRECEDING",  # lower > upper
    ],
)
def test_window_invalid_frame_raises(spark, frame):
    """window.sql: structurally invalid frames are analysis errors."""
    with pytest.raises(AnalysisException):
        _sql(
            spark,
            f"SELECT count(*) OVER (ORDER BY id {frame}) FROM range(3)",
        ).collect()


@pytest.mark.parametrize(
    "over",
    [
        "PARTITION BY cate RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING",  # no ORDER BY
        "PARTITION BY cate ORDER BY v, cate RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING",  # 2 keys
        "ORDER BY id ROWS BETWEEN CURRENT ROW AND 2147483648 FOLLOWING",  # int64 ROWS bound
    ],
)
def test_window_range_frame_requirements(spark, over):
    """window.sql: a value-RANGE frame needs exactly ONE ordering column
    (none / two are analysis errors), and ROWS bounds must fit int32
    (the int64 bound is legal only for RANGE — the oracle battery's
    range_big check)."""
    with pytest.raises(AnalysisException):
        _sql(
            spark,
            "SELECT count(*) OVER ("
            + over
            + ") FROM (SELECT id, id AS v, 'x' AS cate FROM range(3))",
        ).collect()


# --- operators.sql: ANSI-dependent and engine-divergent cells --------------


def test_division_by_zero_mode_dependent(spark):
    """operators.sql: 5/0, 5 div 0, mod(7,0), pmod(7,0) are NULL under
    the engine profile (legacy mode, matching the reference's golden) but
    errors under ANSI — session-dependent, so pytest-pinned per mode."""
    q = "SELECT 5 / 0 AS a, 5 div 0 AS b, mod(7, 0) AS c, pmod(7, 0) AS d"
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    got = _sql(spark, q).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (None, None, None, None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        from pyspark.errors import ArithmeticException

        with pytest.raises((ArithmeticException, Exception)) as ei:
            _sql(spark, "SELECT 5 / 0").collect()
        assert "DIVIDE_BY_ZERO" in str(ei.value)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_concat_plus_precedence_spark_dialect(spark):
    """operators.sql: `'a' || 1 + 2` parses as concat('a', 1) + 2 in Spark
    (|| at the multiplication-adjacent level of the Oracle precedence
    table the file documents) — 'a1' + 2 is a failed numeric cast, NULL
    under legacy mode. DuckDB parses || BELOW + and returns 'a3', a
    genuine cross-engine precedence divergence, which is why this cell is
    pinned here rather than oracle-compared."""
    got = _sql(spark, "SELECT 'a' || 1 + 2 AS x").collect()[0]
    assert got["x"] is None  # concat('a',1)+2 -> CAST('a1' AS DOUBLE) -> NULL
    import duckdb

    assert duckdb.connect().execute("SELECT 'a' || 1 + 2").fetchone()[0] == "a3"


# --- group-by-ordinal.sql / order-by-ordinal.sql: negatives + flag flips ---


@pytest.mark.parametrize("gb", ["-1", "0", "3"])
def test_group_by_ordinal_negatives(spark, gb):
    """group-by-ordinal.sql: out-of-range ordinals are analysis errors
    (ordinal 3 points past the two-column select list). The reference's
    nondeterministic-ordinal negative (GROUP BY a, 2 -> rand(0)) is NOT
    pinned: grouping by nondeterministic expressions became legal
    upstream after 2.4, so modern Spark accepts it."""
    with pytest.raises(AnalysisException):
        _sql(
            spark,
            f"SELECT a, b FROM (VALUES (1, 1), (2, 2)) data(a, b) GROUP BY {gb}",
        ).collect()


def test_group_by_star_raises(spark):
    """group-by-ordinal.sql: star in the select list of a grouped query is
    an analysis error."""
    with pytest.raises(AnalysisException):
        _sql(
            spark,
            "SELECT * FROM (VALUES (1, 1)) data(a, b) GROUP BY a, b, 1",
        ).collect()


def test_ordinal_flags_flip_to_literals(spark):
    """group-by-ordinal.sql / order-by-ordinal.sql: with
    groupByOrdinal/orderByOrdinal off, the integer is a LITERAL — GROUP
    BY -1 groups everything, ORDER BY 0 sorts by a constant (no-op)."""
    data = "(VALUES (1, 1), (2, 2), (3, 1)) data(a, b)"
    spark.conf.set("spark.sql.groupByOrdinal", "false")
    spark.conf.set("spark.sql.orderByOrdinal", "false")
    try:
        got = _sql(spark, f"SELECT sum(b) AS s FROM {data} GROUP BY -1").collect()
        assert [r["s"] for r in got] == [4]
        assert _sql(spark, f"SELECT a FROM {data} ORDER BY 0").count() == 3
    finally:
        spark.conf.unset("spark.sql.groupByOrdinal")
        spark.conf.unset("spark.sql.orderByOrdinal")
    # Flags back on: ORDER BY 0 is out-of-range again.
    with pytest.raises(AnalysisException):
        _sql(spark, f"SELECT a FROM {data} ORDER BY 0").collect()


def test_order_by_ordinal_output_order(spark):
    """order-by-ordinal.sql: ORDER BY 1 DESC / mixed ordinal+name /
    multiple ordinals — pure output order, pinned positionally."""
    data = "(VALUES (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)) data(a, b)"
    got = _sql(spark, f"SELECT a, b FROM {data} ORDER BY 1 DESC, 2 DESC").collect()
    assert [(r["a"], r["b"]) for r in got] == [(3, 2), (3, 1), (2, 2), (2, 1), (1, 2), (1, 1)]
    # 1 + 0 is a constant: ordering falls to the explicit b DESC only.
    got = _sql(spark, f"SELECT a, b FROM {data} ORDER BY 1 + 0 DESC, b DESC").collect()
    assert [r["b"] for r in got[:3]] == [2, 2, 2]


# --- pivot.sql: negatives ---------------------------------------------------


def test_pivot_negatives(spark):
    """pivot.sql: a non-aggregate pivot function and an unresolvable pivot
    column are analysis errors."""
    cs = "(VALUES ('dotNET', 2012, 10000), ('Java', 2013, 30000)) courseSales(course, year, earnings)"
    with pytest.raises(AnalysisException):
        _sql(
            spark,
            f"SELECT * FROM {cs} PIVOT (abs(earnings) FOR year IN (2012, 2013))",
        ).collect()
    with pytest.raises(AnalysisException):
        _sql(
            spark,
            f"SELECT * FROM (SELECT course, earnings FROM {cs}) p"
            " PIVOT (sum(earnings) FOR year IN (2012, 2013))",
        ).collect()


# --- inline-table.sql / table-valued-functions.sql: negatives ---------------


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT * FROM VALUES ('one', rand(5)), ('two', 3.0D) AS data(a, b)",  # nondeterministic
        "SELECT * FROM VALUES ('one', 2.0), ('two') AS data(a, b)",  # ragged rows
        "SELECT * FROM VALUES ('one', array(0, 1)), ('two', struct(1, 2)) AS data(a, b)",  # incompatible
        "SELECT * FROM VALUES ('one'), ('two') AS data(a, b)",  # alias arity
        "SELECT * FROM VALUES ('one', random_not_exist_func(1)) AS data(a, b)",  # unresolved fn
        "SELECT * FROM VALUES ('one', count(1)), ('two', 2) AS data(a, b)",  # aggregate
    ],
)
def test_inline_table_negatives(spark, bad):
    """inline-table.sql: VALUES rows must be deterministic, foldable,
    rectangular, type-compatible, alias-arity-consistent, and
    aggregate-free."""
    with pytest.raises(AnalysisException):
        _sql(spark, bad).collect()


def test_tvf_negatives(spark):
    """table-valued-functions.sql: unknown TVF, range() arity overflow,
    and a NULL range bound are errors."""
    with pytest.raises(AnalysisException):
        _sql(spark, "SELECT * FROM dummy(3)").collect()
    with pytest.raises(AnalysisException):
        _sql(spark, "SELECT * FROM range(1, 1, 1, 1, 1)").collect()
    with pytest.raises(AnalysisException):
        _sql(spark, "SELECT * FROM range(1, null)").collect()


# --- typeCoercion booleanEquality: per-mode -------------------------------


def test_boolean_numeric_equality_mode_dependent(spark):
    """booleanEquality.sql: true = 1 coerces under legacy mode (true for
    every numeric 1, incl. null-safe <=>), but is an analysis error under
    ANSI — session-dependent, pinned per mode."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    got = _sql(
        spark,
        "SELECT true = CAST(1 AS INT) AS a, true = CAST(1 AS DOUBLE) AS b,"
        " true <=> CAST(1 AS BIGINT) AS c, true = CAST(0 AS INT) AS d",
    ).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (True, True, True, False)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(AnalysisException):
            _sql(spark, "SELECT true = CAST(1 AS INT)").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


# --- predicate-functions.sql / dateTimeOperations.sql: per-mode + errors ---


def test_fractional_string_ordering_mode_dependent(spark):
    """predicate-functions.sql: 2 > '2.2' — legacy mode promotes both
    sides to DOUBLE (false); ANSI casts the string to the INT side's type
    and raises on the fractional literal. Session-dependent, pinned per
    mode (the stable direction — fractional string vs fractional numeric
    — lives in the oracle battery)."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    got = _sql(spark, "SELECT 2 > '2.2' AS a, 2 >= '2.0' AS b, 2 < '1.0' AS c").collect()[0]
    assert (got["a"], got["b"], got["c"]) == (False, True, False)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception) as ei:
            _sql(spark, "SELECT 2 > '2.2'").collect()
        assert "CAST_INVALID_INPUT" in str(ei.value)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


@pytest.mark.parametrize(
    "lhs",
    ["CAST(1 AS INT)", "CAST(1 AS DOUBLE)", "CAST('1' AS BINARY)", "CAST(1 AS BOOLEAN)"],
)
def test_interval_illegal_operand_raises(spark, lhs):
    """dateTimeOperations.sql: numeric/binary/boolean ± INTERVAL is an
    analysis error — only date/timestamp/string operands coerce."""
    with pytest.raises(AnalysisException):
        _sql(spark, f"SELECT {lhs} + INTERVAL 2 DAY").collect()
    with pytest.raises(AnalysisException):
        _sql(spark, f"SELECT {lhs} - INTERVAL 2 DAY").collect()
