"""Round-11 sql-tests mining: the subquery golden directory plus the
leftover small inputs (r10 verdict "what's missing #2").

Sources re-derived (reference
`sql/core/src/test/resources/sql-tests/inputs/`, harness
`sql/core/src/test/scala/org/apache/spark/sql/SQLQueryTestSuite.scala:98`):

- subquery/scalar-subquery/scalar-subquery-{predicate,select}.sql —
  the correlated-scalar decorrelation paths
  (`catalyst/optimizer/subquery.scala:286` RewriteCorrelatedScalarSubquery).
- subquery/in-subquery/{in-joins,not-in-joins,in-group-by,not-in-group-by,
  in-having,in-limit,in-order-by,in-set-operations,in-with-cte,
  in-multiple-columns}.sql — the IN/NOT-IN decorrelation paths
  (`subquery.scala:44,174` RewritePredicateSubquery).
- grouping_set.sql + inner-join.sql + pred-pushdown.sql + comparator.sql.
- typeCoercion/native/{widenSetOperationTypes,booleanEquality,
  binaryComparison,windowFrameCoercion}.sql — the session-stable,
  cross-engine-agreeing cells; Spark-only coercion outcomes and
  AnalysisException cells are pinned in tests/test_r11_sqltests.py.

Mining recipe (proven in round 10, sqltests.py): each input file's checks
become ONE labeled UNION-ALL battery with a uniform, fully-CAST output
schema (check_name STRING, s STRING, n1 BIGINT, n2 BIGINT, d DOUBLE) so
the driver's exact-hash compare pins every edge at once. The battery body
is SHARED VERBATIM by both dialects (DuckDB accepts CAST(.. AS STRING));
the only per-dialect split is row-value IN/NOT IN, which DuckDB's binder
rejects — its oracle states the EXISTS / null-aware NOT-EXISTS definition
independently (the sqltests_not_in_null derivation).

Files NOT mined here, with reasons (completing sqltests.py's skip
ledger): udaf.sql registers a JVM-class UDAF into the catalog — a
Java-surface test with no PySpark spelling; the PySpark-native
equivalent (pandas GROUPED_AGG UDAF) is oracle-verified in the pd_*
family. subquery/negative-cases/* are pure error goldens — pinned in
tests/test_r11_sqltests.py (a value hash cannot carry an error).

Determinizations, called out per check: every LIMIT consumed by a check
gets a TOTAL ORDER BY first (the reference relies on golden-file row
order; a value-hash cannot), and ordered subqueries feeding IN get
explicit NULLS FIRST/LAST because the engines' defaults differ. MINUS is
spelled EXCEPT (same operator in Spark; DuckDB has no MINUS). The
reference's no-ON join shapes (accidental cartesians over disjoint
column sets) are given real ON conditions — the corpus-wide
CartesianProduct ban is a feature, not a miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sol_spark.registry import register

# ---------------------------------------------------------------------------
# The shared t1/t2/t3 star every subquery input file builds on (9 columns:
# string, smallint, int, bigint, float, double, double, timestamp, date).
# Values are the reference's, verbatim; only the spelling is generated.
# ---------------------------------------------------------------------------

_T1_ROWS = [
    ("val1a", 6, 8, 10, "15.0", "20", "20E2", "2014-04-04 01:00:00", "2014-04-04"),
    ("val1b", 8, 16, 19, "17.0", "25", "26E2", "2014-05-04 01:01:00", "2014-05-04"),
    ("val1a", 16, 12, 21, "15.0", "20", "20E2", "2014-06-04 01:02:00.001", "2014-06-04"),
    ("val1a", 16, 12, 10, "15.0", "20", "20E2", "2014-07-04 01:01:00", "2014-07-04"),
    ("val1c", 8, 16, 19, "17.0", "25", "26E2", "2014-05-04 01:02:00.001", "2014-05-05"),
    ("val1d", None, 16, 22, "17.0", "25", "26E2", "2014-06-04 01:01:00", None),
    ("val1d", None, 16, 19, "17.0", "25", "26E2", "2014-07-04 01:02:00.001", None),
    ("val1e", 10, None, 25, "17.0", "25", "26E2", "2014-08-04 01:01:00", "2014-08-04"),
    ("val1e", 10, None, 19, "17.0", "25", "26E2", "2014-09-04 01:02:00.001", "2014-09-04"),
    ("val1d", 10, None, 12, "17.0", "25", "26E2", "2015-05-04 01:01:00", "2015-05-04"),
    ("val1a", 6, 8, 10, "15.0", "20", "20E2", "2014-04-04 01:02:00.001", "2014-04-04"),
    ("val1e", 10, None, 19, "17.0", "25", "26E2", "2014-05-04 01:01:00", "2014-05-04"),
]
_T2_ROWS = [
    ("val2a", 6, 12, 14, "15.0", "20", "20E2", "2014-04-04 01:01:00", "2014-04-04"),
    ("val1b", 10, 12, 19, "17.0", "25", "26E2", "2014-05-04 01:01:00", "2014-05-04"),
    ("val1b", 8, 16, 119, "17.0", "25", "26E2", "2015-05-04 01:01:00", "2015-05-04"),
    ("val1c", 12, 16, 219, "17.0", "25", "26E2", "2016-05-04 01:01:00", "2016-05-04"),
    ("val1b", None, 16, 319, "17.0", "25", "26E2", "2017-05-04 01:01:00", None),
    ("val2e", 8, None, 419, "17.0", "25", "26E2", "2014-06-04 01:01:00", "2014-06-04"),
    ("val1f", 19, None, 519, "17.0", "25", "26E2", "2014-05-04 01:01:00", "2014-05-04"),
    ("val1b", 10, 12, 19, "17.0", "25", "26E2", "2014-06-04 01:01:00", "2014-06-04"),
    ("val1b", 8, 16, 19, "17.0", "25", "26E2", "2014-07-04 01:01:00", "2014-07-04"),
    ("val1c", 12, 16, 19, "17.0", "25", "26E2", "2014-08-04 01:01:00", "2014-08-05"),
    ("val1e", 8, None, 19, "17.0", "25", "26E2", "2014-09-04 01:01:00", "2014-09-04"),
    ("val1f", 19, None, 19, "17.0", "25", "26E2", "2014-10-04 01:01:00", "2014-10-04"),
    ("val1b", None, 16, 19, "17.0", "25", "26E2", "2014-05-04 01:01:00", None),
]
_T3_ROWS = [
    ("val3a", 6, 12, 110, "15.0", "20", "20E2", "2014-04-04 01:02:00", "2014-04-04"),
    ("val3a", 6, 12, 10, "15.0", "20", "20E2", "2014-05-04 01:02:00", "2014-05-04"),
    ("val1b", 10, 12, 219, "17.0", "25", "26E2", "2014-05-04 01:02:00", "2014-05-04"),
    ("val1b", 10, 12, 19, "17.0", "25", "26E2", "2014-05-04 01:02:00", "2014-05-04"),
    ("val1b", 8, 16, 319, "17.0", "25", "26E2", "2014-06-04 01:02:00", "2014-06-04"),
    ("val1b", 8, 16, 19, "17.0", "25", "26E2", "2014-07-04 01:02:00", "2014-07-04"),
    ("val3c", 17, 16, 519, "17.0", "25", "26E2", "2014-08-04 01:02:00", "2014-08-04"),
    ("val3c", 17, 16, 19, "17.0", "25", "26E2", "2014-09-04 01:02:00", "2014-09-05"),
    ("val1b", None, 16, 419, "17.0", "25", "26E2", "2014-10-04 01:02:00", None),
    ("val1b", None, 16, 19, "17.0", "25", "26E2", "2014-11-04 01:02:00", None),
    ("val3b", 8, None, 719, "17.0", "25", "26E2", "2014-05-04 01:02:00", "2014-05-04"),
    ("val3b", 8, None, 19, "17.0", "25", "26E2", "2015-05-04 01:02:00", "2015-05-04"),
]

_COLS = "t{k}a, t{k}b, t{k}c, t{k}d, t{k}e, t{k}f, t{k}g, t{k}h, t{k}i"


def _vals(rows: list[tuple]) -> str:
    """Render fixture rows as a dialect-shared VALUES body (explicit CAST
    on every cell so both engines infer identical column types)."""
    out = []
    for a, b, c, d, e, f, g, h, i in rows:
        cells = [
            f"'{a}'",
            "CAST(NULL AS SMALLINT)" if b is None else f"CAST({b} AS SMALLINT)",
            "CAST(NULL AS INT)" if c is None else f"CAST({c} AS INT)",
            f"CAST({d} AS BIGINT)",
            f"CAST({e} AS FLOAT)",
            f"CAST({f} AS DOUBLE)",
            f"CAST({g} AS DOUBLE)",
            f"TIMESTAMP '{h}'",
            "CAST(NULL AS DATE)" if i is None else f"DATE '{i}'",
        ]
        out.append("(" + ", ".join(cells) + ")")
    return ", ".join(out)


def _star_with(spark: bool) -> str:
    """The WITH prologue defining t1/t2/t3 in the requested dialect."""
    parts = []
    for k, rows in (("1", _T1_ROWS), ("2", _T2_ROWS), ("3", _T3_ROWS)):
        cols = _COLS.format(k=k)
        if spark:
            body = f"SELECT * FROM VALUES {_vals(rows)} AS t{k}({cols})"
        else:
            body = f"SELECT * FROM (VALUES {_vals(rows)}) t{k}({cols})"
        parts.append(f"t{k} AS ({body})")
    return "WITH " + ",\n".join(parts)


_OUT_ORDER = "ORDER BY check_name, s, n1, n2, d"


def _sel(check: str, s: str, n1: str, n2: str, d: str, tail: str) -> str:
    """One uniform battery row: every slot explicitly CAST (DuckDB SUM
    widens to HUGEINT and its VALUES ints differ from Spark's — uncast
    slots hash-diverge on dtype even when values agree)."""
    return (
        f"SELECT '{check}' AS check_name, CAST({s} AS STRING) AS s,"
        f" CAST({n1} AS BIGINT) AS n1, CAST({n2} AS BIGINT) AS n2,"
        f" CAST({d} AS DOUBLE) AS d {tail}"
    )


def _battery(spark_sess: SparkSession, body: str) -> DataFrame:
    return spark_sess.sql(f"{_star_with(spark=True)}\n{body}\n{_OUT_ORDER}")


def _oracle(body: str) -> str:
    return f"{_star_with(spark=False)}\n{body}\n{_OUT_ORDER}"


# ---------------------------------------------------------------------------
# scalar-subquery-predicate.sql
# ---------------------------------------------------------------------------


def _scalar_pred_sql() -> str:
    checks = [
        # SPARK-18814.1/.2: the simplified TPCDS-Q32 correlation (inline
        # single-row p/c relations; SELECT literals dodge the VALUES-wrap
        # dialect split).
        _sel("q32_simplified", "NULL", "pk", "cv", "NULL",
             "FROM (SELECT 1 AS pk, 1 AS pv) p, (SELECT 1 AS ck, 1 AS cv) c"
             " WHERE p.pk = c.ck AND c.cv = (SELECT avg(c1.cv)"
             " FROM (SELECT 1 AS ck, 1 AS cv) c1 WHERE c1.ck = p.pk)"),
        _sel("q32_agg_stack", "NULL", "pk", "cv", "NULL",
             "FROM (SELECT 1 AS pk, 1 AS pv) p, (SELECT 1 AS ck, 1 AS cv) c"
             " WHERE p.pk = c.ck AND c.cv = (SELECT max(avg_cv) FROM"
             " (SELECT c1.cv, avg(c1.cv) AS avg_cv FROM (SELECT 1 AS ck, 1 AS cv) c1"
             " WHERE c1.ck = p.pk GROUP BY c1.cv) x)"),
        # TC 01.01: uncorrelated equality
        _sel("tc0101_uncorr_eq", "t1a", "t1b", "NULL", "NULL",
             "FROM t1 WHERE t1c = (SELECT max(t2c) FROM t2)"),
        # TC 01.02: two uncorrelated subqueries ANDed
        _sel("tc0102_two_subqs", "t1a", "t1d", "NULL", "t1f",
             "FROM t1 WHERE t1c = (SELECT max(t2c) FROM t2)"
             " AND t1b > (SELECT min(t3b) FROM t3)"),
        # TC 01.03: OR of two uncorrelated subqueries
        _sel("tc0103_or", "t1a || '@' || CAST(t1h AS STRING)", "NULL", "NULL", "NULL",
             "FROM t1 WHERE t1c = (SELECT max(t2c) FROM t2)"
             " OR t1b = (SELECT min(t3b) FROM t3 WHERE t3b > 10)"),
        # TC 01.04: scalar subquery filtering a LEFT JOIN
        _sel("tc0104_left_join", "t1a", "t1b", "t2d", "NULL",
             "FROM t1 LEFT JOIN t2 ON t1a = t2a"
             " WHERE t1b = (SELECT min(t3b) FROM t3)"),
        # TC 01.05: numeric widening across the comparison (int + int = float)
        _sel("tc0105_cast_num", "t1a", "t1b", "NULL", "t1g",
             "FROM t1 WHERE t1c + 5 = (SELECT max(t2e) FROM t2)"),
        # TC 01.06: date cast on the probe side
        _sel("tc0106_cast_date", "t1a || '@' || CAST(t1h AS STRING)", "NULL", "NULL", "NULL",
             "FROM t1 WHERE CAST(t1h AS DATE) = (SELECT min(t2i) FROM t2)"),
        # TC 01.07: same tables inside and out, expressions on both sides
        _sel("tc0107_same_table", "t1a", "t2d", "NULL", "NULL",
             "FROM t1, t2 WHERE t1b = t2b AND t2c + 1 ="
             " (SELECT max(t2c) + 1 FROM t2, t1 WHERE t2b = t1b)"),
        # TC 01.08: scalar subquery against a grouped derived table
        _sel("tc0108_grouped_max", "t2a", "NULL", "NULL", "max_t1g",
             "FROM (SELECT DISTINCT t2.t2a, dt.max_t1g FROM t2,"
             " (SELECT t1a, max(t1g) AS max_t1g FROM t1 GROUP BY t1a) dt"
             " WHERE t2.t2a = dt.t1a AND dt.max_t1g ="
             " (SELECT max(t1g) FROM t1)) z"),
        # TC 01.09: two scalar subqueries compared to each other
        _sel("tc0109_subq_vs_subq", "NULL", "t3b", "t3c", "NULL",
             "FROM t3 WHERE (SELECT max(t3c) FROM t3 WHERE t3b > 10) >="
             " (SELECT min(t3b) FROM t3 WHERE t3c > 0)"
             " AND (t3b IS NULL OR t3c IS NULL)"),
        # TC 02.01: correlated with GROUP BY on the correlation key
        _sel("tc0201_corr_lt", "t1a", "NULL", "NULL", "NULL",
             "FROM t1 WHERE t1a < (SELECT max(t2a) FROM t2"
             " WHERE t2c = t1c GROUP BY t2c)"),
        # TC 02.02: correlated scalar under IS NULL (empty-group probe)
        _sel("tc0202_corr_is_null", "t1a", "t1c", "NULL", "NULL",
             "FROM t1 WHERE (SELECT max(t2a) FROM t2"
             " WHERE t2c = t1c GROUP BY t2c) IS NULL"),
        # TC 02.03 + .01: HAVING count(*) >= 0 vs >= 1 (the empty-group
        # count asymmetry the decorrelation rewrite must preserve)
        _sel("tc0203_having_ge0", "t1a", "NULL", "NULL", "NULL",
             "FROM t1 WHERE t1a = (SELECT max(t2a) FROM t2 WHERE t2c = t1c"
             " GROUP BY t2c HAVING count(*) >= 0) OR t1i > DATE '2014-12-31'"),
        _sel("tc0203_having_ge1", "t1a", "NULL", "NULL", "NULL",
             "FROM t1 WHERE t1a = (SELECT max(t2a) FROM t2 WHERE t2c = t1c"
             " GROUP BY t2c HAVING count(*) >= 1) OR t1i > DATE '2014-12-31'"),
        # TC 02.04: correlated predicate under a RIGHT JOIN reduces it
        _sel("tc0204_right_join", "NULL", "cnt", "NULL", "NULL",
             "FROM (SELECT count(t1a) AS cnt FROM t1 RIGHT JOIN t2 ON t1d = t2d"
             " WHERE t1a < (SELECT max(t2a) FROM t2 WHERE t2c = t1c"
             " GROUP BY t2c)) z"),
        # TC 02.05: correlated band (two correlated scalars ANDed)
        _sel("tc0205_corr_band", "t1a", "NULL", "NULL", "NULL",
             "FROM t1 WHERE t1b <= (SELECT max(t2b) FROM t2 WHERE t2c = t1c"
             " GROUP BY t2c) AND t1b >= (SELECT min(t2b) FROM t2"
             " WHERE t2c = t1c GROUP BY t2c)"),
        # TC 02.06/02.07/02.08: correlated scalars under set ops (MINUS
        # spelled EXCEPT — same operator; wrapped so precedence is pinned)
        _sel("tc0206_intersect", "ta", "NULL", "NULL", "NULL",
             "FROM (SELECT t1a AS ta FROM t1 WHERE t1a <= (SELECT max(t2a)"
             " FROM t2 WHERE t2c = t1c GROUP BY t2c) INTERSECT"
             " SELECT t1a FROM t1 WHERE t1a >= (SELECT min(t2a) FROM t2"
             " WHERE t2c = t1c GROUP BY t2c)) z"),
        _sel("tc0207_union_all", "ta", "NULL", "NULL", "NULL",
             "FROM (SELECT t1a AS ta FROM t1 WHERE t1a <= (SELECT max(t2a)"
             " FROM t2 WHERE t2c = t1c GROUP BY t2c) UNION ALL"
             " SELECT t1a FROM t1 WHERE t1a >= (SELECT min(t2a) FROM t2"
             " WHERE t2c = t1c GROUP BY t2c)) z"),
        _sel("tc0207_union_distinct", "ta", "NULL", "NULL", "NULL",
             "FROM (SELECT t1a AS ta FROM t1 WHERE t1a <= (SELECT max(t2a)"
             " FROM t2 WHERE t2c = t1c GROUP BY t2c) UNION DISTINCT"
             " SELECT t1a FROM t1 WHERE t1a >= (SELECT min(t2a) FROM t2"
             " WHERE t2c = t1c GROUP BY t2c)) z"),
        _sel("tc0208_except", "ta", "NULL", "NULL", "NULL",
             "FROM (SELECT t1a AS ta FROM t1 WHERE t1a <= (SELECT max(t2a)"
             " FROM t2 WHERE t2c = t1c GROUP BY t2c) EXCEPT"
             " SELECT t1a FROM t1 WHERE t1a >= (SELECT min(t2a) FROM t2"
             " WHERE t2c = t1c GROUP BY t2c)) z"),
        # TC 02.09: correlated scalar inside HAVING
        _sel("tc0209_in_having", "t1a", "NULL", "NULL", "NULL",
             "FROM t1 GROUP BY t1a, t1c HAVING max(t1b) <="
             " (SELECT max(t2b) FROM t2 WHERE t2c = t1c GROUP BY t2c)"),
    ]
    return "\nUNION ALL\n".join(checks)


@register(
    "sqltests_scalar_subq_predicate",
    _oracle(_scalar_pred_sql()),
    tags=("sqltests", "subquery"),
)
def sqltests_scalar_subq_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over scalar-subquery-predicate.sql: every decorrelation
    shape for scalar subqueries in predicate context — uncorrelated
    equality/inequality, OR'd subqueries, scalar probe under LEFT/RIGHT
    joins, type-widened comparisons, empty-group IS NULL, the HAVING
    count(*) >= 0 vs >= 1 asymmetry, correlated bands, correlated scalars
    under INTERSECT/UNION/EXCEPT, and scalar subqueries inside HAVING.
    MINUS is spelled EXCEPT (same operator); the q32 checks use inline
    single-row relations. Scale shape: constant LocalRelation battery."""
    return _battery(spark, _scalar_pred_sql())


# ---------------------------------------------------------------------------
# scalar-subquery-select.sql
# ---------------------------------------------------------------------------


def _scalar_sel_sql() -> str:
    checks = [
        # TC 01.01: two uncorrelated scalars in the SELECT list
        _sel("tc0101_two_scalars", "CAST((SELECT max(t2h) FROM t2) AS STRING)",
             "(SELECT min(t3d) FROM t3)", "NULL", "NULL",
             "FROM t1 WHERE t1a = 'val1c'"),
        # TC 01.02: scalar subquery AS the IN-list value
        _sel("tc0102_scalar_in_in", "t1a", "cnt", "NULL", "NULL",
             "FROM (SELECT t1a, count(*) AS cnt FROM t1 WHERE t1c IN"
             " (SELECT (SELECT min(t3c) FROM t3) FROM t2 GROUP BY t2g"
             " HAVING count(*) > 1) GROUP BY t1a) z"),
        # TC 01.03: scalar subqueries under UNION (distinct) with typed nulls
        _sel("tc0103_under_union", "s2", "m", "NULL", "NULL",
             "FROM (SELECT (SELECT min(t3d) FROM t3) AS m,"
             " CAST(NULL AS STRING) AS s2 FROM t1 WHERE t1a = 'val1c'"
             " UNION SELECT CAST(NULL AS BIGINT),"
             " CAST((SELECT max(t2h) FROM t2) AS STRING) FROM t1"
             " WHERE t1a = 'val1c') z"),
        # TC 01.04: scalar subqueries under INTERSECT
        _sel("tc0104_intersect", "NULL", "m", "NULL", "NULL",
             "FROM (SELECT (SELECT min(t3c) FROM t3) AS m FROM t1"
             " WHERE t1a = 'val1a' INTERSECT SELECT (SELECT min(t2c) FROM t2)"
             " FROM t1 WHERE t1a = 'val1d') z"),
        # TC 01.05: scalar-subquery columns joined through a FULL OUTER
        # JOIN whose condition compares them (avg is exact-sum/count —
        # identical IEEE double both engines)
        _sel("tc0105_full_outer",
             "coalesce(q1a, '#') || '|' || coalesce(q2a, '#')",
             "min_t3d", "NULL", "avg_t3d",
             "FROM (SELECT q1.t1a AS q1a, q2.t2a AS q2a, q1.min_t3d,"
             " q2.avg_t3d FROM (SELECT t1a, (SELECT min(t3d) FROM t3) AS"
             " min_t3d FROM t1 WHERE t1a IN ('val1e', 'val1c')) q1"
             " FULL OUTER JOIN (SELECT t2a, (SELECT avg(t3d) FROM t3) AS"
             " avg_t3d FROM t2 WHERE t2a IN ('val1c', 'val2a')) q2"
             " ON q1.t1a = q2.t2a AND q1.min_t3d < q2.avg_t3d) z"),
        # TC 02.01: correlated scalars in the SELECT list
        _sel("tc0201_corr_pair",
             "CAST((SELECT max(t2h) FROM t2 WHERE t2.t2a = t1.t1a) AS STRING)",
             "(SELECT min(t3d) FROM t3 WHERE t3.t3a = t1.t1a)", "NULL", "NULL",
             "FROM t1 WHERE t1a = 'val1b'"),
        # TC 02.02: correlated vs uncorrelated scalar under EXCEPT (MINUS)
        _sel("tc0202_except", "NULL", "m", "NULL", "NULL",
             "FROM (SELECT (SELECT min(t3d) FROM t3 WHERE t3a = t1a) AS m"
             " FROM t1 WHERE t1a = 'val1b' EXCEPT SELECT"
             " (SELECT min(t3d) FROM t3) FROM t1 WHERE t1a = 'val1b') z"),
        # TC 02.03: scalar subquery nested inside a correlated NOT EXISTS
        _sel("tc0203_nested_not_exists", "t1a", "t1b", "NULL", "NULL",
             "FROM t1 WHERE NOT EXISTS (SELECT (SELECT max(t2b) FROM t2"
             " LEFT JOIN t1 ON t2a = t1a WHERE t2c = t3c) AS dummy FROM t3"
             " WHERE t3b < (SELECT max(t2b) FROM t2 LEFT JOIN t1"
             " ON t2a = t1a WHERE t2c = t3c) AND t3a = t1a)"),
    ]
    return "\nUNION ALL\n".join(checks)


@register(
    "sqltests_scalar_subq_select",
    _oracle(_scalar_sel_sql()),
    tags=("sqltests", "subquery"),
)
def sqltests_scalar_subq_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over scalar-subquery-select.sql: scalar subqueries in the
    SELECT list — uncorrelated pairs, a scalar subquery AS the IN-list
    value, scalars under UNION/INTERSECT/EXCEPT, scalar-produced columns
    compared inside a FULL OUTER JOIN condition, correlated SELECT-list
    scalars, and a scalar nested inside a correlated NOT EXISTS (the
    double-decorrelation path). Scale shape: constant LocalRelation."""
    return _battery(spark, _scalar_sel_sql())


# ---------------------------------------------------------------------------
# in-joins.sql + not-in-joins.sql
# ---------------------------------------------------------------------------


def _in_joins_sql() -> str:
    checks = [
        # in-joins TC 01.02-shape: correlated IN filtering a LEFT JOIN
        # parent (reference's natural join is an accidental cartesian over
        # disjoint columns — given a real ON instead)
        _sel("ij_left_join_corr", "t1a", "t1b", "t3c", "NULL",
             "FROM t1 LEFT JOIN t3 ON t1b = t3b WHERE t1a IN"
             " (SELECT t2a FROM t2 WHERE t1d = t2d)"),
        # TC 01.03-shape: two correlated INs over a RIGHT JOIN parent
        _sel("ij_right_join_two_ins", "NULL", "cnt", "NULL", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt FROM t1"
             " RIGHT JOIN t3 ON t1a = t3a WHERE t1a IN (SELECT t2a FROM t2"
             " WHERE t1b = t2b) AND t1d IN (SELECT t2d FROM t2"
             " WHERE t1c > t2c) GROUP BY t1a) z"),
        # TC 01.04: uncorrelated IN over a FULL OUTER JOIN parent
        _sel("ij_full_outer", "t1a", "t1b", "t3b", "NULL",
             "FROM t1 FULL OUTER JOIN t3 ON t1a = t3a WHERE t1a IN"
             " (SELECT t2a FROM t2 WHERE t2c IS NOT NULL) AND t1b != t3b"
             " AND t1a = 'val1b'"),
        # TC 01.06: correlated IN through a timestamp inequality
        _sel("ij_left_outer_ts_corr", "NULL", "cnt", "NULL", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt FROM t1"
             " LEFT OUTER JOIN t3 ON t1a = t3a WHERE t1a IN (SELECT t2a"
             " FROM t2 WHERE t1h < t2h) GROUP BY t1a) z"),
        # TC 01.07: theta-join parent (BNLJ), OR of two correlated INs
        _sel("ij_theta_or", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b FROM t1"
             " INNER JOIN t2 ON t1a > t2a WHERE t1b IN (SELECT t2b FROM t2"
             " WHERE t2h > t1h) OR t1a IN (SELECT t2a FROM t2"
             " WHERE t2h < t1h) GROUP BY t1b HAVING t1b > 6) z"),
        # TC 01.08: joins INSIDE both IN subqueries
        _sel("ij_join_in_subqs", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b FROM t1"
             " WHERE t1a IN (SELECT t2a FROM t2 JOIN t1 tx ON t2b <> tx.t1b)"
             " AND t1h IN (SELECT t2h FROM t2 RIGHT JOIN t3 ON t2b = t3b)"
             " GROUP BY t1b HAVING t1b > 8) z"),
        # TC 01.10: multi-join parent (INNER + RIGHT) under three INs,
        # two of whose subqueries contain their own outer joins
        _sel("ij_multi_join_parent", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b FROM t1"
             " INNER JOIN t2 ON t1b = t2b RIGHT JOIN t3 ON t1a = t3a"
             " WHERE t1a IN (SELECT t2a FROM t2 FULL OUTER JOIN t3"
             " ON t2b > t3b) AND t1c IN (SELECT t3.t3c FROM t3"
             " LEFT OUTER JOIN t2 ON t3a = t2a) AND t1a = t2a"
             " GROUP BY t1b) z"),
        # not-in-joins TC 01.01: NOT IN over a join parent
        _sel("nij_join_parent", "t1a", "t1b", "t3c", "NULL",
             "FROM t1 JOIN t3 ON t1b = t3b WHERE t1a NOT IN"
             " (SELECT t2a FROM t2)"),
        # TC 01.03: NOT INs whose subqueries contain LEFT/RIGHT joins
        _sel("nij_joins_in_subqs", "t1a", "t1b", "t1d", "NULL",
             "FROM t1 WHERE t1a NOT IN (SELECT t2a FROM t2 LEFT JOIN t3"
             " ON t2b = t3b WHERE t1d = t2d) AND t1d NOT IN (SELECT t2d"
             " FROM t2 RIGHT JOIN t1 tx ON t2e = tx.t1e WHERE tx.t1a = t2a)"),
        # TC 01.04: NOT IN in WHERE and NOT IN in HAVING together
        _sel("nij_where_and_having", "NULL", "cnt", "t1d", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b, t1c, t1d FROM t1"
             " WHERE t1a NOT IN (SELECT t2a FROM t2 JOIN t1 tx"
             " ON t2b <> tx.t1b) GROUP BY t1b, t1c, t1d HAVING t1d NOT IN"
             " (SELECT t2d FROM t2 WHERE t1d = t2d)) z"),
        # TC 01.05: correlated-join NOT IN + aggregate HAVING
        _sel("nij_agg_having", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b, t1c FROM t1"
             " WHERE t1a NOT IN (SELECT t2a FROM t2 INNER JOIN t1 tx"
             " ON tx.t1a = t2a) GROUP BY t1b, t1c HAVING t1b < sum(t1c)) z"),
    ]
    return "\nUNION ALL\n".join(checks)


@register("sqltests_in_joins", _oracle(_in_joins_sql()), tags=("sqltests", "subquery", "join"))
def sqltests_in_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over in-joins.sql + not-in-joins.sql: IN/NOT-IN predicate
    subqueries interacting with every join flavor — correlated IN over
    LEFT/RIGHT/FULL OUTER parents, theta-join parents (BNLJ), joins inside
    the IN subquery itself, NOT IN in WHERE and HAVING simultaneously, and
    correlated NOT IN against self-joined subqueries. The reference's
    no-ON cartesian joins are given real ON conditions (corpus-wide
    CartesianProduct ban). Scale shape: constant LocalRelation."""
    return _battery(spark, _in_joins_sql())


# ---------------------------------------------------------------------------
# in-group-by.sql + not-in-group-by.sql + in-having.sql
# ---------------------------------------------------------------------------


def _in_group_sql() -> str:
    checks = [
        # in-group-by TC 01.01: GROUP BY above an uncorrelated IN
        _sel("gb_avg_parent", "t1a", "NULL", "NULL", "avg(t1b)",
             "FROM t1 WHERE t1a IN (SELECT t2a FROM t2) GROUP BY t1a"),
        # TC 01.02: correlated IN under a multi-key GROUP BY
        _sel("gb_max_corr", "t1a", "max(t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1b IN (SELECT t2b FROM t2 WHERE t1a = t2a)"
             " GROUP BY t1a, t1d"),
        # TC 01.04: OR of two correlated INs + SUM(DISTINCT)
        _sel("gb_sum_distinct_or", "t1a", "sum(DISTINCT t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1c IN (SELECT t2c FROM t2 WHERE t1a = t2a)"
             " OR t1c IN (SELECT t3c FROM t3 WHERE t1a = t3a)"
             " GROUP BY t1a, t1c"),
        # TC 01.07: GROUP BY inside the subquery (agg-produced IN set)
        _sel("gb_agg_subq", "t1a", "t1b", "t1d", "NULL",
             "FROM t1 WHERE t1b IN (SELECT max(t2b) FROM t2 GROUP BY t2a)"),
        # TC 01.10: correlated agg subquery + HAVING inside the subquery
        _sel("gb_corr_agg_having", "t1a", "t1b", "NULL", "NULL",
             "FROM t1 WHERE t1c IN (SELECT max(t2c) FROM t2 WHERE t1a = t2a"
             " GROUP BY t2a, t2c HAVING t2c > 8)"),
        # TC 01.11: IN nested inside IN, inner one agg-grouped
        _sel("gb_nested_agg", "t1a", "t1b", "NULL", "NULL",
             "FROM t1 WHERE t1c IN (SELECT t2c FROM t2 WHERE t2a IN"
             " (SELECT min(t3a) FROM t3 WHERE t3a = t2a GROUP BY t3b)"
             " GROUP BY t2c)"),
        # TC 01.12: GROUP BY in parent AND subquery
        _sel("gb_both_min", "t1a", "min(t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1c IN (SELECT min(t2c) FROM t2 WHERE t2b = t1b"
             " GROUP BY t2a) GROUP BY t1a"),
        # in-group-by TC 01.08: the IN-filtered GROUP BY living inside a
        # derived table (the subquery-in-FROM shape)
        _sel("gb_derived_table", "d2a", "d2b", "NULL", "NULL",
             "FROM (SELECT t2a AS d2a, t2b AS d2b FROM t2 WHERE t2a IN"
             " (SELECT t1a FROM t1 WHERE t1b = t2b) GROUP BY t2a, t2b) d"),
        # TC 01.16: correlated HAVING (outer column inside subquery HAVING)
        _sel("gb_having_corr_outer", "t1a", "min(t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1c IN (SELECT min(t2c) FROM t2 WHERE t2b = t1b"
             " GROUP BY t2a HAVING t2a > t1a) OR t1d IN (SELECT t3d FROM t3"
             " WHERE t1c = t3c GROUP BY t3d HAVING t3d = t1d)"
             " GROUP BY t1a HAVING min(t1b) IS NOT NULL"),
        # in-having TC 01.01: uncorrelated grouped-HAVING subquery feeding IN
        _sel("hv_uncorr_grouped", "t1a || '@' || CAST(t1h AS STRING)", "t1b", "NULL", "NULL",
             "FROM t1 WHERE t1b IN (SELECT t2b FROM t2 GROUP BY t2b"
             " HAVING t2b < 10)"),
        # in-having TC 01.02: correlated agg subquery with HAVING, filter
        _sel("hv_corr_min_having", "t1a", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1b IN (SELECT min(t2b) FROM t2 WHERE t1a = t2a"
             " GROUP BY t2b HAVING t2b > 1)"),
        # TC 01.05: correlated IN below + aggregate HAVING above
        _sel("hv_both_sides", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b FROM t1"
             " WHERE t1c IN (SELECT t2c FROM t2 WHERE t1a = t2a GROUP BY t2c"
             " HAVING t2c > 10) GROUP BY t1b HAVING t1b >= 8) z"),
        # TC 01.06: IN inside HAVING itself, doubly nested
        _sel("hv_in_in_having", "t1a", "max(t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1b > 0 GROUP BY t1a HAVING t1a IN"
             " (SELECT t2a FROM t2 WHERE t2b IN (SELECT t3b FROM t3"
             " WHERE t2c = t3c))"),
        # TC 01.07: NOT IN with agg-HAVING subquery + outer-column HAVING
        _sel("hv_not_in_min_gt", "t1a", "t1c", "min(t1d)", "NULL",
             "FROM t1 WHERE t1a NOT IN (SELECT t2a FROM t2 GROUP BY t2a"
             " HAVING t2a > 'val2a') GROUP BY t1a, t1c"
             " HAVING min(t1d) > t1c"),
        # TC 01.08: correlated NOT IN with grouped HAVING subquery
        _sel("hv_not_in_corr", "t1a", "t1b", "NULL", "NULL",
             "FROM t1 WHERE t1d NOT IN (SELECT t2d FROM t2 WHERE t1a = t2a"
             " GROUP BY t2c, t2d HAVING t2c > 8) GROUP BY t1a, t1b"
             " HAVING t1b < 10"),
        # not-in-group-by TC 01.01: NOT IN below a grouped avg
        _sel("ngb_avg", "t1a", "NULL", "NULL", "avg(t1b)",
             "FROM t1 WHERE t1a NOT IN (SELECT t2a FROM t2) GROUP BY t1a"),
        # TC 01.02: timestamp-correlated NOT IN below SUM(DISTINCT)
        _sel("ngb_ts_corr", "t1a", "sum(DISTINCT t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1d NOT IN (SELECT t2d FROM t2 WHERE t1h < t2h)"
             " GROUP BY t1a"),
        # TC 01.04: NOT IN against a correlated grouped MAX
        _sel("ngb_agg_not_in", "t1a", "max(t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1c NOT IN (SELECT max(t2b) FROM t2"
             " WHERE t1a = t2a GROUP BY t2a) GROUP BY t1a"),
    ]
    return "\nUNION ALL\n".join(checks)


@register(
    "sqltests_in_group_having",
    _oracle(_in_group_sql()),
    tags=("sqltests", "subquery", "agg"),
)
def sqltests_in_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over in-group-by.sql + not-in-group-by.sql + in-having.sql:
    IN/NOT-IN predicate subqueries interacting with aggregation on either
    side — grouped parents over (not-)correlated INs, agg-produced IN
    sets, HAVING inside the subquery (including OUTER-column references in
    the subquery's HAVING — the hardest decorrelation in the directory),
    IN inside the parent's HAVING, and NOT-IN forms of each. Scale shape:
    constant LocalRelation."""
    return _battery(spark, _in_group_sql())


# ---------------------------------------------------------------------------
# in-order-by.sql + in-limit.sql
# ---------------------------------------------------------------------------


def _in_order_limit_sql() -> str:
    checks = [
        # in-order-by TC 01.05: ORDER BY inside the IN subquery is legal
        # and ignored for membership
        _sel("ob_subq_ordered", "t1a", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1b IN (SELECT t2c FROM t2 ORDER BY t2d)"),
        # TC 01.06: ORDER BY over an agg subquery (correlated)
        _sel("ob_corr_agg_ordered", "t1a", "t1b", "NULL", "NULL",
             "FROM t1 WHERE t1b IN (SELECT min(t2b) FROM t2 WHERE t1b = t2b"
             " ORDER BY min(t2b))"),
        # TC 01.07: OR of correlated IN (ordered subq) and timestamp IN
        _sel("ob_or_ts", "t1a || '@' || CAST(t1h AS STRING)", "t1b", "NULL", "NULL",
             "FROM t1 WHERE t1c IN (SELECT t2c FROM t2 WHERE t1a = t2a"
             " ORDER BY t2b DESC NULLS FIRST) OR t1h IN (SELECT t2h FROM t2"
             " WHERE t1h > t2h)"),
        # TC 01.10: NOT IN and IN both over ordered subqueries
        _sel("ob_not_in_and_in", "t1a", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1a NOT IN (SELECT t2a FROM t2"
             " ORDER BY t2a DESC NULLS FIRST) AND t1c IN (SELECT t2c FROM t2"
             " ORDER BY t2b DESC NULLS LAST)"),
        # TC 01.11: grouped+ordered subquery feeding IN
        _sel("ob_grouped_ordered", "t1a", "t1b", "t1d", "NULL",
             "FROM t1 WHERE t1b IN (SELECT min(t2b) FROM t2 GROUP BY t2a"
             " ORDER BY t2a DESC)"),
        # TC 01.13: NOT IN over grouped+ordered subquery
        _sel("ob_not_in_grouped", "t1a", "t1b", "t1d", "NULL",
             "FROM t1 WHERE t1b NOT IN (SELECT min(t2b) FROM t2 GROUP BY t2a"
             " ORDER BY t2a)"),
        # TC 01.14: correlated grouped NOT IN below SUM(DISTINCT)
        _sel("ob_not_in_corr_sum", "t1a", "sum(DISTINCT t1b)", "NULL", "NULL",
             "FROM t1 WHERE t1b NOT IN (SELECT min(t2b) FROM t2"
             " WHERE t1a = t2a GROUP BY t2c ORDER BY t2c DESC NULLS LAST)"
             " GROUP BY t1a"),
        # TC 01.15: timestamp NOT IN, correlated + ordered
        _sel("ob_ts_not_in", "t1a", "cnt", "t1b", "NULL",
             "FROM (SELECT t1a, count(DISTINCT t1a) AS cnt, t1b FROM t1"
             " WHERE t1h NOT IN (SELECT t2h FROM t2 WHERE t1a = t2a"
             " ORDER BY t2d DESC NULLS FIRST) GROUP BY t1a, t1b) z"),
        # in-limit TC 01.02 (determinized: the reference's LIMIT 2 subquery
        # has no ORDER BY — a value-hash needs the TOTAL order added)
        _sel("lim_subq_limit", "t1a", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1c IN (SELECT t2c FROM t2 WHERE t2b >= 8"
             " ORDER BY t2c NULLS FIRST, t2d LIMIT 2)"),
        # TC 01.03 (determinized with a total tiebreak on t2d)
        _sel("lim_ordered_subq", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b FROM t1"
             " WHERE t1d IN (SELECT t2d FROM t2 ORDER BY t2c NULLS FIRST,"
             " t2d LIMIT 2) GROUP BY t1b) z"),
        # TC 01.04: NOT IN over a limited subquery (determinized)
        _sel("lim_not_in", "t1a", "t1b", "t1d", "NULL",
             "FROM t1 WHERE t1b NOT IN (SELECT t2b FROM t2 WHERE t2b > 6"
             " ORDER BY t2b, t2d LIMIT 2)"),
        # TC 01.05: NOT IN over ORDER BY DESC NULLS FIRST LIMIT 1
        # (tiebreak t2d added: two rows tie on t2b IS NULL)
        _sel("lim_not_in_desc", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b FROM t1"
             " WHERE t1d NOT IN (SELECT t2d FROM t2"
             " ORDER BY t2b DESC NULLS FIRST, t2d LIMIT 1)"
             " GROUP BY t1b) z"),
    ]
    return "\nUNION ALL\n".join(checks)


@register(
    "sqltests_in_orderby_limit",
    _oracle(_in_order_limit_sql()),
    tags=("sqltests", "subquery"),
)
def sqltests_in_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over in-order-by.sql + in-limit.sql: ORDER BY and LIMIT
    interacting with IN/NOT-IN subqueries — ordered subqueries feeding IN
    (the sort is legal and dropped), grouped+ordered subqueries, and
    LIMIT-truncated membership sets. Determinization: the reference's
    golden files rely on row order for un-ordered LIMITs; every LIMIT here
    gets a TOTAL ORDER BY (tiebreaks included) and explicit NULLS
    FIRST/LAST because Spark (NULLS FIRST) and DuckDB (NULLS LAST) default
    differently on ASC. The plain ORDER-BY-placement checks of the file
    are output-order-only and live in tests (value hash is order-blind).
    Scale shape: constant LocalRelation."""
    return _battery(spark, _in_order_limit_sql())


# ---------------------------------------------------------------------------
# in-set-operations.sql
# ---------------------------------------------------------------------------


def _in_setops_sql() -> str:
    checks = [
        # TC 01.01: IN-filtered branches under UNION ALL, arithmetic filter
        _sel("so_union_all", "ua", "ub", "uc", "NULL",
             "FROM (SELECT t2a AS ua, t2b AS ub, t2c AS uc, t2i AS ui FROM t2"
             " WHERE t2a IN (SELECT t1a FROM t1) UNION ALL"
             " SELECT t3a, t3b, t3c, t3i FROM t3 WHERE t3a IN"
             " (SELECT t1a FROM t1)) u"
             " WHERE ui IS NOT NULL AND 2 * ub = uc"),
        # TC 01.02: correlated-IN branches under UNION (distinct), then
        # grouped count(DISTINCT timestamp)
        _sel("so_union_group", "ua", "ud", "cnt", "NULL",
             "FROM (SELECT ua, ud, count(DISTINCT uh) AS cnt FROM"
             " (SELECT t2a AS ua, t2b AS ub, t2d AS ud, t2h AS uh FROM t2"
             " WHERE t2a IN (SELECT t1a FROM t1 WHERE t2b = t1b) UNION"
             " SELECT t1a, t1b, t1d, t1h FROM t1 WHERE t1a IN"
             " (SELECT t3a FROM t3 WHERE t1c = t3c)) u"
             " GROUP BY ua, ub, ud) z"),
        # TC 01.03: four agg branches chained UNION ALL / UNION / UNION
        # DISTINCT (each branch correlated differently)
        _sel("so_four_branch", "ua", "ub", "ud", "NULL",
             "FROM (SELECT t2a AS ua, t2b AS ub, min(t2d) AS ud FROM t2"
             " WHERE t2a IN (SELECT t1a FROM t1 WHERE t1b = t2b)"
             " GROUP BY t2a, t2b UNION ALL"
             " SELECT t2a, t2b, max(t2d) FROM t2 WHERE t2a IN"
             " (SELECT t1a FROM t1 WHERE t2c = t1c) GROUP BY t2a, t2b UNION"
             " SELECT t3a, t3b, min(t3d) FROM t3 WHERE t3a IN"
             " (SELECT t2a FROM t2 WHERE t3c = t2c) GROUP BY t3a, t3b"
             " UNION DISTINCT SELECT t1a, t1b, max(t1d) FROM t1"
             " WHERE t1a IN (SELECT t3a FROM t3 WHERE t3d = t1d)"
             " GROUP BY t1a, t1b) u"),
        # TC 01.06: INTERSECT / EXCEPT / UNION ALL chain over IN-filtered
        # branches (explicitly parenthesized: precedence is pinned, not
        # inherited from either parser)
        _sel("so_mixed_chain", "ua", "ub", "ud", "NULL",
             "FROM (((SELECT t2a AS ua, t2b AS ub, t2c AS uc, t2d AS ud"
             " FROM t2 WHERE t2a IN (SELECT t1a FROM t1 WHERE t1b = t2b"
             " AND t1d < t2d) INTERSECT SELECT t2a, t2b, t2c, t2d FROM t2"
             " WHERE t2b IN (SELECT max(t1b) FROM t1 WHERE t2c = t1c))"
             " EXCEPT SELECT t2a, t2b, t2c, t2d FROM t2 WHERE t2d IN"
             " (SELECT min(t3d) FROM t3 WHERE t2c = t3c)) UNION ALL"
             " SELECT t2a, t2b, t2c, t2d FROM t2 WHERE t2c IS NULL) u"),
        # IN whose subquery is itself a set operation
        _sel("so_in_over_union", "t2a", "t2b", "NULL", "NULL",
             "FROM t2 WHERE t2a IN (SELECT t1a FROM t1 UNION"
             " SELECT t3a FROM t3 WHERE t3b > 8)"),
        # NOT IN whose subquery is an INTERSECT (null-free by construction)
        _sel("so_not_in_over_intersect", "t2a", "t2b", "NULL", "NULL",
             "FROM t2 WHERE t2a NOT IN (SELECT t1a FROM t1 WHERE t1b"
             " IS NOT NULL INTERSECT SELECT t3a FROM t3 WHERE t3b IS NOT"
             " NULL)"),
        # TC 01.08: CORRELATION applied on top of a set-op derived table
        # inside the IN subquery (the decorrelation must hoist past the
        # INTERSECT)
        _sel("so_corr_over_intersect", "t1a", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1b IN (SELECT t2b FROM (SELECT t2b FROM t2"
             " WHERE t2b > 6 INTERSECT SELECT t1b FROM t1 WHERE t1b > 6)"
             " i WHERE t2b = t1b)"),
        # TC 01.09: IN over an EXCEPT of timestamp columns
        _sel("so_in_over_except_ts",
             "t1a || '@' || CAST(t1h AS STRING)", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1h IN (SELECT t2h FROM (SELECT t2h FROM t2"
             " EXCEPT SELECT t3h FROM t3) e)"),
        # TC 01.11 (condensed): a set-op derived table probed by a
        # correlated agg IN at the OUTER level — correlation INTO the
        # set-op result
        _sel("so_corr_into_setop", "u2a", "u2b", "NULL", "NULL",
             "FROM (SELECT t2a AS u2a, t2b AS u2b FROM t2 WHERE t2h IN"
             " (SELECT t1h FROM t1 WHERE t1a = t2a) UNION DISTINCT"
             " SELECT t1a, t1b FROM t1 WHERE t1b IN (SELECT t3b FROM t3"
             " UNION DISTINCT SELECT t2b FROM t2)) u"
             " WHERE u.u2b IN (SELECT min(t3b) FROM t3 WHERE u.u2a = t3a)"),
    ]
    return "\nUNION ALL\n".join(checks)


@register(
    "sqltests_in_setops",
    _oracle(_in_setops_sql()),
    tags=("sqltests", "subquery", "setop"),
)
def sqltests_in_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over in-set-operations.sql: IN/NOT-IN subqueries composed
    with set operations on both sides — IN-filtered branches under UNION
    ALL/UNION/UNION DISTINCT, the INTERSECT/EXCEPT/UNION-ALL mixed chain
    (parenthesized so precedence is pinned), and set operations INSIDE the
    IN subquery. Scale shape: constant LocalRelation."""
    return _battery(spark, _in_setops_sql())


# ---------------------------------------------------------------------------
# in-with-cte.sql + in-multiple-columns.sql
# ---------------------------------------------------------------------------


def _rv_in(spark: bool, cols: str, sub: str) -> str:
    """Row-value `(a, b) IN (SELECT x, y ...)`. DuckDB's binder rejects
    row-value IN subqueries, so its oracle states the WHERE-context
    definition: EXISTS a subquery row with every column equal (NULL
    compares unknown -> the row is filtered either way under WHERE)."""
    a, b = [c.strip() for c in cols.split(",")]
    x, y, rest = _split_sub(sub)
    if spark:
        return f"({a}, {b}) IN (SELECT {x}, {y} {rest})"
    return f"EXISTS (SELECT 1 {rest} AND {x} = {a} AND {y} = {b})" if " WHERE " in rest.upper() else (
        f"EXISTS (SELECT 1 {rest} WHERE {x} = {a} AND {y} = {b})"
    )


def _rv_not_in(spark: bool, cols: str, sub: str) -> str:
    """Row-value NOT IN: the null-aware definition — NOT EXISTS a subquery
    row where every column is equal-or-either-null (the independently
    derived rule shared with sqltests_not_in_null)."""
    a, b = [c.strip() for c in cols.split(",")]
    x, y, rest = _split_sub(sub)
    cond = (
        f"({x} = {a} OR {x} IS NULL OR {a} IS NULL)"
        f" AND ({y} = {b} OR {y} IS NULL OR {b} IS NULL)"
    )
    if spark:
        return f"({a}, {b}) NOT IN (SELECT {x}, {y} {rest})"
    if " WHERE " in rest.upper():
        return f"NOT EXISTS (SELECT 1 {rest} AND {cond})"
    return f"NOT EXISTS (SELECT 1 {rest} WHERE {cond})"


def _split_sub(sub: str) -> tuple[str, str, str]:
    """Split 'x, y FROM ...' into (x, y, 'FROM ...')."""
    head, rest = sub.split(" FROM ", 1)
    x, y = [c.strip() for c in head.split(",")]
    return x, y, "FROM " + rest


def _in_cte_multicol_sql(spark: bool) -> str:
    checks = [
        # in-with-cte TC 01.01: CTE consumed by the IN subquery
        _sel("cte_in_subq", "t1a || '@' || CAST(t1h AS STRING)", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1b IN (SELECT cte1.c1b FROM cte1"
             " WHERE cte1.c1b > 0)"),
        # TC 01.02: IN over a chain of set ops, every branch the same CTE
        _sel("cte_setop_chain", "NULL", "cnt", "t1b", "NULL",
             "FROM (SELECT count(DISTINCT t1a) AS cnt, t1b, t1c FROM t1"
             " WHERE t1b IN (SELECT c1b FROM cte1 WHERE c1b > 0 UNION"
             " SELECT c1b FROM cte1 WHERE c1b > 5 UNION ALL"
             " (SELECT c1b FROM cte1 INTERSECT SELECT c1b FROM cte1) UNION"
             " SELECT c1b FROM cte1) GROUP BY t1a, t1b, t1c"
             " HAVING t1c IS NOT NULL) z"),
        # TC 01.03 (condensed to three self-join flavors): the CTE
        # self-joined inside the IN subquery
        _sel("cte_self_joins", "t1a", "t1b", "t1c", "NULL",
             "FROM t1 WHERE t1c IN (SELECT ca.c1c FROM cte1 ca"
             " JOIN cte1 cb ON ca.c1b > cb.c1b FULL OUTER JOIN cte1 cc"
             " ON ca.c1c = cc.c1c LEFT JOIN cte1 cd ON ca.c1d = cd.c1d)"),
        # TC 01.05-shape: CTE defined WITH an IN subquery, then self-joined
        _sel("cte_in_inside_def", "NULL", "cnt", "s1b", "NULL",
             "FROM (SELECT count(DISTINCT s.c1a) AS cnt, s.c1b AS s1b FROM"
             " (SELECT ca.c1a, ca.c1b FROM cte2 ca JOIN cte2 cb"
             " ON ca.c1h >= cb.c1h) s WHERE s.c1b IN"
             " (SELECT t2b FROM t2 WHERE t2b < 19) GROUP BY s.c1b) z"),
        # in-multiple-columns TC 01.01: correlated row-value NOT IN
        _sel("mc_not_in_corr", "t1a || '@' || CAST(t1h AS STRING)", "t1b", "NULL", "NULL",
             "FROM t1 WHERE "
             + _rv_not_in(spark, "t1a, t1h",
                          "t2a, t2h FROM t2 WHERE t2a = t1a")
             + " AND t1a = 'val1a'"),
        # TC 01.02: row-value IN with a nested date IN inside
        _sel("mc_in_nested", "t1a", "t1b", "t1d", "NULL",
             "FROM t1 WHERE "
             + _rv_in(spark, "t1b, t1d",
                      "t2b, t2d FROM t2 WHERE t2i IN (SELECT t3i FROM t3"
                      " WHERE t2b > t3b)")),
        # TC 01.03: row-value NOT IN with a nested timestamp IN inside
        _sel("mc_not_in_nested", "t1a", "t1b", "t1d", "NULL",
             "FROM t1 WHERE "
             + _rv_not_in(spark, "t1b, t1d",
                          "t2b, t2d FROM t2 WHERE t2h IN (SELECT t3h FROM t3"
                          " WHERE t2b > t3b)")
             + " AND t1a = 'val1a'"),
        # TC 01.04: row-value IN branches under UNION ALL / UNION DISTINCT
        _sel("mc_in_under_setops", "t4a", "NULL", "NULL", "NULL",
             "FROM (SELECT t2a AS t4a FROM t2 WHERE "
             + _rv_in(spark, "t2a, t2b", "t1a, t1b FROM t1")
             + " UNION ALL SELECT t2a FROM t2 WHERE "
             + _rv_in(spark, "t2a, t2b", "t1a, t1b FROM t1")
             + " UNION DISTINCT SELECT t2a FROM t2 WHERE "
             + _rv_in(spark, "t2a, t2b", "t3a, t3b FROM t3")
             + ") t4"),
        # TC 01.05: row-value IN (correlated) inside a CTE definition,
        # CTE self-joined outside
        _sel("mc_in_cte", "c1a", "c1b", "c2b", "NULL",
             "FROM (SELECT ca.c1a, ca.c1b, cb.c1b AS c2b FROM cte3 ca"
             " JOIN cte3 cb ON ca.c1b = cb.c1b) s"),
    ]
    # The CTE prologue rides inside the battery body (after the dialect
    # star prologue): cte1/cte2 mirror the reference's t1 projections;
    # cte3 carries the correlated row-value IN of TC 01.05.
    cte3_pred = _rv_in(spark, "x.t1b, x.t1d", "t2b, t2d FROM t2 WHERE x.t1c = t2c")
    prologue = (
        ", cte1 AS (SELECT t1a AS c1a, t1b AS c1b, t1c AS c1c, t1d AS c1d"
        " FROM t1)"
        ", cte2 AS (SELECT t1a AS c1a, t1b AS c1b, t1h AS c1h FROM t1"
        " WHERE t1a IN (SELECT t2a FROM t2 WHERE t1b < t2b))"
        f", cte3 AS (SELECT x.t1a AS c1a, x.t1b AS c1b FROM t1 x WHERE {cte3_pred})"
    )
    return prologue + "\n" + "\nUNION ALL\n".join(checks)


def _cte_multicol_battery(spark_sess: SparkSession) -> DataFrame:
    body = _in_cte_multicol_sql(spark=True)
    prologue, checks = body.split("\n", 1)
    return spark_sess.sql(
        f"{_star_with(spark=True)}{prologue}\n{checks}\n{_OUT_ORDER}"
    )


def _cte_multicol_oracle() -> str:
    body = _in_cte_multicol_sql(spark=False)
    prologue, checks = body.split("\n", 1)
    return f"{_star_with(spark=False)}{prologue}\n{checks}\n{_OUT_ORDER}"


@register(
    "sqltests_in_cte_multicol",
    _cte_multicol_oracle(),
    tags=("sqltests", "subquery"),
)
def sqltests_in_cte_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over in-with-cte.sql + in-multiple-columns.sql: CTEs
    consumed by IN subqueries (set-op chains over one CTE, self-joined
    CTEs, IN inside the CTE definition itself) and row-value
    `(a, b) [NOT] IN (SELECT x, y ...)` — correlated, nested, under set
    ops, and inside a CTE. DuckDB's binder rejects row-value IN
    subqueries, so the oracle states the definition independently:
    EXISTS-with-equality for IN (WHERE context), null-aware NOT EXISTS
    for NOT IN (every column equal-or-either-null) — the
    sqltests_not_in_null derivation extended to correlated forms.
    Scale shape: constant LocalRelation."""
    return _cte_multicol_battery(spark)


# ---------------------------------------------------------------------------
# grouping_set.sql + inner-join.sql + pred-pushdown.sql + comparator.sql
# ---------------------------------------------------------------------------


def _pushdown_misc_sql(spark: bool) -> str:
    # Spark's legacy `GROUP BY a, b, c GROUPING SETS ((a))` form keeps the
    # non-active keys in scope and NULL-fills them; DuckDB has only the
    # direct `GROUP BY GROUPING SETS ((a))` form, so its oracle states the
    # NULL-fill explicitly — a second derivation of the same semantics.
    if spark:
        gs_empty = ("SELECT a, b, c, count(d) AS cnt FROM g"
                    " GROUP BY a, b, c GROUPING SETS (())")
        gs_a = ("SELECT a, b, c, count(d) AS cnt FROM g"
                " GROUP BY a, b, c GROUPING SETS ((a))")
        gs_c = ("SELECT a, b, c, count(d) AS cnt FROM g"
                " GROUP BY a, b, c GROUPING SETS ((c))")
        anti = ("SELECT c1, c2 FROM tbl_a LEFT ANTI JOIN tbl_b"
                " ON ((tbl_a.c1 = tbl_a.c2) IS NULL OR tbl_a.c1 = tbl_a.c2)")
    else:
        gs_empty = ("SELECT CAST(NULL AS STRING) AS a, CAST(NULL AS STRING) AS b,"
                    " CAST(NULL AS STRING) AS c, count(d) AS cnt FROM g"
                    " GROUP BY GROUPING SETS (())")
        gs_a = ("SELECT a, CAST(NULL AS STRING) AS b, CAST(NULL AS STRING) AS c,"
                " count(d) AS cnt FROM g GROUP BY GROUPING SETS ((a))")
        gs_c = ("SELECT CAST(NULL AS STRING) AS a, CAST(NULL AS STRING) AS b,"
                " c, count(d) AS cnt FROM g GROUP BY GROUPING SETS ((c))")
        anti = ("SELECT c1, c2 FROM tbl_a WHERE NOT EXISTS (SELECT 1 FROM"
                " tbl_b WHERE (tbl_a.c1 = tbl_a.c2) IS NULL OR"
                " tbl_a.c1 = tbl_a.c2)")
    checks = [
        # grouping_set.sql (SPARK-17849 NPE triggers): grouping sets whose
        # active set drops listed keys
        _sel("gs_empty_set", "coalesce(a, '#') || coalesce(b, '#') || coalesce(c, '#')",
             "cnt", "NULL", "NULL", f"FROM ({gs_empty}) z"),
        _sel("gs_only_a", "coalesce(a, '#') || coalesce(b, '#') || coalesce(c, '#')",
             "cnt", "NULL", "NULL", f"FROM ({gs_a}) z"),
        _sel("gs_only_c", "coalesce(a, '#') || coalesce(b, '#') || coalesce(c, '#')",
             "cnt", "NULL", "NULL", f"FROM ({gs_c}) z"),
        # inner-join.sql (SPARK-19766): constant alias columns must not be
        # constant-folded across the join
        _sel("ij_const_alias_tag", "tag", "a", "NULL", "NULL",
             "FROM (SELECT tb.a, tb.tag FROM ta INNER JOIN tb"
             " ON ta.a = tb.a AND ta.tag = tb.tag) z"),
        # pred-pushdown.sql (SPARK-18597): the anti-join condition must not
        # be pushed to the left side
        _sel("pp_anti_no_pushdown", "NULL", "c1", "c2", "NULL", f"FROM ({anti}) z"),
        # (SPARK-18614): predicate on the left table below ExistenceJoin
        _sel("pp_existence_join", "NULL", "c1", "c2", "NULL",
             "FROM (SELECT l.c1, l.c2 FROM tbl_a l WHERE EXISTS"
             " (SELECT 1 FROM tbl_b r WHERE l.c1 = l.c2) OR l.c2 < 2) z"),
        # comparator.sql: unsigned byte-wise binary comparison
        _sel("cmp_binary_lt_0f", "NULL",
             "CAST((x'00' < x'0f') AS INT)", "NULL", "NULL", ""),
        _sel("cmp_binary_lt_ff", "NULL",
             "CAST((x'00' < x'ff') AS INT)", "NULL", "NULL", ""),
    ]
    if spark:
        prologue = (
            ", g AS (SELECT * FROM VALUES ('1','2','3',1), ('4','5','6',1),"
            " ('7','8','9',1) AS g(a, b, c, d))"
            ", ta AS (SELECT 1 AS a, 'a' AS tag UNION ALL SELECT 1, 'b')"
            ", tb AS (SELECT 1 AS a, 'a' AS tag FROM (SELECT 1 UNION ALL"
            " SELECT 1) x UNION ALL SELECT 1, 'b' FROM (SELECT 1 UNION ALL"
            " SELECT 1) y)"
            ", tbl_a AS (SELECT * FROM VALUES (1, 1), (2, 1), (3, 6)"
            " AS tbl_a(c1, c2))"
            ", tbl_b AS (SELECT 1 AS c1)"
        )
    else:
        prologue = (
            ", g AS (SELECT * FROM (VALUES ('1','2','3',1), ('4','5','6',1),"
            " ('7','8','9',1)) g(a, b, c, d))"
            ", ta AS (SELECT 1 AS a, 'a' AS tag UNION ALL SELECT 1, 'b')"
            ", tb AS (SELECT 1 AS a, 'a' AS tag FROM (SELECT 1 UNION ALL"
            " SELECT 1) x UNION ALL SELECT 1, 'b' FROM (SELECT 1 UNION ALL"
            " SELECT 1) y)"
            ", tbl_a AS (SELECT * FROM (VALUES (1, 1), (2, 1), (3, 6))"
            " tbl_a(c1, c2))"
            ", tbl_b AS (SELECT 1 AS c1)"
        )
    return prologue + "\n" + "\nUNION ALL\n".join(checks)


def _pushdown_battery(spark_sess: SparkSession) -> DataFrame:
    body = _pushdown_misc_sql(spark=True)
    prologue, checks = body.split("\n", 1)
    return spark_sess.sql(
        f"{_star_with(spark=True)}{prologue}\n{checks}\n{_OUT_ORDER}"
    )


def _pushdown_oracle() -> str:
    body = _pushdown_misc_sql(spark=False)
    prologue, checks = body.split("\n", 1)
    return f"{_star_with(spark=False)}{prologue}\n{checks}\n{_OUT_ORDER}"


@register(
    "sqltests_pushdown_misc",
    _pushdown_oracle(),
    tags=("sqltests", "join", "agg"),
)
def sqltests_pushdown_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over four small golden inputs: grouping_set.sql (the
    SPARK-17849 NPE shapes — GROUPING SETS whose active set drops listed
    keys; DuckDB lacks Spark's legacy GROUP-BY-list form, so its oracle
    NULL-fills the dropped keys explicitly), inner-join.sql (SPARK-19766 —
    constant alias columns must not be constant-folded across a join),
    pred-pushdown.sql (SPARK-18597 anti-join condition not pushed to the
    left side — DuckDB oracle spells the anti join as NOT EXISTS — and
    SPARK-18614 ExistenceJoin via EXISTS-or-disjunct), and comparator.sql
    (unsigned byte-wise binary comparison). Scale: constant."""
    return _pushdown_battery(spark)


# ---------------------------------------------------------------------------
# typeCoercion/native: widenSetOperationTypes + booleanEquality +
# binaryComparison + windowFrameCoercion (cross-engine-agreeing cells)
# ---------------------------------------------------------------------------

_NUM_TYPES = ["TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE"]


def _coercion_sql() -> str:
    checks = []
    # widenSetOperationTypes: the numeric x numeric widening matrix —
    # UNION DISTINCT of 1 and 2 at every type pair; both engines agree the
    # result set is {1, 2} in the widened type. Emitted as d (DOUBLE) so
    # one column carries every pair.
    for lt in _NUM_TYPES:
        for rt in _NUM_TYPES:
            checks.append(_sel(
                f"widen_{lt.lower()}_{rt.lower()}", "NULL", "NULL", "NULL", "v",
                f"FROM (SELECT CAST(1 AS {lt}) AS v UNION"
                f" SELECT CAST(2 AS {rt})) z"))
    # numeric UNION string widens to string in BOTH engines
    for lt in ["TINYINT", "INT", "BIGINT"]:
        checks.append(_sel(
            f"widen_{lt.lower()}_string", "v", "NULL", "NULL", "NULL",
            f"FROM (SELECT CAST(1 AS {lt}) AS v UNION"
            " SELECT CAST('2' AS STRING)) z"))
    # booleanEquality's boolean=numeric cells are ANSI-SESSION-DEPENDENT
    # (legacy mode coerces and returns true; ANSI mode rejects with
    # BINARY_OP_DIFF_TYPES — and the driver's vanilla probe runs ANSI-ON),
    # so they are pinned PER MODE in tests/test_r11_sqltests.py, not
    # oracle-paired here. The vanilla sweep caught this before the driver
    # could (the r10 string-division lesson repeating).
    # binaryComparison: the BLOB/BINARY ordering cells both engines share
    checks.append(_sel("bincmp_eq", "NULL", "CAST((x'11' = x'11') AS INT)",
                       "CAST((x'11' = x'12') AS INT)", "NULL", ""))
    checks.append(_sel("bincmp_order", "NULL", "CAST((x'11' > x'10') AS INT)",
                       "CAST((x'1100' > x'11') AS INT)", "NULL", ""))
    # windowFrameCoercion: COUNT over ORDER BY at every numeric type with
    # the RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING frame (valid in both
    # engines for numeric keys; the non-numeric RANGE cells raise in Spark
    # and are pinned in tests/test_r11_sqltests.py)
    for t in _NUM_TYPES:
        checks.append(_sel(
            f"winrange_{t.lower()}", "NULL", "c", "NULL", "NULL",
            f"FROM (SELECT COUNT(*) OVER (PARTITION BY 1 ORDER BY"
            f" CAST(1 AS {t}) DESC RANGE BETWEEN CURRENT ROW AND"
            " 1 FOLLOWING) AS c FROM (SELECT 1 AS one) t) z"))
    # DATE keys take an integer (days) RANGE offset in BOTH engines
    checks.append(_sel(
        "winrange_date", "NULL", "c", "NULL", "NULL",
        "FROM (SELECT COUNT(*) OVER (PARTITION BY 1 ORDER BY"
        " DATE '2017-12-11' DESC RANGE BETWEEN CURRENT ROW AND"
        " 1 FOLLOWING) AS c FROM (SELECT 1 AS one) t) z"))
    return "\nUNION ALL\n".join(checks)


@register(
    "sqltests_coercion_widen",
    _oracle(_coercion_sql()),
    tags=("sqltests", "coercion"),
)
def sqltests_coercion_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over the four leftover typeCoercion goldens:
    widenSetOperationTypes.sql (the 6x6 numeric widening matrix under
    UNION DISTINCT plus numeric-vs-string widening — both engines agree),
    booleanEquality.sql (boolean = numeric at every width, both operand
    orders), binaryComparison.sql (unsigned lexicographic BINARY/BLOB
    ordering incl. the prefix rule), and windowFrameCoercion.sql (RANGE
    frames valid over every numeric ORDER BY type). Cells where the
    engines' coercion rules genuinely diverge (boolean = string, binary
    vs string comparisons, RANGE over date/boolean keys) are pinned
    per-engine in tests/test_r11_sqltests.py — a value hash can't carry
    a divergence. Scale shape: constant LocalRelation."""
    return _battery(spark, _coercion_sql())


# ---------------------------------------------------------------------------
# sql-compatibility-functions.sql (RuntimeReplaceable compatibility fns)
# ---------------------------------------------------------------------------


def _compat_fn_sql(spark: bool) -> str:
    # DuckDB lacks nvl/nvl2, so the oracle states their definitions
    # (coalesce / CASE WHEN IS NOT NULL) — the same independent-derivation
    # rule the row-value IN oracles follow. ifnull/nullif are native in
    # both engines.
    def nvl(a: str, b: str) -> str:
        return f"nvl({a}, {b})" if spark else f"coalesce({a}, {b})"

    def nvl2(a: str, b: str, c: str) -> str:
        if spark:
            return f"nvl2({a}, {b}, {c})"
        return f"CASE WHEN {a} IS NOT NULL THEN {b} ELSE {c} END"

    struct_lit = (
        "named_struct('col1', 'gamma', 'col2', 'delta')"
        if spark
        else "struct_pack(col1 := 'gamma', col2 := 'delta')"
    )
    d21 = "CAST(2.1 AS DOUBLE)"
    QX, QY, QN = "'x'", "'y'", "'n'"
    checks = [
        _sel("ifnull_strings",
             "ifnull(NULL, 'x') || '|' || ifnull('y', 'x')"
             " || '|' || coalesce(CAST(ifnull(NULL, NULL) AS STRING), '#')",
             "NULL", "NULL", "NULL", ""),
        _sel("nullif_strings",
             "coalesce(nullif('x', 'x'), '#') || '|' || nullif('x', 'y')",
             "NULL", "NULL", "NULL", ""),
        _sel("nvl_strings",
             nvl("NULL", QX) + " || '|' || " + nvl(QY, QX),
             "NULL", "NULL", "NULL", ""),
        _sel("nvl2_strings",
             nvl2("NULL", QX, QY) + " || '|' || " + nvl2(QN, QX, QY),
             "NULL", "NULL", "NULL", ""),
        # type coercion: int vs double widens to double in both engines
        _sel("ifnull_coerce", "NULL", "NULL", "NULL",
             f"ifnull(CAST(NULL AS INT), {d21})", ""),
        _sel("nullif_coerce", "NULL", "NULL", "NULL",
             f"coalesce(CAST(nullif(1, {d21}) AS DOUBLE), -1)", ""),
        _sel("nvl_coerce", "NULL", "NULL", "NULL",
             nvl("CAST(NULL AS INT)", d21), ""),
        _sel("nvl2_coerce", "NULL", "NULL", "NULL",
             nvl2("'n'", "CAST(1 AS INT)", d21), ""),
        # SPARK-21555: RuntimeReplaceable inside GROUP BY (over a struct
        # field — the shape that used to miss resolution)
        _sel("nvl_in_group_by", "k", "cnt", "NULL", "NULL",
             "FROM (SELECT " + nvl("st.col1", "'value'") + " AS k, count(*) AS cnt"
             f" FROM (SELECT 1 AS id, {struct_lit} AS st) tv"
             " GROUP BY " + nvl("st.col1", "'value'") + ") z"),
    ]
    return "\nUNION ALL\n".join(checks)


@register(
    "sqltests_compat_functions",
    f"{_star_with(spark=False)}\n{_compat_fn_sql(spark=False)}\n{_OUT_ORDER}",
    tags=("sqltests", "functions"),
)
def sqltests_compat_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery over sql-compatibility-functions.sql: the
    RuntimeReplaceable compatibility surface — ifnull / nullif / nvl /
    nvl2 over strings and nulls, their int-vs-double coercion cells, and
    the SPARK-21555 RuntimeReplaceable-inside-GROUP-BY shape over a
    struct field. DuckDB lacks nvl/nvl2, so the oracle states their
    definitions (coalesce, CASE WHEN IS NOT NULL). The Hive cast-alias
    sugar (boolean(1), int(1), ...) and the string(1, 2) arity error are
    Spark-only and pinned in tests/test_r11_sqltests.py. Scale shape:
    constant LocalRelation."""
    return spark.sql(
        f"{_star_with(spark=True)}\n{_compat_fn_sql(spark=True)}\n{_OUT_ORDER}"
    )


# ---------------------------------------------------------------------------
# Function-registry gap audit (round-11): a systematic diff of Spark 4.1's
# SHOW FUNCTIONS against every function referenced across the corpus
# surfaced the still-unexercised scalar surface; the cross-engine-checkable
# cells land here, each with an independently derived DuckDB spelling
# (DuckDB lacks width_bucket / equal_null / nanvl / zeroifnull /
# nullifzero / mask / bit_get / unix_date / dayname-abbrev — the oracle
# states each function's DEFINITION instead). Sketch families
# (kll_*/theta_*/approx_top_k_*) are seeded-random and cross-engine
# unhashable; trig/cbrt differ by libm-vs-JVM ulps (cross-engine float
# rules); soundex/luhn_check have no DuckDB analog and get pytest pins.
# ---------------------------------------------------------------------------


def _fn_gap_sql(spark: bool) -> str:
    TS = "TIMESTAMP '2014-04-04 01:00:00'"
    D = "DATE '2014-04-04'"
    if spark:
        cells = [
            ("width_bucket_mid", "NULL", "width_bucket(7, 0, 10, 5)", "width_bucket(11, 0, 10, 5)", "NULL"),
            ("split_part_pos", "split_part('a,b,c', ',', 2)", "NULL", "NULL", "NULL"),
            ("position_in", "NULL", "position('b' IN 'abc')", "NULL", "NULL"),
            ("case_aliases", "lcase('AB') || ucase('ab')", "char_length('abcd')", "character_length('ab')", "NULL"),
            # Spark's two-arg ltrim/rtrim take (trimStr, str) — REVERSED vs
            # DuckDB's (str, trimStr); btrim agrees on (str, trimStr)
            ("trim_chars", "btrim('xxaxx', 'x') || '|' || ltrim('x', 'xxa') || '|' || rtrim('x', 'axx')", "NULL", "NULL", "NULL"),
            (f"day_month_name", f"dayname({D}) || '|' || monthname({D})", "NULL", "NULL", "NULL"),
            (f"unix_date_roundtrip", "CAST(date_from_unix_date(16164) AS STRING)", f"unix_date({D})", "NULL", "NULL"),
            (f"unix_epoch_fns", "NULL", f"unix_seconds({TS})", f"unix_millis({TS})", "NULL"),
            ("timestamp_seconds_fn", "CAST(timestamp_seconds(1000000000) AS STRING)", "NULL", "NULL", "NULL"),
            (f"date_part_fn", "NULL", f"date_part('year', {TS})", f"datepart('month', {TS})", "NULL"),
            ("equal_null_fn", "NULL", "CAST(equal_null(5, 5) AS INT)", "CAST(equal_null(NULL, 5) AS INT)", "NULL"),
            ("nanvl_fn", "NULL", "NULL", "NULL", "nanvl(CAST('NaN' AS DOUBLE), 2.5)"),
            ("zero_null_fns", "NULL", "zeroifnull(CAST(NULL AS INT))", "nullifzero(0)", "NULL"),
            ("mask_default", "mask('AbCD123-@$#')", "NULL", "NULL", "NULL"),
            ("bit_get_fns", "NULL", "bit_get(12, 2)", "getbit(12, 3)", "NULL"),
            ("shift_unsigned", "NULL", "shiftrightunsigned(1024, 3)", "NULL", "NULL"),
            ("try_mod_zero", "NULL", "try_mod(5, 0)", "try_mod(7, 4)", "NULL"),
            ("bround_even", "NULL", "CAST(bround(2.5, 0) AS BIGINT)", "CAST(bround(3.5, 0) AS BIGINT)", "NULL"),
        ]
    else:
        cells = [
            ("width_bucket_mid", "NULL", "(7 * 5) // 10 + 1", "5 + 1", "NULL"),
            ("split_part_pos", "split_part('a,b,c', ',', 2)", "NULL", "NULL", "NULL"),
            ("position_in", "NULL", "position('b' IN 'abc')", "NULL", "NULL"),
            ("case_aliases", "lcase('AB') || ucase('ab')", "length('abcd')", "length('ab')", "NULL"),
            ("trim_chars", "trim('xxaxx', 'x') || '|' || ltrim('xxa', 'x') || '|' || rtrim('axx', 'x')", "NULL", "NULL", "NULL"),
            (f"day_month_name", f"strftime({D}, '%a') || '|' || strftime({D}, '%b')", "NULL", "NULL", "NULL"),
            (f"unix_date_roundtrip", "CAST(DATE '1970-01-01' + 16164 AS STRING)", f"datediff('day', DATE '1970-01-01', {D})", "NULL", "NULL"),
            (f"unix_epoch_fns", "NULL", f"CAST(epoch({TS}) AS BIGINT)", f"epoch_ms({TS})", "NULL"),
            ("timestamp_seconds_fn", "CAST(CAST(to_timestamp(1000000000) AS TIMESTAMP) AS STRING)", "NULL", "NULL", "NULL"),
            (f"date_part_fn", "NULL", f"date_part('year', {TS})", f"date_part('month', {TS})", "NULL"),
            ("equal_null_fn", "NULL", "CAST(5 IS NOT DISTINCT FROM 5 AS INT)", "CAST(NULL IS NOT DISTINCT FROM 5 AS INT)", "NULL"),
            ("nanvl_fn", "NULL", "NULL", "NULL", "CASE WHEN isnan(CAST('NaN' AS DOUBLE)) THEN 2.5 ELSE CAST('NaN' AS DOUBLE) END"),
            ("zero_null_fns", "NULL", "coalesce(CAST(NULL AS INT), 0)", "nullif(0, 0)", "NULL"),
            ("mask_default",
             "regexp_replace(regexp_replace(regexp_replace('AbCD123-@$#',"
             " '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')",
             "NULL", "NULL", "NULL"),
            ("bit_get_fns", "NULL", "(12 >> 2) & 1", "(12 >> 3) & 1", "NULL"),
            ("shift_unsigned", "NULL", "1024 >> 3", "NULL", "NULL"),
            ("try_mod_zero", "NULL", "CAST(NULL AS INT)", "7 % 4", "NULL"),
            ("bround_even", "NULL", "CAST(round_even(2.5, 0) AS BIGINT)", "CAST(round_even(3.5, 0) AS BIGINT)", "NULL"),
        ]
    return "\nUNION ALL\n".join(_sel(c, s, n1, n2, d, "") for c, s, n1, n2, d in cells)


@register(
    "fn_registry_gap_audit",
    f"{_fn_gap_sql(spark=False)}\n{_OUT_ORDER}",
    tags=("functions", "audit"),
)
def fn_registry_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The function-registry diff audit battery: Spark-4 scalar functions
    a systematic SHOW-FUNCTIONS-vs-corpus diff found unexercised —
    width_bucket, split_part, position(IN), lcase/ucase/char_length
    aliases, btrim/ltrim/rtrim with a trim-charset, dayname/monthname,
    unix_date/date_from_unix_date, unix_seconds/unix_millis,
    timestamp_seconds, date_part/datepart, equal_null, nanvl,
    zeroifnull/nullifzero, mask, bit_get/getbit, shiftrightunsigned,
    try_mod, and bround (banker's rounding vs DuckDB round_even). Where
    DuckDB lacks the function the oracle states its definition
    (integer-exact width_bucket formula, IS NOT DISTINCT FROM, the
    triple-regexp mask, shift-and for bit_get). Scale shape: constant
    SELECT-only battery."""
    return spark.sql(f"{_fn_gap_sql(spark=True)}\n{_OUT_ORDER}")


def _fn_gap2_sql(spark: bool) -> str:
    def vals(rows: str, alias: str) -> str:
        return (f"FROM VALUES {rows} AS {alias}" if spark
                else f"FROM (VALUES {rows}) {alias}")

    bools = vals("(true), (false), (CAST(NULL AS BOOLEAN))", "t(x)")
    var2 = vals("(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)), (CAST(2 AS DOUBLE), CAST(4 AS DOUBLE))", "t(x, y)")
    var3 = vals("(CAST(1 AS DOUBLE)), (CAST(2 AS DOUBLE)), (CAST(3 AS DOUBLE))", "t(x)")
    if spark:
        cells = [
            ("from_unixtime_fn", "from_unixtime(1000000000)", "NULL", "NULL", "NULL", ""),
            ("to_unix_timestamp_fn", "NULL", "to_unix_timestamp('2014-04-04', 'yyyy-MM-dd')", "NULL", "NULL", ""),
            ("make_timestamp_fn", "CAST(make_timestamp(2014, 4, 4, 1, 30, 0) AS STRING)", "NULL", "NULL", "NULL", ""),
            ("format_string_fn", "format_string('%d-%s', 7, 'x') || '|' || printf('%d-%s', 8, 'y')", "NULL", "NULL", "NULL", ""),
            ("json_len_keys", "array_join(json_object_keys('{\"a\":1,\"b\":2}'), ',')", "json_array_length('[1,2,3]')", "NULL", "NULL", ""),
            ("ilike_regexp_fns", "NULL", "CAST(ilike('AbC', '%b%') AS INT)", "CAST(regexp_like('abc', 'b.') AS INT)", "NULL", ""),
            ("every_some_any", "NULL", "CAST(every(x) AS INT)", "CAST(some(x) AS INT)", "CAST(any(x) AS INT)", bools),
            ("var_covar_pop", "NULL", "CAST(variance(x) AS BIGINT)", "NULL", "covar_pop(x, y)", var2),
            ("stddev_alias", "NULL", "NULL", "NULL", "stddev(x)", var3),
            ("sha2_256", "sha2('abc', 256)", "NULL", "NULL", "NULL", ""),
            ("const_e", "NULL", "NULL", "NULL", "e()", ""),
            ("const_pi", "NULL", "NULL", "NULL", "pi()", ""),
        ]
    else:
        cells = [
            ("from_unixtime_fn", "strftime(CAST(to_timestamp(1000000000) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')", "NULL", "NULL", "NULL", ""),
            ("to_unix_timestamp_fn", "NULL", "CAST(epoch(strptime('2014-04-04', '%Y-%m-%d')) AS BIGINT)", "NULL", "NULL", ""),
            ("make_timestamp_fn", "CAST(make_timestamp(2014, 4, 4, 1, 30, 0.0) AS STRING)", "NULL", "NULL", "NULL", ""),
            ("format_string_fn", "printf('%d-%s', 7, 'x') || '|' || printf('%d-%s', 8, 'y')", "NULL", "NULL", "NULL", ""),
            ("json_len_keys", "array_to_string(json_keys(CAST('{\"a\":1,\"b\":2}' AS JSON)), ',')", "CAST(json_array_length(CAST('[1,2,3]' AS JSON)) AS BIGINT)", "NULL", "NULL", ""),
            ("ilike_regexp_fns", "NULL", "CAST(('AbC' ILIKE '%b%') AS INT)", "CAST(regexp_matches('abc', 'b.') AS INT)", "NULL", ""),
            ("every_some_any", "NULL", "CAST(bool_and(x) AS INT)", "CAST(bool_or(x) AS INT)", "CAST(bool_or(x) AS INT)", bools),
            ("var_covar_pop", "NULL", "CAST(var_samp(x) AS BIGINT)", "NULL", "covar_pop(x, y)", var2),
            ("stddev_alias", "NULL", "NULL", "NULL", "stddev(x)", var3),
            ("sha2_256", "sha256('abc')", "NULL", "NULL", "NULL", ""),
            ("const_e", "NULL", "NULL", "NULL", "exp(CAST(1 AS DOUBLE))", ""),
            ("const_pi", "NULL", "NULL", "NULL", "pi()", ""),
        ]
    return "\nUNION ALL\n".join(_sel(c, s, n1, n2, d, tail) for c, s, n1, n2, d, tail in cells)


@register(
    "fn_registry_gap_audit2",
    f"{_fn_gap2_sql(spark=False)}\n{_OUT_ORDER}",
    tags=("functions", "audit"),
)
def fn_registry_gap_audit2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second wave of the function-registry diff audit: from_unixtime /
    to_unix_timestamp (format-string dialects parameterized per engine),
    make_timestamp, format_string + printf, json_array_length +
    json_object_keys (keys array_join'ed — raw arrays banned), the
    ilike/regexp_like function forms, the every/some/any boolean-agg
    aliases over a NULL-bearing set (oracle: bool_and/bool_or), the
    variance/stddev/covar_pop alias surface over exactly-representable
    sets (so the Welford-vs-two-pass formula difference cannot produce an
    ulp), sha2-256 vs DuckDB sha256, and the e()/pi() constants (both
    engines expose the same IEEE doubles). Scale: constant battery."""
    return spark.sql(f"{_fn_gap2_sql(spark=True)}\n{_OUT_ORDER}")


def _fn_map_ho_sql(spark: bool) -> str:
    """Higher-order MAP function battery. Map outputs are rendered to
    'k=v' joined strings (raw map columns are banned corpus-wide); the
    DuckDB oracle derives each function over the same base maps via
    map_entries + list lambdas (it has no transform_keys/values,
    map_filter, or map_zip_with)."""
    if spark:
        m = "map_from_arrays(array('a', 'b', 'c'), array(1, 2, 3))"
        render = "array_join(transform(map_entries({0}), e -> concat(e.key, '=', CAST(e.value AS STRING))), ',')"
        cells = [
            ("map_from_arrays_fn", render.format(m)),
            ("map_from_entries_fn",
             render.format("map_from_entries(array(struct('x', 7), struct('y', 8)))")),
            ("transform_keys_fn", render.format(f"transform_keys({m}, (k, v) -> upper(k))")),
            ("transform_values_fn", render.format(f"transform_values({m}, (k, v) -> v * 10)")),
            ("map_filter_fn", render.format(f"map_filter({m}, (k, v) -> v > 1)")),
            ("map_zip_with_fn",
             render.format(
                 "map_zip_with(map_from_arrays(array('a', 'b'), array(1, 2)),"
                 " map_from_arrays(array('b', 'c'), array(10, 20)),"
                 " (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))")),
            ("map_keys_values_fn",
             f"array_join(map_keys({m}), ',') || '|' || array_join(transform(map_values({m}), v -> CAST(v AS STRING)), ',')"),
        ]
    else:
        m = "map(['a', 'b', 'c'], [1, 2, 3])"
        render = "array_to_string(list_transform(map_entries({0}), e -> e.key || '=' || CAST(e.value AS VARCHAR)), ',')"

        def ent(expr: str) -> str:
            return f"array_to_string(list_transform(map_entries({m}), e -> {expr}), ',')"

        cells = [
            ("map_from_arrays_fn", render.format(m)),
            ("map_from_entries_fn", render.format("map(['x', 'y'], [7, 8])")),
            ("transform_keys_fn", ent("upper(e.key) || '=' || CAST(e.value AS VARCHAR)")),
            ("transform_values_fn", ent("e.key || '=' || CAST(e.value * 10 AS VARCHAR)")),
            ("map_filter_fn",
             f"array_to_string(list_transform(list_filter(map_entries({m}),"
             " e -> e.value > 1), e -> e.key || '=' || CAST(e.value AS VARCHAR)), ',')"),
            ("map_zip_with_fn",
             "array_to_string(list_transform(['a', 'b', 'c'], k -> k || '=' ||"
             " CAST(coalesce(map_extract(map(['a', 'b'], [1, 2]), k)[1], 0)"
             " + coalesce(map_extract(map(['b', 'c'], [10, 20]), k)[1], 0)"
             " AS VARCHAR)), ',')"),
            ("map_keys_values_fn",
             f"array_to_string(map_keys({m}), ',') || '|' ||"
             f" array_to_string(list_transform(map_values({m}), v -> CAST(v AS VARCHAR)), ',')"),
        ]
    return "\nUNION ALL\n".join(
        _sel(c, s, "NULL", "NULL", "NULL", "") for c, s in cells
    )


@register(
    "fn_map_higher_order",
    f"{_fn_map_ho_sql(spark=False)}\n{_OUT_ORDER}",
    tags=("functions", "audit"),
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third wave of the function-registry diff audit: the higher-order
    MAP surface — map_from_arrays / map_from_entries construction,
    transform_keys / transform_values, map_filter, map_zip_with (key
    union in first-map-then-new-keys order), and map_keys/map_values.
    Every map is rendered to a 'k=v' joined string (raw map outputs are
    banned corpus-wide); DuckDB lacks the four lambda forms, so the
    oracle derives each over the same base maps via map_entries + list
    lambdas. Scale shape: constant battery (lambdas are CodegenFallback
    — fine on constants, kept out of hot paths per the corpus rule)."""
    return spark.sql(f"{_fn_map_ho_sql(spark=True)}\n{_OUT_ORDER}")


def _gen_outer_sql(spark: bool) -> str:
    """OUTER generator variants: posexplode_outer / explode_outer /
    inline_outer must emit one NULL row for an empty or NULL collection
    where the non-outer forms drop the parent row. The DuckDB oracle
    derives outer semantics as src LEFT JOIN (unnested rows) — the empty
    and NULL arrays fall out as the null row with no special-casing."""
    if spark:
        return (
            "SELECT 'posexplode_outer' AS check_name, CAST(id AS BIGINT) AS n1,"
            " CAST(pos AS BIGINT) AS n2, CAST(val AS BIGINT) AS n3,"
            " CAST(NULL AS STRING) AS s FROM (SELECT id, posexplode_outer(arr)"
            " AS (pos, val) FROM VALUES (1, array(10, 20)),"
            " (2, CAST(array() AS ARRAY<INT>)), (3, CAST(NULL AS ARRAY<INT>))"
            " AS src(id, arr)) z"
            "\nUNION ALL\n"
            "SELECT 'inline_outer', CAST(id AS BIGINT), CAST(a AS BIGINT),"
            " CAST(NULL AS BIGINT), b FROM (SELECT id, inline_outer(sarr)"
            " FROM VALUES (1, array(named_struct('a', 7, 'b', 'x'),"
            " named_struct('a', 8, 'b', 'y'))),"
            " (2, CAST(NULL AS ARRAY<STRUCT<a: INT, b: STRING>>))"
            " AS src(id, sarr)) z"
        )
    return (
        "WITH src AS (SELECT * FROM (VALUES (1, [10, 20]),"
        " (2, CAST([] AS INT[])), (3, CAST(NULL AS INT[]))) s(id, arr)),"
        " ex AS (SELECT id, generate_subscripts(arr, 1) - 1 AS pos,"
        " unnest(arr) AS val FROM src),"
        " src2 AS (SELECT * FROM (VALUES (1, [{'a': 7, 'b': 'x'},"
        " {'a': 8, 'b': 'y'}]), (2, CAST(NULL AS STRUCT(a INT, b VARCHAR)[])))"
        " s(id, sarr)),"
        " ex2 AS (SELECT id, unnest(sarr) AS st FROM src2)"
        " SELECT 'posexplode_outer' AS check_name, CAST(s.id AS BIGINT) AS n1,"
        " CAST(e.pos AS BIGINT) AS n2, CAST(e.val AS BIGINT) AS n3,"
        " CAST(NULL AS STRING) AS s FROM src s LEFT JOIN ex e USING (id)"
        "\nUNION ALL\n"
        "SELECT 'inline_outer', CAST(s.id AS BIGINT), CAST(e.st.a AS BIGINT),"
        " CAST(NULL AS BIGINT), e.st.b FROM src2 s LEFT JOIN ex2 e USING (id)"
    )


_GEN_OUTER_ORDER = "ORDER BY check_name, n1, n2, n3, s"


@register(
    "gen_outer_variants",
    f"{_gen_outer_sql(spark=False)}\n{_GEN_OUTER_ORDER}",
    tags=("generator", "audit"),
)
def gen_outer_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OUTER generator variants closing §2.2's last gap:
    posexplode_outer over a populated / empty / NULL array (the null-row
    emission that plain posexplode lacks — the same reason
    shingle_rows_df uses explode_outer) and inline_outer over a struct
    array with a NULL-collection row. Oracle: outer semantics derived as
    src LEFT JOIN unnested rows — empty/NULL collections become the null
    row with no special-casing, an independent statement of the rule.
    Scale shape: constant LocalRelation battery."""
    return spark.sql(f"{_gen_outer_sql(spark=True)}\n{_GEN_OUTER_ORDER}")
