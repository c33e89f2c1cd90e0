"""Enforceable integer-overflow scale bounds (r8 verdict "What's wrong" #2
/ "Next round" #4): every integer cross-multiplication family documents an
int64 bound in prose — these properties drive each family's exact
expression FORM at the documented bound's magnitude and one order past it,
asserting either engine-identical results (against an arbitrary-precision
Python reference where the form is integer, cross-engine float-repr
identity where it is the staged double) or the documented fail-loud: the
DuckDB oracle RAISES on int64 overflow where non-ANSI Spark wraps
silently, so a corpus that ever breaches a bound turns into a loud
strict-sweep failure instead of silent corruption — the oracle pairing IS
the overflow guard, and these tests pin that it stays one.

Reference intent: the reference fork carries Spark 2.4's silent-overflow
cast/arithmetic semantics (SURVEY §7 hard-parts) — exactly the hazard
these bounds fence.

Each hypothesis example is a BATCH of rows evaluated in one Spark job and
one DuckDB query over identical inputs (hypothesis still shrinks on the
batch), keeping the suite fast while covering the magnitude ladder.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

INT64_MAX = (1 << 63) - 1

# ---------------------------------------------------------------------------
# The expression forms under test, shared VERBATIM between engines (and
# cross-referenced to the operators whose docstrings document the bounds).
# ---------------------------------------------------------------------------

# events_ab_test / stats_tost_equivalence (events_analytics.py): variance
# staged in double — (s2 - s1/n*s1), never the all-integer n*s2 - s1*s1.
WELCH_SQL = "(s2 - s1 / n * s1) / (n - 1.0) / 10000"
# The naive integer cross-product the staged form replaces (overflow probe).
WELCH_NAIVE_SQL = "n * s2 - s1 * s1"

# orders_abc_xyz (relational.py): CV^2 <= 0.25 / <= 1.0 class fences as
# integer cross-multiplications over BIGINT monthly sums.
CV2_SQL = (
    "CASE WHEN 4 * (n * s2 - s1 * s1) <= s1 * s1 THEN 'X' "
    "WHEN n * s2 - s1 * s1 <= s1 * s1 THEN 'Y' ELSE 'Z' END"
)

# The signed integer-ppm rule (stats_cohens_kappa finding, memory'd as the
# magnitude-floor + re-applied sign form): DuckDB floor-division and Spark
# truncating div agree only via this CASE.
PPM_SPARK = "CASE WHEN num >= 0 THEN (1000000 * num) div den ELSE -((1000000 * -num) div den) END"
PPM_DUCK = "CASE WHEN num >= 0 THEN (1000000 * num) // den ELSE -((1000000 * -num) // den) END"

# tpcds q63/q47/q57 deviation family: >10% test as integer
# cross-multiplication plus the HALF_UP integer average.
DEV_SPARK = "abs(10 * n * su - 10 * tot) > tot"
DEV_DUCK = DEV_SPARK
AVG_SPARK = "(2 * tot + n) div (2 * n)"
AVG_DUCK = "(2 * tot + n) // (2 * n)"


def _duck_eval(rows: pd.DataFrame, expr: str):
    con = duckdb.connect()
    try:
        con.register("t", rows)
        return [r[0] for r in con.execute(f"SELECT {expr} FROM t ORDER BY rid").fetchall()]
    finally:
        con.close()


def _spark_eval(spark, rows: pd.DataFrame, expr: str, out_type: str):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows)
    got = (
        df.select("rid", F.expr(expr).cast(out_type).alias("o"))
        .orderBy("rid")
        .collect()
    )
    return [r["o"] for r in got]


def _frame(batch: list[tuple], cols: list[str]) -> pd.DataFrame:
    df = pd.DataFrame(batch, columns=cols).astype("int64")
    df.insert(0, "rid", range(len(batch)))
    return df


# ---------------------------------------------------------------------------
# Family 1: Welch staged-double variance — cross-engine bit-identity at ANY
# magnitude (the whole point of staging in double), while the naive integer
# form it replaced provably overflows at the same draws.
# ---------------------------------------------------------------------------

welch_rows = st.tuples(
    st.integers(2, 10**9),                      # n
    st.integers(1, 4 * 10**18),                 # s1 (cents): to int64/2
    st.integers(1, 9 * 10**18 // 2),            # s2 (squared cents)
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None)
@given(st.lists(welch_rows, min_size=40, max_size=40))
def test_welch_staged_double_engine_identical_past_integer_bound(spark, batch):
    """The staged-double variance is float-repr identical Spark vs DuckDB
    for BIGINT inputs spanning the full int64 range — including draws where
    the all-integer cross-product n*s2 - s1*s1 exceeds int64 (which this
    test also proves happens, justifying the staging)."""
    rows = _frame(batch, ["n", "s1", "s2"])
    duck = _duck_eval(rows, WELCH_SQL)
    spk = _spark_eval(spark, rows, WELCH_SQL, "double")
    assert [repr(float(d)) for d in duck] == [repr(float(s)) for s in spk]
    # The replaced integer form would overflow on these magnitudes: at
    # least one draw per max-scale batch must breach int64 (the batch
    # spans 10^18-scale s1, where s1*s1 ~ 10^36).
    naive = [n * s2 - s1 * s1 for n, s1, s2 in batch]
    if max(abs(s1) for _, s1, _ in batch) > 4 * 10**9:
        assert any(abs(v) > INT64_MAX for v in naive)


# ---------------------------------------------------------------------------
# Family 2: ABC/XYZ CV^2 integer fences — exact vs arbitrary-precision
# Python inside the documented bound; the oracle raises one order past it.
# ---------------------------------------------------------------------------

# The fence multiplies the cross-product by 4, so the true bound is
# 4*S1^2 <= int64 -> S1 <= ~1.51e9 (NOT the ~3e9 a draft docstring
# claimed — this property caught the overstatement; orders_abc_xyz's
# docstring now carries the enforced constant) and 4*n*S2 <= int64.
CV2_S1_BOUND = 1_500_000_000
cv2_in_rows = st.tuples(
    st.integers(1, 120),                        # n months
    st.integers(1, CV2_S1_BOUND),               # s1: 4*s1^2 inside int64
    st.integers(0, 19 * 10**15),                # s2: 4*n*s2 inside int64
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None)
@given(st.lists(cv2_in_rows, min_size=40, max_size=40))
def test_cv2_fences_exact_inside_documented_bound(spark, batch):
    """Inside the documented bound (single-part cumulative S1 < ~3e9 —
    orders_abc_xyz docstring) the integer CV^2 class fences are exact:
    both engines equal arbitrary-precision Python on every draw."""
    rows = _frame(batch, ["n", "s1", "s2"])

    def ref(n, s1, s2):
        d = n * s2 - s1 * s1
        return "X" if 4 * d <= s1 * s1 else ("Y" if d <= s1 * s1 else "Z")

    expect = [ref(*t) for t in batch]
    assert _duck_eval(rows, CV2_SQL) == expect
    assert _spark_eval(spark, rows, CV2_SQL, "string") == expect


@settings(max_examples=20, deadline=None)
@given(st.integers(2 * 10**9, 3 * 10**10), st.integers(1, 120))
def test_cv2_oracle_raises_past_bound(s1, n):
    """Past the bound (4*S1^2 > int64) the DuckDB oracle raises OutOfRange
    instead of wrapping — a corpus that breaches the documented bound
    becomes a loud strict-sweep failure, never a silently-wrong
    classification. s2 = 0 pins the overflowing term to 4*(-S1^2)."""
    assert 4 * s1 * s1 > INT64_MAX  # the draw really is past the bound
    rows = _frame([(n, s1, 0)], ["n", "s1", "s2"])
    with pytest.raises(duckdb.OutOfRangeException):
        _duck_eval(rows, CV2_SQL)


# ---------------------------------------------------------------------------
# Family 3: signed integer-ppm division — exact incl. negatives inside the
# bound; oracle raises past it.
# ---------------------------------------------------------------------------

ppm_rows = st.tuples(
    st.integers(2, 10),                          # filler n (unused)
    st.integers(0, 1),                           # filler s1 (unused)
    st.integers(0, 1),                           # filler s2 (unused)
    st.integers(-(9 * 10**12), 9 * 10**12),      # num: 1e6*num inside int64
    st.integers(1, 10**12),                      # den
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None)
@given(st.lists(ppm_rows, min_size=40, max_size=40))
def test_signed_ppm_exact_inside_bound(spark, batch):
    """The magnitude-floor + re-applied-sign ppm CASE is exact on both
    engines for any signed numerator with 1e6*|num| inside int64 — the
    negative branch is where bare floor-vs-truncate division diverges."""
    rows = _frame(batch, ["n", "s1", "s2", "num", "den"])

    def ref(num, den):
        q = (1_000_000 * abs(num)) // den
        return q if num >= 0 else -q

    expect = [ref(t[3], t[4]) for t in batch]
    assert _duck_eval(rows, PPM_DUCK) == expect
    assert _spark_eval(spark, rows, PPM_SPARK, "long") == expect


@settings(max_examples=20, deadline=None)
@given(st.integers(10**13, 9 * 10**13), st.integers(1, 10**12), st.booleans())
def test_signed_ppm_oracle_raises_past_bound(mag, den, neg):
    """One order past the bound (|num| ~ 1e13, 1e6*num > int64) the oracle
    raises instead of wrapping."""
    num = -mag if neg else mag
    assert 1_000_000 * abs(num) > INT64_MAX
    rows = _frame([(num, den)], ["num", "den"])
    with pytest.raises(duckdb.OutOfRangeException):
        _duck_eval(rows, PPM_DUCK)


# ---------------------------------------------------------------------------
# Family 4: deviation-window cross-multiplication + HALF_UP average
# (q63/q47/q57 integer-unit discipline) — exact inside bound, loud past it.
# ---------------------------------------------------------------------------

dev_rows = st.tuples(
    st.integers(1, 12),                          # n months in window
    st.integers(0, 7 * 10**16),                  # su: 10*12*su inside int64
    st.integers(0, 8 * 10**17),                  # tot: 10*tot inside int64
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None)
@given(st.lists(dev_rows, min_size=40, max_size=40))
def test_deviation_fence_and_halfup_avg_exact_inside_bound(spark, batch):
    """The >10% deviation fence and the HALF_UP integer average are exact
    on both engines for BIGINT ten-thousandth units up to the documented
    magnitude (10*n*su and 2*tot+n inside int64)."""
    rows = _frame(batch, ["n", "su", "tot"])
    exp_dev = [abs(10 * n * su - 10 * tot) > tot for n, su, tot in batch]
    exp_avg = [(2 * tot + n) // (2 * n) for n, su, tot in batch]
    assert _duck_eval(rows, DEV_DUCK) == exp_dev
    assert _spark_eval(spark, rows, DEV_SPARK, "boolean") == exp_dev
    assert _duck_eval(rows, AVG_DUCK) == exp_avg
    assert _spark_eval(spark, rows, AVG_SPARK, "long") == exp_avg


@settings(max_examples=20, deadline=None)
@given(st.integers(8 * 10**17, 9 * 10**17), st.integers(2, 12))
def test_deviation_oracle_raises_past_bound(su, n):
    """One order past the bound (su ~ 1e18, 10*n*su > int64) the oracle
    raises instead of wrapping."""
    assert 10 * n * su > INT64_MAX
    rows = _frame([(n, su, 0)], ["n", "su", "tot"])
    with pytest.raises(duckdb.OutOfRangeException):
        _duck_eval(rows, DEV_DUCK)
