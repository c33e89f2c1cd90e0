"""Property-based pins (hypothesis) for the round-8 session-B algorithm
primitives. These exercise the pure algorithms whose Spark/DuckDB forms
are oracle-pinned elsewhere — hypothesis shrinks to the boundary cases a
fixture can't be counted on to contain (empty windows, all-ties, domain
edges)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

H_SIDE = 1 << 16


def _fold_xy2d(x: int, y: int) -> int:
    """The exact per-level quadrant fold layout_hilbert unrolls."""
    hx, hy, hd = x % H_SIDE, y % H_SIDE, 0
    s = H_SIDE // 2
    while s > 0:
        rx = (hx // s) % 2
        ry = (hy // s) % 2
        hd += s * s * (3 * rx + ry - 2 * rx * ry)
        if ry == 1:
            pass
        elif rx == 0:
            hx, hy = hy, hx
        else:
            hx, hy = H_SIDE - 1 - hy, H_SIDE - 1 - hx
        s //= 2
    return hd


def _wiki_d2xy(n: int, d: int) -> tuple[int, int]:
    x = y = 0
    t, s = d, 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x, y = x + s * rx, y + s * ry
        t //= 4
        s *= 2
    return x, y


@settings(max_examples=300, deadline=None)
@given(st.integers(0, H_SIDE - 1), st.integers(0, H_SIDE - 1))
def test_hilbert_fold_bijective(x, y):
    """xy2d is a bijection onto [0, H^2): the textbook inverse recovers
    every point, including the corners/diagonal cases hypothesis shrinks
    to."""
    d = _fold_xy2d(x, y)
    assert 0 <= d < H_SIDE * H_SIDE
    assert _wiki_d2xy(H_SIDE, d) == (x, y)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 64), min_size=1, max_size=12),
    st.integers(1, 1_000_000),
)
def test_bh_integer_step_up_equals_fraction_reference(counts, q_ppm):
    """The integer cross-multiplied BH frontier (stats_fdr_bh's form) must
    equal the naive Fraction-arithmetic reference for every family of
    exceedance counts and FDR level."""
    from fractions import Fraction

    B = 64
    m = len(counts)
    counts = sorted(counts)
    # integer form: k = max rank with 1e6*m*(1+c) <= rk*q_ppm*(B+1)
    k_int = 0
    for rk, c in enumerate(counts, start=1):
        if 1_000_000 * m * (1 + c) <= rk * q_ppm * (B + 1):
            k_int = rk
    # reference: p_(rk) <= (rk/m)*q with exact rationals
    q = Fraction(q_ppm, 1_000_000)
    k_ref = 0
    for rk, c in enumerate(counts, start=1):
        if Fraction(1 + c, B + 1) <= Fraction(rk, m) * q:
            k_ref = rk
    assert k_int == k_ref


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 5000), min_size=1, max_size=60),
    st.integers(1, 3),
    st.integers(1, 400),
)
def test_sliding_limiter_state_equals_bruteforce(ts, k, w):
    """The K-deep allowed-history state machine (events_rate_limit_sliding
    / its streaming twin) must equal the brute-force definition: allowed
    iff fewer than K ALLOWED events sit in the trailing window (t-W, t]."""
    ts = sorted(ts)
    neg = -(10**15)
    la = [neg] * k
    state_decisions = []
    for t in ts:
        ok = la[k - 1] <= t - w
        if ok:
            la = [t] + la[: k - 1]
        state_decisions.append(ok)
    allowed_times = []
    brute_decisions = []
    for t in ts:
        in_window = [a for a in allowed_times if t - w < a <= t]
        ok = len(in_window) < k
        if ok:
            allowed_times.append(t)
        brute_decisions.append(ok)
    assert state_decisions == brute_decisions


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 40), st.integers(1, 40)), max_size=80),
)
def test_diagonal_islands_equal_bruteforce_runs(matches):
    """dedup_shared_spans' gaps-and-islands over (pa, diag) must recover
    exactly the maximal consecutive runs of matched positions per
    diagonal, for arbitrary (pa, pb) match sets."""
    from collections import defaultdict

    matches = sorted(set(matches))
    # islands form: group by diag, run = consecutive pa
    diags = defaultdict(list)
    for pa, pb in matches:
        diags[pa - pb].append(pa)
    island_runs = []
    for pas in diags.values():
        pas = sorted(set(pas))
        grp_runs = defaultdict(int)
        for rn, pa in enumerate(pas, start=1):
            grp_runs[pa - rn] += 1  # the pa - row_number() trick
        island_runs.extend(grp_runs.values())
    # brute force: maximal consecutive segments per diagonal
    brute_runs = []
    for pas in diags.values():
        pas = sorted(set(pas))
        run = 1
        for prev, cur in zip(pas, pas[1:]):
            if cur == prev + 1:
                run += 1
            else:
                brute_runs.append(run)
                run = 1
        brute_runs.append(run)
    assert sorted(island_runs) == sorted(brute_runs)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 100_000), min_size=1, max_size=120),
    st.integers(1, 20),
)
def test_two_level_running_max_equals_global(secs, bucket_w):
    """events_watermark_lateness' decomposition law: greatest(local
    running max within an order-preserving bucket, max of all previous
    buckets) equals the naive global running max for ANY bucket width."""
    lates_global = []
    runmax = None
    for s in secs:
        runmax = s if runmax is None else max(runmax, s)
        lates_global.append(runmax - s)
    # two-level: buckets by index-order-preserving key (value // width on
    # the ARRIVAL order position stands in for the day bucket)
    lates_two = []
    bucket_max: dict[int, int] = {}
    local_run: dict[int, int] = {}
    for i, s in enumerate(secs):
        b = i // bucket_w
        local_run[b] = s if b not in local_run else max(local_run[b], s)
        prev = max((m for bb, m in bucket_max.items() if bb < b), default=None)
        rm = local_run[b] if prev is None else max(local_run[b], prev)
        lates_two.append(rm - s)
        bucket_max[b] = local_run[b]
    assert lates_two == lates_global
