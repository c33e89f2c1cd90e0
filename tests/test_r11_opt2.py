"""Round-11 optimization-round second-pass pins: the BPE regexp-merge
rebuild (greedy leftmost non-overlapping semantics, regex-metachar safety)
and iterate()'s fused-probe + confirm convergence path."""
from __future__ import annotations

from pyspark.sql import functions as F


def _merge_once(spark, rows, pa, pb):
    """Apply one BPE merge (pa, pb) -> pa+pb to space-separated symbol
    strings via the production regexp path in _make_bpe_step (driven with a
    rigged vocab whose argmax is forced to (pa, pb) by weight)."""
    from sol_spark.operators.dedup import local_checkpoint, release_result
    from sol_spark.operators.text import _make_bpe_step

    # A heavy synthetic word made of the target pair forces the argmax to
    # (pa, pb); the probe words carry weight 1 and don't disturb it.
    heavy = " ".join([pa, pb] * 50)
    vocab = spark.createDataFrame(
        [("__forcer__", 10_000, heavy)] + [(w, 1, s) for w, s in rows],
        "word string, freq long, seq string",
    )
    merges: list = []
    step = _make_bpe_step(merges)
    ck = local_checkpoint(vocab)
    out = step(ck, 0)
    assert merges[0][1] == pa and merges[0][2] == pb
    res = {r["word"]: r["seq"] for r in out.collect()}
    release_result(ck)
    return res


def test_bpe_regexp_merge_matches_sequential_scan(spark):
    """The regexp rebuild reproduces the sequential leftmost
    non-overlapping merge on the adversarial shapes: odd/even runs of a
    repeated symbol, alternating pairs, and boundary positions."""
    got = _merge_once(
        spark,
        [
            ("w1", "a a a"),          # odd run of (a,a): merge positions 1-2 only
            ("w2", "a a a a"),        # even run: both disjoint pairs merge
            ("w3", "a a a a a"),      # 5-run: two merges + trailing single
            ("w4", "b a a c"),        # interior pair with neighbors
            ("w5", "a a"),            # exact whole-word pair
            ("w6", "x y"),            # no match at all
            ("w7", "a b a a"),        # match only at the tail
        ],
        "a", "a",
    )
    assert got["w1"] == "aa a"
    assert got["w2"] == "aa aa"
    assert got["w3"] == "aa aa a"
    assert got["w4"] == "b aa c"
    assert got["w5"] == "aa"
    assert got["w6"] == "x y"
    assert got["w7"] == "a b aa"


def test_bpe_regexp_merge_distinct_pair_and_boundaries(spark):
    """Distinct-symbol pairs: every occurrence merges (matches can't
    overlap), and the symbol boundary check refuses partial-symbol hits
    (pair (a, b) must not fire inside symbol 'ab' or 'ba a')."""
    got = _merge_once(
        spark,
        [
            ("w1", "a b a b a b"),    # all three merge
            ("w2", "ab a b"),         # leading 'ab' SYMBOL untouched
            ("w3", "a ba"),           # 'ba' symbol is not 'b'
            ("w4", "c a b"),          # trailing pair at end-of-string
        ],
        "a", "b",
    )
    assert got["w1"] == "ab ab ab"
    assert got["w2"] == "ab ab"
    assert got["w3"] == "a ba"
    assert got["w4"] == "c ab"


def test_bpe_regexp_merge_metacharacter_symbols(spark):
    """Symbols containing regex metacharacters ($, ., *, parens,
    backslash) are quoted on the pattern side AND escaped on the
    replacement side."""
    got = _merge_once(
        spark,
        [
            ("w1", "$ ."),
            ("w2", "x $ . y"),
            ("w3", "$$ ."),           # distinct symbol '$$' untouched
        ],
        "$", ".",
    )
    assert got["w1"] == "$."
    assert got["w2"] == "x $. y"
    assert got["w3"] == "$$ ."

    got = _merge_once(spark, [("w1", "\\ ( *")], "\\", "(")
    assert got["w1"] == "\\( *"


def test_java_rx_quote_splits_literal_QE():
    from sol_spark.operators.text import _java_rx_quote

    assert _java_rx_quote("ab") == "\\Qab\\E"
    # A payload containing a literal \E must break out and re-enter \Q
    assert _java_rx_quote("a\\Eb") == "\\Qa\\E\\\\E\\Qb\\E"


def test_iterate_probe_confirm_and_initial_seed(spark):
    """probe + converged together: the fused metric gates the frame-level
    confirmation. With probe_initial seeded to the initial count, a
    round-0 fixed point is detected after one round; the confirm callback
    runs EXACTLY when consecutive metrics match."""
    from sol_spark.operators.dedup import iterate, release_result

    state0 = spark.range(5).toDF("v").localCheckpoint()
    confirms: list[int] = []
    rounds: list[int] = []

    def step(state, i):
        rounds.append(i)
        return state.select("v")  # identity: metric equal from round 0

    def confirm(prev, cur):
        confirms.append(1)
        return cur.join(prev, "v", "left_anti").isEmpty()

    out = iterate(
        state0,
        step,
        lambda s: s.orderBy("v"),
        max_rounds=5,
        probe=F.count(F.lit(1)),
        probe_converged=lambda prev, cur: prev == cur,
        probe_initial=5,
        converged=confirm,
        release=(state0,),
    )
    assert [r["v"] for r in out.collect()] == [0, 1, 2, 3, 4]
    release_result(out)
    assert rounds == [0]      # fixed point detected at round 0
    assert confirms == [1]    # confirmation ran exactly once

    # Without the seed the same loop needs one extra round (None != 5).
    state0b = spark.range(5).toDF("v").localCheckpoint()
    rounds.clear()
    confirms.clear()
    out2 = iterate(
        state0b,
        step,
        lambda s: s.orderBy("v"),
        max_rounds=5,
        probe=F.count(F.lit(1)),
        probe_converged=lambda prev, cur: prev == cur,
        converged=confirm,
        release=(state0b,),
    )
    assert out2.count() == 5
    release_result(out2)
    assert rounds == [0, 1]
    assert confirms == [1]


def test_iterate_probe_confirm_rejects_false_positive(spark):
    """Equal counts with a DIFFERENT row set must NOT converge: the
    confirm anti-join rejects the suspect and the loop continues."""
    import pytest

    from sol_spark.operators.dedup import iterate

    state0 = spark.range(4).toDF("v").localCheckpoint()

    def step(state, i):
        # Shift the set every round: count stays 4, contents never repeat.
        return state.select((F.col("v") + 4).alias("v"))

    with pytest.raises(RuntimeError, match="no convergence"):
        iterate(
            state0,
            step,
            lambda s: s,
            max_rounds=3,
            probe=F.count(F.lit(1)),
            probe_converged=lambda prev, cur: prev == cur,
            probe_initial=4,
            converged=lambda prev, cur: cur.join(prev, "v", "left_anti").isEmpty(),
            no_convergence_error="no convergence in test loop",
            release=(state0,),
        )
