"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with a noop-format write: unlike
count(), which lets Catalyst prune a projection-only query down to
Aggregate[count(1)] over an empty scan (r1 ADVICE — text_stats' split/md5
work was never timed), the noop sink evaluates every output column and any
final sort, discarding rows executor-side with zero serialization.

Each query is built + executed up to three times and the MIN is reported
(steady-state: single-run timings on this box swing up to 3x with JIT/GC
noise, and a contended driver machine showed a 20x outlier in round 2 —
gen_explode_wordcount reported 14.6s vs 0.7s reproducible). The third run
only happens when the first two disagree by >1.5x, so the happy path stays
at two runs. Timings include plan construction; the row count printed to
stderr is measured after the timed runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sol_spark.operators.dedup import release_result
from sol_spark.registry import all_queries
from sol_spark.session import get_session

# Headline set: the spine of SURVEY §2 — scan/filter/agg (q1, q6), joins+topk
# (q3, q5, q9, q18, q21), star-schema flights (ssb), window/rollup, set op,
# event-time windows, generators, pandas grouped-map, and the LLM operator
# families (dedup x3, similarity x2, text, multimodal).
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q18",
    "tpch_q21",
    "ssb_q2_1",
    "ssb_q4_2",
    # r4 additions (r3 verdict item 7): the checkpoint-loop iterative path
    # and the heaviest TPC-DS rollup-window query get round-over-round
    # timing alongside the rest of the spine.
    "dedup_clusters",
    "tpcds_q67",
    # r4 wave-2 additions: one cross-channel returns query over the new
    # web/catalog star and one semantic-dedup operator, so the round-4
    # families get round-over-round timing too.
    "tpcds_q75",
    "dedup_semdedup",
    # r5 additions: the governance family's one-scan-per-table expectation
    # suite and the ExactSubstr repeated-span statistic (rewritten
    # lambda-free after its first draft measured 10.3 s — see the operator
    # docstring), so both new round-5 families get round-over-round timing.
    "dq_expectations",
    "text_dup_spans",
    # r6 additions: the trained-centroid SemDeDup composition (the
    # production form of the cell-confined prune), the content-defined
    # chunking pipeline, and the iterative BPE trainer — the three new
    # round-6 cost shapes (argmin assignment + cell prune, linear char
    # explode, per-step model-sync loop).
    "dedup_semdedup_kmeans",
    "text_cdc_chunks",
    "text_bpe_train",
    # r6 wave-2 additions: the ExactSubstr REWRITE (shingle window +
    # sweep-line coverage + per-doc reassembly) and the all-nodes bucketed
    # k-NN graph build — the two new heavy shapes of the second wave.
    "text_span_removal",
    "sim_knn_graph",
    # r6 wave-3 additions: the grouped-map integer state machine over the
    # full event stream and the two-scan mergeable histogram-quantile
    # sketch — the third wave's new cost shapes.
    "events_token_bucket",
    "sketch_quantile_hist",
    # r6 wave-7/8 additions: the held-out trigram-backoff scorer (five
    # n-gram-key joins over the per-doc trigram frame) and the Luby MIS
    # superstep loop over the near-dup graph — the last two new round-6
    # cost shapes (multi-model-join scoring, shrinking-frontier rounds).
    "text_lm_trigram_backoff",
    "dedup_mis_keepset",
    # r6 wave-14 additions: the cross-split shingle semi-join leakage audit
    # (distinct-hash keep-list against the val shingle stream) and the
    # boundary-sweep peak-concurrency window — the session's two new
    # heavy-ish shapes (everything else in waves 9-15 is bounded hash-agg).
    "text_split_leakage",
    "events_peak_concurrency",
    # r7 additions: the ROUGE-2 bigram-intersection join over the banded
    # candidate pairs, the keyless banded range join (the BNLJ rewrite),
    # and the per-user SPRT window pass — the round's three new cost
    # shapes (pair-scoped string join, exploded bucket equi-join, full
    # event-stream window).
    "dedup_rouge2_pairs",
    "range_join_banded",
    "stats_sprt_bernoulli",
    # r8 additions: the all-integer hashed-feature GD trainer (model-sync
    # loop with broadcast weight joins), the 9-level union reformulation
    # of q67 (union-of-aggs vs its base's ExpandExec — a standing A/B of
    # the two rollup physical strategies), and the off-policy bandit
    # replay (two-pass policy evaluation over the full event stream).
    "text_fasttext_quality",
    "tpcds_q67a",
    "events_bandit_replay",
    # r8 continuation additions: the positional k-gram islands pass
    # (exact verbatim-run evidence over the capped pairs), the per-user
    # grouped-map sliding limiter (K-deep allowed-history state), and the
    # iterate()-looped parallel edge matching — the session's three new
    # cost shapes (position join + double window, stateful replay,
    # shrinking-edge-set rounds).
    "dedup_shared_spans",
    "events_rate_limit_sliding",
    "graph_maximal_matching",
    # r9 additions: the broadcast Bloom-sketch ingest probe (bit_or word
    # agg + broadcast bit test — the no-shuffle incremental-dedup shape),
    # the delta-merge incremental view maintenance (changelog agg merged
    # into the snapshot agg, fact never rescanned), and the modified-
    # dialect q27 (three re-aggregation passes over a shared slice vs the
    # base's one-pass ExpandExec rollup — a standing A/B like q67/q67a).
    "dedup_bloom_incremental",
    "warehouse_ivm_agg",
    "tpcds_q27m",
    # r11 additions: the incremental MinHash-LSH band-bucket probe (the
    # near-dup analog of the bloom ingest shape, streaming twin #10) and
    # the Boruvka MST under its fused rewrite (hash-agg edge picks +
    # component-graph label composition) — the round's two new/changed
    # cost shapes, added post-gate so round 12 gets round-over-round
    # timing (standalone r11 baselines (min of 3, loadavg 0.31):
    # minhash_incremental 1.96 s, graph_mst 15.12 s warm; BENCH_r11_quietbox.json predates this list
    # change and stays 51-query-comparable with r10).
    "dedup_minhash_incremental",
    "graph_mst",
    "win_rank_topk_per_group",
    "time_rollup_hierarchy",
    "set_intersect",
    "stream_tumbling_agg",
    "gen_explode_wordcount",
    "pd_grouped_zscore",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_exact",
    "sim_topk_lsh",
    "text_stats",
    "mm_decode_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session("solspark-bench")
    specs = all_queries()

    # Warm the JVM + parquet footers with one cheap action.
    specs["tpch_q6"].fn(spark, sf_dir).collect()

    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = specs[name].fn
        runs: list[float] = []
        for attempt in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            if attempt == 1 and max(runs) <= 1.5 * min(runs):
                break  # two consistent runs — skip the tiebreaker
        all_runs[name] = [round(r, 3) for r in runs]
        timings[name] = round(min(runs), 3)
        n = df.count()  # untimed — row count for the stderr log only
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        release_result(df)  # no-op unless the query returned a checkpointed
        # frame (dedup_clusters) — keeps storage flat across the sweep

    total = round(sum(timings.values()), 3)
    # Load stamp (r10 verdict "what's wrong #2"): without the box's load
    # average and the raw per-query run lists inside the artifact, a
    # round-over-round delta in untouched code is unfalsifiable
    # spread-vs-real. 1-min loadavg > ~2 on this 32-cpu box at bench START
    # means a contaminated run; per-query "runs" expose the min-of-N spread.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "runs": all_runs,
            }
        )
    )


if __name__ == "__main__":
    main()
