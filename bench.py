#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes through a full action with a no-op sink
(``format("noop")``) so the whole plan runs — scan, shuffle, agg — without
driver-side collection skewing the timing.

Modes
-----
default        isolated: each headline query runs in its OWN subprocess
               (fresh JVM, fresh session) via ``--only``; timings are immune
               to suite-position effects (heap/GC state accumulated by
               earlier queries). This is the headline metric mode: round-3
               showed 7 back-half queries regress 1.5-2.4x with zero code
               change when measured in a single shared JVM — see
               BENCH_TRIAGE.md.
--inprocess    legacy shared-JVM suite (warm pass + min-of-2), kept for
               comparison and for measuring suite-position effects.
--shuffle N    like --inprocess but the timed pass runs in seed-N shuffled
               order (warm pass stays canonical) — separates per-query cost
               from suite position.
--only NAME    single query, fresh session: warm once, print min of
               ``--runs`` (default 3) timed runs as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import random
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the round-1 headline set (BENCH_r01 comparability: these 12 summed were
# 5.319 s at sf0.1 local[32] steady-state)
HEADLINE_R1 = [
    "pricing_summary",
    "experiment_join",
    "composite_key_join",
    "fk_remap_dense",
    "first_per_group",
    "melt_unpivot",
    "window_tumbling",
    "sessionization",
    "exact_dedup",
    "minhash_band_pairs",
    "explode_tokens",
    "ann_dot_topk",
]

# round-2 widening (VERDICT r1 item 6): cover the rest of the work surface —
# text dedup referees, temporal joins, fact-scale surrogate ids, and the full
# combine-phase pipeline composition
HEADLINE = HEADLINE_R1 + [
    "simhash_near_pairs",
    "jaccard_pairs",
    "token_count_bpe",
    "asof_join",
    "range_join",
    "surrogate_key_fact",
    "combine_pipeline",
    "tfidf_top_terms",
    "ngram_topk",
    "ann_ivf_topk",
    "fuzzy_dedup_pipeline",
    "regional_revenue",
    # round-2 late additions: analytics, scrubbing, PQ ANN, time series
    "retention_cohorts",
    "span_scrub",
    "ann_pq_topk",
    "gap_fill_resample",
    "scd2_history",
    "bloom_semi_equiv",
    "rolling_anomaly",
    "pagerank_int",
    # round-4 additions: real-vocab tokenization, the ingest dedup gauntlet
    # E2E (exact + LSH/CC + corpus-cell drop), and embedding-space semantic
    # dedup (IVF-cell blocking → cosine pairs → CC droplist)
    "vocab_token_count",
    "ingest_pipeline",
    "semantic_dedup_pipeline",
    # round-5 additions: repetition/decontam/mixture gates, sequence packing
    # + epoch-shuffle sharding, retrieval ranking, int8 ANN, passage dedup
    "gopher_repetition",
    "sequence_packing",
    "benchmark_decontam",
    "mixture_sample",
    "bm25_topk",
    "ann_int8_topk",
    "training_shuffle_shards",
    "passage_dedup",
    "curation_pipeline",
    # round-6 additions: near-exact l2 int8 probe, curation audit funnel,
    # and the diagnose-then-act skew join (profile + strategy pick)
    "ann_int8_l2_topk",
    "curation_funnel",
    "auto_salted_join_equiv",
    "incremental_curation",
    "substring_dedup_trim",
    # round-6 late additions: corpus statistics, model-based filtering,
    # bigram LM gate, hybrid RAG retrieval
    "vocab_growth_curve",
    "quality_classifier_score",
    "bigram_surprisal",
    "hybrid_rrf_topk",
    # round-6 selection batch: DSIR importance selection and the exact
    # global percentile gate (the post-cleaning "what do we train on" stage)
    "dsir_select",
    "quality_percentile_gate",
    "selection_pipeline",
    "source_overlap_minhash",
    "token_budget_report",
    "lang_confusion",
    "dsir_resample",
    "unimax_allocation",
    "curation_select_pipeline",
    # round-6 final additions: winnowing near-dup family, entropy gate,
    # per-source exact quantiles, backoff LM, ingest-vs-corpus winnow
    "winnowing_fingerprints",
    "winnow_near_pairs",
    "token_entropy_gate",
    "source_length_quantiles",
    "stupid_backoff_lm",
    "incremental_winnow",
    # round-7 additions: Aho–Corasick large-blocklist gate, Kneser–Ney
    # smoothed LM gate, PSI drift series, winnow E2E, detector referee
    "phrase_blocklist_ac",
    "kneser_ney_lm",
    "psi_drift_series",
    "winnow_dedup_pipeline",
    "detector_agreement",
    "url_canonicalize",
    "url_domain_gate",
    "fuzzy_decontam",
    "domain_quality_rollup",
    "registered_domain",
    # round-8 additions: HTML main-content extraction (the pre-gate stage)
    # and the trigram Kneser-Ney filter LM
    "html_extract",
    "kneser_ney3_lm",
    "hashed_lang_confusion",
    "host_link_rank",
    "domain_quality_rollup_psl",
    "anchor_text_rollup",
    "robots_txt_gate",
    "authority_gate",
    # round-9 additions: script-aware tokenization audit + CJK near-dup
    # through the unchanged MinHash family (normalize_spacefree stage 0)
    "unicode_token_stats",
    "unicode_minhash_pairs",
    "crawl_permission_funnel",
    "fertility_by_scheme",
    "classifier_calibration",
    # round-10 additions: the documents→embeddings encoder seam (Arrow
    # mapInPandas plumbing, oracle-verified) and the tokens_col seam E2E
    # (bigram LM over script-aware tokens)
    "embedding_encode_stats",
    "unicode_bigram_surprisal",
    "text_semantic_dedup",
    # round-10 late batch: composed selection prior, topic structure,
    # graded retrieval referee
    "rank_weighted_select",
    "kmeans_topics",
    "cluster_balanced_sample",
    "retrieval_ndcg",
    "embedding_top_component",
    "abtt_corrected_topk",
    "embedding_drift",
    "cluster_purity",
    "hll_distinct",
    # round-11: the broadcast-centroid-table IVF assign at k=200 — past
    # the literal ceiling, certifying the constant-plan production path —
    # and the tokens_col seam on the highest-stakes space-split op
    # (CJK contamination through the unchanged 13-gram rule)
    "ivf_table_assign",
    "unicode_decontam",
    "ivf_arrow_assign",
    "simhash_wide_pairs",
    "quantile_sketch_audit",
    # r12: the sketch-maintenance E2E (gate from merged persisted state)
    # and the production-width detector referee rides the existing
    # detector_agreement row (now 60-bit)
    "percentile_gate_sketch",
    "bloom_decontam",
    # r12 late batch: the Arrow GEMM pair-scoring tier, the KMV
    # bottom-k corpus-overlap sketch, and sorted-neighborhood blocking
    "cell_pairs_arrow",
    "kmv_overlap",
    "snm_candidate_pairs",
    "kmv_source_matrix",
]


def _sf_of(sf_dir: str) -> float:
    return float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)


def run_query(spark, name: str, sf_dir: str) -> float:
    from pharmacodi_spark.plans import QUERIES

    fn = QUERIES[name][0]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _fresh_spark():
    from pharmacodi_spark.session import get_spark

    spark = get_spark(app_name="pharmacodi_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_only(name: str, sf_dir: str, runs: int, preboot: bool = False) -> None:
    """Single query in a fresh session: warm once, min of ``runs`` timed.

    ``preboot`` (used by the isolated suite runner): boot the session and
    import the registry, then print READY and BLOCK until the parent writes
    a line on stdin. This lets the suite overlap the NEXT query's JVM boot
    with the CURRENT query's timed runs — the boot is driver-side JVM/class
    loading, excluded from every timing either way (BENCH_r12 context: the
    driver's 32-core leg timed out; per-query wall was ~60% JVM startup).
    """
    spark = _fresh_spark()
    if preboot:
        from pharmacodi_spark.plans import QUERIES  # registry import off the timed path

        assert name in QUERIES
        print("READY", flush=True)
        if not sys.stdin.readline():  # parent died or aborted the suite
            spark.stop()
            return
    run_query(spark, name, sf_dir)  # codegen/JIT/AQE warm
    best = round(min(run_query(spark, name, sf_dir) for _ in range(runs)), 3)
    print(
        json.dumps(
            {
                "metric": "single_query_sec",
                "query": name,
                "value": best,
                "unit": "sec",
                "runs": runs,
                "sf": _sf_of(sf_dir),
            }
        ),
        flush=True,
    )
    spark.stop()


def run_suite_inprocess(sf_dir: str, shuffle_seed: int | None) -> None:
    """Legacy shared-JVM suite: one session, min-of-2 timed per query.

    No full warm pass (ROADMAP item 5): the first of the two timed runs IS
    the warm-up — min-of-2 keeps the steady-state number while halving the
    suite's wall clock. Use --shuffle SEED for the standing noise control
    (BENCH_TRIAGE.md): same JVM, shuffled order; spread between ordered and
    shuffled runs bounds the suite-position effect."""
    spark = _fresh_spark()
    order = list(HEADLINE)
    if shuffle_seed is not None:
        random.Random(shuffle_seed).shuffle(order)
    timings: dict[str, float] = {}
    for name in order:
        timings[name] = round(
            min(run_query(spark, name, sf_dir) for _ in range(2)), 3
        )
    _emit(timings, sf_dir, mode="inprocess" if shuffle_seed is None else f"shuffled:{shuffle_seed}")
    spark.stop()


# per-child deadlines for the isolated suite (env-overridable). BOOT covers
# JVM + session startup; QUERY covers warm + `runs` timed executions. A hung
# child is killed and recorded as -1.0 instead of hanging the whole suite
# (BENCH_r12: the driver's 32-core leg died at rc=124 with ZERO output —
# isolated mode used to print nothing until the very end).
BOOT_TIMEOUT = float(os.environ.get("SPARK_GRAFT_BOOT_TIMEOUT", "300"))
QUERY_TIMEOUT = float(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT", "600"))


class _Child:
    """One --only --preboot subprocess with line-queue readers."""

    def __init__(self, name: str, sf_dir: str, runs: int):
        self.name = name
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--only", name,
             "--runs", str(runs), "--preboot"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, env=env,
        )
        self.lines: queue.Queue[str | None] = queue.Queue()
        self.err_tail: list[str] = []
        threading.Thread(target=self._pump, daemon=True).start()
        threading.Thread(target=self._pump_err, daemon=True).start()

    def _pump(self) -> None:
        for line in self.proc.stdout:
            self.lines.put(line.rstrip("\n"))
        self.lines.put(None)  # EOF sentinel

    def _pump_err(self) -> None:
        for line in self.proc.stderr:
            self.err_tail.append(line)
            del self.err_tail[:-40]

    def wait_line(self, pred, timeout: float):
        """Next stdout line satisfying ``pred`` within ``timeout``; None on
        timeout/EOF (JVM noise lines are skipped, the clock keeps running)."""
        deadline = time.monotonic() + timeout
        while True:
            left = deadline - time.monotonic()
            if left <= 0:
                return None
            try:
                line = self.lines.get(timeout=left)
            except queue.Empty:
                return None
            if line is None:
                return None
            if pred(line):
                return line

    def go(self) -> bool:
        try:
            self.proc.stdin.write("GO\n")
            self.proc.stdin.flush()
            return True
        except (BrokenPipeError, OSError):
            return False

    def kill(self) -> None:
        if self.proc.poll() is None:
            self.proc.kill()
        try:
            self.proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass


def _is_result(line: str) -> bool:
    return line.startswith("{") and '"single_query_sec"' in line


def run_suite_isolated(sf_dir: str, runs: int) -> None:
    """Headline mode: every query in its own subprocess (fresh JVM).

    Immune to suite-position effects (accumulated heap/GC/codegen-cache state
    in a shared JVM) that round-3 measured at up to 2.4x on back-half
    queries. Costs one JVM+session startup per query, which is excluded from
    the timing (the subprocess times only the query actions).

    r13 hardening (BENCH_r12 rc=124 postmortem):
    - the NEXT query's JVM boots while the CURRENT query runs its timed
      passes (the child blocks after session startup until it gets a GO
      line) — boot wall (~11 s/JVM) no longer serializes with execution;
      contamination of the timed runs by a concurrently booting JVM was
      A/B-measured (see OPTIMIZATION_r13.md) before this became default;
    - each child gets a boot deadline and a query deadline; a hung or
      crashed child records -1.0 and the suite moves on;
    - a compact PARTIAL summary line streams after every query, so a run
      killed by an outer timeout still leaves a parseable final line with
      every completed timing (the old code printed nothing until the end).
    """
    timings: dict[str, float] = {}
    # boot lookahead: how many FUTURE children may be booting while the
    # current child runs. 1 balances the pipeline only when exec >= boot;
    # boot is ~11 s vs ~5 s median exec here, so 2 keeps the boot pipeline
    # from becoming the bottleneck on cheap queries. Contamination of the
    # timed runs by concurrent boots was A/B-measured at 1 and 2 before
    # this became default (OPTIMIZATION_r13.md).
    ahead = max(0, int(os.environ.get("SPARK_GRAFT_BOOT_AHEAD", "2")))
    booted: dict[int, _Child | None] = {}

    def _boot(i: int) -> None:
        if i >= len(HEADLINE) or i in booted:
            return
        try:
            booted[i] = _Child(HEADLINE[i], sf_dir, runs)
        except OSError as exc:  # spawn failure: record, keep going
            sys.stderr.write(f"bench: spawn {HEADLINE[i]} failed: {exc}\n")
            booted[i] = None

    _boot(0)
    for i, name in enumerate(HEADLINE):
        cur = booted.pop(i, None)
        # future boots overlap this child's (untimed) boot wait + timed runs
        for j in range(i + 1, i + 1 + ahead):
            _boot(j)
        if cur is None:  # spawn failed
            timings[name] = -1.0
            _emit_partial(timings, sf_dir, mode="isolated", n_total=len(HEADLINE))
            continue
        ready = cur.wait_line(lambda l: l.strip() == "READY", BOOT_TIMEOUT)
        got = None
        if ready is not None and cur.go():
            got = cur.wait_line(_is_result, QUERY_TIMEOUT)
        if got is not None:
            try:
                timings[name] = float(json.loads(got)["value"])
            except (ValueError, KeyError, json.JSONDecodeError):
                got = None
        if got is None:
            stage = "boot" if ready is None else "run"
            sys.stderr.write(
                f"bench: {name} failed ({stage} timeout or crash, "
                f"rc={cur.proc.poll()})\n{''.join(cur.err_tail)[-2000:]}\n"
            )
            timings[name] = -1.0
        cur.kill()
        _emit_partial(timings, sf_dir, mode="isolated", n_total=len(HEADLINE))
    for child in booted.values():
        if child is not None:
            child.kill()
    _emit(timings, sf_dir, mode="isolated")


# The driver records only the LAST 2,000 bytes of stdout into
# BENCH_r{N}.json ("tail") and parses the final line. Rounds 5 AND 6 both
# lost their official artifact (parsed:null) because the final line carried
# the full per-query dict (~3.4 KB at 68 queries). The contract now is:
#   line 1: the COMPLETE results object (also written to BENCH_FULL.json,
#           committed per round — the judge reads per-query numbers there);
#   final line: a compact summary <= FINAL_LINE_BUDGET bytes — totals,
#   failed list, sf1 summary, the SLOWEST queries that fit, and the file
#   pointer. tests/test_bench_emit.py pins the budget against the real
#   2,000-byte window even for the full registry.
FINAL_LINE_BUDGET = 1800
# sidecar target; tests monkeypatch this so fake timings never clobber the
# committed per-round artifact
BENCH_FULL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
)


def _full_record(timings: dict[str, float], sf_dir: str, mode: str) -> dict:
    """The complete results object (first stdout line / sidecar payload)."""
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # failed queries are recorded as -1.0 and excluded from the totals —
    # surface them in the JSON so consumers can tell a shrunken total from
    # a faster one (ADVICE r4), and exit nonzero.
    failed = sorted(n for n, t in timings.items() if t < 0)
    # second-scale-factor evidence (VERDICT r4 item 3): tools/make_sf1.py
    # builds a 10x sf0.1-shaped dataset; an isolated-mode run against it is
    # checked in as BENCH_SF1.json. Attached BY SUMMARY + PATH only.
    sf1 = None
    sf1_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SF1.json")
    if os.path.exists(sf1_path):
        try:
            with open(sf1_path) as fh:
                blob = json.load(fh)
            ratios = sorted(
                v for v in (blob.get("ratio_vs_sf0.1") or {}).values()
                if isinstance(v, (int, float))
            )
            sf1 = {
                "total_sec": blob.get("total_sec"),
                "sf01_same_day_total_sec": blob.get("sf01_same_day_total_sec"),
                "ratio_median": (
                    round(ratios[len(ratios) // 2], 2) if ratios else None
                ),
                "n_queries": len(blob.get("queries", {}) or {}),
                "date": blob.get("date"),
                "file": "BENCH_SF1.json",
            }
        except (OSError, json.JSONDecodeError):
            sf1 = None
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "mode": mode,
        # BENCH_r01-comparable subtotal (same 12 queries as round 1)
        "headline_r1_sec": round(
            sum(
                timings.get(n, -1.0)
                for n in HEADLINE_R1
                if timings.get(n, -1.0) >= 0
            ),
            3,
        ),
        "failed": failed,
        **({"sf1": sf1} if sf1 is not None else {}),
    }
    return full


def _sidecar_path(sf_dir: str) -> str:
    # only the driver-contract scale (sf0.1) owns BENCH_FULL.json — any
    # other scale writes its own sidecar, so an sf1 leg (tools/bench_sf1)
    # can never clobber the round's official sf0.1 record (r8 incident:
    # the committed BENCH_FULL briefly held sf1 timings)
    sf = _sf_of(sf_dir)
    return (
        BENCH_FULL_PATH
        if sf == 0.1
        else BENCH_FULL_PATH.replace(".json", f"_sf{sf}.json")
    )


def _write_sidecar(full: dict, full_path: str) -> None:
    try:
        tmp = full_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
        os.replace(tmp, full_path)  # atomic: an outer kill never corrupts it
    except OSError:
        pass  # read-only checkout: the early stdout line still has it all


def _compact_line(full: dict, full_path: str) -> str:
    # Compact line: same object minus the full per-query dict; "queries"
    # keeps the slowest entries that fit the budget (the ones worth triaging
    # from the tail alone), largest-first, so truncation drops the cheap
    # ones.
    timings = full["queries"]
    failed = full["failed"]
    total = full["value"]
    compact = dict(full)
    # point at the file this run actually wrote (non-sf0.1 scales go to
    # BENCH_FULL_sf{X}.json — a hardcoded name left the pointer stale
    # for sf1 legs, ADVICE r8)
    compact["queries_full"] = os.path.basename(full_path)
    compact["n_queries"] = len(timings)
    # the failed list is also bounded (n_failed always carries the true
    # count): an all-failed run is exactly the case where the driver's
    # tail-parse matters most, so it must never blow the budget (ADVICE r7)
    compact["n_failed"] = len(failed)
    ranked = sorted(
        ((n, t) for n, t in timings.items() if t >= 0),
        key=lambda kv: -kv[1],
    )
    line = None
    fail_keep = len(failed)
    while line is None:
        compact["failed"] = failed[:fail_keep]
        keep = len(ranked)
        while keep >= 0:
            compact["queries"] = dict(sorted(ranked[:keep]))
            cand = json.dumps(compact)
            if len(cand.encode()) <= FINAL_LINE_BUDGET:
                line = cand
                break
            keep -= max(1, keep // 8)
        if line is None:
            if fail_keep == 0:
                # fixed fields only and still over budget: emit the bare
                # minimum rather than an unparseable over-budget line
                line = json.dumps(
                    {
                        "metric": full["metric"],
                        "value": total,
                        "unit": "sec",
                        "sf": full["sf"],
                        "n_queries": len(timings),
                        "n_failed": len(failed),
                        "queries_full": "BENCH_FULL.json",
                    }
                )
                break
            fail_keep //= 2
    assert len(line.encode()) <= FINAL_LINE_BUDGET, len(line)
    return line


def _emit_partial(
    timings: dict[str, float], sf_dir: str, mode: str, n_total: int
) -> None:
    """Stream a compact, parseable progress line after every query.

    If the whole bench is killed by an outer timeout (BENCH_r12: rc=124,
    empty tail), the driver's last-line parse now lands on the most recent
    of these instead of nothing: totals and per-query seconds for every
    COMPLETED query, marked "partial" with n_done/n_total so a truncated
    run can never be mistaken for a fast one. The sidecar is refreshed
    atomically on the same cadence.
    """
    full = _full_record(timings, sf_dir, mode)
    full["partial"] = True
    full["n_done"] = len(timings)
    full["n_total"] = n_total
    full_path = _sidecar_path(sf_dir)
    _write_sidecar(full, full_path)
    print(_compact_line(full, full_path), flush=True)


def _emit(timings: dict[str, float], sf_dir: str, mode: str) -> None:
    full = _full_record(timings, sf_dir, mode)
    full_path = _sidecar_path(sf_dir)
    # Full record: first stdout line + durable sidecar file.
    _write_sidecar(full, full_path)
    print(json.dumps(full), flush=True)
    print(_compact_line(full, full_path), flush=True)
    if full["failed"]:
        sys.exit(3)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", metavar="QUERY", help="run one query in isolation")
    ap.add_argument("--runs", type=int, default=3, help="timed runs for --only / isolated mode")
    ap.add_argument("--preboot", action="store_true",
                    help="with --only: boot the session, print READY, and "
                         "wait for a stdin line before running (suite use)")
    ap.add_argument("--inprocess", action="store_true", help="legacy shared-JVM suite")
    ap.add_argument("--shuffle", type=int, metavar="SEED", default=None,
                    help="shared-JVM suite, timed pass in shuffled order")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args.only:
        run_only(args.only, sf_dir, args.runs, preboot=args.preboot)
    elif args.inprocess or args.shuffle is not None:
        run_suite_inprocess(sf_dir, args.shuffle)
    else:
        run_suite_isolated(sf_dir, args.runs)


if __name__ == "__main__":
    main()
