"""Benchmark harness — exactly ONE short JSON line on stdout.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Every query is
materialized with the noop writer (all columns computed, no sink
cost) so Catalyst can't prune away the work being measured.

Output: {"metric": "total_query_seconds", "value": N, "unit": "sec",
         "queries": {"q01": sec, ...}, "sf": 0.1,
         "anchor": "r9", "worst_ratio": X, "over15": [...]}

The anchor block makes each round's BENCH file self-certifying: every
query is min-of-2 (min-of-3 when the first two runs disagree >1.5× —
the signature of a contended run), and worst_ratio/over15 compare those
mins against the newest blessed BENCH_ANCHOR_r{N}.json so a regression
(over15 non-empty on unchanged code) is distinguishable from
environment noise without re-running anything. over15 requires BOTH
ratio > 1.5 AND an absolute delta > 0.3s — sub-second queries jitter
±0.1s between runs, and 0.18s→0.28s is noise, not regression.

Round-1 lesson (BENCH_r01.json parsed:null): the driver keeps only a
~2000-char tail of stdout and parses the JSON from it, so the line must
be SHORT (qNN keys, compact separators) and be the ONLY stdout content.
We enforce the latter at the fd level: fd 1 is redirected into stderr
for the whole run (the JVM writes progress/log noise to fd 1 regardless
of Python-level sys.stdout), and the final JSON goes to a dup of the
real stdout. Full query names + timings go to stderr for humans.

q70/q71 (md5 oracle anchors, ~8s combined) are correctness-only — the
driver checks them at sf0.01 via oracle_sql(); benching them measured
the deliberately-slow cross-engine hash family, not the engine
(VERDICT r1 #8).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_anchor(repo_dir: str, sf: float) -> tuple[str, dict[str, float]]:
    """Newest blessed per-query anchor (BENCH_ANCHOR_r{N}.json, max N).

    Returns ("rN", {"q01": sec, ...}); ("none", {}) if no anchor exists
    or the anchor was measured at a different scale factor (cross-SF
    ratios compare fixed job overhead, not engine throughput — a
    sf0.001 debug run against sf0.1 anchors reads as a 3× "regression").
    The anchor is the per-query MEDIAN over the prior round's clean
    runs (VERDICT r16 item 1 — a min-of-N envelope is a floor no
    single run can match and manufactured false regression flags; the
    min now rides along as the separate ``queries_min`` diagnostic) —
    comparing the current run against the median separates regression
    from the environment's documented ±30-100% contention noise.
    """
    best_n, best_path = -1, None
    for p in glob.glob(os.path.join(repo_dir, "BENCH_ANCHOR_r*.json")):
        m = re.search(r"BENCH_ANCHOR_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best_n, best_path = int(m.group(1)), p
    if best_path is None:
        return "none", {}
    with open(best_path) as f:
        blessed = json.load(f)
    if float(blessed.get("sf", -1)) != sf:
        return "none", {}
    return f"r{best_n}", blessed["queries"]

#: Queries measured per round: every oracle-checked query plus the
#: heavier rows-only extension operators (ML training excluded — model
#: fit time is not query throughput; md5 oracle anchors excluded — they
#: measure the cross-engine hash family, not the engine).
#: q70/q71: md5 oracle anchors — they measure the deliberately-slow
#: cross-engine hash family. q83: iterative connected components — at
#: bench scale its cost is ~5 driver-paced rounds of fixed job latency
#: (localCheckpoint + convergence count), not engine throughput. All
#: three stay correctness-gated at sf0.01 via oracle_sql().
EXCLUDE = {
    "q70_minhash_oracle_pairs",
    "q71_simhash_oracle_pairs",
    # Calibration on top of the q70 md5 anchor machinery — same reason.
    "q130_sketch_calibration",
    "q83_dedup_components",
    # Iterative CC fixed-point (like q83): per-round job overhead
    # dominates at bench SF and measures the scheduler, not the engine.
    "q95_components_alternating",
    # Canonical election on top of the q83 fixed point — same reason.
    "q117_canonical_docs",
    # r10: component-aware split on top of the q83 CC fixed point —
    # the same reasoning as q117's exclusion (the split/accounting
    # above the labels is sub-second; the 3s reading is driver-paced
    # CC rounds). Correctness-gated at sf0.01 via oracle_sql().
    "q161_component_split",
    # r9: chained incremental-CC merges (three update_components calls,
    # each an alternating-CC fixed point over a comp graph) — like
    # q83/q95, bench SF measures per-round scheduler latency, not
    # engine throughput. Correctness-gated at sf0.01 via oracle_sql().
    "q158_incremental_components",
    # r10: 8 driver-paced BPE trainer rounds over the vocab-sized seg
    # frame (localCheckpoint per iteration) — same scheduler-latency
    # reason as q83/q158. Correctness-gated at sf0.01 via oracle_sql().
    "q162_bpe_learn_merges",
    # r10: the embedding-ingest probe runs group tracking, which chains
    # an update_components fixed point + three eager state pins PER
    # BATCH — q158's scheduler-latency reasoning ×4 batches (~28s at
    # sf0.1, all driver-paced rounds). Correctness-gated at sf0.01 via
    # oracle_sql(); the document ingest's q163 keeps streaming-ingest
    # wall-time visible in BENCH.
    "q164_embedding_ingest_probe",
    # r13: q164's codes-only (PQ) twin — identical group-tracking
    # driver-paced CC rounds per batch; same reasoning. Correctness-
    # gated at sf0.01 via oracle_sql().
    "q168_pq_embedding_ingest_probe",
    # r14: q168's residual-codes twin — same group-tracking ingest
    # replay, same driver-paced rounds. Correctness-gated at sf0.01
    # via oracle_sql().
    "q179_pq_residual_ingest_probe",
}
EXTRA = [
    "q40_minhash_pairs",
    "q41_simhash_pairs",
    "q42_lsh_embedding_pairs",
    "q44_multimodal_features",
    "q45_quality_scores",
    # Arrow-batched BPE encoding (rows-only) — the one mapInPandas
    # corpus operator, worth tracking (~0.9s warm at sf0.1). The MLlib
    # fit queries (q47/q48/q73/q145) stay out: they measure training.
    "q143_bpe_encode",
    # r8: the BPE→span-excision chain (rows-only) — tracks the
    # tokens_col span path stacked on the mapInPandas edge.
    "q153_bpe_repeat_excision",
]


def main() -> None:
    # Isolate stdout at the fd level: everything written to fd 1 by us,
    # Spark, or the JVM lands on stderr; only the final JSON line uses
    # the real stdout.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    import __spark_entry__ as entrymod
    from big_data_ml_pipeline_spark.session import get_session

    bench_queries = list(
        dict.fromkeys([*entrymod.oracle_sql().keys(), *EXTRA])
    )
    bench_queries = [q for q in bench_queries if q not in EXCLUDE]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entrymod.queries()

    # Untimed warmup: pay JVM/codegen/parquet-footer startup once so the
    # per-query numbers measure steady-state execution, not session boot.
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    # Two timed runs per query, report the MIN (VERDICT r2 #5): single
    # runs are ±30% noisy here (JIT, page cache, GC), enough to push a
    # round over the 2×-of-baseline line spuriously. min-of-2 measures
    # steady-state execution; run 1 doubles as the query's own codegen
    # warm-up. When the two runs disagree >1.5× the query gets a THIRD
    # run (VERDICT r9 #1): a contended run corrupts run 1 far more often
    # than both runs, so the escalation recovers the clean number and the
    # reported min self-certifies against the blessed anchor below.
    anchor_name, anchor = load_anchor(
        os.path.dirname(os.path.abspath(__file__)), sf
    )
    timings: dict[str, float] = {}
    ratios: dict[str, float] = {}
    full_name: dict[str, str] = {}
    for name in bench_queries:
        per_run = []
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            per_run.append(time.time() - t0)
        if max(per_run) > 1.5 * min(per_run):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            per_run.append(time.time() - t0)
        timings[name] = round(min(per_run), 2)
        short_name = name.split("_", 1)[0]
        full_name[short_name] = name
        if anchor.get(short_name):
            ratios[short_name] = round(timings[name] / anchor[short_name], 2)
        print(
            f"bench {name}: {timings[name]}s (runs: "
            + ", ".join(f"{t:.2f}" for t in per_run)
            + (
                f"; {ratios[short_name]}x anchor {anchor_name}"
                if short_name in ratios
                else "; no anchor"
            )
            + ")",
            file=sys.stderr,
            flush=True,
        )

    total = round(sum(timings.values()), 2)
    # Short keys: "q01_pricing_summary" -> "q01". Unique by construction
    # (query ids are qNN-prefixed); guard anyway.
    short = {n.split("_", 1)[0]: t for n, t in timings.items()}
    assert len(short) == len(timings), "qNN prefixes must be unique"
    # Compact self-certification block (VERDICT r9 #1): worst per-query
    # ratio vs the newest blessed anchor plus the (expected-empty) list
    # of queries >1.5× it. BENCH_r{N}.json alone now separates
    # regression (over15 non-empty on clean code) from contention noise
    # (min-of-2/3 already absorbed it). Kept tiny so the one-short-line
    # stdout contract (driver tail ~2000 chars) survives.
    # A query is flagged only when BOTH the ratio and the absolute
    # delta are material: sub-second queries jitter ±0.1s between
    # runs, so a 0.18s→0.28s reading is 1.56× of pure noise — the
    # flags exist to catch the q111-style 1-3s regressions, not that.
    over15 = sorted(
        q
        for q, r in ratios.items()
        if r > 1.5 and timings[full_name[q]] - anchor[q] > 0.3
    )
    payload = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": short,
        "sf": sf,
        "anchor": anchor_name,
        "worst_ratio": max(ratios.values()) if ratios else None,
        # capped: an all-contended run must not grow the line past the
        # driver's ~2000-char stdout tail; n_over15 carries the truth.
        "n_over15": len(over15),
        "over15": over15[:8],
    }
    line = json.dumps(payload, separators=(",", ":"))
    print(f"bench total: {total}s over {len(timings)} queries", file=sys.stderr)
    print(
        f"bench vs anchor {anchor_name}: worst {payload['worst_ratio']}x, "
        f"over 1.5x: {over15 or 'none'}",
        file=sys.stderr,
    )
    print(f"bench json ({len(line)} chars): {line}", file=sys.stderr, flush=True)
    os.write(real_stdout, (line + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
