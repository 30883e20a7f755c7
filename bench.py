"""Benchmark harness — exactly ONE short JSON line on stdout.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Every query is
materialized with the noop writer (all columns computed, no sink
cost) so Catalyst can't prune away the work being measured.

Output: {"metric": "total_query_seconds", "value": N, "unit": "sec",
         "queries": {"q01": sec, ...}, "sf": 0.1}

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

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    # r9: chained incremental-CC merges (three update_components calls,
    # each an alternating-CC fixed point over a comp graph) — like
    # q83/q95, bench SF measures per-round scheduler latency, not
    # engine throughput. Correctness-gated at sf0.01 via oracle_sql().
    "q158_incremental_components",
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
    # warm-up.
    timings: dict[str, float] = {}
    for name in bench_queries:
        per_run = []
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            per_run.append(time.time() - t0)
        timings[name] = round(min(per_run), 2)
        print(
            f"bench {name}: {timings[name]}s (runs: "
            + ", ".join(f"{t:.2f}" for t in per_run)
            + ")",
            file=sys.stderr,
            flush=True,
        )

    total = round(sum(timings.values()), 2)
    # Short keys: "q01_pricing_summary" -> "q01". Unique by construction
    # (query ids are qNN-prefixed); guard anyway.
    short = {n.split("_", 1)[0]: t for n, t in timings.items()}
    assert len(short) == len(timings), "qNN prefixes must be unique"
    line = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": total,
            "unit": "sec",
            "queries": short,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    print(f"bench total: {total}s over {len(timings)} queries", file=sys.stderr)
    print(f"bench json ({len(line)} chars): {line}", file=sys.stderr, flush=True)
    os.write(real_stdout, (line + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
