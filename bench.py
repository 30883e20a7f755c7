"""Benchmark harness — one JSON line on stdout.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Every query is
materialized with the noop writer (all columns computed, no sink
cost) so Catalyst can't prune away the work being measured.

Output: {"metric": "total_query_seconds", "value": N, "unit": "sec",
         "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from big_data_ml_pipeline_spark.session import get_session

#: Queries measured per round: every oracle-checked query plus the
#: heavier rows-only extension operators (ML training excluded — model
#: fit time is not query throughput).
BENCH_QUERIES = list(
    dict.fromkeys(
        [
            *entrymod.oracle_sql().keys(),
            "q40_minhash_pairs",
            "q41_simhash_pairs",
            "q42_lsh_embedding_pairs",
            "q44_multimodal_features",
            "q45_quality_scores",
        ]
    )
)


def main() -> None:
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

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"bench {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
