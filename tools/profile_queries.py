"""Per-query profiling harness for the optimization rounds.

For each named query (default: every bench query): construct the
DataFrame, time a noop-sink run (bench methodology), then dump the
FINALIZED .explain("formatted") to plans/<tag>/<name>_<suffix>.txt and
pull per-job/stage wall+metrics from the local Spark UI REST API so
the time can be attributed to stages (shuffle read/write bytes,
executor run time) without eyeballing the UI.

Usage: PYTHONPATH=. python tools/profile_queries.py <suffix> [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench contract),
     PROFILE_OUT (default plans/r17), PROFILE_RUNS (default 2).
"""

from __future__ import annotations

import calendar
import io
import json
import os
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from big_data_ml_pipeline_spark.session import get_session


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.environ.get("PROFILE_OUT", "plans/r17")
    n_runs = int(os.environ.get("PROFILE_RUNS", "2"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session(
        app_name="profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entrymod.queries()
    if not names:
        names = [n for n in entrymod.oracle_sql()]
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_since(t0_ms: float) -> list[dict]:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs", timeout=10
            ) as r:
                jobs = json.load(r)
        except Exception:
            return []
        out = []
        for j in jobs:
            st = j.get("submissionTime", "")
            if not st:
                continue
            # ISO "2026-08-17T21:00:00.000GMT" — explicitly GMT, so
            # convert with timegm; mktime would apply the LOCAL zone
            # and mis-attribute jobs on any non-UTC machine.
            ts = calendar.timegm(
                time.strptime(st.split(".")[0], "%Y-%m-%dT%H:%M:%S")
            )
            if ts * 1000 >= t0_ms - 1000:
                out.append(j)
        return out

    def stage_detail(sid: int) -> dict:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}",
                timeout=10,
            ) as r:
                d = json.load(r)
            d = [x for x in d if x.get("status") == "COMPLETE"] or d
            s = d[0]
            return {
                "stage": sid,
                "name": s.get("name", "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "exec_ms": s.get("executorRunTime"),
                "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                "in_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                "sh_r_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
                "sh_w_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
                "rows_out": s.get("outputRecords"),
            }
        except Exception as e:
            return {"stage": sid, "err": str(e)}

    report = {}
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        per_run = []
        df = None
        t_first = time.time() * 1000
        for _ in range(n_runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            per_run.append(round(time.time() - t0, 2))
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"# {name} runs={per_run} sf_dir={sf_dir}\n")
            f.write(buf.getvalue())
        jobs = jobs_since(t_first)
        stage_ids = sorted(
            {s for j in jobs for s in j.get("stageIds", [])}
        )
        stages = [stage_detail(s) for s in stage_ids]
        stages = [
            s for s in stages if s.get("exec_ms") or s.get("err")
        ]
        stages.sort(key=lambda s: -(s.get("exec_ms") or 0))
        report[name] = {
            "runs": per_run,
            "n_jobs": len(jobs),
            "stages_top": stages[:12],
        }
        print(
            f"{name}: runs={per_run} jobs={len(jobs)} "
            f"top_stages={[(s.get('exec_ms'), s.get('name')) for s in stages[:4]]}",
            file=sys.stderr, flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    with open(os.path.join(out_dir, f"_profile_{suffix}.json"), "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
