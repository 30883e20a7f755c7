"""Sweep every queries() entry and audit its FINAL executed plan for
scale anti-patterns; write PLAN_AUDIT.md.

The plan-shape pytest pins specific guarantees on specific queries;
this tool is the dragnet — every query, every round, the same checks:

 - CartesianProduct / BroadcastNestedLoopJoin: O(n·m) joins that are
   fatal at 100 TB (a bucketized rewrite or an equi-key is missing).
 - BatchEvalPython: a row-at-a-time Python UDF on the hot path
   (ArrowEvalPython / mapInPandas at the media edges are allowed).
 - Exchange count: shuffles are the scale currency — the count is
   reported so a regression (an operator suddenly shuffling twice) is
   visible in the diff between rounds.
 - ReusedExchange is credited: AQE computing a shared subplan once.

Usage: PYTHONPATH=. python tools/plan_audit.py [sf_dir] [out_md]
Plans are finalized by running the query (AQE rewrites plans at
runtime; the pre-execution string lies), so run at a small SF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from big_data_ml_pipeline_spark.session import get_session

#: marker -> (column label, is_failure)
MARKERS = {
    "CartesianProduct": ("cartesian", True),
    "BroadcastNestedLoopJoin": ("bnl_join", True),
    "BatchEvalPython": ("py_udf", True),
    "ArrowEvalPython": ("arrow_udf", False),
    "SortMergeJoin": ("smj", False),
    "BroadcastHashJoin": ("bhj", False),
    "ReusedExchange": ("reused_x", False),
}

#: A BroadcastNestedLoopJoin whose build side is a keyless global
#: aggregate is the CORRECT plan for a scalar broadcast (z-score
#: stats, corpus totals, thresholds): the broadcast side is ONE row,
#: so the "nested loop" is a constant attach. Only BNLJ without such
#: an aggregate anywhere in the plan is flagged — that one really is
#: an O(n·m) join missing its equi-key.
SCALAR_AGG_MARKERS = ("HashAggregate(keys=[], ", "SortAggregate(key=[], ")

#: Queries whose BroadcastNestedLoopJoin is BY DESIGN: the brute-force
#: similarity baselines broadcast a BOUNDED query side (one query
#: vector / a small query batch) against the streaming corpus — the
#: documented exact baselines whose scale path is the bucketed
#: LSH/IVF variants (q42/q43). Anything else hitting BNLJ fails.
BNL_ALLOWLIST = {
    "q28_embedding_topk": "broadcast 1-row query vector (brute-force baseline)",
    "q38_knn_join": "broadcast bounded query batch (exact kNN baseline)",
    # The recenter loop scores every vector against the |cells|-row
    # centroid TABLE (16 rows by construction — the data-dependent
    # analogue of q43's centroid literals); the broadcast cross join
    # IS the intended plan, not a missing equi-key.
    "q155_ivf_recenter_loop": "broadcast |cells|-row centroid table (Lloyd scoring)",
    # The recall report grades the IVF probe AGAINST the exact
    # brute-force baseline — the q38 broadcast-bounded-query-batch
    # cross join is the ground-truth side by definition; the probe
    # side under test is all equi-joins.
    "q157_ivf_nprobe_recall": "broadcast bounded query batch (exact ground-truth side)",
    # Same structure as q157: the rerank_from sweep is graded against
    # the exact brute-force baseline; the ADC probe + rerank side
    # under test is all equi-joins.
    "q173_pq_rerank_recall": "broadcast bounded query batch (exact ground-truth side)",
    # Residual twin of q173 — same structure, same ground-truth side.
    "q176_pq_residual_rerank_recall": (
        "broadcast bounded query batch (exact ground-truth side)"
    ),
}


def audit(sf_dir: str, out_md: str) -> int:
    spark = get_session()
    rows: list[tuple] = []
    failures: list[str] = []
    for name, fn in sorted(entrymod.queries().items()):
        df = fn(spark, sf_dir)
        try:
            df.collect()  # finalize AQE
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # rows-only streaming/ML wrappers, etc.
            rows.append((name, "ERROR", str(ex).splitlines()[0][:60]))
            failures.append(name)
            continue
        counts = {label: plan.count(marker) for marker, (label, _) in MARKERS.items()}
        n_exchange = plan.count("Exchange") - counts["reused_x"]
        scalar_bnl = counts["bnl_join"] > 0 and any(
            m in plan for m in SCALAR_AGG_MARKERS
        )
        allowed_bnl = scalar_bnl or name in BNL_ALLOWLIST
        bad = [
            label
            for marker, (label, is_fail) in MARKERS.items()
            if is_fail
            and plan.count(marker)
            and not (label == "bnl_join" and allowed_bnl)
        ]
        if counts["bnl_join"] and allowed_bnl:
            kind = "scalar" if scalar_bnl else "allowlisted"
            counts["bnl_join"] = f"{counts['bnl_join']}({kind})"
        if bad:
            failures.append(name)
        rows.append((name, n_exchange, counts, "FAIL:" + ",".join(bad) if bad else "ok"))

    with open(out_md, "w") as f:
        f.write(
            "# Plan audit — scale anti-pattern dragnet\n\n"
            f"Every `queries()` entry executed at `{sf_dir}`, FINAL (AQE) plan\n"
            "scanned. FAIL = cartesian/nested-loop join or row-at-a-time Python\n"
            "UDF anywhere in the plan. `x` = shuffle exchanges (net of reuse),\n"
            "`bhj`/`smj` = broadcast/sort-merge joins, `reused_x` = AQE-shared\n"
            "subplans, `arrow_udf` = allowed Arrow-batched Python (media/GEMM\n"
            "edges only).\n\n"
            "| query | x | bhj | smj | bnl | reused_x | arrow_udf | verdict |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            if r[1] == "ERROR":
                f.write(f"| {r[0]} | — | — | — | — | — | — | ERROR: {r[2]} |\n")
            else:
                name, nx, c, verdict = r
                f.write(
                    f"| {name} | {nx} | {c['bhj']} | {c['smj']} | {c['bnl_join']} | "
                    f"{c['reused_x']} | {c['arrow_udf']} | {verdict} |\n"
                )
        f.write(
            f"\n**{len(rows) - len(failures)}/{len(rows)} clean.**"
            + (f" Failures: {', '.join(failures)}\n" if failures else "\n")
        )
    print(f"{len(rows) - len(failures)}/{len(rows)} clean -> {out_md}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.md"
    raise SystemExit(audit(sf, out))
