#!/usr/bin/env python
"""Bless a per-query bench anchor from INTACT machine-written runs.

VERDICT r14 item 6: an anchor must never contain hand-merged values —
every number must trace to a committed bench output. This tool takes
N bench-output JSON files (each the one-line output of `python
bench.py`, saved verbatim) and writes BENCH_ANCHOR_r{N}.json with the
per-query MEDIAN across the runs as the comparison anchor
(``queries``) plus the per-query MIN as a separate floor diagnostic
(``queries_min``), and a provenance block recording the input files'
sha256 — so a future judge can verify each anchor value appears in
one of the inputs.

Median, not min (VERDICT r16 item 1): the min over N runs is a lower
ENVELOPE no single future run can match — it manufactured a 12-query
false-regression list in round 16 (contiguous contention blips each
compared against the luckiest of five runs). The median is what a
typical clean run actually achieves, so bench.py's over15 list is
empty on unchanged code and a non-empty list means something.

Usage:
  python bench.py > /tmp/bench_a.json   # run 1
  python bench.py > /tmp/bench_b.json   # run 2
  python tools/bless_anchor.py 15 /tmp/bench_a.json /tmp/bench_b.json

Refuses runs with mismatched query sets or scale factors.
"""
import hashlib
import json
import os
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    round_n = int(sys.argv[1])
    paths = sys.argv[2:]
    runs, digests = [], []
    for p in paths:
        raw = open(p, "rb").read()
        digests.append(
            {"file": os.path.basename(p),
             "sha256": hashlib.sha256(raw).hexdigest()}
        )
        # bench.py emits exactly one JSON line; tolerate surrounding
        # noise lines by taking the last line that parses with the
        # expected shape.
        run = None
        for line in raw.decode().splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "queries" in cand and "sf" in cand:
                    run = cand
        if run is None:
            sys.exit(f"{p}: no bench JSON line found")
        runs.append(run)
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"mismatched scale factors across runs: {sfs}")
    keysets = [set(r["queries"]) for r in runs]
    union = set.union(*keysets)
    inter = set.intersection(*keysets)
    if union != inter:
        # Mid-round query additions: earlier intact runs lack the new
        # queries. The per-query min is taken over the runs that
        # CONTAIN each query (still machine-written values, provenance
        # recorded for every input) — but only when every run covers
        # the common core; disjoint sets still refuse.
        if not inter:
            sys.exit("runs share no queries — wrong inputs?")
        extra = sorted(union - inter)
        print(f"note: {len(extra)} query(ies) present in only some "
              f"runs (mid-round additions): {extra}")
    anchor = {
        q: statistics.median(
            r["queries"][q] for r in runs if q in r["queries"]
        )
        for q in sorted(union)
    }
    floor = {
        q: min(r["queries"][q] for r in runs if q in r["queries"])
        for q in sorted(union)
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_ANCHOR_r{round_n}.json",
    )
    payload = {
        "sf": sfs.pop(),
        "n_runs": len(runs),
        "policy": "median",
        "provenance": digests,
        "queries": anchor,
        "queries_min": floor,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(anchor)} queries, median over {len(runs)} "
          f"runs, sum {sum(anchor.values()):.2f}s "
          f"(min-floor sum {sum(floor.values()):.2f}s)")


if __name__ == "__main__":
    main()
