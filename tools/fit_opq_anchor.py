#!/usr/bin/env python
"""Fit and commit the OPQ anchor kit (rotation + OPQ codebooks + the
same-seed plain-PQ codebooks) from an embeddings parquet file.

Reproducible by construction: the sample is the max_rows lowest-vec_id
rows (sorted), the k-means init and alternation are seeded numpy, and
the output JSON round-trips doubles exactly (repr-based). Re-running
this script on the same input produces a byte-identical artifact.

The committed artifact (big_data_ml_pipeline_spark/opq_anchor.json) is
this repo's equivalent of the deterministic centroid kits: oracle
queries and their SQL twins read the identical double literals, so
OPQ queries stay twin-exact at every SF. Refit + re-commit when the
anchor corpus vintage changes.

Usage: python tools/fit_opq_anchor.py [embeddings.parquet] [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from big_data_ml_pipeline_spark.operators.similarity import (  # noqa: E402
    fit_opq_rotation_np,
)


def main() -> None:
    src = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.01/embeddings.parquet"
    )
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "big_data_ml_pipeline_spark",
            "opq_anchor.json",
        )
    )
    m, k, seed, n_iter, max_rows = 8, 16, 42, 10, 20000
    X = duckdb.sql(
        f"SELECT CAST(embedding AS DOUBLE[]) AS v FROM '{src}' "
        f"ORDER BY vec_id LIMIT {max_rows}"
    ).fetchnumpy()["v"]
    X = [list(v) for v in X]
    rotation, opq_cbs, pq_cbs = fit_opq_rotation_np(
        X, m=m, k=k, seed=seed, n_iter=n_iter
    )
    artifact = {
        "source": os.path.basename(src),
        "n_rows": len(X),
        "m": m,
        "k": k,
        "seed": seed,
        "n_iter": n_iter,
        "rotation": rotation,
        "opq_codebooks": opq_cbs,
        "pq_codebooks": pq_cbs,
    }
    with open(out, "w") as f:
        json.dump(artifact, f)
    print(f"wrote {out}: dim={len(rotation)} m={m} k={k} n={len(X)}")


if __name__ == "__main__":
    main()
