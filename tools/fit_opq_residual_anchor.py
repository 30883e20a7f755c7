#!/usr/bin/env python
"""Fit and commit the OPQ+RESIDUAL anchor kit — the full modern
composition (the Faiss OPQ→IVF→PQ chain): coarse cells in the RAW
space (the deterministic q43 centroid kit), the committed OPQ anchor's
learned rotation R, and per-subspace codebooks trained on the ROTATED
RESIDUALS R·(v − centroid(cell)) — the exact quantity
``pq_append_codes(centroids=…, rotation=…)`` encodes and
``ivf_pq_knn_join(residual=True, rotation=…)`` probes.

Reproducible by construction, like tools/fit_opq_anchor.py: the sample
is the max_rows lowest-vec_id rows, assignment mirrors the rounded
argmax cell rule, the per-subspace Lloyd fits are the same seeded
deterministic numpy the OPQ alternation uses, and the JSON round-trips
doubles exactly. Re-running on the same input is byte-identical.

Usage: python tools/fit_opq_residual_anchor.py [embeddings.parquet] [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from big_data_ml_pipeline_spark.operators.similarity import (  # noqa: E402
    _lloyd_kmeans_np,
    deterministic_ivf_centroids,
    load_opq_anchor,
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
            "opq_residual_anchor.json",
        )
    )
    m, k, seed, kmeans_iter, max_rows, n_cells = 8, 16, 42, 25, 20000, 16
    X = duckdb.sql(
        f"SELECT CAST(embedding AS DOUBLE[]) AS v FROM '{src}' "
        f"ORDER BY vec_id LIMIT {max_rows}"
    ).fetchnumpy()["v"]
    X = np.array([list(v) for v in X], dtype="float64")
    dim = X.shape[1]
    d = dim // m
    anchor = load_opq_anchor()
    R = np.array(anchor["rotation"], dtype="float64")
    C = np.array(
        deterministic_ivf_centroids(dim=dim, n_cells=n_cells),
        dtype="float64",
    )
    # Rounded-argmax cosine assignment (the round_assign_digits=6 rule;
    # first max wins on ties, matching array_position).
    sims = (X @ C.T) / (
        np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None]
    )
    cells = np.argmax(np.round(sims, 6), axis=1)
    rres = (X - C[cells]) @ R.T
    cbs = [
        _lloyd_kmeans_np(rres[:, j * d:(j + 1) * d], k, seed + j, kmeans_iter)
        for j in range(m)
    ]
    artifact = {
        "source": os.path.basename(src),
        "n_rows": int(len(X)),
        "m": m,
        "k": k,
        "seed": seed,
        "kmeans_iter": kmeans_iter,
        "n_cells": n_cells,
        "round_assign_digits": 6,
        "rotation_source": "opq_anchor.json",
        "codebooks": [
            [[float(x) for x in cb] for cb in cbj] for cbj in cbs
        ],
    }
    with open(out, "w") as f:
        json.dump(artifact, f)
    print(f"wrote {out}: dim={dim} m={m} k={k} n={len(X)}")


if __name__ == "__main__":
    main()
