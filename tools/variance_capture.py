#!/usr/bin/env python3
"""Variance-capture probe for an embeddings corpus — the r17 method
(BENCH_pq_recall_r17.json variance_capture), now a reusable tool:
unit-normalize, Lloyd k-means (k=1024 x 3 iters by default) on a 50k
sample, then mean ||x - C(cell)||^2 on 20k held-out rows. The capture
fraction 1 - mean_residual_sq is the quantity the ANN chooser's
residual-PQ and LSH branches are conditioned on.

Usage: tools/variance_capture.py DIR [k] [iters]
"""
import sys, json
import numpy as np
import pyarrow.parquet as pq


def main():
    d = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    t = pq.read_table(d + "/embeddings.parquet", columns=["embedding"])
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(17)  # sample choice only; capture is stable
    idx = rng.permutation(len(x))
    train, hold = x[idx[:50000]], x[idx[50000:70000]]
    if len(hold) < 1000:  # small corpus: just split in half
        half = len(x) // 2
        train, hold = x[idx[:half]], x[idx[half:]]
    c = train[rng.choice(len(train), k, replace=False)]
    for _ in range(iters):
        a = np.argmax(train @ c.T, axis=1)  # unit vectors: max dot = min L2
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = train[m].mean(axis=0)
    a = np.argmax(hold @ c.T, axis=1)
    res = ((hold - c[a]) ** 2).sum(axis=1)
    out = {
        "dir": d, "n": len(x), "k": k, "iters": iters,
        "n_train": len(train), "n_holdout": len(hold),
        "mean_residual_sq_norm": round(float(res.mean()), 4),
        "variance_captured": round(1 - float(res.mean()), 4),
        "per_dim_variance_minmax": [round(float(x.var(axis=0).min()), 5),
                                    round(float(x.var(axis=0).max()), 5)],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
