"""kNN cluster purity of a materialized item matrix vs generator ground truth.

Usage: python scripts/knn_purity.py <data_root> [k]

Measures how much of the latent micro-style structure (items.latent_cluster,
hidden generator ground truth) stage-1 content vectors recover: for each
item, the fraction of its k nearest neighbors (cosine) sharing its cluster,
plus mean within-cluster vs cross-cluster cosine. The content-expressible
ceiling on the v3 mid world is ~0.30 (feature-weighted kNN oracle,
RESULTS.md attribution section). Prints one JSON line.
"""

import json
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from recsys_tpu.train.checkpoint import load_array_with_ids  # noqa: E402


def knn_purity(vecs: np.ndarray, labels: np.ndarray, k: int = 10) -> dict:
    v = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-8)
    sims = v @ v.T
    np.fill_diagonal(sims, -np.inf)
    nn = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    same = labels[nn] == labels[:, None]
    purity = float(same.mean())
    # within/cross cosine on a subsample of pairs
    rng = np.random.default_rng(0)
    n = len(v)
    a = rng.integers(0, n, 20000)
    b = rng.integers(0, n, 20000)
    keep = a != b
    pair_sims = np.sum(v[a[keep]] * v[b[keep]], axis=1)
    same_pair = labels[a[keep]] == labels[b[keep]]
    return {
        "knn_purity": purity,
        "k": k,
        "within_cos": float(pair_sims[same_pair].mean()) if same_pair.any() else None,
        "cross_cos": float(pair_sims[~same_pair].mean()),
        "n_items": int(n),
        "n_clusters": int(len(np.unique(labels))),
    }


def main():
    root = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mat, ids, _ = load_array_with_ids(f"{root}/item_matrix")
    if len(ids) == len(mat):  # sidecar includes the "<pad>" row-0 id
        ids = ids[1:]
    items = pd.read_parquet(f"{root}/items.parquet")
    lab = items.set_index(items["item_id"].astype(str))["latent_cluster"]
    labels = lab.reindex([str(i) for i in ids]).to_numpy()
    vecs = mat[1:]  # drop PAD row
    assert len(vecs) == len(labels)
    print(json.dumps(knn_purity(vecs, labels, k)))


if __name__ == "__main__":
    main()
