"""Ensemble retrieval evaluators: count-mix, weighted-score, RRF.

Model-agnostic re-implementation of `tower_code/mined_inference.py`'s three
evaluators (`evaluate_multi_vector_ensemble` :797-993,
`evaluate_weighted_score_ensemble` :1001-1227, `evaluate_rrf_ensemble`
:1238-1448): each model contributes its per-user top-M candidate ids +
scores (however computed — sequence tower, GNN, distilled GNN), and the
ensemble layer fuses ranked lists. Fusion is cheap host/numpy work over
(B, M) arrays; the expensive scoring already ran on TPU through the shared
top-k path.
"""

from __future__ import annotations

import numpy as np

from recsys_tpu.eval.recall import recall_at_ks


def _dedup_take(rows: np.ndarray, k: int) -> np.ndarray:
    """Per row: first k distinct entries (order-preserving), -1 padded."""
    out = np.full((rows.shape[0], k), -1, dtype=rows.dtype)
    for r in range(rows.shape[0]):
        _, first = np.unique(rows[r], return_index=True)
        uniq = rows[r][np.sort(first)]
        take = uniq[:k]
        out[r, : len(take)] = take
    return out


def count_mix_ensemble(idx_a: np.ndarray, idx_b: np.ndarray, k: int,
                       alpha: float) -> np.ndarray:
    """Take ceil(alpha*k) from model A's list then fill from model B,
    deduplicating (the reference's count-mix, `:797-993`)."""
    na = int(np.ceil(alpha * k))
    merged = np.concatenate([idx_a[:, :na], idx_b, idx_a[:, na:]], axis=1)
    return _dedup_take(merged, k)


def weighted_score_ensemble(idx_a, scores_a, idx_b, scores_b, k: int,
                            alpha: float) -> np.ndarray:
    """Union candidate pool; min-max normalize each model's scores over its
    own list; weighted sum alpha*A + (1-alpha)*B; top-k (`:1001-1227`).
    Candidates missing from a model's list get that model's minimum (0)."""
    B = idx_a.shape[0]
    out = np.zeros((B, k), dtype=idx_a.dtype)
    for r in range(B):
        def norm(s):
            lo, hi = float(s.min()), float(s.max())
            return (s - lo) / (hi - lo) if hi > lo else np.ones_like(s)
        pool: dict[int, float] = {}
        for i, s in zip(idx_a[r], norm(scores_a[r].astype(np.float64))):
            pool[int(i)] = pool.get(int(i), 0.0) + alpha * s
        for i, s in zip(idx_b[r], norm(scores_b[r].astype(np.float64))):
            pool[int(i)] = pool.get(int(i), 0.0) + (1 - alpha) * s
        ranked = sorted(pool.items(), key=lambda kv: -kv[1])[:k]
        ids = [i for i, _ in ranked]
        out[r, : len(ids)] = ids
        if len(ids) < k:
            out[r, len(ids):] = -1
    return out


def rrf_ensemble(idx_a: np.ndarray, idx_b: np.ndarray, k: int,
                 k_rrf: int = 200) -> np.ndarray:
    """Reciprocal-rank fusion: score = sum 1/(k_rrf + rank + 1) (`:1238-1448`)."""
    B = idx_a.shape[0]
    out = np.zeros((B, k), dtype=idx_a.dtype)
    for r in range(B):
        pool: dict[int, float] = {}
        for rank, i in enumerate(idx_a[r]):
            pool[int(i)] = pool.get(int(i), 0.0) + 1.0 / (k_rrf + rank + 1)
        for rank, i in enumerate(idx_b[r]):
            pool[int(i)] = pool.get(int(i), 0.0) + 1.0 / (k_rrf + rank + 1)
        ranked = sorted(pool.items(), key=lambda kv: -kv[1])[:k]
        ids = [i for i, _ in ranked]
        out[r, : len(ids)] = ids
        if len(ids) < k:
            out[r, len(ids):] = -1
    return out


def alpha_sweep(method: str, model_a: tuple, model_b: tuple, user_ids,
                targets_idx: dict, ks=(20, 100, 500),
                alphas=(1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1, 0.0),
                k_rrf: int = 200) -> dict:
    """Sweep the fusion weight and report recall per alpha + the best
    (the reference's report-table-and-best-alpha protocol).

    model_a/model_b: (topm_idx, topm_scores) arrays, aligned to user_ids.
    """
    idx_a, sc_a = model_a
    idx_b, sc_b = model_b
    max_k = max(ks)
    table = {}
    for alpha in alphas:
        if method == "count_mix":
            fused = count_mix_ensemble(idx_a, idx_b, max_k, alpha)
        elif method == "weighted":
            fused = weighted_score_ensemble(idx_a, sc_a, idx_b, sc_b, max_k, alpha)
        elif method == "rrf":
            fused = rrf_ensemble(idx_a, idx_b, max_k, k_rrf)
        else:
            raise ValueError(method)
        table[alpha] = recall_at_ks(fused, user_ids, targets_idx, ks)
        if method == "rrf":  # rank fusion has no alpha; one row suffices
            break
    key = f"recall@{sorted(ks)[min(1, len(ks) - 1)]}"
    best_alpha = max(table, key=lambda a: table[a][key])
    return {"table": table, "best_alpha": best_alpha, "best": table[best_alpha]}
