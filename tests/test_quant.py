"""Int8-quantized retrieval: ranking fidelity vs the fp32 exact path."""

import numpy as np

from recsys_tpu.ops.quant import (QuantizedItems, int8_topk,
                                  quantization_recall, quantize_items_int8)


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    items = rng.normal(size=(200, 32)).astype(np.float32)
    items[0] = 0
    qi = quantize_items_int8(items)
    assert qi.q.dtype.name == "int8"
    deq = np.asarray(qi.q, np.float32) * np.asarray(qi.col_scale)[None, :]
    normed = items / np.clip(np.linalg.norm(items, axis=-1, keepdims=True),
                             1e-12, None)
    # per-channel symmetric int8: max abs error bounded by col_scale/2
    err = np.abs(deq - normed)
    assert (err <= np.asarray(qi.col_scale)[None, :] * 0.5 + 1e-7).all()


def test_int8_topk_matches_exact_on_separated_data():
    """With clearly separated scores, int8 recovers the exact top-k
    identically; PAD row 0 never appears."""
    rng = np.random.default_rng(1)
    N, D, B, k = 500, 64, 32, 20
    items = rng.normal(size=(N + 1, D)).astype(np.float32)
    items[0] = 0
    u = rng.normal(size=(B, D)).astype(np.float32)
    rec = quantization_recall(items, u, k=k)
    assert rec >= 0.95, rec
    _, idx = int8_topk(u, quantize_items_int8(items), k)
    assert (np.asarray(idx) != 0).all()


def test_int8_topk_approx_method_runs():
    rng = np.random.default_rng(2)
    items = rng.normal(size=(257, 16)).astype(np.float32)
    items[0] = 0
    u = rng.normal(size=(4, 16)).astype(np.float32)
    qi = quantize_items_int8(items)
    vals, idx = int8_topk(u, qi, 10, method="approx", recall_target=0.9)
    assert idx.shape == (4, 10)
    assert (np.asarray(idx) != 0).all()


def test_identical_vectors_score_maximally():
    """A query equal to a catalog row must rank that row first (cosine=1)."""
    rng = np.random.default_rng(3)
    items = rng.normal(size=(100, 32)).astype(np.float32)
    items[0] = 0
    qi = quantize_items_int8(items)
    u = items[[7, 42]]
    _, idx = int8_topk(u, qi, 1)
    assert np.asarray(idx).ravel().tolist() == [7, 42]
