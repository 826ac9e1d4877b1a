"""SpMM kernel config sweep at bench-graph scale (22.6M directed edges).

Measures a single propagation pass (forward) per (block_n, chunk_e, pack)
config with the state-chained differential timing the tunnel requires
(see bench.py notes): time N_long chained passes and N_short, report
(T_long - T_short) / (N_long - N_short).

Usage:  python bench_spmm.py [--configs "1024,1024,1 2048,1024,2 512,1024,2,4 1024,1024,2,1,4 ..."]
(config = block_n,chunk_e,pack[,split[,mxu_parts]]) Prints one JSON line
per config.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import NUM_EDGES, NUM_ITEMS, NUM_USERS, build_synthetic_graph
from recsys_tpu.ops.pallas_spmm import block_graph, spmm

N_SHORT, N_LONG = 5, 25
DIM = 64

DEFAULT_CONFIGS = [(1024, 1024, 1), (1024, 1024, 2), (2048, 1024, 2),
                   (2048, 2048, 2), (4096, 2048, 2)]


def main():
    configs = DEFAULT_CONFIGS
    if "--configs" in sys.argv:
        raw = sys.argv[sys.argv.index("--configs") + 1]
        configs = [tuple(map(int, c.split(","))) for c in raw.split()]
    for c in configs:
        if not 3 <= len(c) <= 5:
            raise SystemExit(f"bad config {c}: want block_n,chunk_e,pack"
                             f"[,split[,mxu_parts]]")
    configs = [(*c, *((1,) * (5 - len(c)))) for c in configs]

    rng = np.random.default_rng(0)
    graph, _, _ = build_synthetic_graph(rng)
    n = NUM_USERS + NUM_ITEMS
    x0 = jnp.asarray(rng.normal(0, 0.1, (n, DIM)).astype(np.float32))

    for bn, ce, pack, split, mxu_parts in configs:
        t0 = time.perf_counter()
        blocked = block_graph(graph.src, graph.dst, graph.weight, n,
                              block_n=bn, chunk_e=ce, pack=pack, split=split,
                              mxu_parts=mxu_parts)
        host_s = time.perf_counter() - t0
        meta = blocked.meta
        arrays = blocked.device_arrays()
        real_e = int((blocked.weight > 0).sum())
        pad_factor = meta.num_chunks * ce / max(real_e, 1)

        @jax.jit
        def chain(a, x, steps):
            def body(i, xx):
                return spmm(meta, a, xx, "bf16")  # noqa: B023
            return jax.lax.fori_loop(0, steps, body, x)

        # warmup/compile (both step counts share one jit via static arg? —
        # steps is traced, one compile)
        t0 = time.perf_counter()
        _ = np.asarray(chain(arrays, x0, 1))
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        _ = np.asarray(chain(arrays, x0, N_SHORT))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(chain(arrays, x0, N_LONG))
        t_long = time.perf_counter() - t0
        per_pass_ms = (t_long - t_short) / (N_LONG - N_SHORT) * 1000

        print(json.dumps({
            "block_n": bn, "chunk_e": ce, "pack": pack, "split": split,
            "mxu_parts": mxu_parts,
            "chunks": meta.num_chunks, "pad_factor": round(pad_factor, 3),
            "host_chunk_s": round(host_s, 2), "compile_s": round(compile_s, 1),
            "ms_per_pass": round(per_pass_ms, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
