"""Pallas ICI ring collectives: remote-DMA counter reduction
(SURVEY.md §5.8 kernel-level tier; pattern from SNIPPETS.md:8-73 and the
Pallas distributed guide).

The XLA psum path (dist/montecarlo.py) is the production collective; this
module provides the explicit-RDMA equivalent — a uni-directional ring
all-reduce built from pltpu.make_async_remote_copy with send/recv DMA
semaphores — as the kernel-level building block for overlapping boundary
exchanges with compute (the graph-parallel upgrade path, SURVEY.md §5.7).

Single-device meshes degenerate to a copy (no RDMA is issued), which is
what the one-chip environment and CPU CI exercise; the multi-chip path
compiles against the same mesh machinery it would use on a pod slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = jax.sharding.PartitionSpec


def _ring_allreduce_kernel(x_ref, out_ref, comm_ref, send_sem, recv_sem, *,
                           axis: str, num_devices: int):
    """Ring all-gather into per-source slots, then local sum.

    comm_ref[src] holds device `src`'s contribution; at ring step i each
    device forwards the chunk that originated at (my_id - i) to its right
    neighbor, into that chunk's OWN slot. Every slot is written exactly
    once, so no slot reuse and no inter-step barrier is needed (a
    double-buffered variant was measured racy at 4 devices).
    """
    my_id = jax.lax.axis_index(axis)
    comm_ref[my_id] = x_ref[:]

    def step(i, _):
        src = jax.lax.rem(my_id - i + num_devices, num_devices)
        dst = jax.lax.rem(my_id + 1, num_devices)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[src],
            dst_ref=comm_ref.at[src],
            send_sem=send_sem.at[i % 2],
            recv_sem=recv_sem.at[i % 2],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        return 0

    jax.lax.fori_loop(0, num_devices - 1, step, 0)
    acc = comm_ref[0]
    for_sum = jax.lax.fori_loop(
        1, num_devices, lambda d, a: a + comm_ref[d], acc
    )
    out_ref[:] = for_sum


def ring_allreduce(x: jax.Array, mesh: jax.sharding.Mesh, axis: str = "batch"):
    """Sum `x` (replicated shape per device) across mesh[axis] via an
    explicit RDMA ring. x: any [rows, 128*k] f32-like array."""
    num_devices = mesh.shape[axis]

    def per_device(x):
        if num_devices == 1:
            return x
        kern = functools.partial(
            _ring_allreduce_kernel, axis=axis, num_devices=num_devices
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((num_devices,) + x.shape, x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7,
            ),
            interpret=jax.default_backend() != "tpu",
        )(x)

    return jax.jit(
        jax.shard_map(
            per_device, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
            check_vma=False,
        )
    )(x)
