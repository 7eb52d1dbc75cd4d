"""Graph-parallel (edge-sharded) decode — the sequence-parallel analog
(SURVEY.md §2.2 C21, §5.7 mode 2).

One codeword's Tanner graph is partitioned across devices: each device owns
a contiguous block of checks and their edges, computes local CN updates,
and the variable-node accumulate becomes a psum over the 'graph' mesh axis
(XLA lowers it to ICI all-reduce on real hardware — SURVEY.md §5.8). This
is the capability that would cover codes larger than one chip's working
set; for codes that fit (all standards families), the batch-parallel mode
is throughput-optimal (zero cross-chip traffic in the hot loop) and remains
the production path — SURVEY.md §5.7 explains the trade.

Implementation notes:
  - check-sharding makes every cross-device quantity a dense [n, B] psum;
    no boundary bookkeeping, and the collective is overlappable by XLA.
  - the per-device CN update reuses the oracle cn_ops on the local padded
    edge arrays, so graph-parallel results are BIT-IDENTICAL to the
    single-device flooding decoder for any shard count (tests/dist/).
  - a Pallas remote-DMA ring (pltpu.make_async_remote_copy) is the
    kernel-level upgrade path for boundary-only exchange; the psum form is
    the idiomatic XLA baseline.
  - PLATFORM CAVEAT: the per-shard VN scatter-add below is validated on
    CPU meshes (tests/dist/); this environment's TPU compiler crashes on
    scatter/gather chains, so a TPU deployment of graph-parallel decode
    would swap the local update for the incidence-matmul or QC-roll forms
    used by the batch-parallel kernels (round-2 work if a workload ever
    needs a single codeword spread over chips — none of the standards
    codes do).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.spec import CodeSpec
from ..decode.types import DecodeResult
from ..decode.xla.cn_ops import cn_minsum, cn_spa
from ..graph.compile import CompiledGraph, compile_graph

P = jax.sharding.PartitionSpec


@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Per-device check-shard subgraphs, stacked on a leading axis."""

    n: int
    m: int
    num_shards: int
    dc_max: int
    cn_vn: np.ndarray  # int32 [D, m_shard, dc_max]
    cn_mask: np.ndarray  # bool [D, m_shard, dc_max]


def shard_graph(spec: CodeSpec, num_shards: int) -> ShardedGraph:
    g = compile_graph(spec)
    m_shard = -(-g.m // num_shards)
    cn_vn = np.zeros((num_shards, m_shard, g.dc_max), np.int32)
    cn_mask = np.zeros((num_shards, m_shard, g.dc_max), bool)
    gv = np.asarray(g.cn_vn)
    gm = np.asarray(g.cn_mask)
    for d in range(num_shards):
        lo = d * m_shard
        hi = min(lo + m_shard, g.m)
        cn_vn[d, : hi - lo] = gv[lo:hi]
        cn_mask[d, : hi - lo] = gm[lo:hi]
    return ShardedGraph(
        n=g.n, m=g.m, num_shards=num_shards, dc_max=g.dc_max,
        cn_vn=cn_vn, cn_mask=cn_mask,
    )


def make_graph_parallel_decoder(
    spec: CodeSpec,
    mesh: jax.sharding.Mesh,
    axis: str = "graph",
    *,
    kind: str = "minsum",
    alpha: float = 1.0,
    beta: float = 0.0,
    max_iters: int = 25,
) -> Callable:
    """decode(llr [B, n]) -> DecodeResult, graph sharded over mesh[axis].

    llr is replicated; each device owns a check shard; counters/totals are
    psum-reduced. Fixed-iteration schedule with per-lane freeze (identical
    results to the single-device flooding decoder with early_term=True).
    """
    D = mesh.shape[axis]
    sg = shard_graph(spec, D)
    if kind == "spa":
        cn_op = cn_spa
    else:
        cn_op = functools.partial(cn_minsum, alpha=alpha, beta=beta)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
    )
    def decode_sharded(cn_vn_d, cn_mask_d, llr):
        cn_vn = cn_vn_d[0]  # [m_shard, dc] local shard
        mask3 = cn_mask_d[0][:, :, None]
        llr_t = llr.T.astype(jnp.float32)  # [n, B] replicated
        B = llr_t.shape[1]

        def syndrome_fail(total):
            hard = (total < 0).astype(jnp.int32)
            par = jnp.sum(jnp.where(mask3, hard[cn_vn], 0), axis=1) & 1
            local = jnp.any(par != 0, axis=0)
            return jax.lax.psum(local.astype(jnp.int32), axis) > 0

        V0 = jnp.where(mask3, llr_t[cn_vn], 0.0)
        total0 = llr_t
        done0 = ~syndrome_fail(total0)
        iters0 = (llr_t[0] * 0).astype(jnp.int32)

        def body(_, state):
            V, total, done, iters = state
            C = cn_op(V, mask3)  # local CN update
            # local partial VN accumulate, then all-reduce over shards:
            # scatter-add of local check messages into the full [n, B]
            partial = jnp.zeros((sg.n, B), jnp.float32)
            Cflat = jnp.where(mask3, C, 0.0).reshape(-1, B)
            partial = partial.at[cn_vn.reshape(-1)].add(Cflat)
            new_total = llr_t + jax.lax.psum(partial, axis)
            newV = jnp.where(mask3, new_total[cn_vn] - C, 0.0)
            fail = syndrome_fail(new_total)
            keep = done[None, None, :]
            V = jnp.where(keep, V, newV)
            total = jnp.where(done[None, :], total, new_total)
            iters = jnp.where(done, iters, iters + 1)
            done = done | ~fail
            return V, total, done, iters

        _, total, done, iters = jax.lax.fori_loop(
            0, max_iters, body, (V0, total0, done0, iters0)
        )
        bits = (total < 0).astype(jnp.uint8).T
        return bits, done, iters

    cn_vn = jnp.asarray(sg.cn_vn)
    cn_mask = jnp.asarray(sg.cn_mask)

    @jax.jit
    def decode(llr):
        bits, ok, iters = decode_sharded(cn_vn, cn_mask, llr)
        return DecodeResult(bits=bits, ok=ok, iterations=iters)

    return decode
