"""Ablation study v2 (VERDICT r2 item 3): where the STATIC-ROWS layered
kernel's time goes, measured in the OVERLAPPED 8-call regime the
benchmark actually runs in (ablate_layered.py v1 chained dependent
single-tile calls — latency-bound, insensitive to op count; DESIGN.md §3
"two regimes" note).

Variants are numerically WRONG where ablated — this measures time only,
keeping the dependency chain alive so Mosaic cannot dead-code-eliminate
the loop. The floor variant (memory movement + min1 chain only) bounds
every possible micro-op win at once.

Run: JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/ablate_layered2.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.decode.pallas.layered_qc import sweep_layout
from ecc_ldpc_tpu.graph import compile_qc_graph

_MAG_CAP = 1e12
_SGN_MASK = np.int32(-(2**31))
Bt = 128
ITERS = 25
ALPHA = 0.8125
CHUNKS = 8  # independent pallas calls per jit — the overlapped regime


def _kernel(llr_ref, bits_ref, total_s, C_s, vrow_s, *, tables, groups,
            nb, Z, roll_on, sign_on, min2_on, vrow_on, sub_on):
    ge_np, col_np, dlt_np = tables
    total_s[:] = llr_ref[:].astype(jnp.float32)
    C_s[:] = jnp.zeros_like(C_s)

    def sweep():
        for deg, nrows, off in groups:
            for li in range(nrows):  # static rows: everything constant
                base = off + li * deg
                inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
                min1, min2 = inf, inf
                sgnacc = jnp.zeros((Z, Bt), jnp.int32)
                for si in range(deg):
                    e = int(ge_np[base + si])
                    d = int(dlt_np[base + si])
                    t = total_s[int(col_np[e])]
                    rolled = pltpu.roll(t, d, 0) if (roll_on and d) else t
                    slab = (rolled - C_s[e].astype(jnp.float32)
                            if sub_on else rolled)
                    if vrow_on:
                        vrow_s[si] = slab
                    a = jnp.abs(slab)
                    if min2_on:
                        min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                    min1 = jnp.minimum(min1, a)
                    if sign_on:
                        sgnacc = sgnacc ^ jax.lax.bitcast_convert_type(
                            slab, jnp.int32)
                mag1 = ALPHA * min1
                mag2 = ALPHA * min2 if min2_on else mag1
                for si in range(deg):
                    e = int(ge_np[base + si])
                    col = int(col_np[e])
                    v = vrow_s[si] if vrow_on else min1
                    mag = (jnp.where(jnp.abs(v) == min1, mag2, mag1)
                           if min2_on else mag1)
                    if sign_on:
                        flip = (sgnacc ^ jax.lax.bitcast_convert_type(
                            v, jnp.int32)) & _SGN_MASK
                        Cnew = jax.lax.bitcast_convert_type(
                            jax.lax.bitcast_convert_type(mag, jnp.int32)
                            | flip, jnp.float32)
                    else:
                        Cnew = mag
                    Cb = Cnew.astype(C_s.dtype)
                    total_s[col] = v + Cnew
                    C_s[e] = Cb

    jax.lax.fori_loop(0, ITERS, lambda _, c: (sweep(), c)[1], 0)
    bits_ref[:] = (total_s[:] < 0).astype(bits_ref.dtype)


def build(graph, **flags):
    groups, ge_be_np, ge_delta_np, _, _, dup_free = sweep_layout(graph)
    assert dup_free
    nb, Z, BE, dcb = graph.nb, graph.Z, graph.num_block_edges, graph.dcb_max
    tables = (ge_be_np, np.asarray(graph.be_col_np, np.int64), ge_delta_np)
    kern = functools.partial(_kernel, tables=tables, groups=groups,
                             nb=nb, Z=Z, **flags)
    state = Z * Bt * (2 * BE + 4 * nb + 4 * nb + nb + 4 * dcb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[pl.BlockSpec((nb, Z, Bt), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((nb, Z, Bt), lambda b: (0, 0, b),
                                memory_space=pltpu.VMEM),),
        scratch_shapes=[
            pltpu.VMEM((nb, Z, Bt), jnp.float32),
            pltpu.VMEM((BE, Z, Bt), jnp.bfloat16),
            pltpu.VMEM((dcb, Z, Bt), jnp.float32),
        ],
    )

    def one(llr3):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((nb, Z, Bt), jnp.int8),),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(state + (1 << 23), 120 << 20))),
        )(llr3)[0]

    @jax.jit
    def decode(llr4):  # [CHUNKS, nb, Z, Bt]: independent calls, overlap
        outs = [one(llr4[i]) for i in range(CHUNKS)]
        # scalar coupling only (one element per chunk) so the next chain
        # step depends on all chunks without charging full-tensor traffic
        return sum(o[0, 0, 0].astype(jnp.float32) for o in outs)

    return decode


def timed(decode, llr4, chain=4, tries=3):
    @jax.jit
    def run(l):
        def body(_, l):
            # scalar chain coupling (one element) — full-tensor coupling
            # would charge ~2% harness HBM traffic to the kernel
            return l.at[0, 0, 0, 0].add(1e-12 * decode(l))
        return jnp.sum(jax.lax.fori_loop(0, chain, body, l)[:, 0, 0, 0])

    float(run(llr4))
    ts = []
    for _ in range(tries):
        t0 = time.perf_counter()
        float(run(llr4))
        ts.append((time.perf_counter() - t0) / (chain * CHUNKS))
    return float(np.median(ts))


def main():
    spec = get_code("dvbs2/64800/12")
    graph = compile_qc_graph(spec)
    rng = np.random.default_rng(0)
    llr4 = jnp.asarray(
        rng.standard_normal((CHUNKS, graph.nb, graph.Z, Bt)) + 2.0,
        jnp.float32)
    base_flags = dict(roll_on=True, sign_on=True, min2_on=True,
                      vrow_on=True, sub_on=True)
    variants = [
        ("full", {}),
        ("noroll", dict(roll_on=False)),
        ("nosign", dict(sign_on=False)),
        ("nomin2", dict(min2_on=False)),
        ("novrow", dict(vrow_on=False)),
        ("nosub", dict(sub_on=False)),
        ("floor", dict(roll_on=False, sign_on=False, min2_on=False,
                       vrow_on=False, sub_on=False)),
    ]
    k = spec.k
    t_full = None
    for name, over in variants:
        flags = dict(base_flags, **over)
        try:
            t = timed(build(graph, **flags), llr4)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__} {str(e)[:150]}")
            continue
        mbps = Bt * k / t / 1e6
        extra = ""
        if name == "full":
            t_full = t
        elif t_full:
            extra = f"  saves {100*(t_full-t)/t_full:5.1f}% of full"
        print(f"{name:8s} {t*1e3:7.2f} ms/tile  {mbps:7.1f} Mbit/s{extra}",
              flush=True)


if __name__ == "__main__":
    main()
