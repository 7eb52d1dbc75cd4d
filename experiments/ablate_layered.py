"""Ablation study: where does the layered-kernel decode time go?

Strips the benchmark-mode (fixed-iteration, dup-free, bitxor) sweep out of
decode/pallas/layered_qc.py and compiles variants with individual cost
components removed (results are numerically WRONG for ablated variants —
this measures time only, keeping the dependency chain alive so Mosaic
cannot dead-code-eliminate the loop).

Run: JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/ablate_layered.py
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
from ecc_ldpc_tpu.graph import compile_qc_graph
from ecc_ldpc_tpu.decode.pallas.layered_qc import sweep_layout

_MAG_CAP = 1e12
_SGN_MASK = np.int32(-(2**31))
Bt = 128
ITERS = 25
ALPHA = 0.8125


def _kernel(ge_be_ref, be_col_ref, ge_delta_ref, llr_ref, bits_ref,
            total_s, C_s, vrow_s, *, groups, nb, Z,
            roll_on, sign_on, min2_on, vrow_on, castq_on):
    total_s[:] = llr_ref[:].astype(jnp.float32)
    C_s[:] = jnp.zeros_like(C_s)

    def sweep():
        for deg, nrows, off in groups:
            def layer(li, c, deg=deg, off=off):
                base = off + li * deg
                inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
                min1, min2 = inf, inf
                sgnacc = jnp.zeros((Z, Bt), jnp.int32)
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    t = total_s[be_col_ref[e]]
                    rolled = (pltpu.roll(t, ge_delta_ref[base + si], 0)
                              if roll_on else t)
                    slab = rolled - C_s[e].astype(jnp.float32)
                    if vrow_on:
                        vrow_s[si] = slab
                    a = jnp.abs(slab)
                    if min2_on:
                        min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                    min1 = jnp.minimum(min1, a)
                    if sign_on:
                        sgnacc = sgnacc ^ jax.lax.bitcast_convert_type(
                            slab, jnp.int32)
                if sign_on:
                    sgnbit = sgnacc & _SGN_MASK
                mag1 = ALPHA * jnp.minimum(min1, _MAG_CAP)
                mag2 = (ALPHA * jnp.minimum(min2, _MAG_CAP)
                        if min2_on else mag1)
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    col = be_col_ref[e]
                    v = vrow_s[si] if vrow_on else min1
                    mag = (jnp.where(jnp.abs(v) == min1, mag2, mag1)
                           if min2_on else mag1)
                    if sign_on:
                        flip = (sgnbit ^ jax.lax.bitcast_convert_type(
                            v, jnp.int32)) & _SGN_MASK
                        Cnew = jax.lax.bitcast_convert_type(
                            jax.lax.bitcast_convert_type(mag, jnp.int32)
                            | flip, jnp.float32)
                    else:
                        Cnew = mag
                    Cb = Cnew.astype(C_s.dtype)
                    Cq = Cb.astype(jnp.float32) if castq_on else Cnew
                    total_s[col] = v + Cq
                    C_s[e] = Cb
                return c
            jax.lax.fori_loop(0, nrows, layer, 0)

    jax.lax.fori_loop(0, ITERS, lambda _, c: (sweep(), c)[1], 0)
    bits_ref[:] = (total_s[:] < 0).astype(bits_ref.dtype)


def build(graph, **flags):
    groups, ge_be_np, ge_delta_np, _, _, dup_free = sweep_layout(graph)
    assert dup_free
    nb, Z, BE, dcb = graph.nb, graph.Z, graph.num_block_edges, graph.dcb_max
    kern = functools.partial(_kernel, groups=groups, nb=nb, Z=Z, **flags)
    state = Z * Bt * (2 * BE + 4 * nb + 4 * nb + nb + 4 * dcb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec((nb, Z, Bt), lambda b, *_: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((nb, Z, Bt), lambda b, *_: (0, 0, b),
                                memory_space=pltpu.VMEM),),
        scratch_shapes=[
            pltpu.VMEM((nb, Z, Bt), jnp.float32),
            pltpu.VMEM((BE, Z, Bt), jnp.bfloat16),
            pltpu.VMEM((dcb, Z, Bt), jnp.float32),
        ],
    )
    ge_be = jnp.asarray(ge_be_np)
    ge_delta = jnp.asarray(ge_delta_np)
    be_col = jnp.asarray(graph.be_col)

    @jax.jit
    def decode(llr3):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((nb, Z, Bt), jnp.int8),),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(state + (1 << 23), 120 << 20))),
        )(ge_be, be_col, ge_delta, llr3)[0]

    return decode


def timed(decode, llr3, chain=10, tries=3):
    @jax.jit
    def run(l):
        def body(_, l):
            return l + 1e-9 * decode(l).astype(jnp.float32)
        return jnp.sum(jax.lax.fori_loop(0, chain, body, l)[:, 0, 0])

    float(run(llr3))
    ts = []
    for _ in range(tries):
        t0 = time.perf_counter()
        float(run(llr3))
        ts.append((time.perf_counter() - t0) / chain)
    return float(np.median(ts))


def main():
    spec = get_code("dvbs2/64800/12")
    graph = compile_qc_graph(spec)
    rng = np.random.default_rng(0)
    llr3 = jnp.asarray(rng.standard_normal((graph.nb, graph.Z, Bt)) + 2.0,
                       jnp.float32)
    base_flags = dict(roll_on=True, sign_on=True, min2_on=True,
                      vrow_on=True, castq_on=True)
    variants = [
        ("full", {}),
        ("noroll", dict(roll_on=False)),
        ("nosign", dict(sign_on=False)),
        ("nomin2", dict(min2_on=False)),
        ("novrow", dict(vrow_on=False)),
        ("nocastq", dict(castq_on=False)),
        ("floor", dict(roll_on=False, sign_on=False, min2_on=False,
                       vrow_on=False, castq_on=False)),
    ]
    k = spec.k
    t_full = None
    for name, over in variants:
        flags = dict(base_flags, **over)
        try:
            t = timed(build(graph, **flags), llr3)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__} {str(e)[:150]}")
            continue
        mbps = Bt * k / t / 1e6
        extra = ""
        if name == "full":
            t_full = t
        elif t_full:
            extra = f"  saves {100*(t_full-t)/t_full:5.1f}% of full"
        print(f"{name:8s} {t*1e3:7.2f} ms/decode  {mbps:7.1f} Mbit/s{extra}",
              flush=True)


if __name__ == "__main__":
    main()
