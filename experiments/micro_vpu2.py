"""Micro-benchmark v2: per-op VPU throughput by dtype, with random inputs
and 4-way ILP (mimics the layered kernel's independent-slab structure).

Suspicion from v1: f32 chains ran 6-8x slower than int32/bf16 chains —
either f32 min/abs lower to slow sequences here, or v1 measured latency
artifacts. This version times each op kind separately.

Run: JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/micro_vpu2.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Z, L = 368, 128
INNER = 200
REPS = 32
ILP = 4


def make_kernel(op):
    def kernel(a_ref, b_ref, o_ref):
        xs = [a_ref[:] + jnp.asarray(i, a_ref.dtype) for i in range(ILP)]
        b = b_ref[:]

        def outer(r, xs):
            def body(i, xs):
                return tuple(op(x, b) for x in xs)
            return jax.lax.fori_loop(0, INNER, body, tuple(xs))

        xs = jax.lax.fori_loop(0, REPS, outer, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


OPS = {
    "add": lambda x, b: x + b,
    "min": lambda x, b: jnp.minimum(x, b),
    "min_lax": lambda x, b: jax.lax.min(x, b),
    "abs": lambda x, b: jnp.abs(x) - b,          # abs+sub: 2 ops
    "mul": lambda x, b: x * b,
    "cmpsel": lambda x, b: jnp.where(x < b, x + b, b),  # cmp+add+sel: 3 ops
}
NOPS = {"add": 1, "min": 1, "min_lax": 1, "abs": 2, "mul": 1, "cmpsel": 3}


def run(dtype, opname):
    rng = np.random.default_rng(0)
    if jnp.issubdtype(dtype, jnp.integer):
        a = jnp.asarray(rng.integers(1, 1000, (Z, L)), dtype)
        b = jnp.asarray(rng.integers(1, 1000, (Z, L)), dtype)
    else:
        a = jnp.asarray(rng.standard_normal((Z, L)), dtype)
        b = jnp.asarray(rng.standard_normal((Z, L)), dtype)
    kern = make_kernel(OPS[opname])
    f = jax.jit(
        lambda a, b: pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((Z, L), jnp.float32),),
        )(a, b)
    )
    f(a, b)[0].block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(4):
        out = f(a, b)
    np.asarray(out[0])
    t = (time.perf_counter() - t0) / 4
    nops = NOPS[opname] * ILP * INNER * REPS
    gops = Z * L * nops / t / 1e9
    print(f"{opname:8s} {jnp.dtype(dtype).name:9s} {t*1e3:7.2f} ms "
          f"{gops:8.1f} Gelem-op/s")
    return gops


def main():
    print(f"backend={jax.default_backend()} ilp={ILP}")
    for opname in OPS:
        for d in (jnp.float32, jnp.int32, jnp.bfloat16):
            if opname == "abs" and d == jnp.bfloat16:
                pass
            try:
                run(d, opname)
            except Exception as e:
                print(f"{opname:8s} {jnp.dtype(d).name:9s} FAILED "
                      f"{type(e).__name__} {str(e)[:120]}")
        print()


if __name__ == "__main__":
    main()
