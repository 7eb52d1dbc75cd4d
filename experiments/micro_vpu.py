"""Micro-benchmark: VPU elementwise throughput per dtype inside a Pallas
kernel, plus dynamic-roll cost per dtype.

Question: does Mosaic execute packed bf16 / int16 elementwise arithmetic at
2x f32 VREG throughput on v5e?  (Tiling is (16,128) for 16-bit dtypes —
two sublanes per VREG — so the hardware *could*.)  The layered LDPC kernel
is VPU-arithmetic-bound; a genuine 2x here is the main remaining lever
toward the 1 Gbit/s north star.

Run on the real TPU:
  JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/micro_vpu.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z, L = 368, 128        # sublane dim multiple of 16 so bf16/int16 tile cleanly
INNER = 400            # chained ops per kernel pass
REPS = 64              # kernel-internal outer reps


def _ew_kernel(x_ref, o_ref, *, dtype):
    x = x_ref[:].astype(dtype)
    one = jnp.asarray(1, dtype)

    def outer(r, x):
        def body(i, x):
            # chain of dependent cheap ops: sub, abs, min  (the kernel's diet)
            y = x - one
            a = jnp.abs(y)
            return jnp.minimum(x, a) + one
        return jax.lax.fori_loop(0, INNER, body, x)

    x = jax.lax.fori_loop(0, REPS, outer, x)
    o_ref[:] = x.astype(o_ref.dtype)


def _roll_kernel(s_ref, x_ref, o_ref, *, dtype):
    x = x_ref[:].astype(dtype)

    def outer(r, x):
        def body(i, x):
            return pltpu.roll(x, s_ref[i % 8], 0)
        return jax.lax.fori_loop(0, INNER, body, x)

    x = jax.lax.fori_loop(0, REPS, outer, x)
    o_ref[:] = x.astype(o_ref.dtype)


def timeit(fn, *args):
    fn(*args)[0].block_until_ready()  # compile+warm
    # chained timing: launch many, fetch scalar (tunnel-safe enough for ratios)
    t0 = time.perf_counter()
    out = None
    for _ in range(4):
        out = fn(*args)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / 4


def run(dtype, kind):
    x = jnp.ones((Z, L), jnp.float32)
    if kind == "ew":
        k = functools.partial(_ew_kernel, dtype=dtype)
        f = jax.jit(
            lambda x: pl.pallas_call(
                k,
                out_shape=(jax.ShapeDtypeStruct((Z, L), jnp.float32),),
            )(x)
        )
        t = timeit(f, x)
        ops = 4 * INNER * REPS  # 4 ops per body
    else:
        s = jnp.arange(8, dtype=jnp.int32) + 1
        k = functools.partial(_roll_kernel, dtype=dtype)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((Z, L), lambda b, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((Z, L), lambda b, *_: (0, 0),
                                    memory_space=pltpu.VMEM),),
        )
        f = jax.jit(
            lambda s, x: pl.pallas_call(
                k,
                grid_spec=grid_spec,
                out_shape=(jax.ShapeDtypeStruct((Z, L), jnp.float32),),
            )(s, x)
        )
        t = timeit(f, s, x)
        ops = INNER * REPS
    eps = Z * L * ops / t / 1e9
    print(f"{kind:4s} {jnp.dtype(dtype).name:10s} {t*1e3:8.2f} ms  "
          f"{eps:9.1f} Gelem-op/s")
    return t


def main():
    print(f"backend={jax.default_backend()} shape=({Z},{L}) "
          f"inner={INNER} reps={REPS}")
    base = run(jnp.float32, "ew")
    for d in (jnp.bfloat16, jnp.int32, jnp.int16, jnp.int8, jnp.float16):
        try:
            t = run(d, "ew")
            print(f"     -> vs f32: {base/t:.2f}x")
        except Exception as e:
            print(f"ew   {jnp.dtype(d).name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
    baser = run(jnp.float32, "roll")
    for d in (jnp.bfloat16, jnp.int16):
        try:
            t = run(d, "roll")
            print(f"     -> vs f32: {baser/t:.2f}x")
        except Exception as e:
            print(f"roll {jnp.dtype(d).name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
