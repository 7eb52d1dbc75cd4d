"""Round-2 throughput experiments on the fused layered kernel
(VERDICT r1 item 1: r=1/2 n=64800 fixed-25 min-sum toward 1 Gbit/s/chip).

Interleaved-arm discipline (bench/ab.py rationale): all variants compile
first, then timing rounds alternate arms so session drift hits everyone.
Run on real TPU: JAX_COMPILATION_CACHE_DIR=/root/jax_cache python
experiments/r2_opt.py [code] [iters]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(graph, spec, llr, chain, **kw):
    from ecc_ldpc_tpu.decode.pallas.layered_qc import (
        make_layered_pallas_decoder, supports,
    )

    msg_dtype = jnp.float32 if supports(graph, msg_bytes=4) else jnp.bfloat16
    dec = make_layered_pallas_decoder(
        graph, alpha=0.8125, max_iters=kw.pop("max_iters", 25),
        early_term=False, jit=False, msg_dtype=msg_dtype,
        llr_dtype=msg_dtype, **kw,
    )

    @jax.jit
    def run(llr):
        def body(_, l):
            res = dec(l)
            return l + 1e-9 * res.bits.astype(jnp.float32)
        out = jax.lax.fori_loop(0, chain, body, llr)
        return jnp.sum(out[:, 0])

    return run


def main():
    code = sys.argv[1] if len(sys.argv) > 1 else "dvbs2/64800/12"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    from ecc_ldpc_tpu.chan import awgn_llr
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.encode.structured import build_encoder
    from ecc_ldpc_tpu.graph.qc import compile_qc_graph

    spec = get_code(code)
    graph = compile_qc_graph(spec)
    enc = build_encoder(spec)
    key = jax.random.key(0)
    batch = 1024
    chain = 4
    msg = jax.random.bernoulli(key, 0.5, (batch, spec.k)).astype(jnp.uint8)
    llr = awgn_llr(jax.random.fold_in(key, 1), enc(msg), 1.5, spec.rate)

    variants = [
        ("scratch", dict(carry="scratch")),
        ("ssa", dict(carry="ssa")),
        ("ssa_abs", dict(carry="ssa_abs")),
    ]
    built = []
    for name, kw in variants:
        t0 = time.perf_counter()
        run = build(graph, spec, llr, chain, max_iters=iters, **kw)
        float(run(llr))  # compile + warm
        print(f"{name}: built+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        built.append((name, run))

    reps = 7
    times = {name: [] for name, _ in built}
    for _ in range(reps):
        for name, run in built:
            t0 = time.perf_counter()
            float(run(llr))
            times[name].append(time.perf_counter() - t0)
    bits = batch * spec.k * chain
    base = None
    for name, _ in built:
        mbps = bits / float(np.median(times[name])) / 1e6
        base = base or mbps
        print(f"{name}: {mbps:8.1f} Mbit/s/chip  ({mbps/base:+.2%} vs arm0)"
              .replace("+100.00%", "baseline"), flush=True)


if __name__ == "__main__":
    main()
