"""Round-2b flagship experiments: last micro-levers toward 1 Gbit/s on
dvbs2/64800/12 fixed-25 min-sum (base: static rows, 986.9 in bench.py),
plus a confirmation that the early-term production leg compiles again
after gating auto-static to fixed-iteration mode.

Run on real TPU: JAX_COMPILATION_CACHE_DIR=/root/jax_cache python
experiments/r2b_opt.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ecc_ldpc_tpu.bench.throughput import chained_decode_time
    from ecc_ldpc_tpu.chan import awgn_llr
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode.pallas.layered_qc import (
        make_layered_pallas_decoder, supports,
    )
    from ecc_ldpc_tpu.encode.structured import build_encoder
    from ecc_ldpc_tpu.graph.qc import compile_qc_graph

    spec = get_code("dvbs2/64800/12")
    graph = compile_qc_graph(spec)
    enc = build_encoder(spec)
    key = jax.random.key(0)

    def mk_llr(batch):
        msg = jax.random.bernoulli(key, 0.5, (batch, spec.k)).astype(jnp.uint8)
        return awgn_llr(jax.random.fold_in(key, 1), enc(msg), 1.5, spec.rate)

    llr2k = mk_llr(2048)
    llr4k = mk_llr(4096)
    md = jnp.float32 if supports(graph, msg_bytes=4) else jnp.bfloat16

    def build(**kw):
        return make_layered_pallas_decoder(
            graph, alpha=0.8125, max_iters=25, early_term=False,
            msg_dtype=md, llr_dtype=md, **kw,
        )

    variants = [
        ("base/2k", llr2k, dict()),
        ("scratch_abs/2k", llr2k, dict(carry="scratch_abs")),
        ("U2/2k", llr2k, dict(iter_unroll=2)),
        ("sabs+U2/2k", llr2k, dict(carry="scratch_abs", iter_unroll=2)),
        ("base/4k", llr4k, dict()),
    ]
    built = []
    for name, llr, kw in variants:
        try:
            t0 = time.perf_counter()
            dec = build(**kw)
            dec(llr)  # compile + warm
            print(f"{name}: built+warm {time.perf_counter()-t0:.0f}s",
                  flush=True)
            built.append((name, llr, dec))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for name, llr, dec in built:
        # chained_decode_time returns PER-DECODE device time
        dt = chained_decode_time(dec, llr, chain=8, tries=5)
        mbps = llr.shape[0] * spec.k / dt / 1e6
        print(f"{name}: {mbps:8.1f} Mbit/s/chip", flush=True)

    # production-leg confirmation (early_term + learned schedule)
    from ecc_ldpc_tpu.bench.throughput import run_benchmark
    try:
        prod = run_benchmark(
            code="dvbs2/64800/12",
            decoder="layered/sched:dvbs2_64800_12_T25_op2",
            batch=2048, ebn0_db=2.5,
        )
        print(f"prod_r12: {prod.throughput_mbps:.1f} Mbit/s/chip", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"prod_r12: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
