"""Small-code fused_mm throughput experiments (VERDICT r1 item 7:
mackay1008 at 127 Mbit/s vs its 343 Mbit/s HBM roofline).

SUPERSEDED by smallcode_opt2.py (round 3): the chain=10 timings here
carried a flat ~25 ms dispatch artifact (~2.6 ms/step), and the "bf16
neutral" conclusion was a layout effect — see DESIGN.md §3.6.

The incidence-matmul tier multiplies dense 0/1 operators, so it is
MXU-compute-bound, not HBM-bound: the interesting knobs are the matmul
input dtype (f32 runs the MXU at a fraction of bf16 rate) and the batch
tile (bigger [K, Bt] amortizes operator loads across lanes).

Interleaved-arm discipline as in r2_opt.py. Run on real TPU:
JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/smallcode_opt.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    code = sys.argv[1] if len(sys.argv) > 1 else "mackay1008"
    from ecc_ldpc_tpu.bench.throughput import chained_decode_time
    from ecc_ldpc_tpu.chan import awgn_llr
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode.pallas.fused_mm import make_pallas_decoder
    from ecc_ldpc_tpu.encode import DenseEncoder
    from ecc_ldpc_tpu.graph import compile_graph

    spec = get_code(code)
    graph = compile_graph(spec)
    enc = DenseEncoder.build(spec)
    key = jax.random.key(0)
    batch = 2048
    msg = jax.random.bernoulli(key, 0.5, (batch, spec.k)).astype(jnp.uint8)
    llr = awgn_llr(jax.random.fold_in(key, 1), enc(msg), 2.0, spec.rate)

    variants = [
        ("f32/Bt128", dict(mxu_dtype=jnp.float32, batch_tile=128)),
        ("bf16/Bt128", dict(mxu_dtype=jnp.bfloat16, batch_tile=128)),
        ("bf16/Bt256", dict(mxu_dtype=jnp.bfloat16, batch_tile=256)),
        ("bf16/Bt512", dict(mxu_dtype=jnp.bfloat16, batch_tile=512)),
        ("f32/Bt256", dict(mxu_dtype=jnp.float32, batch_tile=256)),
    ]
    built = []
    for name, kw in variants:
        try:
            dec = make_pallas_decoder(
                graph, "minsum", alpha=0.8125, max_iters=25,
                early_term=False, **kw,
            )
            t0 = time.perf_counter()
            r = dec(llr)
            fer = float(jnp.mean(~r.ok))
            print(f"{name}: built+warm {time.perf_counter()-t0:.1f}s "
                  f"FER@2dB={fer:.4f}", flush=True)
            built.append((name, dec))
        except Exception as e:  # noqa: BLE001 — record and move on
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    for name, dec in built:
        # chained_decode_time returns PER-DECODE device time
        dt = chained_decode_time(dec, llr, chain=10, tries=3)
        mbps = batch * spec.k / dt / 1e6
        print(f"{name}: {mbps:8.1f} Mbit/s/chip", flush=True)


if __name__ == "__main__":
    sys.exit(main())
