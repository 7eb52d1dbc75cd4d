"""Measure layered-kernel throughput vs replica over-packing factor R on
the real TPU, to set _ZP_TARGET (decode/pallas/layered_qc.py).

  JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/pack_sweep.py
"""
import jax
import jax.numpy as jnp

from ecc_ldpc_tpu.bench.throughput import chained_decode_time
from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.decode.pallas.layered_qc import make_layered_pallas_decoder
from ecc_ldpc_tpu.encode.structured import build_encoder
from ecc_ldpc_tpu.graph.qc import compile_qc_graph

CASES = [
    # (code, packs to try)  r_min: Z=27 -> 8, Z=54 -> 4, Z=24 -> 1, Z=96 -> 1
    ("80211n/648/12", [8, 16, 32]),
    ("80211n/1296/12", [4, 8, 16]),
    ("wimax/576/12", [1, 2, 4, 8, 16]),
    ("wimax/2304/56", [1, 2, 4]),
    ("dvbs2/16200/12", [1, 2]),
]

for name, packs in CASES:
    spec = get_code(name)
    qg = compile_qc_graph(spec)
    enc = build_encoder(spec)
    key = jax.random.key(0)
    B = 2048
    msg = jax.random.bernoulli(key, 0.5, (B, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    llr = awgn_llr(jax.random.fold_in(key, 1), cw, ebn0_db=2.5, rate=spec.rate)
    for R in packs:
        try:
            # same dtype policy as decode/api.py: f32 when it fits VMEM
            from ecc_ldpc_tpu.decode.pallas.layered_qc import supports
            dt = jnp.float32 if supports(qg, msg_bytes=4) else jnp.bfloat16
            dec = make_layered_pallas_decoder(
                qg, alpha=0.8125, max_iters=25, early_term=False, pack=R,
                msg_dtype=dt, llr_dtype=dt,
            )
            wall = chained_decode_time(dec, llr, chain=10)
            mbps = B * spec.k / wall / 1e6
            print(f"{name:18s} Z={qg.Z:3d} R={R:3d} Zp={qg.Z*R:4d} "
                  f"{mbps:8.1f} Mbit/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} R={R}: FAILED {type(e).__name__}: {e}",
                  flush=True)
