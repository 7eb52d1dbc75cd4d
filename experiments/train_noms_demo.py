"""Learned per-iteration min-sum (NOMS) demo: train through the decoder,
evaluate against plain and hand-tuned normalized min-sum.

Measured 2026-08-17 (CPU, 80211n/648/12, T=8 fixed iterations,
held-out noise, 8192 frames):

  warm start (init_alpha=0.8125, steps=400, lr=5e-3, EbN0 1.8-2.6):
    EbN0=2.0: learned 388 frame errors vs norm-0.8125's 455  (-15%)
    EbN0=2.5: learned  26 frame errors vs norm-0.8125's  32  (-19%)
    learned alphas ramp 0.68 -> ~0.92, betas grow 0.1 -> 0.29 —
    the NOMS-paper shape (damp early iterations, trust later ones).

  cold start (init_alpha=1.0 plain min-sum, steps=300):
    recovers hand-tuned-alpha performance automatically
    (261 vs 247 FE at 2.0 dB; plain min-sum: 757) — i.e. the trainer
    replaces manual alpha tuning per code family.

Run: python experiments/train_noms_demo.py
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ecc_ldpc_tpu.chan import awgn_llr  # noqa: E402
from ecc_ldpc_tpu.codes import get_code  # noqa: E402
from ecc_ldpc_tpu.decode.xla.layered import make_layered_decoder  # noqa: E402
from ecc_ldpc_tpu.encode.structured import build_encoder  # noqa: E402
from ecc_ldpc_tpu.graph import compile_qc_graph  # noqa: E402
from ecc_ldpc_tpu.learn import train_noms  # noqa: E402

T = 8
spec = get_code("80211n/648/12")
qg = compile_qc_graph(spec)
enc = build_encoder(spec)

params, losses = train_noms(
    "80211n/648/12", iters=T, steps=400, batch=128, seed=5,
    ebn0_range=(1.8, 2.6), init_alpha=0.8125, lr=5e-3,
)
print("alphas:", np.round(np.asarray(params.alphas), 3))
print("betas: ", np.round(np.asarray(params.betas), 3))

key = jax.random.key(4321)
msg = jax.random.bernoulli(key, 0.5, (8192, spec.k)).astype(jnp.uint8)
cw = enc(msg)
for ebn0 in (2.0, 2.5):
    llr = awgn_llr(jax.random.fold_in(key, int(ebn0 * 10)), cw, ebn0, spec.rate)
    row = {}
    for label, a, b, sm in (
        ("plain", 1.0, 0.0, "bitxor"),
        ("norm0.8125", 0.8125, 0.0, "bitxor"),
        ("learned", params.alphas, params.betas, "count"),
    ):
        r = make_layered_decoder(qg, alpha=a, beta=b, max_iters=T,
                                 early_term=False, sign_mode=sm)(llr)
        row[label] = int((np.asarray(r.bits) != np.asarray(cw)).any(axis=1).sum())
    print(f"EbN0={ebn0} T={T}: frame errors/8192: {row}")
