"""bf16 message storage vs f32 oracle: BER-band equivalence
(SURVEY.md §4.2 — statistical validation where bit-exactness is waived)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes.ieee80211n import surrogate_base
from ecc_ldpc_tpu.codes.qc import QCCode, expand_qc
from ecc_ldpc_tpu.decode.pallas.layered_qc import make_layered_pallas_decoder
from ecc_ldpc_tpu.encode.structured import DualDiagonalEncoder
from ecc_ldpc_tpu.graph.qc import compile_qc_graph

pytestmark = pytest.mark.slow


def test_bf16_messages_match_f32_ber():
    base = surrogate_base(mb=8, nb=24, Z=16, seed=44)
    spec = expand_qc(QCCode(Z=16, base=base), name="bf16test", k=16 * 16)
    qg = compile_qc_graph(spec)
    enc = DualDiagonalEncoder(spec)
    key = jax.random.key(0)
    B = 256
    msg = jax.random.bernoulli(key, 0.5, (B, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    llr = awgn_llr(jax.random.fold_in(key, 1), cw, 2.8, spec.rate)
    errs = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        dec = make_layered_pallas_decoder(
            qg, alpha=0.8125, max_iters=20, early_term=True,
            batch_tile=128, msg_dtype=dt, llr_dtype=dt,
        )
        res = dec(llr)
        errs[name] = int((np.asarray(res.bits) != np.asarray(cw)).any(1).sum())
    # frame-error counts within binomial noise of each other
    assert abs(errs["bf16"] - errs["f32"]) <= max(5, 0.5 * errs["f32"] + 5), errs
