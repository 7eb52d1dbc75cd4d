"""Flooding QC kernel vs its jnp oracle twin — bit-exact in f32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes.ieee80211n import surrogate_base
from ecc_ldpc_tpu.codes.qc import QCCode, expand_qc
from ecc_ldpc_tpu.decode import make_decoder
from ecc_ldpc_tpu.decode.pallas.flooding_qc import make_flooding_pallas_decoder
from ecc_ldpc_tpu.decode.xla.flooding_qc import decode_flooding_qc
from ecc_ldpc_tpu.encode.structured import DualDiagonalEncoder
from ecc_ldpc_tpu.graph import compile_graph
from ecc_ldpc_tpu.graph.qc import compile_qc_graph


@pytest.fixture(scope="module")
def z16():
    base = surrogate_base(mb=4, nb=12, Z=16, seed=99)
    spec = expand_qc(QCCode(Z=16, base=base), name="test.z16f", k=8 * 16)
    return spec, compile_qc_graph(spec), DualDiagonalEncoder(spec)


def _tx(spec, enc, B, ebn0, seed=0):
    key = jax.random.key(seed)
    msg = jax.random.bernoulli(key, 0.5, (B, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    return cw, awgn_llr(jax.random.fold_in(key, 1), cw, ebn0, spec.rate)


@pytest.mark.parametrize("early_term", [True, False])
def test_flooding_qc_matches_twin(z16, early_term):
    spec, qg, enc = z16
    cw, llr = _tx(spec, enc, 48, 3.0)
    a = jax.jit(lambda l: decode_flooding_qc(
        qg, l, alpha=0.8125, max_iters=12, early_term=early_term))(llr)
    b = make_flooding_pallas_decoder(
        qg, alpha=0.8125, max_iters=12, early_term=early_term, batch_tile=32
    )(llr)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.array_equal(np.asarray(a.iterations), np.asarray(b.iterations))


def test_flooding_qc_agrees_with_gather_oracle(z16):
    """Same algorithm as the expanded-graph flooding decoder: identical
    decisions on converged frames (sum order differs -> compare ok set)."""
    spec, qg, enc = z16
    cw, llr = _tx(spec, enc, 64, 3.0, seed=4)
    a = jax.jit(lambda l: decode_flooding_qc(
        qg, l, alpha=0.8125, max_iters=20))(llr)
    g = compile_graph(spec)
    b = make_decoder(g, "minsum", alpha=0.8125, max_iters=20, backend="xla")(llr)
    ok = np.asarray(a.ok) & np.asarray(b.ok)
    assert ok.mean() > 0.9
    assert np.array_equal(np.asarray(a.bits)[ok], np.asarray(b.bits)[ok])
    # same convergence profile
    assert abs(np.asarray(a.iterations)[ok].mean()
               - np.asarray(b.iterations)[ok].mean()) <= 1.25  # on-the-fly lag
