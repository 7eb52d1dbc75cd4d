"""Post-decode remedies: bit-flip cleanup and decoder-diversity retry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.decode import get_decoder, make_decoder, with_retry
from ecc_ldpc_tpu.decode.xla.cleanup import bitflip_cleanup
from ecc_ldpc_tpu.encode.structured import build_encoder
from ecc_ldpc_tpu.graph import compile_graph, compile_qc_graph


@pytest.fixture(scope="module")
def code():
    spec = get_code("80211n/648/12")
    return spec, compile_qc_graph(spec), build_encoder(spec)


def test_cleanup_repairs_isolated_flips(code):
    spec, qg, enc = code
    key = jax.random.key(0)
    msg = jax.random.bernoulli(key, 0.5, (8, spec.k)).astype(jnp.uint8)
    cw = np.asarray(enc(msg))
    bad = cw.copy()
    for b in range(8):
        bad[b, (37 + 61 * b) % spec.n] ^= 1
    bits, ok = bitflip_cleanup(qg, jnp.asarray(bad))
    assert np.array_equal(np.asarray(bits), cw)
    assert np.asarray(ok).all()
    # codewords pass through untouched
    bits2, ok2 = bitflip_cleanup(qg, jnp.asarray(cw))
    assert np.array_equal(np.asarray(bits2), cw)
    assert np.asarray(ok2).all()


def test_cleanup_spec_flag_and_guard(code):
    spec, qg, enc = code
    dec = get_decoder(qg, "layered/norm:0.8125/10/cleanup")
    key = jax.random.key(3)
    msg = jax.random.bernoulli(key, 0.5, (16, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    llr = awgn_llr(jax.random.fold_in(key, 1), cw, 3.0, spec.rate)
    res = dec(llr)
    assert res.bits.shape == (16, spec.n)
    with pytest.raises(TypeError, match="QCGraph"):
        make_decoder(compile_graph(spec), cleanup=True)


def test_with_retry_recovers_failures(code):
    """A 2-iteration primary fails plenty of frames at low SNR; the
    spa/25 fallback must recover some and never un-fix a frame."""
    spec, qg, enc = code
    key = jax.random.key(5)
    msg = jax.random.bernoulli(key, 0.5, (128, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    llr = awgn_llr(jax.random.fold_in(key, 1), cw, 2.5, spec.rate)
    primary = make_decoder(qg, kind="layered", alpha=0.8125, max_iters=2)
    fallback = make_decoder(qg, kind="spa", max_iters=25)
    plain = primary(llr)
    combo = with_retry(primary, fallback)(llr)
    fe_plain = int((np.asarray(plain.bits) != np.asarray(cw)).any(axis=1).sum())
    fe_combo = int((np.asarray(combo.bits) != np.asarray(cw)).any(axis=1).sum())
    assert fe_plain > 0
    assert fe_combo < fe_plain
    # frames the primary already validated are untouched
    okp = np.asarray(plain.ok)
    assert np.array_equal(np.asarray(combo.bits)[okp],
                          np.asarray(plain.bits)[okp])
