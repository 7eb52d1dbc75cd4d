"""Layered-schedule decoder tests (SURVEY.md §4.2 item 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes import ieee80211n
from ecc_ldpc_tpu.decode import make_decoder
from ecc_ldpc_tpu.decode.xla.layered import make_layered_decoder
from ecc_ldpc_tpu.encode.structured import DualDiagonalEncoder
from ecc_ldpc_tpu.graph import compile_graph, compile_qc_graph


@pytest.fixture(scope="module")
def qc_code():
    spec = ieee80211n(648, "12")
    return spec, compile_qc_graph(spec), DualDiagonalEncoder(spec)


def _tx(spec, enc, B, ebn0, seed=0):
    key = jax.random.key(seed)
    msg = jax.random.bernoulli(key, 0.5, (B, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    return cw, awgn_llr(jax.random.fold_in(key, 1), cw, ebn0, spec.rate)


def test_layered_noiseless(qc_code):
    spec, qg, enc = qc_code
    cw, _ = _tx(spec, enc, 8, 2.0)
    llr = (1.0 - 2.0 * cw.astype(jnp.float32)) * 8.0
    res = make_layered_decoder(qg, max_iters=10)(llr)
    assert np.all(np.asarray(res.ok))
    assert np.asarray(res.iterations).max() == 0
    assert np.array_equal(np.asarray(res.bits), np.asarray(cw))


def test_layered_corrects_and_validates(qc_code):
    spec, qg, enc = qc_code
    cw, llr = _tx(spec, enc, 64, 2.5, seed=3)
    res = make_layered_decoder(qg, alpha=0.8125, max_iters=25)(llr)
    ok = np.asarray(res.ok)
    bits = np.asarray(res.bits)
    assert ok.mean() > 0.9
    assert spec.check_syndrome(bits[ok])  # claimed-ok frames are codewords


def test_layered_converges_faster_than_flooding(qc_code):
    """The defining property of the layered schedule: ~2x fewer iterations
    to the same fixed points (SURVEY.md §4.2)."""
    spec, qg, enc = qc_code
    cw, llr = _tx(spec, enc, 128, 2.2, seed=5)
    lay = make_layered_decoder(qg, alpha=0.8125, max_iters=30)(llr)
    g = compile_graph(spec)
    flo = make_decoder(g, "minsum", alpha=0.8125, max_iters=30, backend="xla")(llr)
    it_l = np.asarray(lay.iterations)[np.asarray(lay.ok)].mean()
    it_f = np.asarray(flo.iterations)[np.asarray(flo.ok)].mean()
    # layered uses ~half the iterations of flooding (+ ~1 iteration of
    # on-the-fly convergence-detection lag)
    assert it_l < 0.8 * it_f, (it_l, it_f)
    # and no worse in errors (statistical slack)
    fe_l = (np.asarray(lay.bits) != np.asarray(cw)).any(1).sum()
    fe_f = (np.asarray(flo.bits) != np.asarray(cw)).any(1).sum()
    assert fe_l <= fe_f + 2


def test_layered_spec_string(qc_code):
    spec, qg, enc = qc_code
    from ecc_ldpc_tpu.decode import get_decoder

    dec = get_decoder(qg, "layered/norm:0.8125/20")
    cw, llr = _tx(spec, enc, 16, 3.0, seed=7)
    res = dec(llr)
    assert res.bits.shape == (16, spec.n)


def test_layered_requires_qc_graph(qc_code):
    spec, _, _ = qc_code
    g = compile_graph(spec)
    with pytest.raises(TypeError):
        make_layered_decoder(g)


def test_early_terminated_frames_satisfy_syndrome(qc_code):
    """Exactness of the early-termination criterion: a frame that froze
    BEFORE the iteration cap must satisfy the true posterior syndrome.
    (The on-the-fly per-layer parity alone can pass while posteriors are
    still moving — freezing on it was a measured ~3e-4 detected-failure
    floor on DVB-S2; convergence now additionally requires zero sign
    flips during the sweep, which makes pass exact.)"""
    spec, qg, enc = qc_code
    cw, llr = _tx(spec, enc, 512, 1.8, seed=17)  # marginal SNR, many paths
    res = make_decoder(qg, kind="layered", alpha=0.8125, max_iters=12)(llr)
    it = np.asarray(res.iterations)
    ok = np.asarray(res.ok)
    early = it < 12
    assert early.any()
    assert np.all(ok[early]), "frame froze early without a valid codeword"


def test_layered_sweep_runs():
    """End-to-end through the Monte-Carlo harness with a layered decoder."""
    from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec, run_sweep

    res = run_sweep(SweepSpec(
        code="80211n/648/12", decoder="layered/norm:0.8125/15",
        ebn0_db=(2.5,), batch=64,
        stopping=StoppingRule(min_frame_errors=2, max_frames=128),
    ))
    assert res[0].frames >= 64 and res[0].mean_iters > 0
