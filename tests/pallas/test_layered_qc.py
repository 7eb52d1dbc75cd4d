"""Pallas layered QC kernel vs XLA layered oracle — interpret mode, CPU,
bit-exact (SURVEY.md §4.2 item 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes.ieee80211n import surrogate_base
from ecc_ldpc_tpu.codes.qc import QCCode, expand_qc
from ecc_ldpc_tpu.decode.pallas.layered_qc import (
    make_layered_pallas_decoder,
    supports,
)
from ecc_ldpc_tpu.decode.xla.layered import make_layered_decoder
from ecc_ldpc_tpu.encode.structured import DualDiagonalEncoder
from ecc_ldpc_tpu.graph.qc import compile_qc_graph


@pytest.fixture(scope="module")
def z16_code():
    base = surrogate_base(mb=4, nb=12, Z=16, seed=99)
    spec = expand_qc(QCCode(Z=16, base=base), name="test.z16", k=8 * 16)
    return spec, compile_qc_graph(spec), DualDiagonalEncoder(spec)


def _tx(spec, enc, B, ebn0, seed=0):
    key = jax.random.key(seed)
    msg = jax.random.bernoulli(key, 0.5, (B, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    return cw, awgn_llr(jax.random.fold_in(key, 1), cw, ebn0, spec.rate)


def test_pallas_layered_fixed_mode_matches_oracle(z16_code):
    """Pure fixed-iteration mode: bit-exact vs the oracle's pure mode."""
    spec, qg, enc = z16_code
    cw, llr = _tx(spec, enc, 32, 3.0)
    a = make_layered_decoder(qg, alpha=0.8125, max_iters=8, early_term=False)(llr)
    b = make_layered_pallas_decoder(
        qg, alpha=0.8125, max_iters=8, early_term=False, batch_tile=32
    )(llr)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.all(np.asarray(a.iterations) == 8)
    assert np.all(np.asarray(b.iterations) == 8)


def test_fixed_vs_early_term_consistency(z16_code):
    """Fixed mode has no freeze, so bits can differ on unconverged frames,
    but both modes must agree on frames the et-mode converged early AND
    report the same ok truthfully."""
    spec, qg, enc = z16_code
    cw, llr = _tx(spec, enc, 32, 4.0, seed=11)
    a = make_layered_pallas_decoder(qg, alpha=0.8125, max_iters=12,
                                    early_term=True, batch_tile=32)(llr)
    b = make_layered_pallas_decoder(qg, alpha=0.8125, max_iters=12,
                                    early_term=False, batch_tile=32)(llr)
    ok = np.asarray(a.ok) & np.asarray(b.ok)
    assert ok.mean() > 0.8
    assert np.array_equal(np.asarray(a.bits)[ok], np.asarray(b.bits)[ok])


@pytest.mark.parametrize("alpha,beta", [(1.0, 0.0), (0.8125, 0.0), (1.0, 0.1)])
@pytest.mark.parametrize("early_term", [True])
def test_pallas_layered_matches_oracle(z16_code, alpha, beta, early_term):
    spec, qg, enc = z16_code
    cw, llr = _tx(spec, enc, 32, 3.0)
    a = make_layered_decoder(qg, alpha=alpha, beta=beta, max_iters=12,
                             early_term=early_term)(llr)
    b = make_layered_pallas_decoder(
        qg, alpha=alpha, beta=beta, max_iters=12, early_term=early_term,
        batch_tile=32,
    )(llr)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.array_equal(np.asarray(a.iterations), np.asarray(b.iterations))


def test_pallas_layered_multi_tile_and_pad(z16_code):
    spec, qg, enc = z16_code
    cw, llr = _tx(spec, enc, 50, 2.5, seed=3)  # pads 50 -> 64, 2 tiles of 32
    a = make_layered_decoder(qg, alpha=0.8125, max_iters=10)(llr)
    b = make_layered_pallas_decoder(qg, alpha=0.8125, max_iters=10,
                                    batch_tile=32)(llr)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.iterations), np.asarray(b.iterations))


@pytest.mark.parametrize("sign_mode", ["count", "bitxor"])
def test_sign_modes_match_oracle(z16_code, sign_mode):
    """Both sign semantics stay bit-exact with their oracle twin; the two
    modes differ only on sign of exact-zero messages (-0.0), so decoded
    bits agree on this noisy batch either way."""
    spec, qg, enc = z16_code
    cw, llr = _tx(spec, enc, 32, 3.0, seed=21)
    a = make_layered_decoder(qg, alpha=0.8125, max_iters=10,
                             sign_mode=sign_mode)(llr)
    b = make_layered_pallas_decoder(qg, alpha=0.8125, max_iters=10,
                                    batch_tile=32, sign_mode=sign_mode)(llr)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.iterations), np.asarray(b.iterations))


@pytest.mark.parametrize("early_term", [True, False])
def test_per_iteration_schedule_matches_oracle(z16_code, early_term):
    """Learned NOMS schedules: per-iteration alpha_t/beta_t arrays flow
    through the kernel via SMEM and must stay bit-exact with the oracle
    (both take the capped magnitude branch)."""
    spec, qg, enc = z16_code
    cw, llr = _tx(spec, enc, 32, 3.0, seed=13)
    T = 8
    key = jax.random.key(2)
    alphas = jax.random.uniform(key, (T,), minval=0.6, maxval=1.1)
    betas = jax.random.uniform(jax.random.fold_in(key, 1), (T,),
                               minval=0.0, maxval=0.25)
    a = make_layered_decoder(qg, alpha=alphas, beta=betas, max_iters=T,
                             early_term=early_term)(llr)
    b = make_layered_pallas_decoder(qg, alpha=alphas, beta=betas,
                                    max_iters=T, early_term=early_term,
                                    batch_tile=32)(llr)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.array_equal(np.asarray(a.iterations), np.asarray(b.iterations))
    # and the schedule is actually in effect: constant-(alpha,beta) arrays
    # reproduce the scalar decoder exactly
    c = make_layered_pallas_decoder(qg, alpha=jnp.full((T,), 0.8125),
                                    beta=jnp.zeros((T,)), max_iters=T,
                                    early_term=early_term,
                                    batch_tile=32)(llr)
    d = make_layered_decoder(qg, alpha=0.8125, max_iters=T,
                             early_term=early_term)(llr)
    assert np.array_equal(np.asarray(c.bits), np.asarray(d.bits))


def test_supports_gate(z16_code):
    spec, qg, enc = z16_code
    assert supports(qg)


@pytest.mark.parametrize("Z,R", [(27, 8), (54, 4)])
def test_replica_packed_matches_oracle(Z, R):
    """Z % 8 != 0 codes run via replica packing: R = 8/gcd(Z,8) codewords
    interleaved along the sublane axis, global rolls scaled by R. Must be
    bit-exact vs the unpacked oracle in both modes, across a padded
    partial chunk and a multi-chunk batch."""
    base = surrogate_base(mb=4, nb=12, Z=Z, seed=1)
    spec = expand_qc(QCCode(Z=Z, base=base), name=f"t{Z}", k=8 * Z)
    qg = compile_qc_graph(spec)
    assert supports(qg)
    enc = DualDiagonalEncoder(spec)
    CW = 8 * R  # batch_tile=8 below
    cw, llr = _tx(spec, enc, CW + 5, 3.0, seed=5)
    for et in (True, False):
        a = make_layered_decoder(qg, alpha=0.8125, max_iters=6,
                                 early_term=et)(llr)
        b = make_layered_pallas_decoder(qg, alpha=0.8125, max_iters=6,
                                        early_term=et, batch_tile=8)(llr)
        assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits)), et
        assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok)), et
        assert np.array_equal(
            np.asarray(a.iterations), np.asarray(b.iterations)
        ), et

@pytest.mark.parametrize("Z,R", [(27, 16), (16, 8)])
def test_over_packed_matches_oracle(Z, R):
    """Over-packing (R beyond the minimum 8/gcd(Z,8), incl. R > 8 which
    exercises the widened [Rp, Bt] ok/iters outputs) is the same replica
    identity — must stay bit-exact vs the unpacked oracle in both modes."""
    base = surrogate_base(mb=4, nb=12, Z=Z, seed=2)
    spec = expand_qc(QCCode(Z=Z, base=base), name=f"op{Z}", k=8 * Z)
    qg = compile_qc_graph(spec)
    enc = DualDiagonalEncoder(spec)
    cw, llr = _tx(spec, enc, 8 * R + 3, 3.0, seed=9)
    for et in (True, False):
        a = make_layered_decoder(qg, alpha=0.8125, max_iters=6,
                                 early_term=et)(llr)
        b = make_layered_pallas_decoder(qg, alpha=0.8125, max_iters=6,
                                        early_term=et, batch_tile=8,
                                        pack=R)(llr)
        assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits)), et
        assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok)), et
        assert np.array_equal(
            np.asarray(a.iterations), np.asarray(b.iterations)
        ), et


def test_bad_pack_rejected():
    base = surrogate_base(mb=4, nb=12, Z=27, seed=2)
    spec = expand_qc(QCCode(Z=27, base=base), name="bp", k=8 * 27)
    qg = compile_qc_graph(spec)
    with pytest.raises(ValueError):
        make_layered_pallas_decoder(qg, pack=4)  # not a multiple of 8
