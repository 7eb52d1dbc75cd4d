"""Interpret-mode parity of the fused xor-perm layered kernel
(decode/pallas/layered_xor.py) against its XLA oracle twin
(decode/xla/layered.py, sign_mode='bitxor') — the standard native-tier
test strategy (SURVEY.md §4.2 item 3). In interpret mode the one-hot
perm dot is an exact f32 selection, so the twins must be BIT-identical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.codes.qc import QCXorCode, expand_qc_xor
from ecc_ldpc_tpu.decode.pallas import layered_xor
from ecc_ldpc_tpu.decode.xla.layered import make_layered_decoder
from ecc_ldpc_tpu.graph.qc import compile_qc_graph


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(3)
    Z = 16
    base = rng.integers(0, Z, size=(4, 8)).astype(np.int32)
    spec = expand_qc_xor(QCXorCode(Z=Z, base=base), name="toyxor16")
    return spec, compile_qc_graph(spec)


@pytest.mark.parametrize("early_term", [True, False])
def test_bit_exact_vs_oracle(toy, early_term):
    spec, g = toy
    assert layered_xor.supports(g)
    key = jax.random.key(7)
    # all-zero codeword + AWGN at a mixed-convergence operating point so
    # the freeze path sees converged, converging, and stuck lanes
    llr = 2.2 + 2.0 * jax.random.normal(key, (96, spec.n))
    kdec = layered_xor.make_layered_xor_decoder(
        g, alpha=0.8125, max_iters=12, early_term=early_term,
        batch_tile=128,
    )
    odec = make_layered_decoder(g, alpha=0.8125, max_iters=12,
                                early_term=early_term)
    kr, orr = kdec(llr), odec(llr)
    np.testing.assert_array_equal(np.asarray(kr.bits), np.asarray(orr.bits))
    np.testing.assert_array_equal(np.asarray(kr.ok), np.asarray(orr.ok))
    np.testing.assert_array_equal(
        np.asarray(kr.iterations), np.asarray(orr.iterations)
    )
    # the operating point exercised both converged and struggling lanes
    its = np.asarray(kr.iterations)
    assert (np.asarray(kr.ok)).any() and its.max() > 1
    if early_term:
        assert its.min() < its.max()  # freeze path took effect


def test_multi_tile_batches(toy):
    """Batches above one tile run through the pallas grid; results must
    equal the single-tile decode of each slice."""
    spec, g = toy
    key = jax.random.key(9)
    llr = 2.5 + 1.5 * jax.random.normal(key, (256, spec.n))
    dec = layered_xor.make_layered_xor_decoder(
        g, alpha=0.8125, max_iters=8, batch_tile=128,
    )
    whole = dec(llr)
    parts = [dec(llr[i:i + 128]) for i in (0, 128)]
    np.testing.assert_array_equal(
        np.asarray(whole.bits),
        np.concatenate([np.asarray(p.bits) for p in parts]),
    )
    np.testing.assert_array_equal(
        np.asarray(whole.ok),
        np.concatenate([np.asarray(p.ok) for p in parts]),
    )


def test_8023an_dispatch_and_noiseless():
    """Auto dispatch on CPU stays on the XLA tier (kernel is TPU-gated
    through backend='pallas'); the kernel itself decodes noiseless input
    in 0 iterations on the real family."""
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode import get_decoder

    spec = get_code("8023an")
    g = compile_qc_graph(spec)
    dec = get_decoder(g, "layered/norm:0.8125/25", backend="pallas")
    llr = jnp.full((8, spec.n), 17.0)
    res = dec(llr)
    assert np.asarray(res.ok).all()
    assert (np.asarray(res.iterations) == 0).all()


def test_rejects_unsupported():
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode import get_decoder

    spec = get_code("8023an")
    g = compile_qc_graph(spec)
    with pytest.raises(ValueError, match="minsum"):
        get_decoder(g, "layered/spa/25", backend="pallas")
    with pytest.raises(ValueError, match="scalar"):
        layered_xor.make_layered_xor_decoder(g, alpha=np.ones(25))


@pytest.mark.parametrize("early_term", [True, False])
def test_flooding_schedule_bit_exact(toy, early_term):
    """schedule='flooding' twins decode/xla/flooding_qc (count sign
    semantics, stale totals, pre-sweep-verified freeze)."""
    from ecc_ldpc_tpu.decode.xla.flooding_qc import decode_flooding_qc

    spec, g = toy
    key = jax.random.key(13)
    llr = 2.2 + 2.0 * jax.random.normal(key, (96, spec.n))
    kdec = layered_xor.make_layered_xor_decoder(
        g, alpha=0.8125, max_iters=12, early_term=early_term,
        batch_tile=128, schedule="flooding",
    )
    kr = kdec(llr)
    orr = decode_flooding_qc(g, llr, kind="minsum", alpha=0.8125,
                             max_iters=12, early_term=early_term)
    np.testing.assert_array_equal(np.asarray(kr.bits), np.asarray(orr.bits))
    np.testing.assert_array_equal(np.asarray(kr.ok), np.asarray(orr.ok))
    np.testing.assert_array_equal(
        np.asarray(kr.iterations), np.asarray(orr.iterations)
    )


def test_flooding_dispatch_routes_to_kernel(toy):
    """backend='pallas' + kind='minsum' on an xor graph builds the
    flooding xor kernel (loop.py routing)."""
    from ecc_ldpc_tpu.decode import make_decoder

    spec, g = toy
    dec = make_decoder(g, "minsum", alpha=0.8125, max_iters=6,
                       backend="pallas")
    llr = jnp.full((8, spec.n), 15.0)
    res = dec(llr)
    assert np.asarray(res.ok).all()
    assert (np.asarray(res.iterations) == 0).all()
    with pytest.raises(ValueError, match="flooding minsum"):
        make_decoder(g, "spa", backend="pallas")
