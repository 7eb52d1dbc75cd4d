"""Pallas fused kernel vs XLA oracle tier, interpret mode on CPU
(SURVEY.md §4.2 item 3: the XLA tier is the mock for the native tier —
bit-identical hard decisions and iteration counts required)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes import gallager_36, mackay_1008
from ecc_ldpc_tpu.decode import make_decoder
from ecc_ldpc_tpu.encode import DenseEncoder
from ecc_ldpc_tpu.graph import compile_graph


@pytest.fixture(scope="module")
def small():
    spec = gallager_36(96, seed=4)
    return spec, compile_graph(spec), DenseEncoder.build(spec)


def _llr(spec, enc, B, ebn0, seed=0):
    key = jax.random.key(seed)
    msg = jax.random.bernoulli(key, 0.5, (B, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    return cw, awgn_llr(jax.random.fold_in(key, 1), cw, ebn0, spec.rate)


@pytest.mark.parametrize("kind,alpha,beta", [
    ("minsum", 1.0, 0.0),
    ("minsum", 0.8125, 0.0),
    ("minsum", 1.0, 0.15),
    ("spa", 1.0, 0.0),
])
def test_pallas_matches_oracle(small, kind, alpha, beta):
    spec, graph, enc = small
    cw, llr = _llr(spec, enc, 32, 2.5)
    a = make_decoder(graph, kind, alpha=alpha, beta=beta, max_iters=15,
                     backend="xla-mm")(llr)
    b = make_decoder(graph, kind, alpha=alpha, beta=beta, max_iters=15,
                     backend="pallas")(llr)
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.array_equal(np.asarray(a.iterations), np.asarray(b.iterations))


def test_pallas_fixed_vs_early_term(small):
    spec, graph, enc = small
    cw, llr = _llr(spec, enc, 32, 2.5, seed=7)
    a = make_decoder(graph, "minsum", max_iters=15, early_term=True,
                     backend="pallas")(llr)
    b = make_decoder(graph, "minsum", max_iters=15, early_term=False,
                     backend="pallas")(llr)
    # fixed-iteration mode is PURE (no freeze — benchmark semantics, twin
    # of the layered kernel's): converged frames keep iterating, which is
    # sign-stable, so bits/ok agree; iterations report the fixed count
    assert np.array_equal(np.asarray(a.bits), np.asarray(b.bits))
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.all(np.asarray(b.iterations) == 15)


def test_pallas_nonaligned_batch(small):
    """Batch not a multiple of the tile: padding must not leak."""
    spec, graph, enc = small
    cw, llr = _llr(spec, enc, 77, 3.0, seed=3)
    res = make_decoder(graph, "minsum", max_iters=10, backend="pallas")(llr)
    assert res.bits.shape == (77, spec.n)
    ref = make_decoder(graph, "minsum", max_iters=10, backend="xla-mm")(llr)
    assert np.array_equal(np.asarray(res.bits), np.asarray(ref.bits))


def test_pallas_multi_tile(small):
    """B > tile: grid iteration over batch tiles."""
    spec, graph, enc = small
    cw, llr = _llr(spec, enc, 256, 2.0, seed=9)
    res = make_decoder(graph, "minsum", max_iters=8, backend="pallas")(llr)
    ref = make_decoder(graph, "minsum", max_iters=8, backend="xla-mm")(llr)
    assert np.array_equal(np.asarray(res.bits), np.asarray(ref.bits))
    assert np.array_equal(np.asarray(res.iterations), np.asarray(ref.iterations))


def test_pallas_mackay1008(small):
    spec = mackay_1008()
    graph = compile_graph(spec)
    enc = DenseEncoder.build(spec)
    cw, llr = _llr(spec, enc, 64, 2.0, seed=1)
    res = make_decoder(graph, "minsum", alpha=0.8125, max_iters=25,
                       backend="pallas")(llr)
    ref = make_decoder(graph, "minsum", alpha=0.8125, max_iters=25,
                       backend="xla-mm")(llr)
    assert np.array_equal(np.asarray(res.bits), np.asarray(ref.bits))


@pytest.mark.parametrize("kind", ["minsum", "spa"])
def test_pallas_irregular_rows(kind):
    """Irregular row degrees (802.11n expanded: rows of degree 7 AND 8):
    the dc-major slab tournament must treat padded slots exactly like the
    oracle's inf-masked slots — a regular-code fixture never exercises
    this."""
    from ecc_ldpc_tpu.codes import get_code

    spec = get_code("80211n/648/12")
    graph = compile_graph(spec)  # expanded unstructured view
    key = jax.random.key(21)
    # all-zero codeword is valid; noisy LLRs around it
    llr = awgn_llr(key, jnp.zeros((48, spec.n), jnp.uint8), 2.0, spec.rate)
    res = make_decoder(graph, kind, alpha=0.8125 if kind == "minsum" else 1.0,
                       max_iters=12, backend="pallas")(llr)
    ref = make_decoder(graph, kind, alpha=0.8125 if kind == "minsum" else 1.0,
                       max_iters=12, backend="xla-mm")(llr)
    assert np.array_equal(np.asarray(res.bits), np.asarray(ref.bits))
    assert np.array_equal(np.asarray(res.ok), np.asarray(ref.ok))
    assert np.array_equal(np.asarray(res.iterations), np.asarray(ref.iterations))
