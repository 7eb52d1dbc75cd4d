"""Native-tier exact-BP kinds (VERDICT r1 item 5): spa/minstar in the
Pallas layered and flooding QC kernels, interpret-mode parity vs their
XLA oracle twins.

Parity contracts:
- layered spa/minstar: BIT-exact vs decode_layered(cn=...) in f32 (same
  op order by construction — sequential ltacc / fwd-bwd box-plus).
- flooding spa/minstar: decision parity (bits/ok/iterations) vs
  decode_flooding_qc; magnitudes may differ in ulps (the oracle reduces
  log|tanh| with jnp.sum and uses arctanh; the kernel accumulates
  sequentially and uses the log1p form).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import awgn_llr
from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.decode.pallas.flooding_qc import make_flooding_pallas_decoder
from ecc_ldpc_tpu.decode.pallas.layered_qc import make_layered_pallas_decoder
from ecc_ldpc_tpu.decode.xla.flooding_qc import decode_flooding_qc
from ecc_ldpc_tpu.decode.xla.layered import decode_layered
from ecc_ldpc_tpu.encode.structured import build_encoder
from ecc_ldpc_tpu.graph.qc import compile_qc_graph


@pytest.fixture(scope="module")
def wimax_case():
    spec = get_code("wimax/576/12")  # Z=24 (divisible by 8), dup-free
    graph = compile_qc_graph(spec)
    enc = build_encoder(spec)
    key = jax.random.key(42)
    msg = jax.random.bernoulli(key, 0.5, (16, spec.k)).astype(jnp.uint8)
    llr = awgn_llr(jax.random.fold_in(key, 1), enc(msg), 2.2, spec.rate)
    return spec, graph, llr


@pytest.mark.parametrize("kind", ["spa", "minstar"])
@pytest.mark.parametrize("early_term", [True, False])
def test_layered_exact_kind_bit_exact(wimax_case, kind, early_term):
    spec, graph, llr = wimax_case
    dec = make_layered_pallas_decoder(
        graph, kind=kind, max_iters=8, early_term=early_term,
        interpret=True, batch_tile=16,
    )
    got = dec(llr)
    want = decode_layered(graph, llr, cn=kind, max_iters=8,
                          early_term=early_term)
    assert np.array_equal(np.asarray(got.bits), np.asarray(want.bits))
    assert np.array_equal(np.asarray(got.ok), np.asarray(want.ok))
    assert np.array_equal(
        np.asarray(got.iterations), np.asarray(want.iterations)
    )
    # at 2.2 dB with 8 iterations some frames decode, some don't — both
    # outcomes must be present or the parity assertions are weak
    assert 0 < np.asarray(got.ok).sum() <= len(np.asarray(got.ok))


@pytest.mark.parametrize("kind", ["spa", "minstar"])
def test_flooding_exact_kind_decision_parity(wimax_case, kind):
    spec, graph, llr = wimax_case
    dec = make_flooding_pallas_decoder(
        graph, kind=kind, max_iters=8, early_term=True,
        interpret=True, batch_tile=16,
    )
    got = dec(llr)
    want = decode_flooding_qc(graph, llr, kind=kind, max_iters=8,
                              early_term=True)
    assert np.array_equal(np.asarray(got.ok), np.asarray(want.ok))
    assert np.array_equal(np.asarray(got.bits), np.asarray(want.bits))
    assert np.array_equal(
        np.asarray(got.iterations), np.asarray(want.iterations)
    )


def test_layered_exact_kinds_beat_minsum_fer(wimax_case):
    """Exact BP (spa) should decode at least as many frames as plain
    min-sum at equal iterations (statistical, fixed seed)."""
    spec, graph, _ = wimax_case
    enc = build_encoder(spec)
    key = jax.random.key(7)
    msg = jax.random.bernoulli(key, 0.5, (128, spec.k)).astype(jnp.uint8)
    llr = awgn_llr(jax.random.fold_in(key, 2), enc(msg), 2.0, spec.rate)
    ms = decode_layered(graph, llr, cn="minsum", max_iters=10)
    sp = decode_layered(graph, llr, cn="spa", max_iters=10)
    assert np.asarray(sp.ok).sum() >= np.asarray(ms.ok).sum()


def test_layered_spec_strings():
    from ecc_ldpc_tpu.decode.api import parse_decoder_spec

    kw = parse_decoder_spec("layered/spa/25")
    assert kw == {"kind": "layered", "cn": "spa", "max_iters": 25}
    kw = parse_decoder_spec("layered/minstar/10/noet")
    assert kw["cn"] == "minstar" and kw["early_term"] is False
    with pytest.raises(KeyError, match="cn="):
        from ecc_ldpc_tpu.decode import make_decoder

        make_decoder(
            compile_qc_graph(get_code("wimax/576/12")), "minsum", cn="spa",
        )


@pytest.fixture(scope="module")
def ccsds_case():
    """Multi-edge protograph (intra-layer duplicate block-columns) — the
    classic-exact sweep's reason to exist (VERDICT r2 item 7)."""
    spec = get_code("ccsds/1024/12")
    graph = compile_qc_graph(spec)
    key = jax.random.key(5)
    # random LLRs around a noisy all-zero codeword keep both decode
    # outcomes present without needing the AR4JA encoder here
    llr = 2.0 + 1.8 * jax.random.normal(key, (16, spec.n), jnp.float32)
    return spec, graph, llr


@pytest.mark.parametrize("kind", ["spa", "minstar"])
@pytest.mark.parametrize("early_term", [True, False])
def test_layered_exact_kind_multiedge_bit_exact(ccsds_case, kind, early_term):
    """Exact BP on a DUP graph: the Pallas classic-exact sweep must be
    bit-exact vs the oracle's dup path (r2 item 7 — previously both
    tiers raised NotImplementedError)."""
    spec, graph, llr = ccsds_case
    dec = make_layered_pallas_decoder(
        graph, kind=kind, max_iters=6, early_term=early_term,
        interpret=True, batch_tile=16,
    )
    got = dec(llr)
    want = decode_layered(graph, llr, cn=kind, max_iters=6,
                          early_term=early_term)
    assert np.array_equal(np.asarray(got.bits), np.asarray(want.bits))
    assert np.array_equal(np.asarray(got.ok), np.asarray(want.ok))
    assert np.array_equal(
        np.asarray(got.iterations), np.asarray(want.iterations)
    )
    # the parity must be exercised by a mixed population
    assert 0 < np.asarray(got.ok).sum() < len(np.asarray(got.ok))
