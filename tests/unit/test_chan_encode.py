"""Channel and encoder unit tests (SURVEY.md §4.2 items 1-2)."""
import jax
import jax.numpy as jnp
import numpy as np

from ecc_ldpc_tpu.chan import awgn_llr, bpsk, noise_sigma, uncoded_bpsk_ber
from ecc_ldpc_tpu.codes import gallager_36, mackay_1008
from ecc_ldpc_tpu.encode import DenseEncoder, systematic_generator
from ecc_ldpc_tpu.encode.gf2 import gf2_matmul


def test_bpsk_map():
    bits = jnp.array([0, 1, 1, 0], jnp.uint8)
    assert np.array_equal(np.asarray(bpsk(bits)), [1.0, -1.0, -1.0, 1.0])


def test_sigma_closed_form():
    # sigma = sqrt(1 / (2 R 10^(EbN0/10)))
    got = float(noise_sigma(2.0, 0.5))
    want = (1.0 / (2 * 0.5 * 10 ** 0.2)) ** 0.5
    assert abs(got - want) < 1e-6


def test_llr_sign_and_scale():
    key = jax.random.key(0)
    bits = jnp.zeros((4, 64), jnp.uint8)
    llr = awgn_llr(key, bits, 20.0, 0.5)  # nearly noiseless
    assert np.all(np.asarray(llr) > 0)  # bit 0 -> positive LLR
    # E[llr | bit=0] = 2/sigma^2
    sigma = float(noise_sigma(20.0, 0.5))
    assert abs(np.asarray(llr).mean() - 2 / sigma**2) < 0.05 * 2 / sigma**2


def test_noise_reproducible_and_key_dependent():
    key = jax.random.key(7)
    bits = jnp.zeros((2, 32), jnp.uint8)
    a = awgn_llr(key, bits, 1.0, 0.5)
    b = awgn_llr(key, bits, 1.0, 0.5)
    c = awgn_llr(jax.random.fold_in(key, 1), bits, 1.0, 0.5)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_uncoded_ber_values():
    # Q(sqrt(2*EbN0)): standard values — BER(0 dB) ~ 7.86e-2, BER(9.6 dB) ~ 1e-5
    assert abs(float(uncoded_bpsk_ber(0.0)) - 0.0786) < 2e-3
    assert 0.5e-5 < float(uncoded_bpsk_ber(9.6)) < 2e-5


def test_generator_orthogonal_to_h():
    for spec in [gallager_36(96, seed=2), mackay_1008()]:
        G, info_cols = systematic_generator(spec)
        assert G.shape == (spec.k, spec.n)
        assert not gf2_matmul(G, spec.dense().T).any()


def test_encode_systematic_and_valid():
    spec = gallager_36(96, seed=2)
    enc = DenseEncoder.build(spec)
    key = jax.random.key(3)
    msg = jax.random.bernoulli(key, 0.5, (17, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    assert cw.shape == (17, spec.n)
    assert spec.check_syndrome(np.asarray(cw))
    assert np.array_equal(np.asarray(enc.extract_message(cw)), np.asarray(msg))
