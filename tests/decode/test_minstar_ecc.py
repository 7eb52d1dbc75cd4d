"""minstar CN form + ECC facade tests (SURVEY.md §2.1 R1, §2.2 C12)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.decode.xla.cn_ops import cn_minstar, cn_minsum, cn_spa
from ecc_ldpc_tpu.ecc import build_ecc


def test_minstar_equals_spa_numerically():
    rng = np.random.default_rng(0)
    m, dc, B = 11, 6, 5
    mask = rng.random((m, dc)) < 0.85
    mask[:, :2] = True
    V = np.where(mask[:, :, None], rng.normal(0, 2.5, (m, dc, B)), 0.0).astype(np.float32)
    a = np.asarray(cn_minstar(jnp.asarray(V), jnp.asarray(mask[:, :, None])))
    b = np.asarray(cn_spa(jnp.asarray(V), jnp.asarray(mask[:, :, None])))
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


def test_minstar_magnitude_bounded_by_minsum():
    """|minstar| <= |minsum| (the correction only shrinks magnitudes)."""
    rng = np.random.default_rng(1)
    V = jnp.asarray(rng.normal(0, 3, (7, 5, 4)).astype(np.float32))
    mask = jnp.ones((7, 5, 1), bool)
    ms = np.abs(np.asarray(cn_minstar(V, mask)))
    mm = np.abs(np.asarray(cn_minsum(V, mask)))
    assert (ms <= mm + 1e-4).all()


def test_minstar_decoder_spec():
    ecc = build_ecc("gallager/96/3/6/s1", "minstar/15")
    key = jax.random.key(0)
    msg = jax.random.bernoulli(key, 0.5, (8, ecc.k)).astype(jnp.uint8)
    cw = ecc.encode(msg)
    llr = ecc.transmit(jax.random.fold_in(key, 1), cw, 3.5)
    out = ecc.decode(llr)
    got = np.asarray(ecc.extract_message(out.bits))
    assert (got == np.asarray(msg)).all(axis=1).mean() > 0.8


def test_ecc_facade_end_to_end():
    ecc = build_ecc("80211n/648/12", "layered/norm:0.8125/20")
    assert ecc.k == 324 and ecc.n == 648 and abs(ecc.rate - 0.5) < 1e-9
    key = jax.random.key(3)
    msg = jax.random.bernoulli(key, 0.5, (16, ecc.k)).astype(jnp.uint8)
    cw = ecc.encode(msg)
    assert ecc.spec.check_syndrome(np.asarray(cw))
    llr = ecc.transmit(jax.random.fold_in(key, 1), cw, 3.0)
    out = ecc.decode(llr)
    assert np.asarray(out.ok).mean() > 0.9
    got = np.asarray(ecc.extract_message(out.bits))[np.asarray(out.ok)]
    want = np.asarray(msg)[np.asarray(out.ok)]
    assert np.array_equal(got, want)


def test_ecc_facade_rate_matched_nr():
    ecc = build_ecc("nr5g/bg2/32", "minsum/norm:0.8125/25")
    key = jax.random.key(9)
    msg = jax.random.bernoulli(key, 0.5, (8, ecc.k)).astype(jnp.uint8)
    llr = ecc.transmit(jax.random.fold_in(key, 1), ecc.encode(msg), 4.0)
    # punctured positions got LLR 0
    assert np.all(np.asarray(llr)[:, np.asarray(ecc.spec.punctured_cols)] == 0)
    out = ecc.decode(llr)
    assert np.asarray(out.ok).mean() > 0.8
