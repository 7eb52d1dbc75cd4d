"""General puncture/shorten combinator tests (SURVEY.md §2.1 R5 parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan.awgn import make_channel
from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.codes.puncture import parse_positions, puncture, shorten
from ecc_ldpc_tpu.decode import make_decoder
from ecc_ldpc_tpu.encode.structured import build_encoder
from ecc_ldpc_tpu.graph import compile_graph


def test_puncture_raises_rate():
    spec = get_code("80211n/648/12")
    p = puncture(spec, range(600, 648))
    assert p.rate > spec.rate
    assert len(p.punctured_cols) == 48


def test_shorten_lowers_rate_and_shrinks_message():
    spec = get_code("80211n/648/12")
    s = shorten(spec, 24)
    assert s.rate < spec.rate
    assert s.k == spec.k - 24
    enc = build_encoder(s)
    key = jax.random.key(2)
    msg = jax.random.bernoulli(key, 0.5, (8, s.k)).astype(jnp.uint8)
    cw = enc(msg)
    assert s.check_syndrome(np.asarray(cw))
    # shortened tail carries zeros
    assert not np.asarray(cw)[:, np.asarray(s.shortened_cols)].any()


def test_validation():
    spec = get_code("80211n/648/12")
    with pytest.raises(ValueError):
        puncture(spec, [10_000])
    with pytest.raises(ValueError):
        puncture(spec, range(0, 330))  # would push rate >= 1
    with pytest.raises(ValueError):
        shorten(spec, spec.k)
    s = shorten(spec, 10)
    with pytest.raises(ValueError):
        puncture(s, [s.k])


def test_registry_syntax():
    p = get_code("punct/80211n~648~12/600:648")
    assert len(p.punctured_cols) == 48
    assert parse_positions("1,5,9", 100) == [1, 5, 9]


def test_punctured_code_decodes():
    """Moderate puncturing still decodes at high SNR; BP fills the holes."""
    spec = puncture(get_code("80211n/648/12"), range(624, 648))
    enc = build_encoder(spec)
    ch = make_channel(spec)
    g = compile_graph(spec)
    dec = make_decoder(g, "minsum", alpha=0.8125, max_iters=30)
    key = jax.random.key(0)
    msg = jax.random.bernoulli(key, 0.5, (32, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    llr = ch(jax.random.fold_in(key, 1), cw, 4.0)
    res = dec(llr)
    got = np.asarray(enc.extract_message(res.bits))
    assert (got == np.asarray(msg)).all(axis=1).mean() > 0.9
