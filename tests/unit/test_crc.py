"""CRC tests (codes/crc.py): bit-serial oracle, matrix form, ECC wrapper."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.codes.crc import (
    POLYNOMIALS,
    crc_bits_ref,
    crc_matrix,
    make_crc,
    with_crc,
)


def test_crc16_known_vector():
    """CRC-16/XMODEM (poly 0x1021, init 0) of ASCII '123456789' is 0x31C3
    — the standard published check value for this configuration."""
    data = b"123456789"
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    crc = crc_bits_ref(bits, "16")
    val = int("".join(map(str, crc)), 2)
    assert val == 0x31C3


@pytest.mark.parametrize("name", ["24a", "24b", "16", "11", "6"])
def test_matrix_matches_bitserial(name):
    rng = np.random.default_rng(0)
    k = 200
    M = crc_matrix(name, k)
    for _ in range(5):
        m = rng.integers(0, 2, k).astype(np.uint8)
        ref = crc_bits_ref(m, name)
        got = (M @ m) % 2
        np.testing.assert_array_equal(got, ref)


def test_attach_check_roundtrip_and_detection():
    attach, check = make_crc("24b", 100)
    key = jax.random.key(1)
    msg = jax.random.bernoulli(key, 0.5, (16, 100)).astype(jnp.uint8)
    mc = attach(msg)
    assert mc.shape == (16, 124)
    assert bool(jnp.all(check(mc)))
    # any single-bit corruption (payload or CRC field) must be detected
    for pos in (0, 57, 99, 100, 123):
        bad = mc.at[:, pos].set(1 - mc[:, pos])
        assert not bool(jnp.any(check(bad)))


def test_with_crc_ecc_wrapper():
    from ecc_ldpc_tpu.ecc import build_ecc

    ecc = with_crc(build_ecc("80211n/648/12", "layered/norm:0.8125/25"),
                   "24b")
    assert ecc.k_payload == 324 - 24
    key = jax.random.key(2)
    km, kc = jax.random.split(key)
    payload = jax.random.bernoulli(km, 0.5, (8, ecc.k_payload)).astype(jnp.uint8)
    cw = ecc.encode(payload)
    out = ecc.decode(ecc.transmit(kc, cw, 6.0))
    assert bool(jnp.all(out.ok))
    np.testing.assert_array_equal(
        np.asarray(ecc.extract_payload(out.bits)), np.asarray(payload))
    # the undetected-error case the CRC exists for: a decoder emitting a
    # wrong message (here: tamper one extracted message bit) must fail the
    # payload CRC even though a parity-only check could pass
    _, check = make_crc("24b", ecc.k_payload)
    msg_crc = ecc.extract_message(out.bits)
    tampered = msg_crc.at[:, 3].set(1 - msg_crc[:, 3])
    assert not bool(jnp.any(check(tampered)))
