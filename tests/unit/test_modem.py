"""Channel-spec registry tests: BSC, hard-decision, Gray M-QAM (chan/modem.py).

Validation strategy mirrors tests/unit/test_chan_encode.py: closed-form
anchors (crossover probabilities, LLR magnitudes, Gray-QAM union-bound BER)
plus an exact brute-force demapper oracle for the factorized QAM LLRs.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan.modem import (
    bsc_llr,
    build_channel,
    hard_bpsk_awgn_llr,
    pam_tables,
    parse_channel_spec,
    qam_awgn_llr,
    qam_modulate,
    qam_unit_scale,
)


def test_parse_channel_spec():
    assert parse_channel_spec("bpsk") == {"kind": "bpsk"}
    assert parse_channel_spec("hard") == {"kind": "hard"}
    assert parse_channel_spec("bsc:0.03") == {"kind": "bsc", "p": 0.03}
    assert parse_channel_spec("qpsk") == {"kind": "qam", "M": 4}
    assert parse_channel_spec("qam64") == {"kind": "qam", "M": 64}
    with pytest.raises(ValueError):
        parse_channel_spec("qam8")  # not square
    with pytest.raises(ValueError):
        parse_channel_spec("bsc:0.7")


def test_gray_pam_tables():
    levels, bit_table, lut = pam_tables(2)
    assert list(levels) == [-3.0, -1.0, 1.0, 3.0]
    # adjacent levels differ in exactly one bit (Gray property)
    for i in range(3):
        assert int(np.sum(bit_table[i] != bit_table[i + 1])) == 1
    # lut maps each bit-int back to the level carrying that label
    for i in range(4):
        v = int(bit_table[i, 0]) * 2 + int(bit_table[i, 1])
        assert lut[v] == levels[i]


@pytest.mark.parametrize("M", [4, 16, 64])
def test_qam_unit_energy_and_modulate(M):
    key = jax.random.key(0)
    b = int(math.log2(M))
    bits = jax.random.bernoulli(key, 0.5, (64, 8 * b)).astype(jnp.uint8)
    xi, xq = qam_modulate(bits, M)
    es = np.mean(np.asarray(xi) ** 2 + np.asarray(xq) ** 2)
    # average over random symbols approaches Es=1 (exact for equiprobable)
    assert abs(es - 1.0) < 0.05
    # every point lies on the scaled odd-integer grid
    d = qam_unit_scale(M)
    L = int(round(math.sqrt(M)))
    grid = (np.arange(L) * 2.0 - (L - 1)) * d
    assert np.all(np.isclose(np.asarray(xi)[..., None], grid, atol=1e-6).any(-1))


@pytest.mark.parametrize("M", [4, 16, 64])
def test_qam_noiseless_roundtrip(M):
    b = int(math.log2(M))
    key = jax.random.key(1)
    bits = jax.random.bernoulli(key, 0.5, (16, 4 * b)).astype(jnp.uint8)
    # very high Eb/N0: LLR signs must recover every bit
    llr = qam_awgn_llr(jax.random.key(2), bits, 30.0, 1.0, M)
    hard = np.asarray(llr < 0).astype(np.uint8)
    np.testing.assert_array_equal(hard, np.asarray(bits))


@pytest.mark.parametrize("M", [16, 64])
def test_qam_llr_matches_bruteforce_2d(M):
    """The factorized per-dimension LLR equals the exact 2-D demapper."""
    b = int(math.log2(M))
    bd = b // 2
    d = qam_unit_scale(M)
    levels, bit_table, _ = pam_tables(bd)
    # full 2-D constellation and its b-bit labels
    pts, labels = [], []
    for i in range(len(levels)):
        for q in range(len(levels)):
            pts.append((levels[i] * d, levels[q] * d))
            labels.append(list(bit_table[i]) + list(bit_table[q]))
    pts = np.asarray(pts)
    labels = np.asarray(labels)

    rng = np.random.default_rng(3)
    sigma = 0.35
    y = rng.normal(size=(50, 2)) * 0.8  # arbitrary received points

    # brute force: logsumexp over all M symbols per bit
    m = -((y[:, None, 0] - pts[None, :, 0]) ** 2
          + (y[:, None, 1] - pts[None, :, 1]) ** 2) / (2 * sigma * sigma)
    ref = np.zeros((50, b))
    for j in range(b):
        from scipy.special import logsumexp

        ref[:, j] = (logsumexp(m[:, labels[:, j] == 0], axis=1)
                     - logsumexp(m[:, labels[:, j] == 1], axis=1))

    from ecc_ldpc_tpu.chan.modem import pam_bit_llrs

    li = np.asarray(pam_bit_llrs(jnp.asarray(y[:, 0]), bd, d, sigma))
    lq = np.asarray(pam_bit_llrs(jnp.asarray(y[:, 1]), bd, d, sigma))
    got = np.concatenate([li, lq], axis=-1)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_qpsk_equals_bpsk_ber():
    """Gray QPSK carries two independent BPSK dimensions: uncoded BER must
    match Q(sqrt(2 Eb/N0)) like BPSK (the closed-form anchor)."""
    from ecc_ldpc_tpu.chan.awgn import uncoded_bpsk_ber

    key = jax.random.key(4)
    kb, kc = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (512, 2048)).astype(jnp.uint8)
    ebn0 = 4.0
    llr = qam_awgn_llr(kc, bits, ebn0, 1.0, 4)
    ber = float(jnp.mean((llr < 0) != bits))
    theory = float(uncoded_bpsk_ber(ebn0))  # ~1.25e-2
    assert abs(ber - theory) < 0.15 * theory


@pytest.mark.parametrize("M,ebn0", [(16, 8.0), (64, 12.0)])
def test_qam_uncoded_ber_anchor(M, ebn0):
    """Gray square M-QAM uncoded BER vs the standard nearest-neighbor
    approximation Pb ~ (4/b)(1-1/sqrt(M)) Q(sqrt(3 b gamma/(M-1)))."""
    from ecc_ldpc_tpu.chan.awgn import q_function

    b = int(math.log2(M))
    key = jax.random.key(5)
    kb, kc = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (256, 512 * b)).astype(jnp.uint8)
    llr = qam_awgn_llr(kc, bits, ebn0, 1.0, M)
    ber = float(jnp.mean((llr < 0) != bits))
    g = 10.0 ** (ebn0 / 10.0)
    theory = (4.0 / b) * (1 - 1 / math.sqrt(M)) * float(
        q_function(math.sqrt(3.0 * b * g / (M - 1)))
    )
    assert 0.8 * theory < ber < 1.2 * theory


def test_bsc_crossover_and_llr():
    p = 0.05
    key = jax.random.key(6)
    bits = jnp.zeros((400, 1000), jnp.uint8)
    llr = bsc_llr(key, bits, p)
    mag = math.log((1 - p) / p)
    np.testing.assert_allclose(np.abs(np.asarray(llr)), mag, rtol=1e-5)
    flip_rate = float(jnp.mean(llr < 0))
    assert abs(flip_rate - p) < 0.005


def test_hard_channel_crossover():
    """Hard-decision BPSK/AWGN == BSC with p = Q(sqrt(2 R Eb/N0))."""
    from ecc_ldpc_tpu.chan.awgn import q_function

    rate, ebn0 = 0.5, 2.0
    key = jax.random.key(7)
    bits = jnp.zeros((400, 1000), jnp.uint8)
    llr = hard_bpsk_awgn_llr(key, bits, ebn0, rate)
    p = float(q_function(math.sqrt(2 * rate * 10 ** (ebn0 / 10))))
    mag = math.log((1 - p) / p)
    np.testing.assert_allclose(np.abs(np.asarray(llr)), mag, rtol=1e-4)
    flip_rate = float(jnp.mean(llr < 0))
    assert abs(flip_rate - p) < 0.1 * p + 0.003


def test_build_channel_gates():
    from ecc_ldpc_tpu.codes import get_code

    nr = get_code("nr5g/bg2/52")  # has the 2Zc systematic puncture
    assert len(nr.punctured_cols) or len(nr.shortened_cols)
    with pytest.raises(NotImplementedError):
        build_channel(nr, "qam16")
    # bits/symbol must divide n
    from ecc_ldpc_tpu.codes.spec import CodeSpec

    odd = CodeSpec(name="odd", n=1007, m=0, row_cols=(), k=1007)
    with pytest.raises(ValueError):
        build_channel(odd, "qam16")


def test_ldpc_decodes_over_qam16_and_hard():
    """End-to-end: mackay1008 + min-sum decodes cleanly over 16-QAM at high
    Eb/N0 and over the hard-decision channel at very high Eb/N0."""
    from ecc_ldpc_tpu.ecc import build_ecc

    ecc = build_ecc("mackay1008", "minsum/norm:0.8125/25", channel="qam16")
    key = jax.random.key(8)
    km, kc = jax.random.split(key)
    msg = jax.random.bernoulli(km, 0.5, (8, ecc.k)).astype(jnp.uint8)
    cw = ecc.encode(msg)
    out = ecc.decode(ecc.transmit(kc, cw, 9.0))
    assert bool(jnp.all(out.ok))
    np.testing.assert_array_equal(
        np.asarray(ecc.extract_message(out.bits)), np.asarray(msg)
    )

    ecc_h = build_ecc("mackay1008", "minsum/norm:0.8125/25", channel="hard")
    out = ecc_h.decode(ecc_h.transmit(kc, cw, 7.0))
    assert bool(jnp.all(out.ok))


def test_rayleigh_uncoded_anchor():
    """Coherent BPSK over i.i.d. Rayleigh: BER = (1 - sqrt(g/(1+g)))/2."""
    from ecc_ldpc_tpu.chan.modem import rayleigh_bpsk_llr, uncoded_rayleigh_ber

    key = jax.random.key(11)
    bits = jnp.zeros((512, 2048), jnp.uint8)
    for ebn0 in (5.0, 10.0):
        llr = rayleigh_bpsk_llr(key, bits, ebn0, 1.0)
        ber = float(jnp.mean(llr < 0))
        theory = float(uncoded_rayleigh_ber(ebn0))
        assert abs(ber - theory) < 0.05 * theory + 2e-4


def test_rayleigh_worse_than_awgn_coded():
    """Fading costs SNR: at a fixed operating point the coded FER over
    Rayleigh must exceed the AWGN FER."""
    from ecc_ldpc_tpu.ecc import build_ecc

    key = jax.random.key(12)
    km, kc = jax.random.split(key)
    fers = {}
    for ch in ("bpsk", "rayleigh"):
        ecc = build_ecc("80211n/648/12", "layered/norm:0.8125/25", channel=ch)
        msg = jax.random.bernoulli(km, 0.5, (256, ecc.k)).astype(jnp.uint8)
        out = ecc.decode(ecc.transmit(kc, ecc.encode(msg), 2.5))
        fers[ch] = float(jnp.mean(~out.ok))
    assert fers["rayleigh"] > fers["bpsk"]


def test_bec_channel_and_decode_vs_threshold():
    """BEC erasures decode through plain BP; FER behavior brackets the
    exact DE threshold (eps* ~ 0.43 for the (3,6) ensemble): clean decode
    well below it, failure well above."""
    from ecc_ldpc_tpu.chan.modem import bec_llr
    from ecc_ldpc_tpu.ecc import build_ecc

    key = jax.random.key(13)
    km, kc = jax.random.split(key)
    for eps, lo, hi in ((0.25, 0.0, 0.05), (0.6, 0.8, 1.01)):
        ecc = build_ecc("mackay1008", "minsum/60", channel=f"bec:{eps}")
        msg = jax.random.bernoulli(km, 0.5, (64, ecc.k)).astype(jnp.uint8)
        out = ecc.decode(ecc.transmit(kc, ecc.encode(msg), 0.0))
        fer = float(jnp.mean(~out.ok))
        assert lo <= fer <= hi, (eps, fer)
    # LLR alphabet is exactly {0, +/-60}
    llr = bec_llr(key, jnp.zeros((8, 100), jnp.uint8), 0.3)
    vals = set(np.unique(np.asarray(llr)))
    assert vals <= {0.0, 60.0}


def test_psk_tables_gray_and_unit_energy():
    from ecc_ldpc_tpu.chan.modem import psk_tables

    xi, xq, bit_table, lut_i, lut_q = psk_tables(3)
    np.testing.assert_allclose(xi**2 + xq**2, 1.0, atol=1e-12)  # Es = 1
    # Gray property: adjacent ring points differ in exactly one bit
    for i in range(8):
        d = int(np.sum(bit_table[i] != bit_table[(i + 1) % 8]))
        assert d == 1
    # bit-int lookup inverts the labeling
    for i in range(8):
        v = int(sum(bit_table[i, j] << (2 - j) for j in range(3)))
        np.testing.assert_allclose([lut_i[v], lut_q[v]], [xi[i], xq[i]])


def test_psk_noiseless_roundtrip():
    from ecc_ldpc_tpu.chan.modem import psk_bit_llrs, psk_modulate

    key = jax.random.key(11)
    bits = jax.random.bernoulli(key, 0.5, (4, 96)).astype(jnp.uint8)
    xi, xq = psk_modulate(bits, 8)
    llr = psk_bit_llrs(xi, xq, 3, 0.1).reshape(4, 96)
    assert bool(jnp.all((llr < 0) == bits))


def test_psk_llr_matches_bruteforce_2d():
    """psk_bit_llrs equals the direct logsumexp over all 8 points."""
    from scipy.special import logsumexp

    from ecc_ldpc_tpu.chan.modem import psk_bit_llrs, psk_tables

    xi, xq, bit_table, _, _ = psk_tables(3)
    rng = np.random.default_rng(7)
    sigma = 0.4
    y = rng.normal(size=(64, 2)) * 0.9
    m = -((y[:, None, 0] - xi[None, :]) ** 2
          + (y[:, None, 1] - xq[None, :]) ** 2) / (2 * sigma * sigma)
    ref = np.zeros((64, 3))
    for j in range(3):
        ref[:, j] = (logsumexp(m[:, bit_table[:, j] == 0], axis=1)
                     - logsumexp(m[:, bit_table[:, j] == 1], axis=1))
    got = np.asarray(
        psk_bit_llrs(jnp.asarray(y[:, 0]), jnp.asarray(y[:, 1]), 3, sigma))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_8psk_uncoded_ber_anchor():
    from ecc_ldpc_tpu.chan.modem import psk_awgn_llr, uncoded_8psk_ber_approx

    key = jax.random.key(12)
    kb, kc = jax.random.split(key)
    ebn0 = 8.0
    bits = jax.random.bernoulli(kb, 0.5, (256, 768)).astype(jnp.uint8)
    llr = psk_awgn_llr(kc, bits, ebn0, 1.0, 8)
    ber = float(jnp.mean((llr < 0) != bits))
    theory = float(uncoded_8psk_ber_approx(ebn0))
    assert 0.8 * theory < ber < 1.25 * theory


def test_ldpc_decodes_over_8psk():
    """mackay1008 (n divisible by 3) through the 8psk channel spec: the
    FER cliff sits between 2.5 and 4.5 dB (~1 dB right of the BPSK
    waterfall — the Gray-BICM 8PSK penalty at rate 1/2)."""
    from ecc_ldpc_tpu.chan.modem import build_channel
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode.api import choose_graph, get_decoder
    from ecc_ldpc_tpu.encode.dense import DenseEncoder

    spec = get_code("mackay1008")
    ch = build_channel(spec, "8psk")
    enc = DenseEncoder.build(spec)
    dec = get_decoder(choose_graph(spec, "minsum/norm:0.8125/25"),
                      "minsum/norm:0.8125/25")
    key = jax.random.key(13)
    msg = jax.random.bernoulli(key, 0.5, (128, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    fer = {}
    for ebn0 in (2.5, 4.5):
        out = dec(ch(jax.random.fold_in(key, int(ebn0 * 10)), cw, ebn0))
        fer[ebn0] = 1.0 - float(jnp.mean(out.ok))
    assert fer[2.5] > 0.5
    assert fer[4.5] == 0.0


# ---------------------------------------------------------------- APSK


def test_apsk_tables_energy_and_rings():
    from ecc_ldpc_tpu.chan.modem import apsk_tables

    for M, gamma in ((16, 2.85), (32, (2.84, 5.27))):
        xi, xq, bit_table, lut_i, lut_q = apsk_tables(M, gamma)
        r = np.hypot(xi, xq)
        # unit mean symbol energy
        np.testing.assert_allclose(np.mean(r**2), 1.0, rtol=1e-12)
        # ring populations and ratios
        radii = np.unique(np.round(r, 9))
        assert len(radii) == (2 if M == 16 else 3)
        g = gamma if M == 16 else gamma[0]
        np.testing.assert_allclose(radii[1] / radii[0], g, rtol=1e-7)
        # labels are a permutation of 0..M-1
        b = bit_table.shape[1]
        labels = (bit_table * (1 << np.arange(b - 1, -1, -1))).sum(axis=1)
        assert sorted(labels.tolist()) == list(range(M))


def test_apsk_quasi_gray_beats_identity():
    """The surrogate labeling's distance-weighted Hamming cost must beat
    the naive identity labeling (sanity that the optimizer optimizes).
    Uses 32APSK — the ring 16APSK no longer needs the optimizer (standard
    mapping recalled, test below)."""
    from ecc_ldpc_tpu.chan.modem import apsk_tables

    M = 32
    xi, xq, bit_table, _, _ = apsk_tables(M, (2.84, 5.27))
    b = bit_table.shape[1]
    labels = (bit_table * (1 << np.arange(b - 1, -1, -1))).sum(axis=1)
    d2 = (xi[:, None] - xi[None, :]) ** 2 + (xq[:, None] - xq[None, :]) ** 2
    w = np.exp(-d2)
    np.fill_diagonal(w, 0.0)

    def cost(lab):
        ham = np.zeros((M, M))
        for i in range(M):
            for j in range(M):
                ham[i, j] = bin(int(lab[i]) ^ int(lab[j])).count("1")
        return float((w * ham).sum())

    assert cost(labels) < cost(np.arange(M))


def test_apsk16_standard_mapping_structure():
    """Pin the recalled EN 302 307 Figure 10 16APSK mapping (VERDICT r3
    item 6) by its joint structural anchors: permutation of 0..15, both
    rings cyclically Gray, LSB = Q-axis reflection, y3 = I-axis
    reflection, MSB pair 11 exactly on the inner ring."""
    from ecc_ldpc_tpu.chan.modem import _APSK16_STD_LABELS, apsk_tables

    lab = list(_APSK16_STD_LABELS)
    assert sorted(lab) == list(range(16))
    inner, outer = lab[:4], lab[4:]
    # cyclic Gray on each ring (point order is by increasing angle)
    for ring in (inner, outer):
        for a, c in zip(ring, ring[1:] + ring[:1]):
            assert bin(a ^ c).count("1") == 1, (a, c)
    # MSB pair == 11 exactly on the inner ring
    assert all(v >> 2 == 3 for v in inner)
    assert all(v >> 2 != 3 for v in outer)
    # reflection semantics, from the actual generated geometry
    xi, xq, bit_table, _, _ = apsk_tables(16, 2.85)
    labels = (bit_table * (1 << np.arange(3, -1, -1))).sum(axis=1)
    pts = {
        (round(float(x), 9), round(float(y), 9)): int(v)
        for x, y, v in zip(xi, xq, labels)
    }
    for (x, y), v in pts.items():
        assert pts[(x, round(-y, 9))] == v ^ 1          # Q mirror: LSB
        assert pts[(round(-x, 9), y)] == v ^ 2          # I mirror: y3


def test_apsk_noiseless_roundtrip():
    from ecc_ldpc_tpu.chan.modem import apsk_awgn_llr

    key = jax.random.key(3)
    for M in (16, 32):
        b = int(math.log2(M))
        gamma = 2.85 if M == 16 else (2.84, 5.27)
        bits = jax.random.bernoulli(key, 0.5, (8, 20 * b)).astype(jnp.uint8)
        llr = apsk_awgn_llr(key, bits, 60.0, 1.0, M, gamma)
        assert np.array_equal(np.asarray(llr < 0, np.uint8), np.asarray(bits))


def test_apsk_llr_matches_bruteforce_2d():
    from scipy.special import logsumexp

    from ecc_ldpc_tpu.chan.modem import apsk_tables, const_bit_llrs

    xi, xq, bit_table, _, _ = apsk_tables(16, 2.85)
    rng = np.random.default_rng(11)
    sigma = 0.35
    y = rng.normal(size=(64, 2)) * 1.1
    m = -((y[:, None, 0] - xi[None, :]) ** 2
          + (y[:, None, 1] - xq[None, :]) ** 2) / (2 * sigma * sigma)
    ref = np.zeros((64, 4))
    for j in range(4):
        ref[:, j] = (logsumexp(m[:, bit_table[:, j] == 0], axis=1)
                     - logsumexp(m[:, bit_table[:, j] == 1], axis=1))
    got = np.asarray(const_bit_llrs(
        jnp.asarray(y[:, 0]), jnp.asarray(y[:, 1]), xi, xq, bit_table, sigma))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_parse_apsk_and_interleave_specs():
    from ecc_ldpc_tpu.chan.modem import (
        APSK16_GAMMA, APSK32_GAMMA, parse_channel_spec)

    assert parse_channel_spec("apsk16") == {
        "kind": "apsk", "M": 16, "gamma": APSK16_GAMMA["34"]}
    assert parse_channel_spec("apsk16:r56") == {
        "kind": "apsk", "M": 16, "gamma": APSK16_GAMMA["56"]}
    assert parse_channel_spec("apsk16:g3.0:il") == {
        "kind": "apsk", "M": 16, "gamma": 3.0, "il": True}
    assert parse_channel_spec("apsk32") == {
        "kind": "apsk", "M": 32, "gamma": APSK32_GAMMA["34"]}
    assert parse_channel_spec("8psk:il") == {"kind": "psk", "M": 8, "il": True}
    # bare specs keep their original dict shape (no il key)
    assert parse_channel_spec("qpsk") == {"kind": "qam", "M": 4}
    with pytest.raises(ValueError):
        parse_channel_spec("apsk32:g2.8")  # needs two ratios
    with pytest.raises(ValueError):
        parse_channel_spec("apsk16:r12")  # no such rate key


def test_interleaver_roundtrip_and_pattern():
    from ecc_ldpc_tpu.chan.modem import deinterleave_llr, interleave_tx

    n, b = 24, 3
    cw = jnp.arange(n, dtype=jnp.float32)[None, :]
    tx = interleave_tx(cw, b)
    # column-wise write, row-wise read: tx[r*b + c] = cw[c*(n/b) + r]
    rows = n // b
    expect = np.array([[c * rows + r for r in range(rows)
                        for c in range(b)][i] for i in range(n)])
    # build expected in read order
    expect = np.array([c * rows + r for r in range(rows) for c in range(b)])
    np.testing.assert_array_equal(np.asarray(tx[0]).astype(int), expect)
    back = deinterleave_llr(tx, b)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(cw))


def test_ldpc_decodes_over_apsk16_interleaved():
    """dvbs2/16200 r=1/2 through 'apsk16:r56:il': decodes cleanly at high
    SNR, fails at very low SNR (channel + interleaver wired end-to-end)."""
    from ecc_ldpc_tpu.ecc import build_ecc

    ecc = build_ecc("dvbs2/16200/12", "minsum/norm:0.8125/20",
                    channel="apsk16:r56:il")
    key = jax.random.key(4)
    msg = jax.random.bernoulli(key, 0.5, (8, ecc.k)).astype(jnp.uint8)
    cw = ecc.encode(msg)
    out_hi = ecc.decode(ecc.transmit(jax.random.fold_in(key, 1), cw, 9.0))
    assert np.array_equal(np.asarray(out_hi.bits), np.asarray(cw))
    out_lo = ecc.decode(ecc.transmit(jax.random.fold_in(key, 2), cw, -2.0))
    assert not np.asarray(out_lo.ok).any()
