"""5G NR family tests (SURVEY.md §4.2 item 1, config 5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.chan.awgn import make_channel
from ecc_ldpc_tpu.codes.nr5g import LIFTING_SIZES, nr5g
from ecc_ldpc_tpu.encode.structured import NRCoreExtensionEncoder, build_encoder


def test_lifting_sizes_standard():
    # the 51 standard values: a*2^j, a in {2,3,5,7,9,11,13,15}, <= 384
    assert len(LIFTING_SIZES) == 51
    assert LIFTING_SIZES[0] == 2 and LIFTING_SIZES[-1] == 384
    assert 208 in LIFTING_SIZES and 104 in LIFTING_SIZES
    assert 100 not in LIFTING_SIZES


def test_bg_geometry():
    s1 = nr5g("bg1", 384)
    assert s1.qc.base.shape == (46, 68)
    assert s1.k == 22 * 384
    assert abs(s1.rate - 1 / 3) < 1e-9  # mother rate with 2Zc puncture
    s2 = nr5g("bg2", 384)
    assert s2.qc.base.shape == (42, 52)
    assert s2.k == 10 * 384
    assert abs(s2.rate - 1 / 5) < 1e-9


def test_bg2_recalled_connectivity():
    """Pin the recalled BG2 connectivity (38.212 Table 5.3.2-3; VERDICT
    r2 item 5): published aggregate anchors — 197 edges, heavy-column
    weights 22/23, core row degrees (8,10,8,10) — plus the BG2 core-parity
    variant (special col 10 at rows {0,2,3}) and per-row spot checks so
    accidental edits are caught."""
    from ecc_ldpc_tpu.codes.nr5g import _BG1_CORE_ROWS, _BG2_ROWS

    assert len(_BG2_ROWS) == 42
    assert sum(len(r) for r in _BG2_ROWS) == 197
    colw = np.zeros(52, int)
    for r in _BG2_ROWS:
        for j in r:
            colw[j] += 1
    assert colw[0] == 22 and colw[1] == 23
    assert [len(_BG2_ROWS[i]) for i in range(4)] == [8, 10, 8, 10]
    # core-parity variant: col 10 at rows {0,2,3}; staircase 11/12/13
    assert [i for i in range(4) if 10 in _BG2_ROWS[i]] == [0, 2, 3]
    assert [i for i in range(4) if 11 in _BG2_ROWS[i]] == [0, 1]
    assert [i for i in range(4) if 12 in _BG2_ROWS[i]] == [1, 2]
    assert [i for i in range(4) if 13 in _BG2_ROWS[i]] == [2, 3]
    # every extension row: exactly one identity column, in order
    for i in range(4, 42):
        assert _BG2_ROWS[i][-1] == 10 + i
        assert all(j < 14 for j in _BG2_ROWS[i][:-1])
    # spot rows
    assert _BG2_ROWS[0] == (0, 1, 2, 3, 6, 9, 10, 11)
    assert _BG2_ROWS[26] == (2, 7, 12, 13, 36)
    # BG1 core rows: 19 entries each, special col 22 at rows {0,1,3}
    assert all(len(r) == 19 for r in _BG1_CORE_ROWS)
    assert [i for i in range(4) if 22 in _BG1_CORE_ROWS[i]] == [0, 1, 3]
    assert [i for i in range(4) if 23 in _BG1_CORE_ROWS[i]] == [0, 1]
    assert [i for i in range(4) if 25 in _BG1_CORE_ROWS[i]] == [2, 3]


def test_bg2_expanded_matches_connectivity():
    """The expanded code's base matrix preserves the recalled connectivity
    exactly (girth optimization moves shift values, never edges)."""
    from ecc_ldpc_tpu.codes.nr5g import _BG2_ROWS

    base = nr5g("bg2", 104).qc.base
    for i in range(42):
        assert tuple(np.flatnonzero(base[i] >= 0)) == _BG2_ROWS[i]


def test_bg1_recalled_connectivity():
    """Pin the recalled BG1 connectivity (38.212 Table 5.3.2-2; VERDICT
    r3 item 5, second targeted attempt): published aggregate anchors —
    316 edges total, punctured heavy-column weights 30/28, core rows at
    19 entries each — plus identity-column structure and per-row spot
    checks so accidental edits are caught."""
    from ecc_ldpc_tpu.codes.nr5g import _BG1_CORE_ROWS, _BG1_EXT_ROWS

    rows = _BG1_CORE_ROWS + _BG1_EXT_ROWS
    assert len(rows) == 46
    assert sum(len(r) for r in rows) == 316
    colw = np.zeros(68, int)
    for r in rows:
        for j in r:
            colw[j] += 1
    assert colw[0] == 30 and colw[1] == 28
    # every extension row r: exactly one identity column 22 + r, in order
    for i, r in enumerate(_BG1_EXT_ROWS):
        assert r[-1] == 26 + i
        assert all(j < 26 for j in r[:-1])
    # extension degrees span the published 3..10 range; row 4 is the
    # famous degree-3 row {0, 1, 26}
    degs = [len(r) for r in _BG1_EXT_ROWS]
    assert min(degs) == 3 and max(degs) == 10
    assert _BG1_EXT_ROWS[0] == (0, 1, 26)
    assert _BG1_EXT_ROWS[4] == (0, 1, 3, 12, 16, 19, 21, 22, 24, 30)
    assert _BG1_EXT_ROWS[41] == (1, 6, 10, 67)


def test_bg1_expanded_matches_connectivity():
    """The expanded code's base matrix preserves the recalled BG1
    connectivity exactly (girth optimization moves shifts, not edges)."""
    from ecc_ldpc_tpu.codes.nr5g import _BG1_CORE_ROWS, _BG1_EXT_ROWS

    base = nr5g("bg1", 104).qc.base
    for i, cols in enumerate(_BG1_CORE_ROWS + _BG1_EXT_ROWS):
        assert tuple(np.flatnonzero(base[i] >= 0)) == cols


@pytest.mark.parametrize("bg,Zc", [("bg1", 384), ("bg2", 208), ("bg1", 56)])
def test_encoder_validates(bg, Zc):
    spec = nr5g(bg, Zc)
    enc = build_encoder(spec)
    assert isinstance(enc, NRCoreExtensionEncoder)
    key = jax.random.key(0)
    msg = jax.random.bernoulli(key, 0.5, (3, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    assert spec.check_syndrome(np.asarray(cw))
    assert np.array_equal(np.asarray(cw), enc.encode_numpy(np.asarray(msg)))


def test_filler_bits():
    spec = nr5g("bg1", 384, k=8000)
    assert spec.k == 8000
    assert len(spec.shortened_cols) == 22 * 384 - 8000
    enc = build_encoder(spec)
    key = jax.random.key(1)
    msg = jax.random.bernoulli(key, 0.5, (2, 8000)).astype(jnp.uint8)
    cw = np.asarray(enc(msg))
    # filler positions carry zeros
    assert not cw[:, np.asarray(spec.shortened_cols)].any()
    assert spec.check_syndrome(cw)


def test_rate_matching_puncture():
    spec = nr5g("bg1", 384, k=8448, n_tx=12000)
    assert abs(spec.rate - 8448 / 12000) < 1e-9
    # leading 2Zc always punctured
    assert set(range(2 * 384)).issubset(set(spec.punctured_cols))
    with pytest.raises(ValueError):
        nr5g("bg1", 384, n_tx=10**6)


def test_channel_masking():
    spec = nr5g("bg2", 52, k=400)
    ch = make_channel(spec)
    cw = jnp.zeros((4, spec.n), jnp.uint8)
    llr = np.asarray(ch(jax.random.key(0), cw, 3.0))
    assert np.all(llr[:, np.asarray(spec.punctured_cols)] == 0.0)
    assert np.all(llr[:, np.asarray(spec.shortened_cols)] == 60.0)


def test_punctured_decode_recovers_message():
    """The 2Zc punctured systematic bits must be recovered by BP."""
    from ecc_ldpc_tpu.decode import make_decoder
    from ecc_ldpc_tpu.graph import compile_graph

    spec = nr5g("bg2", 32)
    enc = build_encoder(spec)
    graph = compile_graph(spec)
    ch = make_channel(spec)
    key = jax.random.key(3)
    msg = jax.random.bernoulli(key, 0.5, (16, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    llr = ch(jax.random.fold_in(key, 1), cw, 4.0)
    res = make_decoder(graph, "minsum", alpha=0.8125, max_iters=30)(llr)
    got = np.asarray(enc.extract_message(res.bits))
    assert (got == np.asarray(msg)).all(axis=1).mean() > 0.9


def test_bad_args():
    with pytest.raises(ValueError):
        nr5g("bg3", 384)
    with pytest.raises(ValueError):
        nr5g("bg1", 100)
    with pytest.raises(ValueError):
        nr5g("bg1", 384, k=0)


def test_rate_matched_truncation_equivalent():
    """n_tx rate matching drops extension rows whose degree-1 parity is
    entirely punctured. Those checks are permanently inert (their parity
    VN returns extrinsic LLR 0, zeroing every outgoing message), so the
    truncated decode must produce bit-identical posteriors to the full
    mother graph with the tail LLRs zeroed."""
    from ecc_ldpc_tpu.decode import make_decoder
    from ecc_ldpc_tpu.graph import compile_graph

    Zc = 16
    k = 10 * Zc
    n_tx = 20 * Zc  # rate 1/2
    t = nr5g("bg2", Zc, k=k, n_tx=n_tx)
    f = nr5g("bg2", Zc, k=k)
    assert t.n < f.n and t.m < f.m
    assert abs(t.rate - k / n_tx) < 1e-9

    enc_t, enc_f = build_encoder(t), build_encoder(f)
    key = jax.random.key(7)
    msg = jax.random.bernoulli(key, 0.5, (24, k)).astype(jnp.uint8)
    cw_t, cw_f = np.asarray(enc_t(msg)), np.asarray(enc_f(msg))
    # parities are computed sequentially, so truncation is a prefix
    assert np.array_equal(cw_t, cw_f[:, : t.n])

    # one channel realization; identical LLRs on shared transmitted
    # positions, zeros on everything rate-matching would not transmit
    sigma = 0.7
    noise = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1), cw_f.shape)
    )
    llr_f = 2.0 * ((1.0 - 2.0 * cw_f.astype(np.float32)) + sigma * noise) / sigma**2
    llr_f[:, np.asarray(t.punctured_cols)] = 0.0
    llr_f[:, t.n :] = 0.0
    llr_t = llr_f[:, : t.n].copy()

    # flooding schedule: schedule-free, so the two graphs are comparable
    # message-for-message (fixed iterations; no early termination)
    dec_t = make_decoder(compile_graph(t), "minsum", alpha=0.8125,
                         max_iters=12, early_term=False, backend="xla")
    dec_f = make_decoder(compile_graph(f), "minsum", alpha=0.8125,
                         max_iters=12, early_term=False, backend="xla")
    bt = np.asarray(dec_t(jnp.asarray(llr_t)).bits)
    bf = np.asarray(dec_f(jnp.asarray(llr_f)).bits)
    assert np.array_equal(bt, bf[:, : t.n])


# ---- redundancy versions RV0-3 (38.212 §5.4.2.1; r5, VERDICT r4 item 5) --


def test_rv_k0_published_positions():
    """Table 5.4.2.1-2 with the full buffer: k0/Zc = 0/17/33/56 (BG1),
    0/13/25/43 (BG2) — hand-computed from the published formulas."""
    from ecc_ldpc_tpu.codes.nr5g import rv_k0

    for Zc in (4, 52, 384):
        assert [rv_k0("bg1", Zc, rv) for rv in range(4)] == [
            0, 17 * Zc, 33 * Zc, 56 * Zc]
        assert [rv_k0("bg2", Zc, rv) for rv in range(4)] == [
            0, 13 * Zc, 25 * Zc, 43 * Zc]
    with pytest.raises(ValueError):
        rv_k0("bg1", 384, 4)


def test_rv_window_selection_small():
    """Hand-built expected transmitted set on a tiny lifting: BG2, Zc=4,
    rv=3 starts at buffer position 43*4=172 and wraps past N_cb=200."""
    Zc, n_tx = 4, 40
    spec = nr5g("bg2", Zc, n_tx=n_tx, rv=3)
    n_cb = 50 * Zc
    k0 = 43 * Zc
    want = {2 * Zc + (k0 + j) % n_cb for j in range(n_tx)}  # no filler here
    got = set(range(spec.n)) - set(spec.punctured_cols)
    assert got == want
    # wraps: some selected positions lie before k0
    assert any(c < 2 * Zc + k0 for c in got)


def test_rv0_circular_matches_legacy_transmitted_set():
    """rv=0's circular window must select exactly the legacy tail-puncture
    path's transmitted bits (the truncation path is BER-preserving, so the
    two specs describe the same transmission)."""
    k, n_tx = 320, 640
    legacy = nr5g("bg2", 32, k=k, n_tx=n_tx)        # truncated graph
    rv0 = nr5g("bg2", 32, k=k, n_tx=n_tx, rv=0)     # full graph
    tx_legacy = (set(range(legacy.n)) - set(legacy.punctured_cols)
                 - set(legacy.shortened_cols))
    tx_rv0 = (set(range(rv0.n)) - set(rv0.punctured_cols)
              - set(rv0.shortened_cols))
    assert tx_legacy == tx_rv0
    assert rv0.n > legacy.n  # rv path keeps the full mother graph


def test_rv_filler_skipped():
    """Filler (NULL) positions are skipped by bit selection, not counted."""
    Zc, k = 32, 200  # k < kb*Zc=320 -> fillers at cols 200..319
    spec = nr5g("bg2", Zc, k=k, n_tx=400, rv=1)
    tx = set(range(spec.n)) - set(spec.punctured_cols) - set(spec.shortened_cols)
    assert len(tx) == 400
    assert not (set(range(k, 10 * Zc)) & tx)  # no filler transmitted


def test_rv3_self_decodable_and_harq_combining():
    """RV3 (wrapped window incl. systematic tail) decodes standalone at
    high SNR; and IR-combining RV0+RV2 beats RV0 alone at the same SNR."""
    from ecc_ldpc_tpu.codes.nr5g import harq_combine
    from ecc_ldpc_tpu.decode import make_decoder
    from ecc_ldpc_tpu.graph.qc import compile_qc_graph

    Zc, k, n_tx = 32, 320, 500
    key = jax.random.key(9)
    specs = {rv: nr5g("bg2", Zc, k=k, n_tx=n_tx, rv=rv) for rv in (0, 2, 3)}
    enc = build_encoder(specs[3])
    msg = jax.random.bernoulli(key, 0.5, (64, k)).astype(jnp.uint8)
    cw = enc(msg)

    def decode_fer(llr, spec):
        dec = make_decoder(compile_qc_graph(spec), "layered", alpha=0.8125,
                           max_iters=30)
        res = dec(llr)
        ok_msg = (np.asarray(enc.extract_message(res.bits))
                  == np.asarray(msg)).all(axis=1)
        return 1.0 - ok_msg.mean()

    llr3 = make_channel(specs[3])(jax.random.fold_in(key, 1), cw, 7.0)
    assert decode_fer(llr3, specs[3]) < 0.2  # standalone RV3, rate ~0.64

    # IR combining at an SNR where one RV0 transmission mostly fails
    snr = 1.0
    llr0 = make_channel(specs[0])(jax.random.fold_in(key, 2), cw, snr)
    llr2 = make_channel(specs[2])(jax.random.fold_in(key, 3), cw, snr)
    fer_single = decode_fer(llr0, specs[0])
    fer_comb = decode_fer(harq_combine(llr0, llr2), specs[0])
    assert fer_comb < fer_single, (fer_comb, fer_single)


def test_rv_spec_string_surface():
    from ecc_ldpc_tpu.codes import get_code

    spec = get_code("nr5g/bg2/32/320/500/rv2")
    assert ".rv2" in spec.name
    with pytest.raises(ValueError):
        nr5g("bg2", 32, rv=2)  # rv without n_tx is meaningless
