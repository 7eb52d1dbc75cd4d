"""Code-construction and loader unit tests (SURVEY.md §4.2 item 1)."""
import numpy as np
import pytest

from ecc_ldpc_tpu.codes import (
    CodeSpec,
    dumps_alist,
    gallager_36,
    loads_alist,
    mackay_1008,
)
from ecc_ldpc_tpu.codes.qc import QCCode, circulant, expand_qc
from ecc_ldpc_tpu.encode.gf2 import gf2_rank, gf2_row_reduce, pack_rows, unpack_rows


def test_alist_roundtrip():
    spec = gallager_36(48, seed=3)
    text = dumps_alist(spec)
    spec2 = loads_alist(text)
    assert spec2.n == spec.n and spec2.m == spec.m
    for a, b in zip(spec.row_cols, spec2.row_cols):
        assert np.array_equal(a, b)


def test_alist_unpadded_accepted():
    # regular codes have no padding either way; force an irregular code
    H = np.array([[1, 1, 0, 1], [0, 1, 1, 0]], dtype=np.uint8)
    spec = CodeSpec.from_dense(H)
    text = dumps_alist(spec)
    # strip the padding zeros
    toks = []
    for line in text.splitlines():
        toks.append(" ".join(t for t in line.split() if t != "0" or line.startswith("0")))
    spec2 = loads_alist(text)
    assert np.array_equal(spec2.dense(), H)


def test_mackay1008_shape_and_regularity():
    spec = mackay_1008()
    assert spec.n == 1008 and spec.m == 504
    assert set(spec.row_deg.tolist()) == {6}
    assert set(spec.col_deg.tolist()) == {3}
    assert spec.num_edges == 3024
    # 4-cycle-free: no two rows share 2+ columns
    from ecc_ldpc_tpu.codes.gallager import _four_cycle_pairs

    assert not _four_cycle_pairs(list(spec.row_cols))
    # rank deficiency of the Gallager ensemble: exactly j-1 = 2
    assert spec.k == 1008 - gf2_rank(spec.dense()) == 506


def test_gallager_deterministic():
    a = gallager_36(96, seed=7)
    b = gallager_36(96, seed=7)
    for ra, rb in zip(a.row_cols, b.row_cols):
        assert np.array_equal(ra, rb)


def test_gf2_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    H = rng.integers(0, 2, (13, 171), dtype=np.uint8)
    assert np.array_equal(unpack_rows(pack_rows(H), 171), H)


def test_gf2_row_reduce_properties():
    rng = np.random.default_rng(1)
    H = rng.integers(0, 2, (20, 35), dtype=np.uint8)
    R, piv = gf2_row_reduce(H)
    rank = len(piv)
    # pivot columns of R form an identity on the first `rank` rows
    assert np.array_equal(R[:rank][:, piv], np.eye(rank, dtype=np.uint8))
    assert not R[rank:].any()
    # row spaces agree: rank of stacked matrix unchanged
    assert gf2_rank(np.vstack([H, R])) == rank


def test_circulant_convention():
    P = circulant(5, 2)
    # row r has its 1 at column (r+2) % 5
    for r in range(5):
        assert P[r, (r + 2) % 5] == 1
    assert P.sum() == 5
    # P^a @ P^b = P^(a+b)
    a, b = circulant(7, 3), circulant(7, 5)
    assert np.array_equal((a @ b) % 2, circulant(7, (3 + 5) % 7))


def test_qc_expand_matches_dense_circulants():
    base = np.array([[0, 2, -1], [1, -1, 3]], dtype=np.int32)
    qc = QCCode(Z=4, base=base)
    spec = expand_qc(qc)
    H = spec.dense()
    want = np.zeros((8, 12), dtype=np.uint8)
    for i in range(2):
        for j in range(3):
            if base[i, j] >= 0:
                want[i * 4 : (i + 1) * 4, j * 4 : (j + 1) * 4] = circulant(4, base[i, j])
    assert np.array_equal(H, want)
    assert spec.qc is qc


def test_qc_shift_out_of_range_rejected():
    with pytest.raises(ValueError):
        QCCode(Z=4, base=np.array([[4]]))
