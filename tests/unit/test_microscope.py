"""Trapping-set microscopy (sim/microscope.py): classification against
brute-force H arithmetic, QC rotation canonicalization, and an
end-to-end harvest through the ECC facade."""
import numpy as np
import pytest

from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.sim.microscope import (
    canonical_set,
    classify_failure,
    harvest,
)


def _brute_ab(spec, err_set):
    H = spec.dense()
    e = np.zeros(spec.n, np.uint8)
    e[list(err_set)] = 1
    synd = (H @ e) % 2
    deg = H @ e  # induced degree per check
    return len(err_set), int(synd.sum()), bool(
        len(err_set) and deg.max() <= 2)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_classify_matches_bruteforce(seed):
    spec = get_code("80211n/648/12")
    rng = np.random.default_rng(seed)
    tx = np.zeros(spec.n, np.uint8)
    err = rng.choice(spec.n, size=rng.integers(1, 6), replace=False)
    rx = tx.copy()
    rx[err] = 1
    f = classify_failure(spec, tx, rx)
    a, b, elem = _brute_ab(spec, set(err.tolist()))
    assert (f.a, f.b, f.elementary) == (a, b, elem)
    assert set(f.vn_set) == set(err.tolist())


def test_single_flip_is_elementary():
    spec = get_code("mackay1008")
    tx = np.zeros(spec.n, np.uint8)
    rx = tx.copy()
    rx[17] = 1
    f = classify_failure(spec, tx, rx)
    # (3,6)-regular: one flipped bit leaves its dv=3 checks odd, degree 1
    assert f.a == 1 and f.b == 3 and f.elementary


def test_qc_canonicalization_merges_rotations():
    spec = get_code("80211n/648/12")
    Z = spec.qc.Z
    base = (0 * Z + 3, 5 * Z + 11, 9 * Z + 20)
    for t in (1, 7, 26):
        rot = tuple(b // Z * Z + (b % Z + t) % Z for b in base)
        assert canonical_set(spec, rot) == canonical_set(spec, base)
    # a genuinely different set must NOT merge
    other = (0 * Z + 3, 5 * Z + 12, 9 * Z + 20)
    assert canonical_set(spec, other) != canonical_set(spec, base)


def test_harvest_end_to_end():
    # low SNR + few iterations so failures are plentiful at small frames
    rep = harvest("80211n/648/12", "minsum/norm:0.8125/5",
                  ebn0_db=1.0, frames=256, batch=128, seed=3)
    assert rep.frames == 256
    assert len(rep.failures) > 0
    assert sum(rep.histogram.values()) == len(rep.failures) \
        or sum(rep.histogram.values()) >= len(rep.failures)  # cap-safe
    # every classified failure's b equals its unsat count
    for f in rep.failures[:50]:
        assert f.b == len(f.unsat_checks)
    js = rep.to_json()
    assert js["n_failures"] == sum(rep.histogram.values())
    assert rep.summary()
