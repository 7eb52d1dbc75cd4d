"""Operating-point finder tests (sim/findsnr.py)."""
import math

import pytest

from ecc_ldpc_tpu.sim.findsnr import find_operating_point


def test_uncoded_bpsk_matches_closed_form():
    """Uncoded BPSK frame of n bits: FER = 1 - (1-Q(sqrt(2g)))^n, so the
    Eb/N0 for a target FER has a closed form to pin the finder against."""
    n, target = 128, 0.05
    # invert: per-bit p = 1 - (1-target)^(1/n); g = (Qinv(p))^2 / 2
    from scipy.stats import norm

    p = 1.0 - (1.0 - target) ** (1.0 / n)
    g = norm.isf(p) ** 2 / 2.0
    expected_db = 10.0 * math.log10(g)
    op = find_operating_point(
        f"bpsk/{n}", "minsum/1", target_fer=target, bracket=(2.0, 12.0),
        tol_db=0.08, batch=1024, max_frames_per_probe=32768,
    )
    assert abs(op.ebn0_db - expected_db) < 0.25


def test_coded_point_and_ordering():
    """An LDPC code needs less SNR at FER 0.3 than at FER 0.02, and both
    sit in the code's known waterfall region."""
    kw = dict(bracket=(0.0, 6.0), tol_db=0.15, batch=256,
              max_frames_per_probe=4096)
    hi = find_operating_point("80211n/648/12", "layered/norm:0.8125/15",
                              target_fer=0.3, **kw)
    lo = find_operating_point("80211n/648/12", "layered/norm:0.8125/15",
                              target_fer=0.02, **kw)
    assert hi.ebn0_db < lo.ebn0_db
    assert 0.5 < hi.ebn0_db < 3.5 and 1.0 < lo.ebn0_db < 4.5


def test_bad_bracket_raises():
    with pytest.raises(ValueError):
        find_operating_point(
            "80211n/648/12", "layered/norm:0.8125/25", target_fer=0.3,
            bracket=(8.0, 10.0), batch=256, max_frames_per_probe=2048,
        )
