"""Statistical BER integration tests (SURVEY.md §4.2 item 5).

The golden-band test pins the (3,6) n=1008 waterfall: the BER-parity
correctness oracle of the whole framework (BASELINE.json:2). Bands were
recorded from the oracle SPA tier with generous CI margins.
"""
import numpy as np
import pytest

from ecc_ldpc_tpu.chan import uncoded_bpsk_ber
from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec, run_sweep

pytestmark = pytest.mark.slow


def test_uncoded_bpsk_matches_q_function():
    spec = SweepSpec(
        code="bpsk/1024", decoder="hard", ebn0_db=(0.0, 2.0, 4.0, 6.0),
        batch=512, stopping=StoppingRule(min_frame_errors=10**9, max_frames=8192),
    )
    for r in run_sweep(spec):
        want = float(uncoded_bpsk_ber(r.ebn0_db))
        lo, hi = r.ber_ci
        assert lo <= want * 1.05 and hi >= want * 0.95, (r.ebn0_db, r.ber, want)


def test_mackay1008_spa_waterfall_band():
    """SPA on the shipped (3,6) n=1008 code: FER inside golden bands.

    Bands chosen ~4x wider than binomial CI at these sample sizes; they
    encode the density-evolution threshold (~1.1 dB) + finite-length gap.
    """
    spec = SweepSpec(
        code="mackay1008", decoder="spa/50", ebn0_db=(1.0, 1.5, 2.0),
        batch=256, stopping=StoppingRule(min_frame_errors=50, max_frames=6144),
    )
    res = {r.ebn0_db: r for r in run_sweep(spec)}
    assert 0.55 <= res[1.0].fer <= 0.95
    assert 0.08 <= res[1.5].fer <= 0.45
    assert res[2.0].fer <= 0.08


def test_fer_extremes():
    """FER ~ 1 far below threshold; FER ~ 0 far above (SURVEY.md §4.2)."""
    lo = run_sweep(SweepSpec(
        code="mackay1008", decoder="minsum/25", ebn0_db=(-2.0,), batch=64,
        stopping=StoppingRule(min_frame_errors=1, max_frames=64),
    ))[0]
    assert lo.fer > 0.95
    hi = run_sweep(SweepSpec(
        code="mackay1008", decoder="minsum/25", ebn0_db=(4.5,), batch=256,
        stopping=StoppingRule(min_frame_errors=10**9, max_frames=1024),
    ))[0]
    assert hi.fer < 0.01
