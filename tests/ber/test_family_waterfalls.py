"""Per-family waterfall position checks (slow; SURVEY.md §4.2 item 5).

Bands are generous (4x binomial CI) and encode where each family's
threshold + finite-length gap must sit. A surrogate table that broke the
construction (wrong protograph, destroyed girth) would leave these bands.
"""
import pytest

from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec, run_sweep

pytestmark = pytest.mark.slow


def _fer(code, decoder, ebn0, batch=128, max_frames=1024):
    res = run_sweep(SweepSpec(
        code=code, decoder=decoder, ebn0_db=(ebn0,), batch=batch,
        stopping=StoppingRule(min_frame_errors=40, max_frames=max_frames),
    ))
    return res[0].fer


def test_80211n_648_r12_waterfall():
    dec = "layered/norm:0.8125/25"
    assert _fer("80211n/648/12", dec, 1.0) > 0.25
    assert _fer("80211n/648/12", dec, 2.5) < 0.12


def test_wimax_576_r12_waterfall():
    dec = "layered/norm:0.8125/25"
    assert _fer("wimax/576/12", dec, 1.0) > 0.25
    assert _fer("wimax/576/12", dec, 3.0) < 0.15


def test_dvbs2_short_r12_waterfall():
    # n=16200 r~1/2: long-block territory, waterfall between 1 and 2.5 dB
    dec = "layered/norm:0.8125/30"
    assert _fer("dvbs2/16200/12", dec, 0.6, batch=64, max_frames=256) > 0.5
    assert _fer("dvbs2/16200/12", dec, 2.2, batch=64, max_frames=256) < 0.2


def test_8023an_waterfall():
    # (6,32)-regular rate 0.84: GA-DE threshold 3.0 dB; n=2048 finite-
    # length waterfall measured 3.2-4.0 dB (fer 0.70 @3.2, 0.004 @4.0)
    dec = "minsum/norm:0.8125/25"
    assert _fer("8023an", dec, 3.0) > 0.4
    assert _fer("8023an", dec, 4.2) < 0.1


def test_nr5g_bg2_waterfall():
    # BG2 Zc=64, mother rate 1/5: works at very low Eb/N0
    dec = "minsum/norm:0.8125/30"
    assert _fer("nr5g/bg2/64", dec, -1.5, batch=64, max_frames=256) > 0.4
    assert _fer("nr5g/bg2/64", dec, 1.5, batch=64, max_frames=256) < 0.15
