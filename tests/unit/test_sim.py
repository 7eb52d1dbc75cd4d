"""Monte-Carlo harness tests (SURVEY.md §4.2 items 1, 5-lite)."""
import json
import os

import numpy as np
import pytest

from ecc_ldpc_tpu.chan import uncoded_bpsk_ber
from ecc_ldpc_tpu.sim import (
    PointResult,
    StoppingRule,
    SweepSpec,
    curves_overlap,
    format_table,
    run_sweep,
    wilson_interval,
)
from ecc_ldpc_tpu.sim.report import results_to_json


def test_wilson_interval_basics():
    lo, hi = wilson_interval(0, 0)
    assert (lo, hi) == (0.0, 1.0)
    lo, hi = wilson_interval(50, 100)
    assert lo < 0.5 < hi and hi - lo < 0.25
    lo, hi = wilson_interval(0, 1000)
    assert lo == 0.0 and 0 < hi < 0.01  # rule-of-three-ish upper bound


def test_stopping_rule():
    r = StoppingRule(min_frame_errors=10, max_frames=100)
    assert not r.done(5, 50)
    assert r.done(10, 50)
    assert r.done(0, 100)
    r2 = StoppingRule(min_frame_errors=1, max_frames=100, min_frames=64)
    assert not r2.done(5, 32)
    assert r2.done(5, 64)


def _bpsk_spec(**kw):
    defaults = dict(
        code="bpsk/512",
        decoder="hard",
        ebn0_db=(4.0,),
        batch=128,
        stopping=StoppingRule(min_frame_errors=40, max_frames=4096),
    )
    defaults.update(kw)
    return SweepSpec(**defaults)


def test_bpsk_sweep_matches_theory():
    res = run_sweep(_bpsk_spec(ebn0_db=(2.0, 4.0)))
    for r in res:
        want = float(uncoded_bpsk_ber(r.ebn0_db))
        # generous CI: binomial fluctuation over >=64k bits
        assert abs(r.ber - want) / want < 0.2, (r.ebn0_db, r.ber, want)


def test_sweep_deterministic_given_seed():
    a = run_sweep(_bpsk_spec(seed=3))
    b = run_sweep(_bpsk_spec(seed=3))
    c = run_sweep(_bpsk_spec(seed=4))
    assert a[0].bit_errors == b[0].bit_errors
    assert a[0].bit_errors != c[0].bit_errors


def test_ber_ci_burst_variance():
    """ber_ci design effect must follow sum(w^2)/sum(w), not the mean
    burst: a few heavy frames dominate the BER estimator's variance
    (measured on dvbs2/16200 over apsk32 at 5.6 dB, where 9 of 437
    errored frames carried 80% of the bit errors and two same-decoder
    runs sat 3.6x apart in BER at matched FER)."""
    base = dict(code="c", decoder="d", ebn0_db=1.0, frames=10_000,
                message_bits_per_frame=8100)
    # equal bursts: new formula reduces exactly to the old mean-burst one
    eq = PointResult(**base, frame_errors=100, bit_errors=500,
                     bit_errors_sq=100 * 5.0**2)
    old = PointResult(**base, frame_errors=100, bit_errors=500)
    np.testing.assert_allclose(eq.ber_ci, old.ber_ci, rtol=1e-12)
    # heavy-tailed bursts at the same totals: CI must widen, a lot
    heavy = PointResult(**base, frame_errors=100, bit_errors=500,
                        bit_errors_sq=96 * 1.0 + 4 * 101.0**2)
    assert heavy.ber == eq.ber
    assert heavy.ber_ci[1] - heavy.ber_ci[0] > 3 * (eq.ber_ci[1] - eq.ber_ci[0])
    # and stay centered: the point estimate is inside both intervals
    assert heavy.ber_ci[0] < heavy.ber < heavy.ber_ci[1]


def test_sweep_tracks_bit_errors_sq():
    """The squared-weight counter must equal the sum over frames of the
    per-frame bit-error count squared (uncoded BPSK: recompute exactly)."""
    res = run_sweep(_bpsk_spec(seed=11))[0]
    assert res.bit_errors_sq > 0
    assert res.bit_errors_sq >= res.bit_errors  # w^2 >= w for integer w
    assert res.bit_errors_sq <= res.bit_errors * 512  # w^2 <= w*n
    # consistency of the CI: new interval contains the point estimate
    lo, hi = res.ber_ci
    assert lo <= res.ber <= hi


def test_resume_reproduces_uninterrupted_totals(tmp_path):
    """Fault-injection-style test (SURVEY.md §5.3): kill the sweep mid-way,
    resume, and require identical totals to an uninterrupted run."""
    state = str(tmp_path / "state.json")
    rule = StoppingRule(min_frame_errors=10**9, max_frames=512)  # 4 steps
    full = run_sweep(_bpsk_spec(seed=9, stopping=rule))

    # interrupted: stop after 2 steps (simulated crash), then resume with
    # the real rule from the state file
    partial_spec = _bpsk_spec(
        seed=9, stopping=StoppingRule(min_frame_errors=10**9, max_frames=256)
    )
    run_sweep(partial_spec, resume_path=state)
    assert os.path.exists(state)
    resumed = run_sweep(_bpsk_spec(seed=9, stopping=rule), resume_path=state)
    assert resumed[0].frames == full[0].frames
    assert resumed[0].bit_errors == full[0].bit_errors
    assert resumed[0].frame_errors == full[0].frame_errors
    assert resumed[0].bit_errors_sq == full[0].bit_errors_sq


def test_report_formats():
    res = run_sweep(_bpsk_spec())
    table = format_table(res)
    assert "bpsk/512" in table and "BER" in table
    parsed = json.loads(results_to_json(res))
    assert parsed[0]["frames"] == res[0].frames
    assert 0 <= parsed[0]["ber"] <= 1


def test_curves_overlap():
    def pt(ebn0, errs, frames):
        p = PointResult("c", "d", ebn0, frames=frames, frame_errors=errs,
                        bit_errors=errs, message_bits_per_frame=1)
        return p

    a = [pt(1.0, 50, 1000), pt(2.0, 10, 1000)]
    b = [pt(1.0, 55, 1000), pt(2.0, 12, 1000)]
    assert curves_overlap(a, b)
    c = [pt(1.0, 300, 1000), pt(2.0, 10, 1000)]
    assert not curves_overlap(a, c)
    with pytest.raises(ValueError):
        curves_overlap(a, [pt(9.0, 1, 10)])


def test_curves_overlap_borrows_design_effect():
    """BER overlap vs a legacy golden (no bit_errors_sq): the golden's CI
    is recomputed with the measured run's burst design effect — the
    real apsk32 case, where both runs drew from the same heavy-tailed
    per-frame weight distribution but sat 3.6x apart in BER."""
    base = dict(code="c", decoder="d", ebn0_db=5.6,
                message_bits_per_frame=8100)
    golden = PointResult(**base, frames=46080, frame_errors=402,
                         bit_errors=2319)  # legacy: no bit_errors_sq
    # measured: same FER, 3.6x the BER, 2 heavy frames dominate w^2
    measured = PointResult(**base, frames=13312, frame_errors=104,
                           bit_errors=2383, bit_errors_sq=7.4e5)
    assert curves_overlap([measured], [golden], metric="fer")
    # without borrowing the legacy CI is ~±10% and cannot reach 2.2e-5;
    # with the borrowed design effect both CIs are frame-event-scaled
    assert curves_overlap([measured], [golden], metric="ber")
    # both sides carrying the statistic: no patching, normal comparison
    golden2 = PointResult(**base, frames=46080, frame_errors=402,
                          bit_errors=2319, bit_errors_sq=310.0 * 2319)
    assert curves_overlap([measured], [golden2], metric="ber")


def test_ldpc_sweep_smoke():
    spec = SweepSpec(
        code="gallager/96/3/6/s1",
        decoder="minsum/10",
        ebn0_db=(3.0,),
        batch=64,
        stopping=StoppingRule(min_frame_errors=5, max_frames=256),
    )
    res = run_sweep(spec)
    assert res[0].frames >= 64
    assert res[0].mean_iters > 0
