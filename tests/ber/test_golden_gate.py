"""Golden-curve regression gate (VERDICT r1 item 4): re-measure each
family at its deep TPU golden points and require Wilson-CI overlap — the
reference's overlapping-BER-curves validation as an automated test
(SURVEY.md §1.1, sim/report.curves_overlap).

The goldens (curves/*_golden.json) carry >= 16384 frames per point (up
to 400 frame errors), so their CIs are tight enough that a ~1.5x FER
regression at a waterfall point fails the gate. The re-measure arm runs
on CPU in the slow tier with a smaller budget — its wider CI is what the
overlap test correctly accounts for. Points whose golden FER is below
what the CPU budget can resolve (few expected errors) are skipped by
the min-FER filter, not silently compared against nothing.
"""
import json
from pathlib import Path

import pytest

from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec, curves_overlap, run_sweep
from ecc_ldpc_tpu.sim.runner import PointResult

pytestmark = pytest.mark.slow

_CURVES = Path(__file__).parents[2] / "curves"

# (golden file, max points to re-measure) — re-measure the waterfall
# points the CPU budget can resolve: golden FER >= MIN_FER
_GOLDENS = [
    "80211n_1944_12_tpu_golden.json",
    "wimax_2304_12_tpu_golden.json",
    "wimax_2304_56_tpu_golden.json",     # r3: recalled high-rate tables
    "nr5g_bg1_384_tpu_golden.json",
    "nr5g_bg2_384_tpu_golden.json",
    "dvbs2_16200_12_tpu_golden.json",
    "dvbs2_64800_12_tpu_golden.json",    # r3: the flagship itself
    "mackay1008_tpu_golden.json",        # r3: config-1 class, spa/50
    # r4: the APSK modem layer under the gate (16APSK standard mapping,
    # 32APSK surrogate — PointResult carries the channel spec)
    "dvbs2_16200_12_apsk16_tpu_golden.json",
    "dvbs2_16200_12_apsk32_tpu_golden.json",
    "8023an_tpu_golden.json",            # r4: RS-LDPC family (flooding)
    "8023an_layered_tpu_golden.json",    # r5: xor-QC layered production path
]
_MIN_FER = 2e-2      # ~80+ expected errors in the 4096-frame CPU budget
_MAX_POINTS = 2      # the two lowest-SNR resolvable points per family


def _load(path: Path):
    return [PointResult.from_json(d) for d in json.loads(path.read_text())]


@pytest.mark.parametrize("fname", _GOLDENS)
def test_family_matches_golden(fname):
    path = _CURVES / fname
    if not path.exists():
        pytest.skip(f"{fname}: golden not generated yet (gen_goldens.py)")
    golden = _load(path)
    pts = [r for r in golden if r.fer >= _MIN_FER][:_MAX_POINTS]
    if not pts:
        pytest.skip(f"{fname}: no point with FER >= {_MIN_FER}")
    code, decoder = pts[0].code, pts[0].decoder
    res = run_sweep(SweepSpec(
        code=code, decoder=decoder, channel=pts[0].channel or "bpsk",
        ebn0_db=tuple(r.ebn0_db for r in pts),
        batch=512, seed=77,
        stopping=StoppingRule(min_frame_errors=80, max_frames=4096),
    ))
    # FER: CI overlap, except near saturation (golden FER >= 0.5) where a
    # 1.25x ratio band also passes — at the iteration cap the TPU bf16
    # kernel and CPU f32 oracle legitimately disagree by a few percent on
    # WHICH marginal frames converge within the cap (measured: recalled
    # BG1 at 0.8 dB reads 0.63 on CPU vs 0.68 TPU golden, CIs adjacent
    # but disjoint), and a real regression at saturation either pushes
    # FER to ~1 or moves the whole waterfall, which the mid-band point
    # catches.
    def fer_pt_ok(m, r):
        lo, hi = m.fer_ci
        if not (r.fer_ci[1] < lo or hi < r.fer_ci[0]):
            return True
        return r.fer >= 0.5 and 0.8 <= m.fer / r.fer <= 1.25

    assert all(fer_pt_ok(m, r) for m, r in zip(res, pts)), (
        f"{code} FER diverged from golden:\n"
        + "\n".join(
            f"  {r.ebn0_db} dB: got {m.fer:.3e} {m.fer_ci}, "
            f"golden {r.fer:.3e} {r.fer_ci}"
            for m, r in zip(res, pts)
        )
    )
    # BER: the stored CI is binomial over BITS, but bit errors cluster in
    # failed frames, so at high-FER points the true sampling variance is
    # far larger than binomial (measured: CPU-f32 vs TPU-bf16 flagship at
    # 1.0 dB differ ~19% in BER at statistically identical FER). Gate BER
    # at CI-overlap OR within a 2x band — a real decoder regression moves
    # BER an order of magnitude; a tier/clustering artifact stays inside.
    assert curves_overlap(res, pts, metric="ber") or all(
        0.5 <= (m.ber / r.ber) <= 2.0 for m, r in zip(res, pts) if r.ber > 0
    ), (
        f"{code} BER diverged >2x from golden:\n"
        + "\n".join(
            f"  {r.ebn0_db} dB: got {m.ber:.3e}, golden {r.ber:.3e}"
            for m, r in zip(res, pts)
        )
    )
