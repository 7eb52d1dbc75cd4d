"""Regenerate deep per-family golden curves on real TPU (VERDICT r1
item 4): >= 16384 frames at EVERY point (vs the old 256-frame points
whose CIs were too wide to catch a 1.5x FER regression), up to 400 frame
errors per point for ~10% CI half-width in the waterfall.

Also regenerates the 802.11n/WiMAX goldens for the RECALLED standard
tables (the r1 curves were measured on surrogate tables — different
codes).

Run: JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/gen_goldens.py [out_dir]
"""
import sys
import time

CONFIGS = [
    # (out_name, code, decoder, ebn0 grid) — grids put >= 2 points in
    # FER [2e-2, 0.9] (the gate's usable band) and stop before the
    # deep-zero region so no 131k-frame point buys zero regression power
    # (VERDICT r2 weak item 7)
    ("80211n_1944_12_tpu_golden", "80211n/1944/12",
     "layered/norm:0.8125/25", (1.0, 1.25, 1.5, 1.75, 2.0)),
    ("wimax_2304_12_tpu_golden", "wimax/2304/12",
     "layered/norm:0.8125/25", (1.0, 1.25, 1.5, 1.75, 2.0)),
    # rate 5/6: covers the round-3 recalled high-rate tables (r2 item 1)
    ("wimax_2304_56_tpu_golden", "wimax/2304/56",
     "layered/norm:0.8125/25", (3.0, 3.25, 3.5, 3.75)),
    # NR grids re-centered for the recalled BG2 / BG1-core connectivity
    ("nr5g_bg1_384_tpu_golden", "nr5g/bg1/384",
     "layered/norm:0.8125/25", (0.4, 0.5, 0.6, 0.7, 0.8)),
    ("nr5g_bg2_384_tpu_golden", "nr5g/bg2/384",
     "layered/norm:0.8125/25", (0.3, 0.45, 0.6, 0.75, 0.9)),
    ("dvbs2_16200_12_tpu_golden", "dvbs2/16200/12",
     "layered/norm:0.8125/25", (0.8, 1.0, 1.2, 1.4, 1.6)),
    # the flagship itself under the gate (VERDICT r2 item 2)
    ("dvbs2_64800_12_tpu_golden", "dvbs2/64800/12",
     "layered/norm:0.8125/25", (0.95, 1.0, 1.05, 1.1, 1.2)),
    ("mackay1008_tpu_golden", "mackay1008",
     "spa/50", (1.0, 1.5, 2.0, 2.5)),
]


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "curves"
    from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec, run_sweep
    from ecc_ldpc_tpu.sim.report import format_table, save_results

    stopping = StoppingRule(
        min_frame_errors=400, max_frames=131_072, min_frames=16_384
    )
    for name, code, decoder, grid in CONFIGS:
        t0 = time.time()
        res = run_sweep(SweepSpec(
            code=code, decoder=decoder, ebn0_db=grid, batch=1024,
            seed=20260819, stopping=stopping,
        ))
        path = f"{out_dir}/{name}.json"
        save_results(res, path)
        print(f"{code}: {time.time()-t0:.0f}s -> {path}", flush=True)
        print(format_table(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
