"""Round benchmark: prints ONE JSON line with decoded throughput.

Primary metric (BASELINE.json:2): decoded Mbit/s/chip, min-sum, 25 iters.
Flagship config is DVB-S2 n=64800 (BASELINE.json:5); until that family
lands, falls back to the shipped n=1008 code so every round reports a
comparable number. vs_baseline = fraction of the 1 Gbit/s/chip north star.
"""
from __future__ import annotations

import sys


def main() -> int:
    from ecc_ldpc_tpu.bench.throughput import run_benchmark

    attempts = [
        # Flagship (BASELINE.json:5): n=64800, 25-iteration min-sum. Layered
        # schedule on the fused QC kernel — the TPU-native form of the
        # reference's structured-decoder tier.
        dict(code="dvbs2/64800/12", decoder="layered/norm:0.8125/25/noet",
             batch=1024, ebn0_db=1.5),
        dict(code="mackay1008", decoder="minsum/norm:0.8125/25/noet",
             batch=2048),
    ]
    last_err = None
    for cfg in attempts:
        try:
            result = run_benchmark(**cfg)
        except NotImplementedError as e:
            last_err = e
            continue
        print(result.json_line())
        return 0
    print(f"bench failed: {last_err}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
