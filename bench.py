"""Round benchmark: prints ONE JSON line with decoded throughput.

Primary metric (BASELINE.json:2): decoded Mbit/s/chip, min-sum, 25 iters.
The headline is DVB-S2 n=64800 RATE-1/2 at fixed 25-iteration min-sum —
the hardest info-bits-per-edge configuration of the north-star code
(VERDICT r1 "what's weak" item 1 pins this as the number to beat). The
same line carries `r34_mbps` (rate-3/4, a standard broadcast operating
point) and `prod_r12_mbps` (early-termination + learned schedule at the
2.5 dB operating point) for context. vs_baseline = fraction of the
1 Gbit/s/chip north star. Falls back to the n=1008 code if the DVB-S2
family is unavailable, so every round reports a comparable number.
"""
from __future__ import annotations

import json
import sys


def main() -> int:
    from ecc_ldpc_tpu.bench.throughput import run_benchmark

    attempts = [
        # Flagship (BASELINE.json:5): n=64800 r=1/2, 25-iteration min-sum.
        # Layered schedule on the fused QC kernel — the TPU-native form of
        # the reference's structured-decoder tier.
        dict(code="dvbs2/64800/12", decoder="layered/norm:0.8125/25/noet",
             batch=4096, ebn0_db=1.5),
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
        line = json.loads(result.json_line())
        if cfg["code"].startswith("dvbs2/64800"):
            try:
                r34 = run_benchmark(
                    code="dvbs2/64800/34",
                    decoder="layered/norm:0.8125/25/noet",
                    batch=2048, ebn0_db=3.0,
                )
                line["r34_mbps"] = round(r34.throughput_mbps, 3)
            except Exception as e:  # noqa: BLE001 — headline already measured
                print(f"r34 leg failed: {e!r}", file=sys.stderr)
            try:
                # production mode: exact early termination + the shipped
                # operating-band learned schedule (learn/schedules/) at the
                # 2.5 dB operating point — the r=1/2 config clears 1 Gbit/s
                # here (README "Production mode")
                prod = run_benchmark(
                    code="dvbs2/64800/12",
                    decoder="layered/sched:dvbs2_64800_12_T25_op2",
                    batch=2048, ebn0_db=2.5,
                )
                line["prod_r12_mbps"] = round(prod.throughput_mbps, 3)
            except Exception as e:  # noqa: BLE001
                print(f"production leg failed: {e!r}", file=sys.stderr)
        print(json.dumps(line))
        return 0
    print(f"bench failed: {last_err}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
