"""BER/FER reporting: human tables, machine-readable output, parity checks
(SURVEY.md §2.2 C23, §5.5).

The reference prints a stdout table of EbN0 / frames / errors / BER(+CI);
format_table reproduces that workflow. curves_overlap implements the
BER-parity equivalence test (SURVEY.md §7.2 item 7): two curves "match
within statistical bounds" iff their Wilson CIs overlap at every common
Eb/N0 point — the oracle-vs-optimized validation the reference performs by
eyeballing overlapping curves, made mechanical.
"""
from __future__ import annotations

import json
from typing import Sequence

from .runner import PointResult


def format_table(results: Sequence[PointResult]) -> str:
    head = (
        f"{'code':>16} {'decoder':>24} {'EbN0':>6} {'frames':>9} "
        f"{'bit_err':>8} {'frm_err':>8} {'BER':>10} {'FER':>10} "
        f"{'FER 95% CI':>22} {'iters':>6}"
    )
    lines = [head, "-" * len(head)]
    for r in results:
        lo, hi = r.fer_ci
        lines.append(
            f"{r.code:>16} {r.decoder:>24} {r.ebn0_db:>6.2f} {r.frames:>9} "
            f"{r.bit_errors:>8} {r.frame_errors:>8} {r.ber:>10.3e} "
            f"{r.fer:>10.3e} {f'[{lo:.2e},{hi:.2e}]':>22} {r.mean_iters:>6.1f}"
        )
    return "\n".join(lines)


def results_to_json(results: Sequence[PointResult]) -> str:
    return json.dumps([r.to_json() for r in results], indent=2)


def save_results(results: Sequence[PointResult], path: str) -> None:
    if path.endswith(".csv"):
        with open(path, "w") as f:
            f.write(results_to_csv(results))
    else:
        with open(path, "w") as f:
            f.write(results_to_json(results))


_CSV_FIELDS = (
    "code decoder ebn0_db frames bit_errors frame_errors ber fer "
    "mean_iters wall_s".split()
)


def results_to_csv(results: Sequence[PointResult]) -> str:
    lines = [",".join(_CSV_FIELDS)]
    for r in results:
        lines.append(",".join(str(getattr(r, f)) for f in _CSV_FIELDS))
    return "\n".join(lines) + "\n"


def curves_overlap(
    a: Sequence[PointResult], b: Sequence[PointResult], metric: str = "fer"
) -> bool:
    """True iff CIs overlap at every Eb/N0 point both curves share."""
    bi = {round(r.ebn0_db, 6): r for r in b}
    shared = [(ra, bi[round(ra.ebn0_db, 6)]) for ra in a if round(ra.ebn0_db, 6) in bi]
    if not shared:
        raise ValueError("curves share no Eb/N0 points")
    for ra, rb in shared:
        lo_a, hi_a = getattr(ra, f"{metric}_ci")
        lo_b, hi_b = getattr(rb, f"{metric}_ci")
        if hi_a < lo_b or hi_b < lo_a:
            return False
    return True
