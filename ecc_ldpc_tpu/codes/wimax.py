"""IEEE 802.16e (WiMAX) QC-LDPC codes (config 3, BASELINE.json:9).

Structure: 24 block columns, n = 576..2304 in steps of 96, Z = n/24 in
{24, 28, ..., 96}; rates 1/2, 2/3A, 2/3B, 3/4A, 3/4B, 5/6. Tables are
defined at Z0 = 96 and scaled to smaller Z — the standard scales most
tables as floor(s * Z / 96) and 2/3A as s mod Z; both rules are implemented
and applied to the surrogate tables.

TABLE PROVENANCE (VERDICT r1 item 2): the rate-1/2 base table is RECALLED
from the published standard (802.16e-2005 §8.4.9.2.5) — validation
evidence for the recall: it measures zero lifted 4-cycles at its
definition Z0=96 AND at 18 of the 19 floor-scaled Z values (only Z=28
closes one 4-cycle, a property of the standard's own scaling rule, kept
faithfully); surviving the scaling sweep is a strong correctness signal a
random-shift table would not exhibit. Row degrees {6,7}, info column
degrees {3,6}, special column (7,0,7) with the middle zero at row 5 —
all matching the published structure. The OTHER rates remain
clearly-labelled SURROGATES (same 24-column protograph skeleton:
dual-diagonal parity with an (x,0,x) special column, heavy + light info
columns per rate, deterministic QC-girth-repaired shifts at Z0=96).
Construction is validated by the structured encoder (G·H^T=0) and
waterfall tests.
"""
from __future__ import annotations

import numpy as np

from .ieee80211n import surrogate_base
from .qc import QCCode, expand_qc
from .spec import CodeSpec

BLOCK_COLS = 24
Z0 = 96

# Rate-1/2, Z0=96 [recalled, HIGH confidence — see module docstring].
_R12_Z96 = """
-1 94 73 -1 -1 -1 -1 -1 55 83 -1 -1  7  0 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1
-1 27 -1 -1 -1 22 79  9 -1 -1 -1 12 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1 -1
-1 -1 -1 24 22 81 -1 33 -1 -1 -1  0 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1
61 -1 47 -1 -1 -1 -1 -1 65 25 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1
-1 -1 39 -1 -1 -1 84 -1 -1 41 72 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1
-1 -1 -1 -1 46 40 -1 82 -1 -1 -1 79  0 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1
-1 -1 95 53 -1 -1 -1 -1 -1 14 18 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1
-1 11 73 -1 -1 -1  2 -1 -1 47 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1
12 -1 -1 -1 83 24 -1 43 -1 -1 -1 51 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1
-1 -1 -1 -1 -1 94 -1 59 -1 -1 70 72 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1
-1 -1  7 65 -1 -1 -1 -1 39 49 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0
43 -1 -1 -1 -1 66 -1 41 -1 -1 -1 26  7 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0
"""
RATES = {
    # rate string -> (mb, heavy_cols, info_weight, scale_rule)
    "12": (12, 2, 3, "floor"),
    "23A": (8, 2, 3, "mod"),
    "23B": (8, 2, 3, "floor"),
    "34A": (6, 2, 3, "floor"),
    "34B": (6, 2, 3, "floor"),
    "56": (4, 2, 3, "floor"),
}


def _scale(base: np.ndarray, Z: int, rule: str) -> np.ndarray:
    out = base.copy()
    nz = out >= 0
    if rule == "mod":
        out[nz] = out[nz] % Z
    else:
        out[nz] = out[nz] * Z // Z0
    return out


def _base_table(rate: str) -> np.ndarray:
    if rate == "12":
        rows = [r.split() for r in _R12_Z96.strip().splitlines()]
        return np.asarray([[int(x) for x in r] for r in rows], np.int32)
    mb, heavy, w, _ = RATES[rate]
    base = surrogate_base(mb, BLOCK_COLS, Z0, seed=16_000 + mb * 7 + len(rate),
                          heavy_cols=heavy, info_weight=w)
    return base


def wimax(n: int, rate: str) -> CodeSpec:
    """e.g. wimax(1152, '23A'). n in 576..2304 step 96."""
    if n % BLOCK_COLS or not (576 <= n <= 2304) or (n // BLOCK_COLS) % 4:
        raise ValueError(f"WiMAX n must be 576..2304 in steps of 96, got {n}")
    if rate not in RATES:
        raise ValueError(f"WiMAX rate must be one of {sorted(RATES)}, got {rate!r}")
    Z = n // BLOCK_COLS
    mb, _, _, rule = RATES[rate]
    base = _scale(_base_table(rate), Z, rule)
    kb = BLOCK_COLS - mb
    if rate == "12":
        # recalled table: the floor rule keeps the special column's paired
        # shifts equal and >= 1 for every valid Z, so the scaled table is
        # used exactly as the standard's scaling produces it (including the
        # single lifted 4-cycle it closes at Z=28 — faithful > pretty)
        provenance = "recalled"
    else:
        provenance = "surrogate"
        # re-pin the special column to (1, 0, 1) after scaling (scaling can
        # send 1 -> 0 for small Z, collapsing the encode structure)
        base[0, kb] = 1
        base[mb // 2, kb] = 0
        base[mb - 1, kb] = 1
        # scaling to smaller Z reintroduces lifted 4-cycles and equal-shift
        # chain conflicts the Z0-level repair had removed — re-optimize AT
        # the target Z (no-op for clean tables, e.g. Z = Z0)
        from .girth import block_4cycle_violations, chain_conflicts, optimize_shifts

        if (block_4cycle_violations(base, Z)
                or chain_conflicts(base, kb, 8)):
            base = optimize_shifts(
                base, Z, free=lambda i, j: j < kb,
                seed=32_000 + mb * 13 + Z * 7 + len(rate),
                chain_dist=8, chain_ncols=kb,
            )
    qc = QCCode(Z=Z, base=base)
    return expand_qc(qc, name=f"wimax.{n}.{rate}.{provenance}", k=kb * Z)
