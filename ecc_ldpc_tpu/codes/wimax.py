"""IEEE 802.16e (WiMAX) QC-LDPC codes (config 3, BASELINE.json:9).

Structure: 24 block columns, n = 576..2304 in steps of 96, Z = n/24 in
{24, 28, ..., 96}; rates 1/2, 2/3A, 2/3B, 3/4A, 3/4B, 5/6. Tables are
defined at Z0 = 96 and scaled to smaller Z — the standard scales most
tables as floor(s * Z / 96) and 2/3A as s mod Z; both rules are implemented
and applied to the surrogate tables.

TABLE PROVENANCE: all WiMAX base tables here are clearly-labelled
SURROGATES (no network to fetch the standard; SURVEY.md §7.2 item 4):
same 24-column protograph skeleton as the standard family (dual-diagonal
parity with an (x,0,x) special column, heavy + light info columns per
rate), deterministic QC-girth-repaired shifts defined at Z0=96. Construction
is validated by the structured encoder (G·H^T=0) and waterfall tests.
"""
from __future__ import annotations

import numpy as np

from .ieee80211n import surrogate_base
from .qc import QCCode, expand_qc
from .spec import CodeSpec

BLOCK_COLS = 24
Z0 = 96
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
    # re-pin the special column to (1, 0, 1) after scaling (scaling can send
    # 1 -> 0 for small Z, collapsing the encode structure)
    kb = BLOCK_COLS - mb
    base[0, kb] = 1
    base[mb // 2, kb] = 0
    base[mb - 1, kb] = 1
    # scaling to smaller Z reintroduces lifted 4-cycles and equal-shift
    # chain conflicts the Z0-level repair had removed — re-optimize AT the
    # target Z (no-op for clean tables, e.g. Z = Z0)
    from .girth import block_4cycle_violations, chain_conflicts, optimize_shifts

    if (block_4cycle_violations(base, Z)
            or chain_conflicts(base, kb, 8)):
        base = optimize_shifts(
            base, Z, free=lambda i, j: j < kb,
            seed=32_000 + mb * 13 + Z * 7 + len(rate),
            chain_dist=8, chain_ncols=kb,
        )
    qc = QCCode(Z=Z, base=base)
    return expand_qc(qc, name=f"wimax.{n}.{rate}.surrogate", k=kb * Z)
