"""IEEE 802.16e (WiMAX) QC-LDPC codes (config 3, BASELINE.json:9).

Structure: 24 block columns, n = 576..2304 in steps of 96, Z = n/24 in
{24, 28, ..., 96}; rates 1/2, 2/3A, 2/3B, 3/4A, 3/4B, 5/6. Tables are
defined at Z0 = 96 and scaled to smaller Z — the standard scales most
tables as floor(s * Z / 96) and 2/3A as s mod Z; both rules are implemented
and applied to the surrogate tables.

TABLE PROVENANCE (VERDICT r1 item 2 / r2 item 1): ALL SIX base tables are
now RECALLED from the published standard (802.16e-2005 §8.4.9.2.5), with
per-table confidence recorded next to each table below. Validation
evidence (experiments/wimax_census.py, run per table):

- structural: dual-diagonal parity skeleton (paired special column +
  shift-0 staircase), row-degree and info-column-degree profiles match
  the published ones exactly (r=1/2 rows {6,7} cols {3,6}; 2/3A rows
  uniform 10, 5 degree-6 info cols at every third position; 2/3B rows 10
  with checkerboard degree-4 info cols; 3/4A rows {14,15}, uniform
  degree-4 info cols; 3/4B rows {14,15}, cols {3,6}; 5/6 rows uniform
  20, cols {3,4});
- girth: 4-cycle census at the definition Z0=96 AND across all 19
  standard-scaled Z values (floor rule; 2/3A uses the standard's mod
  rule) — the standard's tables are 4-cycle-free at Z0, and surviving
  the scaling sweep is a strong correctness signal a table with random
  recall errors would not exhibit (a single wrong cell closes cycles
  with high probability somewhere in the sweep);
- G·H^T = 0 through the structured encoder at every (n, rate).

Any cell that had to be girth-repaired after recall is declared in
_REPAIRS with the same convention as codes/ieee80211n.py (repaired
values are NOT claimed to match the standard). Rate 3/4B's special
column is the standard's (0, y, 0) variant — paired zeros with a
nonzero middle shift — handled by the generalized dual-diagonal
encoder (encode/structured.py).
"""
from __future__ import annotations

import numpy as np

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
# Rate-2/3A, Z0=96 (scaled by the standard's MOD rule, not floor)
# [recalled, MEDIUM-HIGH confidence: uniform row degree 10 and the five
# degree-6 info columns at every third position (2,5,8,11,14) emerge from
# the raw recall — structural regularities a confabulated table would not
# reproduce; individual shifts may still carry errors].
_R23A_Z96 = """
 3  0 -1 -1  2  0 -1  3  7 -1  1  1 -1 -1 -1 -1  1  0 -1 -1 -1 -1 -1 -1
-1 -1  1 -1 36 -1 -1 34 10 -1 -1 18  2 -1  3  0 -1  0  0 -1 -1 -1 -1 -1
-1 -1 12  2 -1 15 -1 40 -1  3 -1 15 -1  2 13 -1 -1 -1  0  0 -1 -1 -1 -1
-1 -1 19 24 -1  3  0 -1  6 -1 17 -1 -1 -1  8 39 -1 -1 -1  0  0 -1 -1 -1
20 -1  6 -1 -1 10 29 -1 -1 28 -1 14 -1 38 -1 -1  0 -1 -1 -1  0  0 -1 -1
-1 -1 10 -1 28 20 -1 -1  8 -1 36 -1  9 -1 21 45 -1 -1 -1 -1 -1  0  0 -1
35 25 -1 37 -1 21 -1 -1  5 -1 -1  0 -1  4 20 -1 -1 -1 -1 -1 -1 -1  0  0
-1  6  6 -1 -1 -1  4 -1 14 30 -1  3 36 -1 14 -1  1 -1 -1 -1 -1 -1 -1  0
"""

# Rate-2/3B, Z0=96 [recalled, MEDIUM confidence: the checkerboard layout
# (even info columns on even rows, odd on odd) and uniform degree-4 info
# columns are solid; shift values may carry errors].
_R23B_Z96 = """
 2 -1 19 -1 47 -1 48 -1 36 -1 82 -1 47 -1 15 -1 95  0 -1 -1 -1 -1 -1 -1
-1 69 -1 88 -1 33 -1  3 -1 16 -1 37 -1 40 -1 48 -1  0  0 -1 -1 -1 -1 -1
10 -1 86 -1 62 -1 28 -1 85 -1 16 -1 34 -1 73 -1 -1 -1  0  0 -1 -1 -1 -1
-1 28 -1 32 -1 81 -1 27 -1 88 -1  5 -1 56 -1 37 -1 -1 -1  0  0 -1 -1 -1
23 -1 29 -1 15 -1 30 -1 66 -1 24 -1 50 -1 62 -1 -1 -1 -1 -1  0  0 -1 -1
-1 30 -1 65 -1 54 -1 14 -1  0 -1 30 -1 74 -1  0 -1 -1 -1 -1 -1  0  0 -1
32 -1  0 -1 15 -1 56 -1 85 -1  5 -1  6 -1 52 -1  0 -1 -1 -1 -1 -1  0  0
-1  0 -1 47 -1 13 -1 61 -1 84 -1 55 -1 78 -1 41 95 -1 -1 -1 -1 -1 -1  0
"""

# Rate-3/4A, Z0=96 [recalled, MEDIUM-HIGH confidence: uniform degree-4
# info columns and row degrees {14,15} emerge from the raw recall].
_R34A_Z96 = """
 6 38  3 93 -1 -1 -1 30 70 -1 86 -1 37 38  4 11 -1 46 48  0 -1 -1 -1 -1
62 94 19 84 -1 92 78 -1 15 -1 -1 92 -1 45 24 32 30 -1 -1  0  0 -1 -1 -1
71 -1 55 -1 12 66 45 79 -1 78 -1 -1 10 -1 22 55 70 82 -1 -1  0  0 -1 -1
38 61 -1 66  9 73 47 64 -1 39 61 43 -1 -1 -1 -1 95 32  0 -1 -1  0  0 -1
-1 -1 -1 -1 32 52 55 80 95 22  6 51 24 90 44 20 -1 -1 -1 -1 -1 -1  0  0
-1 63 31 88 20 -1 -1 -1  6 40 56 16 71 53 -1 -1 27 26 48 -1 -1 -1 -1  0
"""

# Rate-3/4B, Z0=96 [recalled, MEDIUM confidence]. The special parity
# column is the standard's (0, 80, 0) variant: paired zeros at the first
# and last rows with the nonzero middle shift at row 2 — the paired
# entries cancel in the row sum regardless of value, so encoding solves
# P^80 p0 = sum(s) (see encode/structured.py).
_R34B_Z96 = """
-1 81 -1 28 -1 -1 14 25 17 -1 -1 85 29 52 78 95 22 92  0  0 -1 -1 -1 -1
42 -1 14 68 32 -1 -1 -1 -1 70 43 11 36 40 33 57 38 24 -1  0  0 -1 -1 -1
-1 -1 20 -1 -1 63 39 -1 70 67 -1 38  4 72 47 29 60  5 80 -1  0  0 -1 -1
64  2 -1 -1 63 -1 -1  3 51 -1 81 15 94  9 85 36 14 19 -1 -1 -1  0  0 -1
-1 53 60 80 -1 26 75 -1 -1 -1 -1 86 77  1  3 72 60 25 -1 -1 -1 -1  0  0
77 -1 -1 -1 15 28 -1 35 -1 72 30 68 85 84 26 64 11 89  0 -1 -1 -1 -1  0
"""

# Rate-5/6, Z0=96 [recalled, MEDIUM-HIGH confidence: uniform row degree
# 20 emerges from the raw recall].
_R56_Z96 = """
 1 25 55 -1 47  4 -1 91 84  8 86 52 82 33  5  0 36 20  4 77 80  0 -1 -1
-1  6 -1 36 40 47 12 79 47 -1 41 21 12 71 14 72  0 44 49  0  0  0  0 -1
51 81 83  4 67 -1 21 -1 31 24 91 61 81  9 86 78 60 88 67 15 -1 -1  0  0
50 -1 50 15 -1 36 13 10 11 20 53 90 29 92 57 30 84 92 11 66 80 -1 -1  0
"""

# Girth repairs after recall, same convention as ieee80211n._REPAIRS:
# the standard's tables are 4-cycle-free at Z0; any colliding cell pair
# found by the census was therefore mis-recalled, and the minimal repair
# below restores the property. Repaired values are deterministic but NOT
# claimed to match the standard. Populated from experiments/wimax_census.py:
# 3/4A recalled with 3 lifted 4-cycles at Z0=96 — no 1-cell fix exists;
# the first-in-deterministic-order 2-cell fix (exhaustive search over the
# 11 involved cells x 96 shifts, minimizing scaled-sweep residual then
# chain conflicts: 104 -> 52 standard-scaling cycles, 0 chain conflicts)
# is declared below. The other five tables recalled 4-cycle-free.
_REPAIRS: dict = {"34A": {(1, 1): 4, (3, 6): 0}}

RATES = {
    # rate string -> (mb, table text, scale_rule)
    "12": (12, _R12_Z96, "floor"),
    "23A": (8, _R23A_Z96, "mod"),
    "23B": (8, _R23B_Z96, "floor"),
    "34A": (6, _R34A_Z96, "floor"),
    "34B": (6, _R34B_Z96, "floor"),
    "56": (4, _R56_Z96, "floor"),
}


def _scale(base: np.ndarray, Z: int, rule: str) -> np.ndarray:
    out = base.copy()
    nz = out >= 0
    if rule == "mod":
        out[nz] = out[nz] % Z
    else:
        out[nz] = out[nz] * Z // Z0
    return out


def _base_table(rate: str) -> tuple[np.ndarray, str]:
    """(Z0-level base matrix, provenance) for one rate."""
    mb, text, _ = RATES[rate]
    rows = [r.split() for r in text.strip().splitlines()]
    base = np.asarray([[int(x) for x in r] for r in rows], np.int32)
    if base.shape != (mb, BLOCK_COLS):
        raise AssertionError(f"table {rate} is {base.shape}")
    provenance = "recalled"
    for (i, j), v in _REPAIRS.get(rate, {}).items():
        base[i, j] = v
        provenance = "recalled-repaired"
    return base, provenance


def wimax(n: int, rate: str) -> CodeSpec:
    """e.g. wimax(1152, '23A'). n in 576..2304 step 96."""
    if n % BLOCK_COLS or not (576 <= n <= 2304) or (n // BLOCK_COLS) % 4:
        raise ValueError(f"WiMAX n must be 576..2304 in steps of 96, got {n}")
    if rate not in RATES:
        raise ValueError(f"WiMAX rate must be one of {sorted(RATES)}, got {rate!r}")
    Z = n // BLOCK_COLS
    mb, _, rule = RATES[rate]
    table, provenance = _base_table(rate)
    # All tables are recalled standard tables: the standard's own scaling
    # rule (floor, or mod for 2/3A) is applied exactly as published, with
    # no girth re-repair at scaled Z — faithful > pretty (any lifted
    # 4-cycle a scaled standard table closes is the standard's own).
    base = _scale(table, Z, rule)
    kb = BLOCK_COLS - mb
    qc = QCCode(Z=Z, base=base)
    return expand_qc(qc, name=f"wimax.{n}.{rate}.{provenance}", k=kb * Z)
