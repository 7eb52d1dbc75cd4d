"""IEEE 802.11n QC-LDPC codes (config 3, BASELINE.json:9).

Structure (802.11n-2009 Annex R): 24 block columns; Z = n/24 with
n in {648, 1296, 1944} => Z in {27, 54, 81}; rates 1/2, 2/3, 3/4, 5/6 with
mb = 24*(1-R) block rows. The parity part is dual-diagonal: a special first
parity column with three entries (shift 1 at the top row, 0 at a middle row,
1 at the bottom row) and an identity staircase (shift-0 double diagonal),
which encode/structured.py exploits for O(n) encoding.

TABLE PROVENANCE (no network in the build environment — SURVEY.md §7.2
item 4): the rate-1/2 Z=27 base matrix below is reproduced from memory of
the published standard (it is the most widely reprinted LDPC table in the
literature); the other (rate, Z) tables are clearly-labelled SURROGATES:
same protograph skeleton (dual-diagonal parity, two full-weight info
columns, standard degree profile), deterministic shifts, QC-girth-repaired.
Every table (recalled or surrogate) is validated by construction checks
(G·H^T = 0 through the structured encoder, rank, degree profile) and by
waterfall-position tests; a surrogate differs from the standard only in
shift constants, which moves BER curves by fractions of a dB, not in any
capability the framework exposes.
"""
from __future__ import annotations

import numpy as np

from .qc import QCCode, expand_qc
from .spec import CodeSpec

# Rate-1/2, Z=27 (n=648) base matrix [recalled from the published standard].
_R12_Z27 = """
 0 -1 -1 -1  0  0 -1 -1  0 -1 -1  0  1  0 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1
22  0 -1 -1 17 -1  0  0 12 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1 -1
 6 -1  0 -1 10 -1 -1 -1 24 -1  0 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1
 2 -1 -1  0 20 -1 -1 -1 25  0 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1
23 -1 -1 -1  3 -1 -1 -1  0 -1  9 11 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1
24 -1 23  1 17 -1  3 -1 10 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1
25 -1 -1 -1  8 -1 -1 -1  7 18 -1 -1  0 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1
13 24 -1 -1  0 -1  8 -1  6 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1
 7 20 -1 16 22 10 -1 -1 23 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1
11 -1 -1 -1 19 -1 -1 -1 13 -1  3 17 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1
25 -1  8 -1 23 18 -1 14  9 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0
 3 -1 -1 -1 16 -1 -1  2 25  5 -1 -1  1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0
"""

RATES = {"12": 0.5, "23": 2 / 3, "34": 3 / 4, "56": 5 / 6}
BLOCK_COLS = 24
VALID_N = {648: 27, 1296: 54, 1944: 81}


def _parse_table(text: str) -> np.ndarray:
    rows = [r.split() for r in text.strip().splitlines()]
    return np.asarray([[int(x) for x in r] for r in rows], dtype=np.int32)


def _scale_table(base: np.ndarray, z_from: int, z_to: int) -> np.ndarray:
    """802.11n derives larger-Z tables per-rate; absent exact recall of the
    Z=54/81 tables we use the WiMAX-style modulo scaling s' = s mod Z, which
    preserves the protograph and the dual-diagonal encode structure."""
    out = base.copy()
    nz = out >= 0
    out[nz] = out[nz] % z_to
    # keep the special column's (1, 0, 1) triple intact
    return out


# canonical home is codes/girth.py; re-exported for existing importers
from .girth import block_4cycle_violations as _block_4cycle_violations  # noqa: E402


def surrogate_base(mb: int, nb: int, Z: int, seed: int, heavy_cols: int = 2,
                   info_weight: int = 3) -> np.ndarray:
    """Structure-faithful surrogate base matrix: dual-diagonal parity part,
    `heavy_cols` full-weight info columns, remaining info columns of weight
    `info_weight`; deterministic shifts, QC-girth repaired."""
    rng = np.random.default_rng(seed)
    kb = nb - mb
    base = -np.ones((mb, nb), dtype=np.int32)
    # special parity column: (1, 0, 1)
    base[0, kb] = 1
    base[mb // 2, kb] = 0
    base[mb - 1, kb] = 1
    # staircase
    for d in range(mb - 1):
        base[d, kb + 1 + d] = 0
        base[d + 1, kb + 1 + d] = 0
    # heavy info columns
    for j in range(heavy_cols):
        base[:, j] = rng.integers(0, Z, mb)
    # light info columns: `info_weight` entries, rows chosen to keep row
    # degrees balanced (standards rows are near-uniform degree; unbalanced
    # rows inflate dcb_max and with it decoder state/padding)
    deg = (base >= 0).sum(axis=1)
    for j in range(heavy_cols, kb):
        order = np.argsort(deg + rng.random(mb) * 0.5)
        rows = order[:info_weight]
        base[rows, j] = rng.integers(0, Z, info_weight)
        deg[rows] += 1
    # girth repair on shifts only (structure fixed)
    for _ in range(2000):
        viol = _block_4cycle_violations(base, Z)
        viol = [v for v in viol if v[2] < kb or v[3] < kb]  # don't touch parity
        if not viol:
            break
        i1, i2, j1, j2 = viol[0]
        j = j1 if j1 < kb else j2
        base[i2 if j1 < kb else i1, j] = rng.integers(0, Z)
    # chain-cycle repair: equal shifts at nearby rows of one column close a
    # short bit-level cycle through the shift-0 staircase (see codes/dvbs2
    # for the measured failure mode); forbid within row distance 8
    if Z > 1:
        for _ in range(1000):
            fixed = True
            for j in range(kb):
                rows = np.flatnonzero(base[:, j] >= 0)
                for x in range(len(rows)):
                    for y in range(x + 1, len(rows)):
                        a, b = rows[x], rows[y]
                        if abs(int(b) - int(a)) <= 8 and base[a, j] == base[b, j]:
                            base[b, j] = rng.integers(0, Z)
                            fixed = False
            if fixed:
                break
    # the greedy loops above can stall (and the chain pass can undo 4-cycle
    # fixes); finish with the coordinate-descent optimizer, which respects
    # the chain rule as a hard constraint and is a no-op on a clean table
    from .girth import block_4cycle_violations, chain_conflicts, optimize_shifts

    if block_4cycle_violations(base, Z) or chain_conflicts(base, kb, 8):
        base = optimize_shifts(
            base, Z, free=lambda i, j: j < kb, seed=seed + 7_777,
            chain_dist=8, chain_ncols=kb,
        )
    return base


def ieee80211n(n: int, rate: str) -> CodeSpec:
    """rate: '12' | '23' | '34' | '56' (e.g. ieee80211n(648, '12'))."""
    if n not in VALID_N:
        raise ValueError(f"802.11n n must be one of {sorted(VALID_N)}, got {n}")
    if rate not in RATES:
        raise ValueError(f"802.11n rate must be one of {sorted(RATES)}, got {rate!r}")
    Z = VALID_N[n]
    R = RATES[rate]
    mb = round(BLOCK_COLS * (1 - R))
    if rate == "12":
        base = _parse_table(_R12_Z27)
        if Z != 27:
            base = _scale_table(base, 27, Z)
        provenance = "recalled" if Z == 27 else "scaled"
    else:
        base = surrogate_base(mb, BLOCK_COLS, Z, seed=n * 100 + int(rate))
        provenance = "surrogate"
    qc = QCCode(Z=Z, base=base)
    spec = expand_qc(qc, name=f"80211n.{n}.{rate}.{provenance}", k=(BLOCK_COLS - mb) * Z)
    return spec
