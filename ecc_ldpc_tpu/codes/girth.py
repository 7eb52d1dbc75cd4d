"""QC shift-table optimization: lifted-4-cycle minimization under the
surrogate builders' chain-shift rule.

A block 4-cycle (rows i,i2 sharing cols j,j') lifts to Z bit-level
4-cycles iff s[i,j]-s[i2,j] == s[i,j']-s[i2,j'] (mod Z), so per entry the
violation count over every candidate shift is one histogram lookup —
coordinate descent over the free entries is cheap and deterministic.
This is the same problem 3GPP solved with hand-optimized per-lifting-set
tables and IEEE with per-(rate,Z) tables; the surrogate tables here are
machine-optimized instead (provenance labels in each codes/ module).

The chain rule (equal shifts at rows within `chain_dist` of one another
in the same column close short bit-level cycles through the shift-0
dual-diagonal staircase — measured error floors, see codes/dvbs2.py) is
folded in as a hard penalty so the optimizer cannot trade a 4-cycle for
a chain cycle. Every entry point re-validates rather than assumes: a
table already clean is returned unchanged.
"""
from __future__ import annotations

import numpy as np

_BIG = 1 << 30


def block_4cycle_violations(base: np.ndarray, Z: int):
    """QC 4-cycles: rows i1<i2 sharing cols j1<j2 with
    s[i1,j1]-s[i1,j2]+s[i2,j2]-s[i2,j1] == 0 (mod Z)."""
    mb, nb = base.shape
    viol = []
    for i1 in range(mb):
        for i2 in range(i1 + 1, mb):
            shared = np.flatnonzero((base[i1] >= 0) & (base[i2] >= 0))
            for a in range(len(shared)):
                for b in range(a + 1, len(shared)):
                    j1, j2 = shared[a], shared[b]
                    if (base[i1, j1] - base[i1, j2]
                            + base[i2, j2] - base[i2, j1]) % Z == 0:
                        viol.append((i1, i2, j1, j2))
    return viol


def chain_conflicts(base: np.ndarray, ncols: int, dist: int):
    """(row_a, row_b, col) triples with equal shifts at rows within `dist`
    in one of the first `ncols` columns."""
    out = []
    for j in range(ncols):
        rows = np.flatnonzero(base[:, j] >= 0)
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                a, b = int(rows[x]), int(rows[y])
                if b - a <= dist and base[a, j] == base[b, j]:
                    out.append((a, b, j))
    return out


def optimize_shifts(
    base: np.ndarray,
    Z: int,
    free,
    seed: int,
    *,
    chain_dist: int = 0,
    chain_ncols: int = 0,
    max_passes: int = 50,
    kicks: int = 24,
    kick_threshold: int = 8,
) -> np.ndarray:
    """Minimize lifted 4-cycles by coordinate descent on the shifts where
    free(i, j) is True (ties keep the current shift — a clean table comes
    back unchanged). When zero isn't reached directly and the residual is
    small, random-restart kicks (deterministic rng from `seed`) perturb
    one violating cycle's free entries and re-descend in shuffled order;
    the best table seen wins. Residuals can be genuinely unavoidable:
    two rows sharing s columns pigeonhole-force collisions once s > Z.
    """
    base = base.copy()
    mb, nb = base.shape
    entries = [(i, j) for i in range(mb) for j in range(nb)
               if base[i, j] >= 0 and free(i, j)]
    rows_of_col = {j: np.flatnonzero(base[:, j] >= 0) for j in range(nb)}

    def descend(b, order_rng=None):
        for _ in range(max_passes):
            changed = False
            sweep = entries
            if order_rng is not None:
                sweep = [entries[t]
                         for t in order_rng.permutation(len(entries))]
            for i, j in sweep:
                cost = np.zeros(Z, np.int64)
                for i2 in rows_of_col[j]:
                    if i2 == i:
                        continue
                    shared = np.flatnonzero((b[i] >= 0) & (b[i2] >= 0))
                    shared = shared[shared != j]
                    if len(shared):
                        deltas = (b[i, shared] - b[i2, shared]) % Z
                        hist = np.bincount(deltas, minlength=Z)
                        # candidate v's delta is (v - s[i2,j]) % Z: a roll
                        cost += np.roll(hist, int(b[i2, j]))
                    if chain_dist and j < chain_ncols \
                            and abs(int(i2) - i) <= chain_dist:
                        cost[int(b[i2, j])] += _BIG
                best = int(np.argmin(cost))
                if cost[best] < cost[int(b[i, j])]:
                    b[i, j] = best
                    changed = True
            if not changed:
                return

    def total(b):
        t = len(block_4cycle_violations(b, Z))
        if chain_dist:
            t += _BIG * len(chain_conflicts(b, chain_ncols, chain_dist))
        return t

    rng = np.random.default_rng(seed)
    descend(base)
    best = base.copy()
    best_v = total(best)
    for _ in range(kicks if 0 < best_v <= kick_threshold else 0):
        b = best.copy()
        viols = block_4cycle_violations(b, Z)
        if not viols:
            break
        i1, i2, j1, j2 = viols[int(rng.integers(len(viols)))]
        touched = False
        for i, j in ((i1, j1), (i2, j1), (i1, j2), (i2, j2)):
            if free(i, int(j)):
                b[i, j] = rng.integers(0, Z)
                touched = True
        if not touched:
            break
        descend(b, order_rng=rng)
        v = total(b)
        if v < best_v:
            best, best_v = b.copy(), v
            if v == 0:
                break
    return best
