"""IEEE 802.3an 10GBASE-T RS-LDPC (2048, 1723) construction.

Beyond the five contract families (SURVEY.md §CONTRACT): the Ethernet
10GBASE-T code class — a (6,32)-regular n=2048 code built ALGEBRAICALLY
from Reed-Solomon codewords (Djurdjevic, Xu, Abdel-Ghaffar, Lin, "A
class of low-density parity-check codes constructed based on Reed-
Solomon codes with two information symbols", IEEE Comm. Letters 2003 —
the construction IEEE Std 802.3an adopted).

Construction — exact, nothing tabular to recall:

  * GF(64) with primitive polynomial x^6 + x + 1; a shortened (32, 2)
    Reed-Solomon code evaluates the 4096 degree-<=1 polynomials
    p(x) = a + b*x at 32 distinct field points. MDS => d = 31, so any
    two distinct codewords AGREE in at most one position.
  * The location vector z(beta) of a field element is the weight-1
    binary 64-vector indexing beta. A codeword's location vector is the
    length-2048 concatenation over its 32 positions (weight 32).
  * Fix a slope b: the coset {a + b*x : a in GF(64)} holds 64 pairwise-
    everywhere-different codewords, so their location vectors are
    DISJOINT and stack into a 64 x 2048 block where every column has
    weight exactly 1. Six distinct slopes stack into the 384 x 2048
    (6,32)-regular H.
  * Girth >= 6 by construction: rows within a block are disjoint; rows
    of different blocks are lines of different slope, so they intersect
    in <= 1 evaluated point — no two rows share two columns.
  * Rank(H) = 325 over GF(2), hence k = 2048 - 325 = **1723** — the
    published 802.3an dimension, reproduced exactly (asserted at build
    time, pinned by tests). The rank is slope-choice-invariant for every
    choice tried (distinct slopes incl. b=0).

SURROGATE LABEL (SURVEY.md §7.2 item 4): IEEE Std 802.3an Clause 55
fixes specific evaluation-point ordering and slope/coset choices; those
orderings did not clear the reliable-recall bar. The shipped H is the
same construction family with matching published anchors (n, k, rank,
degree profile, girth) — different slope/point subsets of the RS
construction are not guaranteed permutation-equivalent, and no
permutation-equivalence check has been run.
This module uses the deterministic choice points = [0, 1, alpha, ...,
alpha^30], slopes = [1, alpha, ..., alpha^5]. Degree profile, girth,
n, k, and the RS-based structure match the standard exactly; interop
with a compliant transceiver would need the standard's exact ordering.

The code has no circulant blocks, but it IS block-structured: each
64 x 64 block is the XOR-permutation a -> a ^ bp (bp = b*p in GF(64)),
compile-time static. The spec therefore carries a QCXorCode (codes/qc.py)
— base matrix [6, 32] of xor-shifts, every cell occupied — so the
layered/flooding QC tiers serve it through graph.qc's to_check_align/
to_var_align (xor_perm = reshape + flip, gather-free); this replaced the
incidence-matmul tier whose n*edges cost model is 12x mackay's per bit
(r4 verdict weak item 3: 97 Mbit/s on the wrong tier). Encoding is the
dense systematic generator (encode/dense.py).

Spec string: 8023an
"""
from __future__ import annotations

import numpy as np

from .spec import CodeSpec

_Q = 64
_PRIM = 0b1000011  # x^6 + x + 1


def _gf64_tables():
    exp = np.zeros(2 * _Q, dtype=np.int64)
    log = np.zeros(_Q, dtype=np.int64)
    x = 1
    for i in range(_Q - 1):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & _Q:
            x ^= _PRIM
    exp[_Q - 1:] = exp[: _Q + 1]
    return exp, log


def rs_ldpc_H(n_points: int = 32, slopes=None) -> np.ndarray:
    """Binary H of the RS-based LDPC: one 64-row block per slope.

    Rows of block for slope b: location vectors of {a + b*x : a}
    evaluated at the chosen points. (len(slopes), n_points)-regular.
    """
    exp, log = _gf64_tables()
    if slopes is None:
        slopes = [int(exp[i]) for i in range(6)]  # 1, alpha, ..., alpha^5
    points = [0] + [int(exp[i]) for i in range(n_points - 1)]
    if len(set(points)) != n_points or n_points > _Q:
        raise ValueError(f"need {n_points} distinct points in GF(64)")
    H = np.zeros((_Q * len(slopes), _Q * n_points), dtype=np.uint8)
    for ci, b in enumerate(slopes):
        for j, p in enumerate(points):
            # b*p is constant down the coset; a + b*p sweeps GF(64)
            bp = 0 if (b == 0 or p == 0) else int(exp[log[b] + log[p]])
            for a in range(_Q):
                H[ci * _Q + a, j * _Q + (a ^ bp)] = 1
    return H


def xor_base(n_points: int = 32, slopes=None) -> np.ndarray:
    """The [len(slopes), n_points] base matrix of xor-shifts: cell (ci, j)
    holds bp = slopes[ci] * points[j] in GF(64) — block row a has its 1 at
    block column position a ^ bp, exactly rs_ldpc_H's placement."""
    exp, log = _gf64_tables()
    if slopes is None:
        slopes = [int(exp[i]) for i in range(6)]
    points = [0] + [int(exp[i]) for i in range(n_points - 1)]
    base = np.zeros((len(slopes), n_points), dtype=np.int32)
    for ci, b in enumerate(slopes):
        for j, p in enumerate(points):
            base[ci, j] = 0 if (b == 0 or p == 0) else int(exp[log[b] + log[p]])
    return base


def ieee8023an() -> CodeSpec:
    """The (2048, 1723) 10GBASE-T class code (structure-exact surrogate)."""
    from ..encode.gf2 import gf2_rank
    from .qc import QCXorCode, expand_qc_xor

    spec = expand_qc_xor(QCXorCode(Z=_Q, base=xor_base()), name="8023an",
                         k=1723)
    rank = gf2_rank(spec.dense())
    k = spec.n - rank
    if k != 1723:  # the published dimension is the construction's anchor
        raise AssertionError(f"RS-LDPC rank self-check failed: k={k} != 1723")
    return spec
