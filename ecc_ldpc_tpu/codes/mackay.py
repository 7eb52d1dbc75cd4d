"""The shipped (3,6)-regular rate-1/2 n=1008 code (config 1, BASELINE.json:7).

The reference ships MacKay's n=1008 matrix as a data file; this environment
has no network access, so data/mackay1008.alist is a deterministic
Gallager-ensemble surrogate from codes/gallager.py (same ensemble as MacKay's
construction 1A: (3,6)-regular, 4-cycle-free). Its BP waterfall sits at the
same density-evolution threshold (~1.1 dB Eb/N0) as any (3,6) instance of
this length, which is what the BER-parity tests pin (SURVEY.md §6).
"""
from __future__ import annotations

import os

from .alist import load_alist, save_alist
from .gallager import gallager_36
from .spec import CodeSpec

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")
_PATH = os.path.abspath(os.path.join(_DATA, "mackay1008.alist"))
_SEED = 1008


def mackay_1008() -> CodeSpec:
    """Load (or deterministically regenerate) the shipped n=1008 code."""
    if os.path.exists(_PATH):
        spec = load_alist(_PATH, name="mackay1008")
    else:  # pragma: no cover - data file is committed
        spec = regenerate()
    from ..encode.gf2 import gf2_rank

    # Gallager-ensemble H has 2 dependent rows (rank 502) => k = 506.
    k = spec.n - gf2_rank(spec.dense())
    return CodeSpec(
        name="mackay1008", n=spec.n, m=spec.m, row_cols=spec.row_cols, k=k
    )


def regenerate() -> CodeSpec:
    spec = gallager_36(1008, seed=_SEED)
    os.makedirs(_DATA, exist_ok=True)
    save_alist(spec, _PATH)
    return spec
