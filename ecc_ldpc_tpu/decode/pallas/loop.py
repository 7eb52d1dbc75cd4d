"""Pallas-tier decoder dispatch (SURVEY.md §2.2 C17).

Routes to the right native kernel for the graph: the fused incidence-matmul
kernel for unstructured codes; QC codes get the roll-based layered kernel
(layered_qc.py) once their graphs carry QC structure.
"""
from __future__ import annotations

from ...graph.compile import CompiledGraph
from .fused_mm import make_pallas_decoder as _make_fused_mm


def make_pallas_decoder(
    graph: CompiledGraph,
    kind: str = "minsum",
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    max_iters: int = 25,
    early_term: bool = True,
    jit: bool = True,
    **kw,
):
    return _make_fused_mm(
        graph, kind, alpha=alpha, beta=beta, max_iters=max_iters,
        early_term=early_term, jit=jit, **kw,
    )
