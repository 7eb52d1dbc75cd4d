"""H-matrix -> device-ready compiled graphs (SURVEY.md §1.3 L1, §2.2 C8)."""

from .compile import CompiledGraph, compile_graph
from .qc import QCGraph, compile_qc_graph, qc_graph_from_block_edges

__all__ = [
    "CompiledGraph",
    "compile_graph",
    "QCGraph",
    "compile_qc_graph",
    "qc_graph_from_block_edges",
]
