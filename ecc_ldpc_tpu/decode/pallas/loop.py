"""Pallas-tier decoder dispatch (SURVEY.md §2.2 C17).

Routes to the right native kernel for the graph: the fused incidence-matmul
kernel for unstructured codes; QC codes get the roll-based layered kernel
(layered_qc.py) once their graphs carry QC structure.
"""
from __future__ import annotations

from ...graph.compile import CompiledGraph
from ...graph.qc import QCGraph
from .fused_mm import make_pallas_decoder as _make_fused_mm


def make_pallas_decoder(
    graph,
    kind: str = "minsum",
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    max_iters: int = 25,
    early_term: bool = True,
    jit: bool = True,
    **kw,
):
    if isinstance(graph, QCGraph):
        if kind not in ("minsum", "spa", "minstar"):
            raise KeyError(
                f"pallas QC flooding kernel supports minsum/spa/minstar, "
                f"not {kind!r}"
            )
        import jax.numpy as jnp

        from . import flooding_qc

        if graph.perm == "xor":
            from . import layered_xor

            if kind != "minsum" or not layered_xor.supports(
                graph, kind=kind, schedule="flooding"
            ):
                raise ValueError(
                    f"{graph.name}: the xor-perm kernel serves flooding "
                    f"minsum only — use backend='xla' (static-perm tier) "
                    f"for {kind!r}"
                )
            return layered_xor.make_layered_xor_decoder(
                graph, alpha=alpha, beta=beta, max_iters=max_iters,
                early_term=early_term, jit=jit, schedule="flooding", **kw,
            )

        # Gate on the bf16 floor FIRST (ADVICE r2 item 3): supports() with
        # the default 2-byte sizes is the smallest config this kernel can
        # build; if even that exceeds the envelope, fail with the same
        # descriptive error the layered path uses instead of letting Mosaic
        # die with an opaque VMEM message at compile time.
        # Message audited against flooding_qc.supports() (ADVICE r3 item 2):
        # the gates really are Z % 8 == 0 (this kernel has no replica
        # packing, unlike layered_qc), padded sublane dim <= 1024, and the
        # 84 MB spill-headroom state cap — all three named below.
        if not flooding_qc.supports(graph, kind=kind):
            raise ValueError(
                f"{graph.name}: outside the Pallas flooding-QC kernel's "
                f"platform envelope even at bf16 messages (needs Z % 8 == 0, "
                f"padded sublane dim Z*R <= 1024, and ~84 MB of VMEM state) "
                f"— use backend='xla' (roll-form flooding twin), or the "
                f"expanded graph + fused_mm for small codes (choose_graph "
                f"does this routing automatically)"
            )
        dt = (
            jnp.float32
            if flooding_qc.supports(graph, msg_bytes=4, total_bytes=4,
                                    acc_bytes=4, kind=kind)
            else jnp.bfloat16
        )
        return flooding_qc.make_flooding_pallas_decoder(
            graph, alpha=alpha, beta=beta, max_iters=max_iters,
            early_term=early_term, jit=jit, msg_dtype=dt, total_dtype=dt,
            llr_dtype=dt, acc_dtype=dt, kind=kind, **kw,
        )
    return _make_fused_mm(
        graph, kind, alpha=alpha, beta=beta, max_iters=max_iters,
        early_term=early_term, jit=jit, **kw,
    )
