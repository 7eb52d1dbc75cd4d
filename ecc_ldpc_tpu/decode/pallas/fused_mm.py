"""Fused flooding decoder: all BP iterations inside ONE Pallas kernel.

The native tier (SURVEY.md §2.2 C15-C17) for unstructured codes. Where the
reference's accelerator tier launches one Accelerate/CUDA kernel per decode
step (SURVEY.md §2.1 R10), this kernel keeps the entire message state in
VMEM across all iterations — the roofline in SURVEY.md §6 shows per-
iteration HBM round-trips forfeit ~an order of magnitude.

In-kernel data flow per iteration (per batch tile, everything VMEM-resident):

  C    = cn_update(V)            VPU   two-min + sign product, [m, dc, Bt]
  tot  = llr + S @ C             MXU   VN accumulate as incidence matmul
  V    = St @ tot - C            MXU   edge re-expansion
  par  = (H @ (tot<0)) mod 2     MXU   syndrome
  freeze converged lanes         VPU   done-mask (early term under jit)

The gather/scatter of the compressed edge list is realized as multiplication
by the 0/1 incidence operators S [n, m*dc] / S^T — the MXU-native form (and
the only TPU-viable one here: the platform compiler crashes on XLA
gather->reduce->gather chains, and Pallas TPU has no vector-gather).

All shapes are padded to MXU/VPU tiles (n, m*dc -> multiples of 128; batch
tile Bt on lanes). Padding is arithmetically neutral: padded edges are
masked, padded variables see llr=0, padded checks have empty rows.

Numerics are f32 end-to-end => bit-identical to decode/xla/dense_mm.py
(same op order), which tests/pallas/ verifies in interpret mode.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...graph.compile import CompiledGraph
from ..types import DecodeResult

_MAG_CAP = 1e12  # keep padded-slot inf out of downstream arithmetic


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _sign_prod(V3, mask3):
    """Row sign product as negative-count parity (reduce_prod has no Pallas
    TPU lowering); identical to prod of {+1,-1} with masked slots -> +1."""
    neg = jnp.where(mask3, (V3 < 0).astype(jnp.float32), 0.0)
    cnt = jnp.sum(neg, axis=1, keepdims=True)
    return 1.0 - 2.0 * (cnt - 2.0 * jnp.floor(cnt * 0.5))


def _cn_minsum_3d(V3, mask3, alpha: float, beta: float):
    """Two-min CN update on [m, dc, Bt]; tie-robust without argmin/one_hot
    (provably identical to cn_ops.cn_minsum — see tests/pallas/)."""
    s = jnp.where(V3 < 0, -1.0, 1.0)
    s = jnp.where(mask3, s, 1.0)
    a = jnp.where(mask3, jnp.abs(V3), jnp.inf)
    sgn_prod = _sign_prod(V3, mask3)
    min1 = jnp.min(a, axis=1, keepdims=True)
    is_min = a == min1
    count_min = jnp.sum(is_min.astype(jnp.float32), axis=1, keepdims=True)
    min2 = jnp.min(jnp.where(is_min, jnp.inf, a), axis=1, keepdims=True)
    mag = jnp.where(is_min & (count_min == 1.0), min2, min1)
    mag = jnp.minimum(mag, _MAG_CAP)
    mag = jnp.maximum(alpha * mag - beta, 0.0)
    C = (sgn_prod * s) * mag
    return jnp.where(mask3, C, 0.0)


def _cn_spa_3d(V3, mask3):
    """SPA tanh CN update on [m, dc, Bt] (mirrors cn_ops.cn_spa)."""
    s = jnp.where(V3 < 0, -1.0, 1.0)
    s = jnp.where(mask3, s, 1.0)
    a = jnp.where(mask3, jnp.abs(V3), jnp.inf)
    lt = jnp.log(jnp.tanh(jnp.clip(a, 1e-10, 40.0) * 0.5))
    lt = jnp.where(mask3, lt, 0.0)
    loo = jnp.sum(lt, axis=1, keepdims=True) - lt
    t = jnp.clip(jnp.exp(loo), None, 1.0 - 1e-7)
    # 2*arctanh(t) in the log1p form: Mosaic has no atanh lowering
    # (hit on real TPU, mackay spa golden regen 2026-08-20); same
    # expression the layered/flooding QC kernels use
    mag = jnp.log1p(t) - jnp.log1p(-t)
    sgn_prod = _sign_prod(V3, mask3)
    return jnp.where(mask3, (sgn_prod * s) * mag, 0.0)


def _dot(A, x):
    return jax.lax.dot_general(
        A, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    llr_ref, S_ref, St_ref, H_ref, mask_ref,
    bits_ref, ok_ref, iters_ref,
    *, m_pad: int, dc: int, kind: str, alpha: float, beta: float,
    max_iters: int, early_term: bool,
):
    llr = llr_ref[:].astype(jnp.float32)  # [n_pad, Bt]
    S = S_ref[:]      # [n_pad, e_pad]   (f32 or bf16; 0/1 exact either way)
    St = St_ref[:]    # [e_pad, n_pad]
    H = H_ref[:]      # [m2_pad, n_pad]
    mask3 = mask_ref[:].reshape(m_pad, dc, 1) > 0.5
    Bt = llr.shape[1]
    md = S.dtype  # matmul input dtype: bf16 runs the MXU at full rate

    def dot(A, x):
        return _dot(A, x.astype(md))

    if kind == "spa":
        cn = functools.partial(_cn_spa_3d)
    else:
        cn = functools.partial(_cn_minsum_3d, alpha=alpha, beta=beta)

    def syndrome_fail(total):  # -> f32 [1, Bt], 1.0 where some check fails
        hard = (total < 0).astype(jnp.float32)
        cnt = dot(H, hard)
        par = cnt - 2.0 * jnp.floor(cnt * 0.5)
        return jnp.max(par, axis=0, keepdims=True)

    V = jnp.where(mask3, dot(St, llr).reshape(m_pad, dc, Bt), 0.0)
    total = llr
    fail0 = syndrome_fail(total)
    done = 1.0 - fail0  # f32 [1, Bt]
    iters = jnp.zeros_like(done)

    def body(carry):
        V, total, done, iters, it = carry
        C = cn(V, mask3)
        Cflat = C.reshape(m_pad * dc, Bt)
        new_total = llr + dot(S, Cflat)
        newV = jnp.where(mask3, dot(St, new_total).reshape(m_pad, dc, Bt) - C, 0.0)
        fail = syndrome_fail(new_total)
        keep = done > 0.5
        V = jnp.where(keep[:, None, :], V, newV)
        total = jnp.where(keep, total, new_total)
        iters = iters + (1.0 - done)
        done = jnp.maximum(done, 1.0 - fail)
        return V, total, done, iters, it + 1

    if early_term:
        carry = (V, total, done, iters, jnp.zeros((), jnp.int32))

        def cond(carry):
            _, _, done, _, it = carry
            return (it < max_iters) & (jnp.min(done) < 0.5)

        _, total, done, iters, _ = jax.lax.while_loop(cond, body, carry)
    else:
        # pure fixed-iteration benchmark mode (twin of the layered
        # kernel's): no per-iteration syndrome matmul, no freeze masks —
        # literally max_iters update steps, truthful syndrome at the end
        def pure_body(_, c):
            V, total = c
            C = cn(V, mask3)
            Cflat = C.reshape(m_pad * dc, Bt)
            new_total = llr + dot(S, Cflat)
            newV = jnp.where(
                mask3, dot(St, new_total).reshape(m_pad, dc, Bt) - C, 0.0
            )
            return newV, new_total

        _, total = jax.lax.fori_loop(0, max_iters, pure_body, (V, total))
        done = 1.0 - syndrome_fail(total)
        iters = jnp.full_like(done, float(max_iters))
    bits_ref[:] = (total < 0).astype(jnp.float32)
    ok_ref[:] = done
    iters_ref[:] = iters


def supports(graph: CompiledGraph) -> bool:
    """Gate: both incidence operators (2 copies each, double-buffered) must
    leave room in ~128 MB VMEM alongside the message state."""
    n_pad = _round_up(graph.n, 128)
    e_pad = _round_up(graph.m, 128) * graph.dc_max
    return 2 * 2 * 4 * n_pad * e_pad <= 100 * 1024 * 1024


def build_operators(graph: CompiledGraph, n_pad: int, m_pad: int, m2_pad: int):
    """Padded incidence operators (host-side, NumPy)."""
    m, n, dc = graph.m, graph.n, graph.dc_max
    e_pad = m_pad * dc
    cn_vn = np.asarray(graph.cn_vn)
    cn_mask = np.asarray(graph.cn_mask)
    S = np.zeros((n_pad, e_pad), dtype=np.float32)
    H = np.zeros((m2_pad, n_pad), dtype=np.float32)
    maskf = np.zeros((m_pad, dc), dtype=np.float32)
    for i in range(m):
        for j in range(dc):
            if cn_mask[i, j]:
                v = int(cn_vn[i, j])
                S[v, i * dc + j] = 1.0
                H[i, v] = 1.0
                maskf[i, j] = 1.0
    return S, S.T.copy(), H, maskf


def make_pallas_decoder(
    graph: CompiledGraph,
    kind: str = "minsum",
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    max_iters: int = 25,
    early_term: bool = True,
    jit: bool = True,
    batch_tile: int = 128,
    interpret: Optional[bool] = None,
    mxu_dtype=jnp.float32,
):
    """decode(llr [B, n]) -> DecodeResult via the fused VMEM-resident kernel.

    interpret=None auto-selects interpreter mode off-TPU (the CI strategy of
    SURVEY.md §4.2 item 3: the XLA tier is the oracle, interpret mode the
    bridge). mxu_dtype=bf16 stores the incidence operators in bf16 (0/1 is
    exact) and rounds messages to bf16 at the matmul inputs — ~8x MXU rate
    at the cost of message quantization; f32 stays bit-exact with the
    oracle."""
    if kind not in ("minsum", "spa"):
        raise KeyError(f"pallas fused decoder supports spa/minsum, not {kind!r}")
    n_pad = _round_up(graph.n, 128)
    m_pad = _round_up(graph.m, 128 // 8 * 8)  # sublane-friendly; dc stays
    m2_pad = _round_up(graph.m, 8)
    e_pad = m_pad * graph.dc_max
    S, St, H, maskf = build_operators(graph, n_pad, m_pad, m2_pad)
    S = jnp.asarray(S, mxu_dtype)
    St = jnp.asarray(St, mxu_dtype)
    H = jnp.asarray(H, mxu_dtype)
    maskf = jnp.asarray(maskf)

    kern = functools.partial(
        _kernel, m_pad=m_pad, dc=graph.dc_max, kind=kind, alpha=alpha,
        beta=beta, max_iters=max_iters, early_term=early_term,
    )

    # 2x: pallas double-buffers input blocks (even grid-invariant ones), so
    # a tight single-copy budget makes Mosaic reject the kernel.
    vmem_bytes = 2 * 4 * (
        S.size + St.size + H.size + maskf.size
        + 3 * e_pad * batch_tile + 4 * n_pad * batch_tile
    ) + (1 << 23)

    # The operators are ARGUMENTS of the jitted impl (closure-captured arrays
    # embed as giant inline MLIR constants that break the remote compiler).
    # Padding/unpadding also live INSIDE the jit: on the tunneled device each
    # eager dispatch costs milliseconds, so the whole decode must be one call.
    def decode_impl(llr, S, St, H, maskf):
        B = llr.shape[0]
        B_pad = _round_up(max(B, batch_tile), batch_tile)
        llr_t = jnp.zeros((n_pad, B_pad), jnp.float32)
        llr_t = llr_t.at[: graph.n, :B].set(llr.T.astype(jnp.float32))
        grid = (B_pad // batch_tile,)
        itp = interpret
        if itp is None:
            itp = jax.default_backend() != "tpu"
        bits, ok, iters = pl.pallas_call(
            kern,
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, B_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec((n_pad, batch_tile), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, e_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_pad, n_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m2_pad, n_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, graph.dc_max), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((n_pad, batch_tile), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, batch_tile), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, batch_tile), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(int(vmem_bytes), 120 * 1024 * 1024),
            ),
            interpret=itp,
        )(llr_t, S, St, H, maskf)
        return DecodeResult(
            bits=(bits[: graph.n, :B] > 0.5).astype(jnp.uint8).T,
            ok=ok[0, :B] > 0.5,
            iterations=iters[0, :B].astype(jnp.int32),
        )

    impl = jax.jit(decode_impl) if jit else decode_impl

    def decode(llr: jax.Array) -> DecodeResult:
        return impl(llr, S, St, H, maskf)

    return decode
