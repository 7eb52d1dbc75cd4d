"""Fused flooding decoder: all BP iterations inside ONE Pallas kernel.

The native tier (SURVEY.md §2.2 C15-C17) for unstructured codes. Where the
reference's accelerator tier launches one Accelerate/CUDA kernel per decode
step (SURVEY.md §2.1 R10), this kernel keeps the entire message state in
VMEM across all iterations — the roofline in SURVEY.md §6 shows per-
iteration HBM round-trips forfeit ~an order of magnitude.

Edge state is stored DC-MAJOR: edge e = j*m_pad + i (slot j of check i),
so slab j = V[j*m_pad:(j+1)*m_pad] is a clean (8,128)-tiled 2D block per
check-slot. The production layout used to be [m, dc, Bt] (dc on the
sublane-tiled axis): with dc=6 every slab padded 6->8 sublanes and every
reshape to/from the matmul's flat [m*dc, Bt] form relayouted — measured
2026-08-20 (experiments/smallcode_opt2.py, honest differential timing):
dc-major + the slab-unrolled CN below took mackay1008 fixed-25 min-sum
from 169 -> 257 Mbit/s/chip.

In-kernel data flow per iteration (per batch tile, everything VMEM-resident):

  C    = cn_update(V)            VPU   slab tournament two-min + bitxor signs
  tot  = llr + S @ C             MXU   VN accumulate as incidence matmul
  V    = St @ tot - C            MXU   edge re-expansion
  par  = (H @ (tot<0)) mod 2     MXU   syndrome
  freeze converged lanes         VPU   done-mask (early term under jit)

The gather/scatter of the compressed edge list is realized as multiplication
by the 0/1 incidence operators S [n, m*dc] / S^T — the MXU-native form (and
the only TPU-viable one here: the platform compiler crashes on XLA
gather->reduce->gather chains, and Pallas TPU has no vector-gather).

All shapes are padded to MXU/VPU tiles (n -> multiple of 128, m -> multiple
of 128 so each slab tiles evenly; batch tile Bt on lanes). Padding is
arithmetically neutral: padded edges are masked, padded variables see llr=0,
padded checks have empty rows.

Numerics at mxu_dtype=f32 are bit-identical to decode/xla/dense_mm.py
(same schedule; CN forms provably equal — tournament two-min/bitxor vs
is-min-count/sign-product), which tests/pallas/ verifies in interpret
mode. mxu_dtype='auto' selects bf16 operators + bf16-rounded matmul
inputs for MIN-SUM on a real TPU backend (0/1 operators are exact in
bf16; min-sum is quantization-robust — measured FER identical at the
mackay1008 operating point, tests/decode/test_quantized.py shows the
same at 6-bit messages) and f32 everywhere else, so CPU/interpret stays
the oracle twin and the spa golden tier keeps f32 end-to-end.
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

_MAG_CAP = 1e12  # padded-slot sentinel magnitude; also caps degree-1 rows
_SGN = np.int32(-(2**31))  # f32 sign bit


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cn_minsum_slabs(V, masks, m_pad: int, dc: int, alpha: float, beta: float):
    """Min-sum CN update on dc-major [dc*m_pad, Bt] edge state.

    Unrolled tournament two-min per slab + int32 sign-bit XOR accumulate.
    Tie-robust: the tournament's m2 tracks the second-smallest COUNTING
    duplicates, so `where(a == m1, m2, m1)` yields min1 for every slot of
    a duplicated minimum — exactly cn_ops.cn_minsum's is-min/count rule.
    All ops are exact (min/max/compare/bit ops; the only rounding is
    alpha*mag-beta, shared with the oracle), so outputs are bit-identical
    to the [m, dc, B] oracle form.
    """
    slabs_a = []
    slabs_sb = []
    m1 = None
    m2 = None
    sx = None
    for j in range(dc):
        v = V[j * m_pad:(j + 1) * m_pad]
        a = jnp.where(masks[j], jnp.abs(v), _MAG_CAP)
        # (v < 0), not the raw sign bit: -0.0 must count positive to match
        # the oracle's sign-product convention
        sb = jnp.where(v < 0, _SGN, 0)
        slabs_a.append(a)
        slabs_sb.append(sb)
        if j == 0:
            m1, m2 = a, jnp.full_like(a, _MAG_CAP)
            sx = sb
        else:
            nm1 = jnp.minimum(m1, a)
            m2 = jnp.minimum(jnp.maximum(m1, a), m2)
            m1 = nm1
            sx = jax.lax.bitwise_xor(sx, sb)
    outs = []
    for j in range(dc):
        a, sb = slabs_a[j], slabs_sb[j]
        mag = jnp.where(a == m1, m2, m1)
        mag = jnp.maximum(alpha * mag - beta, 0.0)
        sgn = jax.lax.bitwise_xor(sx, sb)
        c = jax.lax.bitcast_convert_type(
            jax.lax.bitwise_xor(
                jax.lax.bitcast_convert_type(mag, jnp.int32), sgn
            ),
            jnp.float32,
        )
        outs.append(jnp.where(masks[j], c, 0.0))
    return jnp.concatenate(outs, axis=0)


def _cn_spa_slabs(V, masks, m_pad: int, dc: int):
    """SPA tanh CN update on dc-major [dc*m_pad, Bt] (mirrors cn_ops.cn_spa:
    log-tanh sum, leave-one-out, 2*arctanh in the log1p form — Mosaic has
    no atanh lowering, hit on real TPU during the mackay spa golden regen
    2026-08-20)."""
    slabs_lt = []
    slabs_sb = []
    acc = None
    sx = None
    for j in range(dc):
        v = V[j * m_pad:(j + 1) * m_pad]
        a = jnp.abs(v)
        lt = jnp.log(jnp.tanh(jnp.clip(a, 1e-10, 40.0) * 0.5))
        lt = jnp.where(masks[j], lt, 0.0)
        sb = jnp.where(v < 0, _SGN, 0)
        slabs_lt.append(lt)
        slabs_sb.append(sb)
        acc = lt if j == 0 else acc + lt
        sx = sb if j == 0 else jax.lax.bitwise_xor(sx, sb)
    outs = []
    for j in range(dc):
        loo = acc - slabs_lt[j]
        t = jnp.clip(jnp.exp(loo), None, 1.0 - 1e-7)
        mag = jnp.log1p(t) - jnp.log1p(-t)
        sgn = jax.lax.bitwise_xor(sx, slabs_sb[j])
        c = jax.lax.bitcast_convert_type(
            jax.lax.bitwise_xor(
                jax.lax.bitcast_convert_type(mag, jnp.int32), sgn
            ),
            jnp.float32,
        )
        outs.append(jnp.where(masks[j], c, 0.0))
    return jnp.concatenate(outs, axis=0)


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
    md = S.dtype  # matmul input dtype: bf16 runs the MXU at full rate
    # per-slab mask columns [m_pad, 1], broadcast over lanes
    masks = [mask_ref[j, :].reshape(m_pad, 1) > 0.5 for j in range(dc)]

    def dot(A, x):
        return jax.lax.dot_general(
            A, x.astype(md), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if kind == "spa":
        cn = functools.partial(_cn_spa_slabs, masks=masks, m_pad=m_pad, dc=dc)
    else:
        cn = functools.partial(_cn_minsum_slabs, masks=masks, m_pad=m_pad,
                               dc=dc, alpha=alpha, beta=beta)

    def syndrome_fail(total):  # -> f32 [1, Bt], 1.0 where some check fails
        hard = (total < 0).astype(jnp.float32)
        cnt = dot(H, hard)
        par = cnt - 2.0 * jnp.floor(cnt * 0.5)
        return jnp.max(par, axis=0, keepdims=True)

    # init: V_e = llr[v(e)] on live edges, 0 on padded (St rows of padded
    # edges are all-zero, so the matmul masks for free)
    V = dot(St, llr)
    total = llr

    if early_term:
        fail0 = syndrome_fail(total)
        done = 1.0 - fail0  # f32 [1, Bt]
        iters = jnp.zeros_like(done)

        def body(carry):
            V, total, done, iters, it = carry
            C = cn(V)
            new_total = llr + dot(S, C)
            newV = dot(St, new_total) - C
            fail = syndrome_fail(new_total)
            keep = done > 0.5
            V = jnp.where(keep, V, newV)
            total = jnp.where(keep, total, new_total)
            iters = iters + (1.0 - done)
            done = jnp.maximum(done, 1.0 - fail)
            return V, total, done, iters, it + 1

        def cond(carry):
            _, _, done, _, it = carry
            return (it < max_iters) & (jnp.min(done) < 0.5)

        carry = (V, total, done, iters, jnp.zeros((), jnp.int32))
        _, total, done, iters, _ = jax.lax.while_loop(cond, body, carry)
    else:
        # pure fixed-iteration benchmark mode (twin of the layered
        # kernel's): no per-iteration syndrome matmul, no freeze masks —
        # literally max_iters update steps, truthful syndrome at the end
        def pure_body(_, c):
            V, total = c
            C = cn(V)
            new_total = llr + dot(S, C)
            newV = dot(St, new_total) - C
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
    """Padded dc-major incidence operators (host-side, NumPy).

    Edge index e = j*m_pad + i. A live edge (check i, slot j, variable v)
    sets S[v, e] = 1; padded slots/rows stay zero everywhere, and the
    returned mask is [dc, m_pad] (slab-major, matching the kernel)."""
    m, n, dc = graph.m, graph.n, graph.dc_max
    e_pad = m_pad * dc
    cn_vn = np.asarray(graph.cn_vn)
    cn_mask = np.asarray(graph.cn_mask)
    S = np.zeros((n_pad, e_pad), dtype=np.float32)
    H = np.zeros((m2_pad, n_pad), dtype=np.float32)
    maskf = np.zeros((dc, m_pad), dtype=np.float32)
    for i in range(m):
        for j in range(dc):
            if cn_mask[i, j]:
                v = int(cn_vn[i, j])
                S[v, j * m_pad + i] = 1.0
                H[i, v] = 1.0
                maskf[j, i] = 1.0
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
    batch_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    mxu_dtype="auto",
):
    """decode(llr [B, n]) -> DecodeResult via the fused VMEM-resident kernel.

    interpret=None auto-selects interpreter mode off-TPU (the CI strategy of
    SURVEY.md §4.2 item 3: the XLA tier is the oracle, interpret mode the
    bridge). batch_tile=None auto-selects 256 lanes/tile when the batch
    fills it and VMEM allows (+3% measured on mackay1008, prologue
    amortization), else 128; pass an int to force.
    mxu_dtype: 'auto' picks bf16 for min-sum on a real TPU backend
    (measured +60% at identical FER, module docstring) and f32 otherwise;
    an explicit jnp dtype forces it. f32 stays bit-exact with the oracle;
    bf16 stores the incidence operators in bf16 (0/1 is exact) and rounds
    messages to bf16 at the matmul inputs."""
    if kind not in ("minsum", "spa"):
        raise KeyError(f"pallas fused decoder supports spa/minsum, not {kind!r}")
    if mxu_dtype == "auto":
        mxu_dtype = (
            jnp.bfloat16
            if kind == "minsum"
            and interpret is not True
            and jax.default_backend() == "tpu"
            else jnp.float32
        )
    n_pad = _round_up(graph.n, 128)
    m_pad = _round_up(graph.m, 128)  # slabs tile (8,128) evenly
    m2_pad = _round_up(graph.m, 8)
    e_pad = m_pad * graph.dc_max
    S, St, H, maskf = build_operators(graph, n_pad, m_pad, m2_pad)

    def vmem_estimate(bt: int) -> int:
        # One formula for both the auto-tile decision and the CompilerParams
        # limit, so they can't silently diverge. 2x: pallas double-buffers
        # input blocks (even grid-invariant ones); 4 B/elt is a deliberate
        # upper bound that stays valid when mxu_dtype is bf16.
        return 2 * 4 * (
            S.size + St.size + H.size + maskf.size
            + 3 * e_pad * bt + 4 * n_pad * bt
        ) + (1 << 23)

    def _pick_batch_tile(B: int) -> int:
        # 256 lanes/tile amortizes the per-tile prologue over twice the
        # work: mackay1008 batch-2048 fixed-25 measures 270 vs 261 Mbit/s
        # (bt=512 regresses to 265 — the tile state starts crowding the
        # operator double-buffers). Auto-pick 256 when the batch fills it
        # and the VMEM estimate leaves headroom, else the safe 128.
        if batch_tile is not None:
            return batch_tile
        return 256 if B >= 256 and vmem_estimate(256) <= 110 * 1024 * 1024 else 128
    S = jnp.asarray(S, mxu_dtype)
    St = jnp.asarray(St, mxu_dtype)
    H = jnp.asarray(H, mxu_dtype)
    maskf = jnp.asarray(maskf)

    kern = functools.partial(
        _kernel, m_pad=m_pad, dc=graph.dc_max, kind=kind, alpha=alpha,
        beta=beta, max_iters=max_iters, early_term=early_term,
    )

    # The operators are ARGUMENTS of the jitted impl (closure-captured arrays
    # embed as giant inline MLIR constants that break the remote compiler).
    # Padding/unpadding also live INSIDE the jit: on the tunneled device each
    # eager dispatch costs milliseconds, so the whole decode must be one call.
    def decode_impl(llr, S, St, H, maskf):
        B = llr.shape[0]
        bt = _pick_batch_tile(B)  # static per traced batch shape
        # A tight single-copy budget makes Mosaic reject the kernel — use
        # the shared double-buffered estimate (same one the tile pick saw).
        vmem_bytes = vmem_estimate(bt)
        B_pad = _round_up(max(B, bt), bt)
        llr_t = jnp.zeros((n_pad, B_pad), jnp.float32)
        llr_t = llr_t.at[: graph.n, :B].set(llr.T.astype(jnp.float32))
        grid = (B_pad // bt,)
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
                pl.BlockSpec((n_pad, bt), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, e_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_pad, n_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m2_pad, n_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((graph.dc_max, m_pad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((n_pad, bt), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bt), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bt), lambda b: (0, b),
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
