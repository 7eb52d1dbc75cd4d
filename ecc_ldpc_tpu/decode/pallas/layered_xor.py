"""Fused layered decoder for XOR-permutation QC graphs (IEEE 802.3an).

The 802.3an RS-LDPC lifts with GF(2)-additive blocks (a -> a ^ s,
codes/ieee8023an.py) — not circulants, so pltpu.roll cannot address it
and layered_qc gates itself off. This kernel serves the family natively:
each Z x Z XOR-permutation is applied as a one-hot MATMUL P_e @ slab on
the MXU (P_e[i, i^s] = 1; an involution, so the same P_e converts both
alignments). Everything else mirrors layered_qc's classic sweep: [Z, Bt]
slabs with batch on lanes, VMEM-resident total/C state across all
iterations, two-pass per-layer min-sum with streaming two-min, bitxor
(IEEE signbit) sign accumulation, the exact pass-with-no-flips early-
termination criterion, and per-lane freeze.

Why a kernel at all: the XLA static-perm tier is correct but this
platform's remote XLA helper compiles its ~5k-op unrolled sweep
pathologically (minutes per replica, hangs under the chained timing
harness) and the flip-based lowering runs at 37 Mbit/s; the Mosaic
module here is opaque to XLA (chains compile instantly) and the dots run
at MXU rate. Measured (TPU v5e, batch 4096, fixed-25): see
docs/FAMILY_BENCH.json 8023an row.

Oracle twin: decode/xla/layered.py with sign_mode='bitxor' (dup-free set
form — xor lifts have one shift per base cell). Bit-exact in interpret
mode, where the one-hot dot is an exact f32 selection.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...graph.qc import QCGraph
from ..types import DecodeResult

_MAG_CAP = 1e12
_SGN_MASK = np.int32(-(2**31))  # 0x80000000: f32 sign bit


def supports(graph: QCGraph, batch_tile: int = 256, msg_bytes: int = 4,
             kind: str = "minsum", schedule: str = "layered") -> bool:
    if graph.perm != "xor" or kind != "minsum":
        return False
    if not graph.intra_layer_dup_free:
        return False  # set-form posterior update needs one touch per layer
    lanes = max(batch_tile, 128)
    Z, nb, BE = graph.Z, graph.nb, graph.num_block_edges
    if Z % 8 or Z > 1024:
        return False
    state = Z * lanes * (
        msg_bytes * BE          # C
        + 4 * nb                # total (f32)
        + 4 * nb                # llr window
        + 4 * nb                # bits out (f32)
        + 4 * graph.dcb_max     # vrow scratch
        + (4 * nb if schedule == "flooding" else 0)  # acc
    ) + 2 * 4 * BE * Z * Z      # P table (double-buffered input)
    return state <= 100 * 1024 * 1024


def _kernel(
    ge_be_ref, be_col_ref,
    P_ref, llr_ref, bits_ref, ok_ref, iters_ref,
    total_s, C_s, vrow_s, *extra_s,
    groups: tuple, nb: int, Z: int, Bt: int,
    alpha, beta, max_iters: int, early_term: bool,
    precision=None, schedule: str = "layered",
):
    acc_s = extra_s[0] if schedule == "flooding" else None
    def perm(e, x):
        # one-hot MXU matmul. HIGHEST keeps the full f32 mantissa through
        # the multi-pass decomposition (exact selection — the interpret /
        # parity configuration); DEFAULT is a single bf16 pass, i.e. the
        # perm rounds values to bf16 — the same message-precision policy
        # the other production kernels use (bf16 storage, FER-validated),
        # measured 3.5x faster end-to-end (1018 vs 288 Mbit/s).
        return jax.lax.dot(
            P_ref[e], x, precision=precision,
            preferred_element_type=jnp.float32,
        )

    total_s[:] = llr_ref[:].astype(jnp.float32)
    C_s[:] = jnp.zeros_like(C_s)

    def syndrome_fail():
        fail = jnp.zeros((1, Bt), jnp.float32)
        for deg, nrows, off in groups:
            def layer(li, fail, deg=deg, off=off):
                acc = jnp.zeros((Z, Bt), jnp.float32)
                for si in range(deg):
                    e = ge_be_ref[off + li * deg + si]
                    hard = (perm(e, total_s[be_col_ref[e]]) < 0)
                    acc = acc + hard.astype(jnp.float32)
                par = acc - 2.0 * jnp.floor(acc * 0.5)
                return jnp.maximum(fail, jnp.max(par, axis=0, keepdims=True))
            fail = jax.lax.fori_loop(0, nrows, layer, fail)
        return fail

    def sweep(frozen, track):
        """One layered iteration (classic two-pass, set-form posterior).
        Returns the on-the-fly fail: any layer parity unsatisfied OR any
        hard-decision sign flip — pass-with-no-flips is an exact
        syndrome (twin comment in decode/xla/layered.py)."""
        keep = (frozen > 0.5) if track else None
        fail = jnp.zeros((1, Bt), jnp.float32)
        flipacc0 = jnp.zeros((Z, Bt), jnp.int32)
        for deg, nrows, off in groups:
            def layer(li, carry, deg=deg, off=off):
                if track:
                    fail, flipacc = carry
                else:
                    fail = carry
                base = off + li * deg
                inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
                zero = jnp.zeros((Z, Bt), jnp.float32)
                min1, min2, hardcnt = inf, inf, zero
                sgnacc = jnp.zeros((Z, Bt), jnp.int32)
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    aligned = perm(e, total_s[be_col_ref[e]])
                    vrow_s[si] = aligned  # pass 2 re-derives the extrinsic
                    slab = aligned - C_s[e].astype(jnp.float32)
                    a = jnp.abs(slab)
                    min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                    min1 = jnp.minimum(min1, a)
                    # signbit (bitxor) semantics — twin of the oracle's
                    # sign_mode='bitxor'
                    sgnacc = sgnacc ^ jax.lax.bitcast_convert_type(
                        slab, jnp.int32
                    )
                    if track:
                        hardcnt = hardcnt + (aligned < 0).astype(jnp.float32)
                if track:
                    hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                    fail = jnp.maximum(
                        fail, jnp.max(hpar, axis=0, keepdims=True)
                    )
                mag1 = jnp.maximum(alpha * jnp.minimum(min1, _MAG_CAP) - beta,
                                   0.0)
                mag2 = jnp.maximum(alpha * jnp.minimum(min2, _MAG_CAP) - beta,
                                   0.0)
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    col = be_col_ref[e]
                    aligned = vrow_s[si]
                    Cold = C_s[e].astype(jnp.float32)
                    v = aligned - Cold
                    mag = jnp.where(jnp.abs(v) == min1, mag2, mag1)
                    flip = (sgnacc ^ jax.lax.bitcast_convert_type(
                        v, jnp.int32)) & _SGN_MASK
                    Cnew = jax.lax.bitcast_convert_type(
                        jax.lax.bitcast_convert_type(mag, jnp.int32) | flip,
                        jnp.float32,
                    )
                    if track:
                        Cnew = jnp.where(keep, Cold, Cnew)
                    Cb = Cnew.astype(C_s.dtype)
                    new_aligned = v + Cb.astype(jnp.float32)
                    if track:
                        new_aligned = jnp.where(keep, aligned, new_aligned)
                        flipacc = flipacc | (
                            (jax.lax.bitcast_convert_type(new_aligned,
                                                          jnp.int32)
                             ^ jax.lax.bitcast_convert_type(aligned,
                                                            jnp.int32))
                            & _SGN_MASK
                        )
                        # frozen lanes keep the STORED total (a perm
                        # round-trip must not touch a verified frame)
                        total_s[col] = jnp.where(
                            keep, total_s[col], perm(e, new_aligned)
                        )
                    else:
                        total_s[col] = perm(e, new_aligned)
                    C_s[e] = Cb
                if track:
                    return fail, flipacc
                return fail
            if track:
                fail, flipacc0 = jax.lax.fori_loop(
                    0, nrows, layer, (fail, flipacc0)
                )
            else:
                fail = jax.lax.fori_loop(0, nrows, layer, fail)
        if track:
            anyflip = jnp.max((flipacc0 != 0).astype(jnp.float32), axis=0,
                              keepdims=True)
            fail = jnp.maximum(fail, anyflip)
        return fail

    def sweep_flooding(frozen, track):
        """One flooding iteration — the perm-dot twin of
        decode/pallas/flooding_qc's sweep (count sign semantics, stale
        totals all iteration, posterior rebuilt into acc and swapped;
        a frame whose PRE-sweep parity verifies keeps that state)."""
        acc_s[:] = llr_ref[:].astype(jnp.float32)
        keep = (frozen > 0.5) if track else None
        fail = jnp.zeros((1, Bt), jnp.float32)
        for deg, nrows, off in groups:
            def layer(li, fail, deg=deg, off=off):
                base = off + li * deg
                inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
                zero = jnp.zeros((Z, Bt), jnp.float32)
                min1, min2, negcnt, hardcnt = inf, inf, zero, zero
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    aligned = perm(e, total_s[be_col_ref[e]])
                    slab = aligned - C_s[e].astype(jnp.float32)
                    vrow_s[si] = slab
                    a = jnp.abs(slab)
                    min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                    min1 = jnp.minimum(min1, a)
                    negcnt = negcnt + (slab < 0).astype(jnp.float32)
                    if track:
                        hardcnt = hardcnt + (aligned < 0).astype(jnp.float32)
                if track:
                    hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                    fail = jnp.maximum(
                        fail, jnp.max(hpar, axis=0, keepdims=True)
                    )
                par = negcnt - 2.0 * jnp.floor(negcnt * 0.5)
                sgn_prod = 1.0 - 2.0 * par
                mag1 = jnp.maximum(
                    alpha * jnp.minimum(min1, _MAG_CAP) - beta, 0.0
                )
                mag2 = jnp.maximum(
                    alpha * jnp.minimum(min2, _MAG_CAP) - beta, 0.0
                )
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    col = be_col_ref[e]
                    v = vrow_s[si]
                    sv = jnp.where(v < 0, -1.0, 1.0)
                    mag = jnp.where(jnp.abs(v) == min1, mag2, mag1)
                    Cnew = (sgn_prod * sv) * mag
                    if track:
                        Cnew = jnp.where(keep, C_s[e].astype(jnp.float32),
                                         Cnew)
                    Cb = Cnew.astype(C_s.dtype)
                    acc_s[col] = acc_s[col] + perm(e, Cb.astype(jnp.float32))
                    C_s[e] = Cb
                return fail
            fail = jax.lax.fori_loop(0, nrows, layer, fail)
        if track:
            # pre-sweep-verified frames FREEZE the verified state (the
            # fail parity is of the stale posteriors — twin comment in
            # decode/xla/flooding_qc.py)
            keep_end = jnp.logical_or(keep, fail <= 0.5)
            total_s[:] = jnp.where(keep_end, total_s[:], acc_s[:])
        else:
            total_s[:] = acc_s[:]
        return fail

    if early_term:
        done0 = 1.0 - syndrome_fail()
        iters0 = jnp.zeros((1, Bt), jnp.float32)

        if schedule == "flooding":
            def body(carry):
                done, iters, it = carry
                fail = sweep_flooding(done, True)
                done = jnp.maximum(done, 1.0 - fail)
                # a frame whose pre-sweep state verified kept that state
                # (no advance), so the verifying sweep is not counted —
                # twin of decode_flooding_qc's done_new accounting
                iters = iters + (1.0 - done)
                return done, iters, it + 1
        else:
            def body(carry):
                done, iters, it = carry
                # iters counts sweeps APPLIED (incl. the verifying one) —
                # twin of decode_layered's pre-sweep-done accounting
                iters = iters + (1.0 - done)
                fail = sweep(done, True)
                done = jnp.maximum(done, 1.0 - fail)
                return done, iters, it + 1

        def cond(carry):
            done, _, it = carry
            return (it < max_iters) & (jnp.min(done) < 0.5)

        _, iters, _ = jax.lax.while_loop(
            cond, body, (done0, iters0, jnp.zeros((), jnp.int32))
        )
    else:
        one = (sweep_flooding if schedule == "flooding"
               else sweep)
        jax.lax.fori_loop(
            0, max_iters, lambda _, c: (one(None, False), c)[1], 0
        )
        iters = jnp.full((1, Bt), float(max_iters), jnp.float32)

    bits_ref[:] = (total_s[:] < 0).astype(jnp.float32)
    ok_ref[:] = 1.0 - syndrome_fail()
    iters_ref[:] = iters


def make_layered_xor_decoder(
    graph: QCGraph,
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    max_iters: int = 25,
    early_term: bool = True,
    jit: bool = True,
    batch_tile: int = 256,
    interpret: Optional[bool] = None,
    msg_dtype=jnp.float32,
    mxu_precision="auto",
    schedule: str = "layered",
):
    """decode(llr [B, n]) -> DecodeResult via the fused xor-perm kernel.

    alpha/beta must be scalars (learned schedules not wired for this
    family). mxu_precision='auto' picks the bf16 single-pass perm on a
    real TPU backend (3.5x throughput at FER parity — validated like the
    other kernels' bf16 message storage) and HIGHEST otherwise, which is
    bit-exact with the XLA oracle twin; pass a jax.lax.Precision to
    force."""
    if graph.perm != "xor":
        raise TypeError(f"{graph.name}: layered_xor needs a perm='xor' graph")
    if not graph.intra_layer_dup_free:
        raise ValueError(f"{graph.name}: xor kernel needs dup-free layers")
    if not (np.isscalar(alpha) or np.ndim(alpha) == 0) or not (
        np.isscalar(beta) or np.ndim(beta) == 0
    ):
        raise ValueError("layered_xor takes scalar alpha/beta")
    Z, nb = graph.Z, graph.nb
    BE = graph.num_block_edges

    ge_be = []
    groups = []
    for deg, rows in graph.layer_groups:
        groups.append((deg, len(rows), len(ge_be)))
        for r in rows:
            for e, _, _ in graph.layer_edges(r):
                ge_be.append(e)
    groups = tuple(groups)
    ge_be = jnp.asarray(np.asarray(ge_be, np.int32))
    be_col = jnp.asarray(graph.be_col)
    # one-hot permutation table: P[e, i, i ^ s_e] = 1 (self-inverse)
    P_np = np.zeros((BE, Z, Z), np.float32)
    r = np.arange(Z)
    for e in range(BE):
        P_np[e, r, r ^ int(graph.be_shift_np[e])] = 1.0
    P = jnp.asarray(P_np)

    if mxu_precision == "auto":
        mxu_precision = (
            jax.lax.Precision.DEFAULT
            if interpret is not True and jax.default_backend() == "tpu"
            else jax.lax.Precision.HIGHEST
        )
    if schedule not in ("layered", "flooding"):
        raise KeyError(f"schedule must be layered/flooding, got {schedule!r}")
    kern = functools.partial(
        _kernel, groups=groups, nb=nb, Z=Z, Bt=batch_tile,
        alpha=float(alpha), beta=float(beta), max_iters=max_iters,
        early_term=early_term, precision=mxu_precision, schedule=schedule,
    )
    state_bytes = Z * batch_tile * (
        jnp.dtype(msg_dtype).itemsize * BE + 4 * nb * 3
        + 4 * graph.dcb_max
    ) + 2 * 4 * BE * Z * Z
    vmem_limit = min(state_bytes + (1 << 23), 127 * 1024 * 1024)

    def decode_impl(llr, ge_be, be_col, P):
        B = llr.shape[0]
        B_pad = -(-max(B, batch_tile) // batch_tile) * batch_tile
        llr3 = jnp.zeros((nb, Z, B_pad), jnp.float32)
        llr3 = llr3.at[:, :, :B].set(
            llr.T.astype(jnp.float32).reshape(nb, Z, B)
        )
        itp = interpret
        if itp is None:
            itp = jax.default_backend() != "tpu"
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B_pad // batch_tile,),
            in_specs=[
                pl.BlockSpec((BE, Z, Z), lambda b, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, Z, batch_tile), lambda b, *_: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((nb, Z, batch_tile), lambda b, *_: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, batch_tile), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, batch_tile), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((nb, Z, batch_tile), jnp.float32),
                pltpu.VMEM((BE, Z, batch_tile), msg_dtype),
                pltpu.VMEM((graph.dcb_max, Z, batch_tile), jnp.float32),
            ] + (
                [pltpu.VMEM((nb, Z, batch_tile), jnp.float32)]
                if schedule == "flooding" else []
            ),
        )
        bits, ok, iters = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb, Z, B_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit),
            ),
            interpret=itp,
        )(ge_be, be_col, P, llr3)
        return DecodeResult(
            bits=(bits.reshape(nb * Z, B_pad)[:, :B] > 0.5).astype(
                jnp.uint8).T,
            ok=ok[0, :B] > 0.5,
            iterations=iters[0, :B].astype(jnp.int32),
        )

    impl = jax.jit(decode_impl) if jit else decode_impl

    def decode(llr):
        return impl(llr, ge_be, be_col, P)

    return decode
