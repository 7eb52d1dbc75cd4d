"""Fused layered QC decoder: full layered min-sum in one Pallas kernel
(SURVEY.md §2.2 C18 — the DVB-S2 / long-block performance path).

All decode state lives in VMEM for the whole decode: posteriors
total [nb, Z, Bt] (f32) and check-aligned messages C [BE, Z, Bt]
(bf16-storable). Circulant addressing is pltpu.roll along the sublane (Z)
axis with shifts streamed from SMEM scalar prefetch.

Layer sweeps are DEGREE-GROUPED: block-rows are processed in the canonical
degree-sorted order (QCGraph.layer_order, shared with the XLA oracle), one
fori loop per degree group whose body is unrolled to exactly that degree —
no padding slots and no validity masks anywhere in the hot loop. For ragged
graphs (5G NR: degree-3 extension rows next to degree-19 core rows) this
removes a multiple of wasted work.

ALIGNMENT-CARRYING STORAGE (the "delta shift" form): each block-column's
posterior is stored in the check alignment of the LAST layer that touched
it; the next touch rolls only by the shift *difference* (streamed from
SMEM), and the updated posterior is written back in current-layer alignment
as `slab + Cnew`. That is ONE roll per edge-visit instead of two, and in
fixed-iteration mode it also deletes the old-message read and the
(Cnew - Cold) subtract. Columns are pre-rotated once at kernel entry to the
steady-state alignment (so every sweep uses the same deltas) and un-rotated
once at exit. Requires no block-row to touch the same block-column twice
(QCGraph.intra_layer_dup_free); graphs with duplicates take the classic
2-roll delta-add path.

Modes (identical semantics in decode/xla/layered.py):
  early_term=True: on-the-fly syndrome accumulated during the sweep drives
    per-lane freezing and a while_loop exit; ok is one truthful posterior
    syndrome at the end. The per-edge scratch row holds the *rolled
    posterior* so frozen lanes restore it bit-exactly.
  early_term=False: literally max_iters sweeps of min-sum — no freeze, no
    parity bookkeeping (the paper-comparable fixed-iteration benchmark).

Hardware constraints (probed): dynamic-shift roll needs the sublane dim to
be a multiple of 8; lane dim pads to 128. Codes whose Z is not a multiple
of 8 (e.g. 802.11n Z in {27, 54, 81}) are handled by REPLICA PACKING:
R = 8/gcd(Z, 8) independent codewords are interleaved along the sublane
axis (sublane index z*R + r, padded dim Zp = Z*R). A global roll by R*s on
that layout is exactly a per-replica circulant roll by s — the mod-Zp
wraparound lands in the same replica because Zp = Z*R — so the kernel body
is unchanged; only the shift tables scale by R, and per-replica
syndrome/freeze state is kept via a log-tree cyclic max whose static roll
steps are multiples of R. f32 message storage is bit-identical to the
oracle (tests/pallas/); bf16 storage quantizes messages (BER-band tested).
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supports(
    graph: QCGraph, batch_tile: int = 128, msg_bytes: int = 2,
    llr_bytes: int | None = None, kind: str = "minsum",
) -> bool:
    if llr_bytes is None:
        llr_bytes = msg_bytes  # dispatch sets llr_dtype = msg_dtype
    if graph.perm != "roll":
        # this kernel's addressing IS pltpu.roll; xor-perm graphs (802.3an)
        # decode on the XLA static-perm tier (reshape+flip, TPU-safe)
        return False
    lanes = max(batch_tile, 128)  # lane dim pads to 128 either way
    R = 8 // int(np.gcd(graph.Z, 8))  # replica packing factor (see below)
    if graph.Z * R > 1024:
        # measured platform limit (2026-08-18, ccsds family): the remote
        # TPU compile helper exits 1 on this kernel at padded sublane dim
        # 2048 (Z=1024 compiles and runs, Z=2048 crashes; VMEM budget is
        # not the binding constraint). The XLA static-roll tier serves
        # big-Z codes — auto dispatch routes there.
        return False
    vrow_rows = graph.dcb_max
    if kind == "minstar" and not graph.intra_layer_dup_free:
        vrow_rows *= 2  # classic-exact sweep stores slabs + fwd prefixes
    state = graph.Z * R * lanes * (
        msg_bytes * graph.num_block_edges  # C (msg_dtype)
        + 4 * graph.nb                     # total (f32)
        + llr_bytes * graph.nb             # llr in (llr_dtype)
        + 1 * graph.nb                     # bits out (int8)
        + 4 * vrow_rows                    # vrow (f32)
    )
    return state <= 118 * 1024 * 1024


def sweep_layout(graph: QCGraph):
    """Host-side degree-grouped sweep layout + delta-shift tables.

    Returns (groups, ge_be, ge_delta, col_pre, col_post, dup_free) where
    groups = ((deg, nrows, offset), ...) in QCGraph.layer_order;
    ge_be[i] is the block-edge id of sweep slot i; ge_delta[i] the roll
    taking the stored posterior (aligned to its previous touch) into this
    edge's check alignment; col_pre/col_post [nb] the entry/exit rotations.
    Shared by the Pallas kernel and (structurally) the XLA oracle so both
    tiers visit edges in the same order.
    """
    Z = graph.Z
    ge_be, groups = [], []
    for deg, rows in graph.layer_groups:
        groups.append((deg, len(rows), len(ge_be)))
        for r in rows:
            for e, _, _ in graph.layer_edges(r):
                ge_be.append(e)
    groups = tuple(groups)

    col = np.asarray(graph.be_col_np, np.int64)
    shift = np.asarray(graph.be_shift_np, np.int64)
    # steady-state alignment at sweep boundaries: each column's last touch
    a0 = np.zeros(graph.nb, np.int64)
    for e in ge_be:
        a0[col[e]] = shift[e]
    cur = a0.copy()
    ge_delta = np.zeros(len(ge_be), np.int64)
    for i, e in enumerate(ge_be):
        j = col[e]
        ge_delta[i] = (cur[j] - shift[e]) % Z
        cur[j] = shift[e]
    col_pre = (Z - a0) % Z   # var-aligned -> steady-state storage
    col_post = a0            # storage -> var-aligned
    return (
        groups,
        np.asarray(ge_be, np.int32),
        ge_delta.astype(np.int32),
        col_pre.astype(np.int32),
        col_post.astype(np.int32),
        graph.intra_layer_dup_free,
    )


def _kernel(
    # scalar prefetch (SMEM)
    ge_be_ref,     # int32 [sum(deg*nrows)] edge ids, degree-grouped layout
    be_col_ref,    # int32 [BE]
    be_shift_ref,  # int32 [BE]   forward shift s (dup fallback path)
    be_shiftb_ref, # int32 [BE]   precomputed (Z - s) % Z (syndrome)
    ge_delta_ref,  # int32 [sum(deg*nrows)] delta shifts (dup-free path)
    col_pre_ref,   # int32 [nb] entry rotation (dup-free path)
    col_post_ref,  # int32 [nb] exit rotation (dup-free path)
    # VMEM in/out  (Z below is the PACKED sublane dim Zp = Z_base * R)
    llr_ref,       # llr_dtype [nb, Zp, Bt]
    bits_ref,      # int8 [nb, Zp, Bt]
    ok_ref,        # f32 [Rp, Bt]  per-replica ok on sublanes 0..R-1
    iters_ref,     # f32 [Rp, Bt]
    # scratch
    total_s,       # f32 [nb, Zp, Bt]
    C_s,           # msg_dtype [BE, Zp, Bt]
    vrow_s,        # f32 [dcb, Zp, Bt]
    *, groups: tuple, nb: int, Z: int, Bt: int, R: int, Rp: int,
    alpha: float, beta: float, max_iters: int, early_term: bool,
    dup_free: bool, sign_mode: str, fast_mag: bool = True, ab_ref=None,
    kind: str = "minsum", carry_mode: str = "scratch",
    static_tables=None, iter_unroll: int = 1,
):
    # static_tables: optional (ge_be, be_col, ge_delta, col_pre, col_post)
    # NUMPY tables (delta/pre/post already R-scaled). When present the
    # minsum delta sweep unrolls the row loops at trace time: every edge
    # id and shift becomes a compile-time constant, so zero-delta rolls
    # (the DVB-S2 staircase: ~28% of r=1/2 edge-visits) disappear
    # entirely, the per-edge SMEM scalar loads go away, and Mosaic can
    # schedule across row boundaries (disjoint static scratch indices
    # prove independence). Bit-identical to the fori form — same ops in
    # the same order, minus rolls by literal zero.
    # carry_mode: fixed-iteration-path row-value storage. 'scratch' stores the
    # extrinsic slab in the vrow VMEM scratch (the long-standing form);
    # 'ssa' carries the slabs as SSA values across the two passes; and
    # 'ssa_abs' additionally carries |slab| so pass 2 skips the abs
    # recompute. All three are bit-identical; they differ only in where
    # Mosaic keeps the row (registers vs spill), measured in
    # experiments/r2_opt.py. track mode always uses the scratch (the
    # freeze path needs the rolled posterior restored bit-exactly).
    # ab_ref: optional SMEM f32 [2, max_iters] per-iteration (alpha_t,
    # beta_t) schedule (learned NOMS, learn/noms.py). When present the
    # magnitude always takes the capped branch (matching the XLA oracle's
    # unconditional form), read per sweep; the scalar path is untouched.
    bitxor = sign_mode == "bitxor" and dup_free
    total_s[:] = llr_ref[:].astype(jnp.float32)
    # NOTE (measured 2026-08-19): specializing sweep 0 to a "C is
    # known-zero" form (skipping the zero-fill and the old-message
    # read/cast/subtract) LOSES ~11% on the DVB-S2 flagship — the extra
    # unrolled sweep body degrades Mosaic scheduling far more than the
    # saved ops gain. Keep the uniform-sweep form.
    C_s[:] = jnp.zeros_like(C_s)

    def replica_max(x):
        """Cyclic max over the z index within each replica (sublane index
        z*R + r): static rolls by R*2^j stay inside a replica, and after
        ceil(log2(Z_base)) doubling steps every sublane holds its
        replica's max. For R=1 this is a plain cyclic max over Z."""
        shift = R
        while shift < Z:  # 2^j < Z_base  <=>  R*2^j < Zp
            x = jnp.maximum(x, pltpu.roll(x, shift, 0))
            shift *= 2
        return x

    def syndrome_fail():
        """f32 [Zp, Bt]: 1.0 on every sublane of a replica whose codeword
        has some unsatisfied check (posteriors, variable-aligned)."""
        fail = jnp.zeros((Z, Bt), jnp.float32)
        # stays SMEM-streamed even in rows='static' builds: an unrolled
        # syndrome (measured 2026-08-19) inflates Mosaic register-spill
        # slots by ~9 MB and busts the 128 MB VMEM cap at DVB-S2 scale,
        # for a ~1% best-case win (it runs once per decode).
        for deg, nrows, off in groups:
            def layer(li, fail, deg=deg, off=off):
                acc = jnp.zeros((Z, Bt), jnp.float32)
                for si in range(deg):
                    e = ge_be_ref[off + li * deg + si]
                    hard = (total_s[be_col_ref[e]] < 0).astype(jnp.float32)
                    acc = acc + pltpu.roll(hard, be_shiftb_ref[e], 0)
                par = acc - 2.0 * jnp.floor(acc * 0.5)
                return jnp.maximum(fail, par)
            fail = jax.lax.fori_loop(0, nrows, layer, fail)
        return replica_max(fail)

    def rotate(off_ref, off_np):
        if off_np is not None:
            for i in range(nb):
                if int(off_np[i]):
                    total_s[i] = pltpu.roll(total_s[i], int(off_np[i]), 0)
            return
        def rot(i, c):
            total_s[i] = pltpu.roll(total_s[i], off_ref[i], 0)
            return c
        jax.lax.fori_loop(0, nb, rot, 0)

    def edge_at(li, si, deg, off):
        """(edge id, column, roll fn) for sweep slot si of row li — SMEM
        scalar reads on the fori path, compile-time constants (with
        zero rolls elided) on the static path."""
        if static_tables is None:
            e = ge_be_ref[off + li * deg + si]
            dlt = ge_delta_ref[off + li * deg + si]
            return e, be_col_ref[e], lambda x: pltpu.roll(x, dlt, 0)
        ge_np, col_np, dlt_np = static_tables[:3]
        gi = off + li * deg + si
        e = int(ge_np[gi])
        d = int(dlt_np[gi])
        rollp = (lambda x: x) if d == 0 else (
            lambda x, d=d: pltpu.roll(x, d, 0))
        return e, int(col_np[e]), rollp

    def sweep_delta(frozen, track, t=0):
        """One layered iteration, alignment-carrying form (1 roll/edge).
        Returns on-the-fly fail [1, Bt] (meaningful when track=True)."""
        a_s = alpha if ab_ref is None else ab_ref[0, t]
        b_s = beta if ab_ref is None else ab_ref[1, t]
        keep = (frozen > 0.5) if track else None
        fail = jnp.zeros((Z, Bt), jnp.float32)
        # flipacc: sign-flip accumulator (track mode only). Layers see
        # different posterior snapshots, so all parities passing does NOT
        # imply a consistent final state — freezing on that alone was a
        # measured ~3e-4 detected-failure floor on DVB-S2. Pass WITH zero
        # sign flips during the sweep means every layer's parity was
        # evaluated on the final hard decisions: an exact syndrome.
        flipacc0 = jnp.zeros((Z, Bt), jnp.int32)
        for deg, nrows, off in groups:
            def layer(li, carry, deg=deg, off=off):
                if track:
                    fail, flipacc = carry
                else:
                    fail = carry
                # pass 1: roll posteriors into this layer's alignment,
                # running two-min / sign / parity over extrinsic slabs
                inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
                zero = jnp.zeros((Z, Bt), jnp.float32)
                min1, min2, negcnt, hardcnt = inf, inf, zero, zero
                sgnacc = jnp.zeros((Z, Bt), jnp.int32)
                slabs, absl = [], []  # SSA carry variants (see carry_mode)
                for si in range(deg):
                    e, col, rollp = edge_at(li, si, deg, off)
                    rolled = rollp(total_s[col])
                    if track:
                        # scratch holds the rolled POSTERIOR so frozen
                        # lanes restore it bit-exactly in pass 2
                        vrow_s[si] = rolled
                        hardcnt = hardcnt + (rolled < 0).astype(jnp.float32)
                    slab = rolled - C_s[e].astype(jnp.float32)
                    if not track:
                        if carry_mode in ("scratch", "scratch_abs"):
                            vrow_s[si] = slab
                        else:
                            slabs.append(slab)
                    a = jnp.abs(slab)
                    if not track and carry_mode in ("ssa_abs",
                                                    "scratch_abs"):
                        absl.append(a)
                    min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                    min1 = jnp.minimum(min1, a)
                    if bitxor:
                        # sign product as an XOR of f32 bit patterns: one
                        # VPU op per edge vs compare+add (signbit
                        # semantics: -0.0 counts as negative)
                        sgnacc = sgnacc ^ jax.lax.bitcast_convert_type(
                            slab, jnp.int32
                        )
                    else:
                        negcnt = negcnt + (slab < 0).astype(jnp.float32)
                if track:
                    hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                    fail = jnp.maximum(fail, hpar)
                if bitxor:
                    # no pre-mask: the flip computation below masks to the
                    # sign bit anyway
                    sgnbit = sgnacc
                else:
                    par = negcnt - 2.0 * jnp.floor(negcnt * 0.5)
                    sgn_prod = 1.0 - 2.0 * par
                if ab_ref is None and beta == 0.0 and fast_mag and not track:
                    # offset-free fixed-iteration path: alpha*min is already
                    # non-negative and finite (fast_mag certifies every row
                    # has degree >= 2, so min2 is finite, and LLR inputs are
                    # finite), so the cap/clamp ops are dead
                    mag1 = alpha * min1
                    mag2 = alpha * min2
                else:
                    mag1 = jnp.maximum(
                        a_s * jnp.minimum(min1, _MAG_CAP) - b_s, 0.0
                    )
                    mag2 = jnp.maximum(
                        a_s * jnp.minimum(min2, _MAG_CAP) - b_s, 0.0
                    )

                # pass 2: emit messages; posterior written back IN THIS
                # LAYER'S ALIGNMENT as slab + Cnew — no roll
                for si in range(deg):
                    e, col, _ = edge_at(li, si, deg, off)
                    if track:
                        rolledv = vrow_s[si]
                        Cold = C_s[e].astype(jnp.float32)
                        v = rolledv - Cold
                    elif carry_mode in ("scratch", "scratch_abs"):
                        v = vrow_s[si]
                    else:
                        v = slabs[si]
                    if not track and carry_mode in ("ssa_abs",
                                                    "scratch_abs"):
                        mag = jnp.where(absl[si] == min1, mag2, mag1)
                    else:
                        mag = jnp.where(jnp.abs(v) == min1, mag2, mag1)
                    if bitxor:
                        # sign(Cnew) = sign-product XOR sign(v), applied by
                        # OR-ing the flip bit onto the non-negative mag
                        flip = (
                            sgnbit ^ jax.lax.bitcast_convert_type(
                                v, jnp.int32
                            )
                        ) & _SGN_MASK
                        Cnew = jax.lax.bitcast_convert_type(
                            jax.lax.bitcast_convert_type(mag, jnp.int32)
                            | flip,
                            jnp.float32,
                        )
                    else:
                        sv = jnp.where(v < 0, -1.0, 1.0)
                        Cnew = (sgn_prod * sv) * mag
                    if track:
                        Cnew = jnp.where(keep, Cold, Cnew)
                    Cb = Cnew.astype(C_s.dtype)
                    if track:
                        # freeze path: quantize through storage dtype BEFORE
                        # the posterior update so total and C stay consistent
                        # (frozen lanes must restore bit-exactly)
                        Cq = Cb.astype(jnp.float32)
                        neww = jnp.where(keep, rolledv, v + Cq)
                        flipacc = flipacc | (
                            (jax.lax.bitcast_convert_type(neww, jnp.int32)
                             ^ jax.lax.bitcast_convert_type(
                                 rolledv, jnp.int32))
                            & _SGN_MASK
                        )
                        total_s[col] = neww
                    else:
                        # fixed-iteration path: posterior accumulates the
                        # UNQUANTIZED message (messages quantize through
                        # storage, posteriors stay f32 — the standard
                        # fixed-point-decoder precision split; identical to
                        # the quantized form when msg_dtype is f32)
                        total_s[col] = v + Cnew
                    C_s[e] = Cb
                if track:
                    return fail, flipacc
                return fail
            if static_tables is not None:
                for li in range(nrows):
                    if track:
                        fail, flipacc0 = layer(li, (fail, flipacc0))
                    else:
                        fail = layer(li, fail)
            elif track:
                fail, flipacc0 = jax.lax.fori_loop(
                    0, nrows, layer, (fail, flipacc0)
                )
            else:
                fail = jax.lax.fori_loop(0, nrows, layer, fail)
        if track:
            fail = jnp.maximum(fail, (flipacc0 != 0).astype(jnp.float32))
        return replica_max(fail)

    def sweep_classic(frozen, track, t=0):
        """One layered iteration, 2-roll delta-add form (fallback for
        graphs with intra-layer duplicate columns: posterior updates for
        duplicates must ACCUMULATE)."""
        a_s = alpha if ab_ref is None else ab_ref[0, t]
        b_s = beta if ab_ref is None else ab_ref[1, t]
        keep = (frozen > 0.5) if track else None
        fail = jnp.zeros((Z, Bt), jnp.float32)
        flipacc0 = jnp.zeros((Z, Bt), jnp.int32)  # see sweep_delta
        for deg, nrows, off in groups:
            def layer(li, carry, deg=deg, off=off):
                if track:
                    fail, flipacc = carry
                else:
                    fail = carry
                base = off + li * deg
                inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
                zero = jnp.zeros((Z, Bt), jnp.float32)
                min1, min2, negcnt, hardcnt = inf, inf, zero, zero
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    rolled = pltpu.roll(total_s[be_col_ref[e]],
                                        be_shiftb_ref[e], 0)
                    slab = rolled - C_s[e].astype(jnp.float32)
                    vrow_s[si] = slab
                    a = jnp.abs(slab)
                    min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                    min1 = jnp.minimum(min1, a)
                    negcnt = negcnt + (slab < 0).astype(jnp.float32)
                    if track:
                        hardcnt = hardcnt + (rolled < 0).astype(jnp.float32)
                if track:
                    hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                    fail = jnp.maximum(fail, hpar)
                par = negcnt - 2.0 * jnp.floor(negcnt * 0.5)
                sgn_prod = 1.0 - 2.0 * par
                mag1 = jnp.maximum(a_s * jnp.minimum(min1, _MAG_CAP) - b_s, 0.0)
                mag2 = jnp.maximum(a_s * jnp.minimum(min2, _MAG_CAP) - b_s, 0.0)

                for si in range(deg):
                    e = ge_be_ref[base + si]
                    col = be_col_ref[e]
                    v = vrow_s[si]
                    sv = jnp.where(v < 0, -1.0, 1.0)
                    mag = jnp.where(jnp.abs(v) == min1, mag2, mag1)
                    Cold = C_s[e].astype(jnp.float32)
                    Cnew = (sgn_prod * sv) * mag
                    if track:
                        Cnew = jnp.where(keep, Cold, Cnew)
                    Cb = Cnew.astype(C_s.dtype)
                    Cq = Cb.astype(jnp.float32)
                    old = total_s[col]
                    neww = old + pltpu.roll(Cq - Cold, be_shift_ref[e], 0)
                    if track:
                        flipacc = flipacc | (
                            (jax.lax.bitcast_convert_type(neww, jnp.int32)
                             ^ jax.lax.bitcast_convert_type(old, jnp.int32))
                            & _SGN_MASK
                        )
                    total_s[col] = neww
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
            fail = jnp.maximum(fail, (flipacc0 != 0).astype(jnp.float32))
        return replica_max(fail)

    _SPA_TANH_CLIP = 1.0 - 1e-7

    def _boxplus(x, y):
        # twin of decode/xla/flooding_qc._boxplus (same jnp expression, so
        # interpret mode is bit-exact with the oracle)
        mag = jnp.minimum(jnp.abs(x), jnp.abs(y))
        sgn = jnp.where((x < 0) ^ (y < 0), -1.0, 1.0)
        corr = jnp.log1p(jnp.exp(-jnp.abs(x + y))) - jnp.log1p(
            jnp.exp(-jnp.abs(x - y))
        )
        return sgn * mag + corr

    def sweep_exact(frozen, track, t=0):
        """One layered iteration with an EXACT-BP check-node rule
        (kind='spa': tanh rule via a running log|tanh| accumulator;
        kind='minstar': box-plus via forward prefixes in vrow + a running
        backward suffix, with the extrinsic slab RECOMPUTED in pass 2 by
        re-rolling the still-unwritten posterior — so neither kind needs
        any memory beyond the minsum sweep's). Alignment-carrying delta
        form; dup-free graphs only (wrapper guards). Oracle twins:
        decode/xla/layered.py cn='spa'/'minstar' (same op order)."""
        keep = (frozen > 0.5) if track else None
        fail = jnp.zeros((Z, Bt), jnp.float32)
        flipacc0 = jnp.zeros((Z, Bt), jnp.int32)  # see sweep_delta
        for deg, nrows, off in groups:
            def layer(li, carry, deg=deg, off=off):
                if track:
                    fail, flipacc = carry
                else:
                    fail = carry
                base = off + li * deg
                zero = jnp.zeros((Z, Bt), jnp.float32)
                hardcnt = zero
                ltacc = zero          # spa
                fwd = None            # minstar
                sgnacc = jnp.zeros((Z, Bt), jnp.int32)
                # pass 1: roll posteriors into this layer's alignment and
                # accumulate the CN statistic (log|tanh| sum, or box-plus
                # forward prefixes stored in vrow)
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    rolled = pltpu.roll(total_s[be_col_ref[e]],
                                        ge_delta_ref[base + si], 0)
                    if track:
                        hardcnt = hardcnt + (rolled < 0).astype(jnp.float32)
                    slab = rolled - C_s[e].astype(jnp.float32)
                    if kind == "spa":
                        if track:
                            vrow_s[si] = rolled
                        else:
                            vrow_s[si] = slab
                        a = jnp.abs(slab)
                        lt = jnp.log(jnp.tanh(
                            jnp.clip(a, 1e-10, 40.0) * 0.5
                        ))
                        ltacc = ltacc + lt
                        sgnacc = sgnacc ^ jax.lax.bitcast_convert_type(
                            slab, jnp.int32
                        )
                    else:  # minstar: sign rides inside box-plus
                        fwd = slab if si == 0 else _boxplus(fwd, slab)
                        vrow_s[si] = fwd
                if track:
                    hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                    fail = jnp.maximum(fail, hpar)

                # pass 2: emit messages, posterior back in this layer's
                # alignment. minstar iterates BACKWARD for the running
                # suffix; reads of total/C at step si precede their writes.
                order = range(deg) if kind == "spa" else range(deg - 1, -1, -1)
                bwd = None
                for si in order:
                    e = ge_be_ref[base + si]
                    col = be_col_ref[e]
                    Cold = C_s[e].astype(jnp.float32)
                    if kind == "spa":
                        if track:
                            rolledv = vrow_s[si]
                            v = rolledv - Cold
                        else:
                            v = vrow_s[si]
                        a = jnp.abs(v)
                        lt = jnp.log(jnp.tanh(
                            jnp.clip(a, 1e-10, 40.0) * 0.5
                        ))
                        tt = jnp.minimum(jnp.exp(ltacc - lt), _SPA_TANH_CLIP)
                        mag = jnp.log1p(tt) - jnp.log1p(-tt)
                        # sign product XOR'd onto the non-negative mag
                        flip = (
                            sgnacc ^ jax.lax.bitcast_convert_type(
                                v, jnp.int32
                            )
                        ) & _SGN_MASK
                        Cnew = jax.lax.bitcast_convert_type(
                            jax.lax.bitcast_convert_type(mag, jnp.int32)
                            | flip,
                            jnp.float32,
                        )
                    else:  # minstar
                        rolledv = pltpu.roll(total_s[col],
                                             ge_delta_ref[base + si], 0)
                        v = rolledv - Cold
                        if deg == 1:
                            out = jnp.full((Z, Bt), 1e9, jnp.float32)
                        elif si == deg - 1:
                            out = vrow_s[deg - 2]
                        elif si == 0:
                            out = bwd
                        else:
                            out = _boxplus(vrow_s[si - 1], bwd)
                        Cnew = jnp.clip(out, -_MAG_CAP, _MAG_CAP)
                        bwd = v if si == deg - 1 else _boxplus(bwd, v)
                    if track:
                        Cnew = jnp.where(keep, Cold, Cnew)
                    Cb = Cnew.astype(C_s.dtype)
                    if track:
                        Cq = Cb.astype(jnp.float32)
                        neww = jnp.where(keep, rolledv, v + Cq)
                        flipacc = flipacc | (
                            (jax.lax.bitcast_convert_type(neww, jnp.int32)
                             ^ jax.lax.bitcast_convert_type(
                                 rolledv, jnp.int32))
                            & _SGN_MASK
                        )
                        total_s[col] = neww
                    else:
                        total_s[col] = v + Cnew
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
            fail = jnp.maximum(fail, (flipacc0 != 0).astype(jnp.float32))
        return replica_max(fail)

    def sweep_exact_classic(frozen, track, t=0):
        """Exact-BP layered sweep in the 2-roll delta-add form — the
        fallback for graphs with INTRA-LAYER DUPLICATE block-columns
        (multi-edge protographs, e.g. CCSDS AR4JA): posterior updates for
        duplicate columns must ACCUMULATE, so the alignment-carrying
        storage of sweep_exact cannot apply. kind='spa' stores extrinsic
        slabs in vrow and recomputes log|tanh| per edge in pass 2;
        kind='minstar' stores slabs in vrow[0:dcb] AND box-plus forward
        prefixes in vrow[dcb:2*dcb] (the wrapper doubles the scratch).
        Sign semantics are 'count' ((x < 0), matching the oracle's forced
        degradation on dup graphs). Oracle twin: decode/xla/layered.py
        cn='spa'/'minstar' on dup graphs (bit-exact in f32; the oracle
        reverses its posterior-update order for minstar to match this
        sweep's backward pass 2)."""
        keep = (frozen > 0.5) if track else None
        fail = jnp.zeros((Z, Bt), jnp.float32)
        flipacc0 = jnp.zeros((Z, Bt), jnp.int32)  # see sweep_delta
        # wrapper allocates 2*dcb rows for minstar (slabs + fwd prefixes)
        dcb = vrow_s.shape[0] // 2 if kind == "minstar" else vrow_s.shape[0]
        for deg, nrows, off in groups:
            def layer(li, carry, deg=deg, off=off):
                if track:
                    fail, flipacc = carry
                else:
                    fail = carry
                base = off + li * deg
                zero = jnp.zeros((Z, Bt), jnp.float32)
                hardcnt = zero
                ltacc = zero          # spa
                negcnt = zero         # spa (count sign semantics)
                fwd = None            # minstar
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    rolled = pltpu.roll(total_s[be_col_ref[e]],
                                        be_shiftb_ref[e], 0)
                    if track:
                        hardcnt = hardcnt + (rolled < 0).astype(jnp.float32)
                    slab = rolled - C_s[e].astype(jnp.float32)
                    vrow_s[si] = slab
                    if kind == "spa":
                        a = jnp.abs(slab)
                        lt = jnp.log(jnp.tanh(
                            jnp.clip(a, 1e-10, 40.0) * 0.5
                        ))
                        ltacc = ltacc + lt
                        negcnt = negcnt + (slab < 0).astype(jnp.float32)
                    else:  # minstar: sign rides inside box-plus
                        fwd = slab if si == 0 else _boxplus(fwd, slab)
                        vrow_s[dcb + si] = fwd
                if track:
                    hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                    fail = jnp.maximum(fail, hpar)
                if kind == "spa":
                    par = negcnt - 2.0 * jnp.floor(negcnt * 0.5)
                    sgn_prod = 1.0 - 2.0 * par

                # pass 2: backward for minstar's running suffix; posterior
                # deltas ACCUMULATE (dup columns add both edges' updates)
                order = range(deg) if kind == "spa" else range(deg - 1, -1, -1)
                bwd = None
                for si in order:
                    e = ge_be_ref[base + si]
                    col = be_col_ref[e]
                    Cold = C_s[e].astype(jnp.float32)
                    v = vrow_s[si]
                    if kind == "spa":
                        a = jnp.abs(v)
                        lt = jnp.log(jnp.tanh(
                            jnp.clip(a, 1e-10, 40.0) * 0.5
                        ))
                        tt = jnp.minimum(jnp.exp(ltacc - lt), _SPA_TANH_CLIP)
                        mag = jnp.log1p(tt) - jnp.log1p(-tt)
                        sv = jnp.where(v < 0, -1.0, 1.0)
                        Cnew = (sgn_prod * sv) * mag
                    else:  # minstar
                        if deg == 1:
                            out = jnp.full((Z, Bt), 1e9, jnp.float32)
                        elif si == deg - 1:
                            out = vrow_s[dcb + deg - 2]
                        elif si == 0:
                            out = bwd
                        else:
                            out = _boxplus(vrow_s[dcb + si - 1], bwd)
                        Cnew = jnp.clip(out, -_MAG_CAP, _MAG_CAP)
                        bwd = v if si == deg - 1 else _boxplus(bwd, v)
                    if track:
                        Cnew = jnp.where(keep, Cold, Cnew)
                    Cb = Cnew.astype(C_s.dtype)
                    Cq = Cb.astype(jnp.float32)
                    old = total_s[col]
                    neww = old + pltpu.roll(Cq - Cold, be_shift_ref[e], 0)
                    if track:
                        flipacc = flipacc | (
                            (jax.lax.bitcast_convert_type(neww, jnp.int32)
                             ^ jax.lax.bitcast_convert_type(old, jnp.int32))
                            & _SGN_MASK
                        )
                    total_s[col] = neww
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
            fail = jnp.maximum(fail, (flipacc0 != 0).astype(jnp.float32))
        return replica_max(fail)

    if kind == "minsum":
        sweep = sweep_delta if dup_free else sweep_classic
    else:
        sweep = sweep_exact if dup_free else sweep_exact_classic

    if early_term:
        done0 = 1.0 - syndrome_fail()
        if dup_free:
            rotate(col_pre_ref, None if static_tables is None
                   else static_tables[3])
        iters0 = jnp.zeros((Z, Bt), jnp.float32)

        def body(carry):
            done, iters, it = carry
            fail = sweep(done, True, it)
            iters = iters + (1.0 - done)
            done = jnp.maximum(done, 1.0 - fail)
            return done, iters, it + 1

        def cond(carry):
            done, _, it = carry
            return (it < max_iters) & (jnp.min(done) < 0.5)

        _, iters, _ = jax.lax.while_loop(
            cond, body, (done0, iters0, jnp.zeros((), jnp.int32))
        )
    else:
        # pure fixed-iteration benchmark mode
        if dup_free:
            rotate(col_pre_ref, None if static_tables is None
                   else static_tables[3])
        # iter_unroll: U sweeps per fori body (Mosaic can software-
        # pipeline across the sweep boundary). Per-iteration schedules
        # (ab_ref) need the true t, so they keep U=1 (wrapper guards).
        U = max(1, iter_unroll) if ab_ref is None else 1
        nfull, tail = divmod(max_iters, U)

        def bodyU(t, c):
            for _ in range(U):
                sweep(None, False, t)
            return c

        jax.lax.fori_loop(0, nfull, bodyU, 0)
        for _ in range(tail):
            sweep(None, False, 0)
        iters = jnp.full((Z, Bt), float(max_iters), jnp.float32)

    if dup_free:
        rotate(col_post_ref, None if static_tables is None
               else static_tables[4])
    bits_ref[:] = (total_s[:] < 0).astype(bits_ref.dtype)
    # truthful ok: one final posterior syndrome over the emitted bits.
    # Sublane z*R + r at z = 0 holds replica r, so the first R (<= Rp)
    # sublanes carry the per-replica values; the wrapper slices them.
    ok_ref[:] = (1.0 - syndrome_fail())[0:Rp]
    iters_ref[:] = iters[0:Rp]


def make_layered_pallas_decoder(
    graph: QCGraph,
    *,
    alpha=1.0,   # scalar or per-iteration [max_iters] array (NOMS)
    beta=0.0,    # scalar or per-iteration [max_iters] array
    max_iters: int = 25,
    early_term: bool = True,
    jit: bool = True,
    batch_tile: int = 128,
    interpret: Optional[bool] = None,
    msg_dtype=jnp.float32,
    llr_dtype=jnp.float32,
    sign_mode: str = "bitxor",
    pack: int | str = "auto",
    kind: str = "minsum",
    carry: str = "scratch",
    rows: str = "auto",
    iter_unroll: int = 1,
):
    """decode(llr [B, n]) -> DecodeResult via the fused layered kernel.

    kind: 'minsum' (alpha/beta-normalized, the benchmark path), or the
    exact-BP rules 'spa' / 'minstar' — the oracle-grade algorithms in the
    fused-VMEM native tier (VERDICT r1 item 5), same memory footprint as
    minsum (spa uses a running log|tanh| accumulator; minstar keeps
    box-plus forward prefixes in the vrow scratch and re-rolls the
    posterior in pass 2). Exact kinds need a dup-free graph and scalar
    alpha/beta (which they ignore).

    sign_mode: 'count' tallies negative slabs per check (compare+add per
    edge, sign conventions of (x < 0)); 'bitxor' accumulates the CN sign
    product as an XOR of f32 bit patterns and ORs the flip bit onto the
    magnitude — fewer VPU ops per edge-visit, signbit semantics (-0.0
    counts as negative; the oracle's sign_mode='bitxor' matches
    bit-exactly). 'bitxor' applies only on the dup-free delta path and
    silently degrades to 'count' on graphs with intra-layer duplicates.

    rows: 'static' unrolls the minsum row sweeps at trace time (edge ids
    and shifts become compile-time constants; zero-delta rolls elide;
    Mosaic schedules across row boundaries) — measured +17% on the
    DVB-S2 flagship, bit-identical on real TPU, but UNSAFE under jitted
    interpret mode (XLA:CPU mis-executes the trace; see the auto-mode
    comment). 'fori' is the SMEM-streamed loop form, correct everywhere.
    'auto' (default) picks static exactly when targeting real TPU.

    msg_dtype: storage dtype of the C message array — the dominant VMEM
    consumer. bf16 halves it (required to fit DVB-S2 at Bt=128) at the cost
    of message quantization; f32 is bit-exact with the XLA oracle. llr_dtype
    likewise for the input posteriors. The kernel computes in f32 either
    way and quantizes through the storage dtype so total/C stay consistent.
    """
    Z, nb, dcb = graph.Z, graph.nb, graph.dcb_max
    BE = graph.num_block_edges
    # Replica packing: the dynamic-shift roll needs a sublane dim that is a
    # multiple of 8. For Z % 8 != 0 (e.g. 802.11n Z in {27, 54, 81}) pack
    # R = 8/gcd(Z, 8) independent codewords interleaved along sublanes
    # (index z*R + r, padded dim Zp = Z*R): a global roll by R*s on that
    # layout IS a per-replica circulant roll by s, because the mod-Zp
    # wraparound lands back in the same replica. The identity holds for ANY
    # R that is a multiple of 8/gcd(Z, 8), so callers may OVER-pack
    # (pack=R beyond the minimum) to trade batch-dim chunks for bigger
    # [Zp, Bt] slabs. Measured on real TPU (experiments/pack_sweep.py,
    # 2026-08-17): over-packing is throughput-neutral at best (Z=24/27/54
    # within run noise, ~5%) and NEGATIVE for Z>=96 (wimax/2304 Z=96:
    # R=2 is -11% vs R=1), so 'auto' always picks the minimum R.
    r_min = 8 // int(np.gcd(Z, 8))
    msg_bytes = jnp.dtype(msg_dtype).itemsize
    llr_bytes = jnp.dtype(llr_dtype).itemsize
    lanes = max(batch_tile, 128)
    if pack == "auto":
        R = r_min
    else:
        R = int(pack)
        if R <= 0 or R % r_min:
            raise ValueError(
                f"pack={R} must be a positive multiple of "
                f"8/gcd(Z,8)={r_min}"
            )
    Rp = _round_up(R, 8)  # ok/iters output rows (sublane-padded)
    Zp = Z * R
    CW = batch_tile * R  # codewords per kernel call

    groups, ge_be_np, ge_delta_np, col_pre_np, col_post_np, dup_free = (
        sweep_layout(graph)
    )
    if kind not in ("minsum", "spa", "minstar"):
        raise KeyError(f"layered kernel kind must be minsum/spa/minstar, "
                       f"got {kind!r}")
    # exact kinds on dup graphs take sweep_exact_classic; minstar there
    # stores box-plus forward prefixes alongside the slabs (2*dcb rows)
    vrow_rows = 2 * dcb if (kind == "minstar" and not dup_free) else dcb
    ge_be = jnp.asarray(ge_be_np)
    # all shift tables scale by R for the packed layout
    ge_delta = jnp.asarray(ge_delta_np * R)
    col_pre = jnp.asarray(col_pre_np * R)
    col_post = jnp.asarray(col_post_np * R)
    be_col = jnp.asarray(graph.be_col)
    be_shift = jnp.asarray(np.asarray(graph.be_shift) * R)
    be_shiftb = jnp.asarray(((Z - np.asarray(graph.be_shift)) % Z) * R)

    # the offset-free fast path (mag = alpha*min, no cap) needs every
    # row degree >= 2 so min2 is finite; degree-1 rows (degenerate but
    # constructible) take the capped branch like the XLA oracle does
    min_deg = min((deg for deg, _, _ in groups), default=0)
    per_iter = not (np.isscalar(alpha) and np.isscalar(beta))
    if kind != "minsum" and per_iter:
        raise ValueError(
            f"per-iteration alpha/beta schedules apply to minsum only "
            f"(kind={kind!r} is exact BP — nothing to normalize)"
        )
    if per_iter:
        ab = jnp.stack([
            jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), (max_iters,)),
            jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (max_iters,)),
        ])
        alpha, beta = 0.0, 0.0  # unused; a_s/b_s come from the SMEM schedule
    if rows not in ("auto", "fori", "static"):
        raise ValueError(f"rows must be auto/fori/static, got {rows!r}")
    if rows == "auto":
        # static row unrolling is a measured +17% on real TPU
        # (experiments/r2_opt.py, dvbs2/64800/12 fixed-25: 807 vs 688
        # Mbit/s/chip) and bit-identical there (Mosaic sequences the
        # unrolled ref ops correctly). It is NOT safe under jitted
        # INTERPRET mode: XLA:CPU mis-executes the identical jaxpr
        # (jit != eager on the same trace — diverges from iteration 2;
        # verified 2026-08-19, fori/eager/TPU all bit-identical), so
        # auto picks static only when the decode will run on real TPU.
        # early_term (track-mode) sweeps carry the rolled-posterior
        # restore scratch per slot; unrolling them inflates Mosaic's
        # register-spill stack past the 120 MB VMEM cap at DVB-S2 scale
        # (measured 2026-08-19: +5 MB over budget), so auto keeps the
        # fori form there — early-terminating decodes are iteration-
        # bound, not sweep-op-bound, and lose little.
        use_static = (
            kind == "minsum" and dup_free and not early_term
            and (interpret is False
                 or (interpret is None and jax.default_backend() == "tpu"))
        )
        rows = "static" if use_static else "fori"
    if rows == "static" and not (kind == "minsum" and dup_free):
        raise NotImplementedError(
            "rows='static' (trace-time row unrolling) applies to the "
            "minsum delta sweep only (dup-free graphs)"
        )
    static_tables = None
    if rows == "static":
        static_tables = (
            ge_be_np, np.asarray(graph.be_col_np, np.int64),
            ge_delta_np * R, col_pre_np * R, col_post_np * R,
        )
    kern_kw = dict(
        groups=groups, nb=nb, Z=Zp, Bt=batch_tile, R=R, Rp=Rp,
        alpha=alpha, beta=beta, max_iters=max_iters, early_term=early_term,
        dup_free=dup_free, sign_mode=sign_mode, fast_mag=min_deg >= 2,
        kind=kind, carry_mode=carry, static_tables=static_tables,
        iter_unroll=1 if per_iter else iter_unroll,
    )
    if per_iter:
        def kern(ge, bc, bs, bsb, gd, cp, cpo, ab_r, *rest):
            return _kernel(ge, bc, bs, bsb, gd, cp, cpo, *rest,
                           ab_ref=ab_r, **kern_kw)
    else:
        kern = functools.partial(_kernel, **kern_kw)
    per_sublane = lanes * (msg_bytes * BE + 4 * nb + 4 * vrow_rows
                           + llr_bytes * nb + nb)
    state_bytes = Zp * per_sublane
    vmem_limit = min(state_bytes + (1 << 23), 120 * 1024 * 1024)

    def decode_impl(llr, ge_be, be_col, be_shift, be_shiftb, ge_delta,
                    col_pre, col_post):
        # exactly one batch tile per call; decode() chunks larger batches
        B = llr.shape[0]
        llr2 = jnp.zeros((nb, Z, CW), llr_dtype)
        llr2 = llr2.at[:, :, :B].set(
            llr.T.astype(llr_dtype).reshape(nb, Z, B)
        )
        # codeword c = r*batch_tile + b lands on sublane z*R + r, lane b
        llr3 = llr2.reshape(nb, Z, R, batch_tile).reshape(
            nb, Zp, batch_tile
        )
        itp = interpret
        if itp is None:
            itp = jax.default_backend() != "tpu"
        # One batch tile per pallas_call, chunked by the wrapper: with a >1
        # grid, pallas double-buffers the llr/bits windows (+48 MB at
        # DVB-S2 scale), blowing the VMEM cap. Sequential chunks have
        # identical throughput (the grid was sequential anyway).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8 if per_iter else 7,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((nb, Zp, batch_tile), lambda b, *_: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((nb, Zp, batch_tile), lambda b, *_: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Rp, batch_tile), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Rp, batch_tile), lambda b, *_: (0, b),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((nb, Zp, batch_tile), jnp.float32),
                pltpu.VMEM((BE, Zp, batch_tile), msg_dtype),
                pltpu.VMEM((vrow_rows, Zp, batch_tile), jnp.float32),
            ],
        )
        def one_chunk(llr_chunk):
            return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb, Zp, batch_tile), jnp.int8),
                jax.ShapeDtypeStruct((Rp, batch_tile), jnp.float32),
                jax.ShapeDtypeStruct((Rp, batch_tile), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit),
            ),
            interpret=itp,
        )(ge_be, be_col, be_shift, be_shiftb, ge_delta, col_pre, col_post,
          *((ab,) if per_iter else ()), llr_chunk)

        bits, ok8, iters8 = one_chunk(llr3)
        # unpack: sublane z*R + r of lane b is bit blk*Z + z of codeword
        # c = r*batch_tile + b; ok/iters live on sublanes 0..R-1 (z = 0)
        bits_cw = (
            bits.reshape(nb, Z, R, batch_tile)
            .transpose(2, 3, 0, 1)
            .reshape(CW, nb * Z)
        )
        ok = ok8[:R].reshape(CW)
        iters = iters8[:R].reshape(CW)
        return DecodeResult(
            bits=(bits_cw[:B] > 0).astype(jnp.uint8),
            ok=ok[:B] > 0.5,
            iterations=iters[:B].astype(jnp.int32),
        )

    impl = jax.jit(decode_impl) if jit else decode_impl

    def decode(llr):
        B = llr.shape[0]
        if B <= CW:
            return impl(llr, ge_be, be_col, be_shift, be_shiftb, ge_delta,
                        col_pre, col_post)
        # chunk large batches into one-tile kernel calls (a >1 pallas grid
        # double-buffers the big IO windows and busts the VMEM cap)
        outs = [
            impl(llr[i : i + CW], ge_be, be_col, be_shift, be_shiftb,
                 ge_delta, col_pre, col_post)
            for i in range(0, B, CW)
        ]
        return DecodeResult(
            bits=jnp.concatenate([o.bits for o in outs]),
            ok=jnp.concatenate([o.ok for o in outs]),
            iterations=jnp.concatenate([o.iterations for o in outs]),
        )

    return decode
