"""Fused flooding QC decoder: whole flooding min-sum decode in one kernel.

The flooding-schedule sibling of layered_qc.py — the exact algorithm of the
reference's flooding min-sum tier (SURVEY.md §2.1 R6/R8) in QC roll form.
Within an iteration every check row reads the SAME stale posteriors, so
rows have no serializing dependency (unlike layered) and Mosaic can
pipeline rolls/compute across rows; posteriors are rebuilt into a separate
accumulator and swapped at iteration end.

State: total (stale posteriors), acc (f32 accumulator), C (check-aligned
messages). No vrow scratch: pass 2 recomputes the extrinsic slab from the
stale totals (free of hazards because totals are read-only all iteration).

Oracle twin: decode/xla/flooding_qc.py (identical op order; bit-exact in
f32). Oracle-of-the-oracle: the gather-form flooding decoder agrees
statistically (summation order differs).
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supports(
    graph: QCGraph, batch_tile: int = 128, msg_bytes: int = 2,
    total_bytes: int = 2, acc_bytes: int = 2, llr_bytes: int | None = None,
    kind: str = "minsum",
) -> bool:
    if llr_bytes is None:
        llr_bytes = msg_bytes  # dispatch sets llr_dtype = msg_dtype
    if graph.perm != "roll":
        return False  # pltpu.roll addressing; xor-perm codes use XLA tier
    lanes = max(batch_tile, 128)
    if graph.Z * (8 // int(np.gcd(graph.Z, 8))) > 1024:
        # same measured platform limit as layered_qc.supports: Pallas
        # kernels with padded sublane dim >= 2048 crash the remote TPU
        # compile helper; the XLA roll tier serves big-Z codes instead
        return False
    state = graph.Z * lanes * (
        msg_bytes * graph.num_block_edges   # C
        + total_bytes * graph.nb            # total (stale posteriors)
        + acc_bytes * graph.nb              # acc
        + llr_bytes * graph.nb              # llr in (llr_dtype)
        + 1 * graph.nb                      # bits out (int8)
        + (4 * graph.dcb_max if kind == "minstar" else 0)  # fwd scratch
    )
    # 84 MB cap: unlike the layered kernel, this kernel's recompute-heavy
    # sweep makes Mosaic allocate tens of MB of register spill slots on
    # top of the declared scratch (measured: a 111 MB-state config needed
    # 128.06 MB and failed to compile), so big codes must leave room.
    # n=64800 flooding falls back to the XLA roll tier — layered is the
    # production kernel there anyway (and measured faster AND better-BER
    # than flooding, docs/DESIGN.md §3).
    return graph.Z % 8 == 0 and state <= 84 * 1024 * 1024


_SPA_TANH_CLIP = 1.0 - 1e-7


def _boxplus(x, y):
    # twin of decode/xla/flooding_qc._boxplus
    mag = jnp.minimum(jnp.abs(x), jnp.abs(y))
    sgn = jnp.where((x < 0) ^ (y < 0), -1.0, 1.0)
    corr = jnp.log1p(jnp.exp(-jnp.abs(x + y))) - jnp.log1p(
        jnp.exp(-jnp.abs(x - y))
    )
    return sgn * mag + corr


def _kernel(
    ge_be_ref, be_col_ref, be_shift_ref, be_shiftb_ref,
    llr_ref, bits_ref, ok_ref, iters_ref,
    total_s, acc_s, C_s, *extra_s,
    groups: tuple, nb: int, Z: int, Bt: int,
    alpha: float, beta: float, max_iters: int, early_term: bool,
    kind: str = "minsum",
):
    fwd_s = extra_s[0] if kind == "minstar" else None
    total_s[:] = llr_ref[:].astype(total_s.dtype)
    C_s[:] = jnp.zeros_like(C_s)

    def syndrome_fail():
        fail = jnp.zeros((1, Bt), jnp.float32)
        for deg, nrows, off in groups:
            def layer(li, fail, deg=deg, off=off):
                acc = jnp.zeros((Z, Bt), jnp.float32)
                for si in range(deg):
                    e = ge_be_ref[off + li * deg + si]
                    hard = (
                        total_s[be_col_ref[e]].astype(jnp.float32) < 0
                    ).astype(jnp.float32)
                    acc = acc + pltpu.roll(hard, be_shiftb_ref[e], 0)
                par = acc - 2.0 * jnp.floor(acc * 0.5)
                return jnp.maximum(fail, jnp.max(par, axis=0, keepdims=True))
            fail = jax.lax.fori_loop(0, nrows, layer, fail)
        return fail

    def sweep(frozen, track):
        """One flooding iteration: CN from stale totals into acc; swap.
        Returns on-the-fly fail (parity of the stale posteriors)."""
        acc_s[:] = llr_ref[:].astype(acc_s.dtype)
        keep = (frozen > 0.5) if track else None
        fail = jnp.zeros((1, Bt), jnp.float32)
        for deg, nrows, off in groups:
            def layer(li, fail, deg=deg, off=off):
                base = off + li * deg
                inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
                zero = jnp.zeros((Z, Bt), jnp.float32)
                min1, min2, negcnt, hardcnt = inf, inf, zero, zero
                ltacc = zero   # spa: running log|tanh| sum
                fwd = None     # minstar: box-plus forward prefix
                for si in range(deg):
                    e = ge_be_ref[base + si]
                    rolled = pltpu.roll(
                        total_s[be_col_ref[e]].astype(jnp.float32),
                        be_shiftb_ref[e], 0,
                    )
                    slab = rolled - C_s[e].astype(jnp.float32)
                    if kind == "minsum":
                        a = jnp.abs(slab)
                        min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                        min1 = jnp.minimum(min1, a)
                        negcnt = negcnt + (slab < 0).astype(jnp.float32)
                    elif kind == "spa":
                        a = jnp.abs(slab)
                        ltacc = ltacc + jnp.log(jnp.tanh(
                            jnp.clip(a, 1e-10, 40.0) * 0.5
                        ))
                        negcnt = negcnt + (slab < 0).astype(jnp.float32)
                    else:  # minstar: sign rides inside box-plus
                        fwd = slab if si == 0 else _boxplus(fwd, slab)
                        fwd_s[si] = fwd
                    if track:
                        hardcnt = hardcnt + (rolled < 0).astype(jnp.float32)
                if track:
                    hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                    fail = jnp.maximum(fail, jnp.max(hpar, axis=0, keepdims=True))
                if kind != "minstar":
                    par = negcnt - 2.0 * jnp.floor(negcnt * 0.5)
                    sgn_prod = 1.0 - 2.0 * par
                if kind == "minsum":
                    mag1 = jnp.maximum(alpha * jnp.minimum(min1, _MAG_CAP) - beta, 0.0)
                    mag2 = jnp.maximum(alpha * jnp.minimum(min2, _MAG_CAP) - beta, 0.0)

                # pass 2: minstar iterates BACKWARD for the running suffix
                order = (
                    range(deg - 1, -1, -1) if kind == "minstar"
                    else range(deg)
                )
                bwd = None
                for si in order:
                    e = ge_be_ref[base + si]
                    col = be_col_ref[e]
                    # recompute the extrinsic slab from the STALE totals
                    # (hazard-free: totals are read-only all iteration)
                    Cold = C_s[e].astype(jnp.float32)
                    v = pltpu.roll(
                        total_s[col].astype(jnp.float32), be_shiftb_ref[e], 0
                    ) - Cold
                    if kind == "minsum":
                        sv = jnp.where(v < 0, -1.0, 1.0)
                        mag = jnp.where(jnp.abs(v) == min1, mag2, mag1)
                        Cnew = (sgn_prod * sv) * mag
                    elif kind == "spa":
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
                            out = fwd_s[deg - 2]
                        elif si == 0:
                            out = bwd
                        else:
                            out = _boxplus(fwd_s[si - 1], bwd)
                        Cnew = jnp.clip(out, -_MAG_CAP, _MAG_CAP)
                        bwd = v if si == deg - 1 else _boxplus(bwd, v)
                    if track:
                        Cnew = jnp.where(keep, Cold, Cnew)
                    Cq = Cnew.astype(C_s.dtype).astype(jnp.float32)
                    acc_s[col] = (
                        acc_s[col].astype(jnp.float32)
                        + pltpu.roll(Cq, be_shift_ref[e], 0)
                    ).astype(acc_s.dtype)
                    C_s[e] = Cq.astype(C_s.dtype)
                return fail
            fail = jax.lax.fori_loop(0, nrows, layer, fail)
        # swap: acc becomes the posterior. Frozen lanes keep old totals —
        # and so do lanes whose PRE-sweep state just verified (fail == 0):
        # fail is the stale-posterior parity, so the verified state is the
        # pre-sweep one; advancing it an extra sweep can flip a bit out of
        # the codeword (measured detected-failure floor; twin comment in
        # decode/xla/flooding_qc.py).
        if track:
            keep_end = jnp.logical_or(keep, fail <= 0.5)
            total_s[:] = jnp.where(
                keep_end, total_s[:].astype(jnp.float32),
                acc_s[:].astype(jnp.float32),
            ).astype(total_s.dtype)
        else:
            total_s[:] = acc_s[:].astype(total_s.dtype)
        return fail

    if early_term:
        done0 = 1.0 - syndrome_fail()
        iters0 = jnp.zeros((1, Bt), jnp.float32)

        def body(carry):
            done, iters, it = carry
            fail = sweep(done, True)
            done = jnp.maximum(done, 1.0 - fail)
            # iters counts sweeps applied to the REPORTED state: a frame
            # whose pre-sweep state verified kept that state (no advance)
            iters = iters + (1.0 - done)
            return done, iters, it + 1

        def cond(carry):
            done, _, it = carry
            return (it < max_iters) & (jnp.min(done) < 0.5)

        _, iters, _ = jax.lax.while_loop(
            cond, body, (done0, iters0, jnp.zeros((), jnp.int32))
        )
    else:
        jax.lax.fori_loop(
            0, max_iters, lambda _, c: (sweep(None, False), c)[1], 0
        )
        iters = jnp.full((1, Bt), float(max_iters), jnp.float32)

    bits_ref[:] = (total_s[:].astype(jnp.float32) < 0).astype(bits_ref.dtype)
    # NOTE: bits_ref aliases llr_ref (input_output_aliases) — llr is dead
    # after the last sweep's acc init, so the clobber is safe.
    ok_ref[:] = 1.0 - syndrome_fail()
    iters_ref[:] = iters


def make_flooding_pallas_decoder(
    graph: QCGraph,
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    max_iters: int = 25,
    early_term: bool = True,
    jit: bool = True,
    batch_tile: int = 128,
    interpret: Optional[bool] = None,
    msg_dtype=jnp.float32,
    total_dtype=jnp.float32,
    llr_dtype=jnp.float32,
    acc_dtype=jnp.float32,
    kind: str = "minsum",
):
    """decode(llr [B, n]) -> DecodeResult via the fused flooding QC kernel.

    kind: 'minsum' (alpha/beta), or the exact-BP rules 'spa' / 'minstar'
    (VERDICT r1 item 5 — the oracle-grade algorithms in the native tier;
    spa uses a running log|tanh| accumulator, minstar keeps box-plus
    forward prefixes in a [dcb, Z, Bt] scratch). alpha/beta are ignored
    by the exact kinds. acc_dtype=bf16 quantizes the posterior
    accumulation (needed to fit DVB-S2 at full lanes); f32 is bit-exact
    with the oracle twin for minsum and decision-parity for spa/minstar
    (their oracle twins reduce in a different but mathematically equal
    order)."""
    if graph.Z % 8 != 0:
        raise ValueError(
            f"{graph.name}: pallas flooding-qc kernel needs Z % 8 == 0"
        )
    if kind not in ("minsum", "spa", "minstar"):
        raise KeyError(
            f"flooding kernel kind must be minsum/spa/minstar, got {kind!r}"
        )
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
    be_shift = jnp.asarray(graph.be_shift)
    be_shiftb = jnp.asarray((Z - np.asarray(graph.be_shift)) % Z)

    kern = functools.partial(
        _kernel, groups=groups, nb=nb, Z=Z, Bt=batch_tile,
        alpha=alpha, beta=beta, max_iters=max_iters, early_term=early_term,
        kind=kind,
    )
    lanes = max(batch_tile, 128)
    state_bytes = Z * lanes * (
        jnp.dtype(msg_dtype).itemsize * BE
        + jnp.dtype(total_dtype).itemsize * nb
        + jnp.dtype(acc_dtype).itemsize * nb
        + jnp.dtype(llr_dtype).itemsize * nb  # llr window (aliased w/ bits)
        + (4 * graph.dcb_max if kind == "minstar" else 0)
    )
    vmem_limit = min(state_bytes + (1 << 23), 127 * 1024 * 1024)

    def decode_impl(llr, ge_be, be_col, be_shift, be_shiftb):
        # exactly one batch tile per call; decode() chunks larger batches
        B = llr.shape[0]
        B_pad = batch_tile
        llr3 = jnp.zeros((nb, Z, B_pad), llr_dtype)
        llr3 = llr3.at[:, :, :B].set(
            llr.T.astype(llr_dtype).reshape(nb, Z, B)
        )
        itp = interpret
        if itp is None:
            itp = jax.default_backend() != "tpu"
        # One batch tile per pallas_call, chunked with lax.map: with a >1
        # grid, pallas double-buffers the llr/bits windows (+48 MB at
        # DVB-S2 scale), blowing the VMEM cap. Sequential chunks have
        # identical throughput (the grid was sequential anyway).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(1,),
            in_specs=[
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
                pltpu.VMEM((nb, Z, batch_tile), total_dtype),
                pltpu.VMEM((nb, Z, batch_tile), acc_dtype),
                pltpu.VMEM((BE, Z, batch_tile), msg_dtype),
            ] + (
                [pltpu.VMEM((graph.dcb_max, Z, batch_tile), jnp.float32)]
                if kind == "minstar" else []
            ),
        )
        def one_chunk(llr_chunk):
            return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb, Z, batch_tile), llr_dtype),
                jax.ShapeDtypeStruct((1, batch_tile), jnp.float32),
                jax.ShapeDtypeStruct((1, batch_tile), jnp.float32),
            ),
            # reuse the llr buffer for the bits output (operand 4 after the
            # 4 scalar-prefetch args) — saves a full [nb, Z, Bt] VMEM window
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit),
            ),
            interpret=itp,
        )(ge_be, be_col, be_shift, be_shiftb, llr_chunk)

        bits, ok, iters = one_chunk(llr3)
        return DecodeResult(
            bits=(bits.reshape(nb * Z, B_pad)[:, :B].astype(jnp.float32)
                  > 0).astype(jnp.uint8).T,
            ok=ok[0, :B] > 0.5,
            iterations=iters[0, :B].astype(jnp.int32),
        )

    impl = jax.jit(decode_impl) if jit else decode_impl

    def decode(llr):
        B = llr.shape[0]
        if B <= batch_tile:
            return impl(llr, ge_be, be_col, be_shift, be_shiftb)
        # chunk large batches into one-tile kernel calls (a >1 pallas grid
        # double-buffers the big IO windows and busts the VMEM cap)
        outs = [
            impl(llr[i : i + batch_tile], ge_be, be_col, be_shift, be_shiftb)
            for i in range(0, B, batch_tile)
        ]
        return DecodeResult(
            bits=jnp.concatenate([o.bits for o in outs]),
            ok=jnp.concatenate([o.ok for o in outs]),
            iterations=jnp.concatenate([o.iterations for o in outs]),
        )

    return decode
