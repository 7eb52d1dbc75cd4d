"""Fused layered QC decoder: full layered min-sum in one Pallas kernel
(SURVEY.md §2.2 C18 — the DVB-S2 / long-block performance path).

All decode state lives in VMEM for the whole decode: posteriors
total [nb, Z, Bt] and check-aligned messages C [BE, Z, Bt]. Circulant
addressing is pltpu.roll along the sublane (Z) axis with shifts streamed
from SMEM scalar-prefetch arrays — the layer sweep is a compact
fori/unrolled loop, NOT a per-edge unroll, so compile time is independent
of the graph and one binary serves every (code, Z) with the same
(mb, dcb_max, BE, Z) signature.

Constraints (probed on hardware, see git history): dynamic-shift roll
requires Z % 8 == 0 — true for DVB-S2 (Z=360) and the large 5G NR lifting
sizes; small-Z codes (802.11n Z=27..81) use the fused_mm flooding kernel or
the XLA layered tier instead. supports() encodes the gate.

Numerics are f32 with the exact op ordering of decode/xla/layered.py
(running two-min == is-min/count formulation in exact arithmetic), so
interpret-mode results are bit-identical to the oracle — tests/pallas/.
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


def supports(graph: QCGraph, batch_tile: int = 128, msg_bytes: int = 2) -> bool:
    lanes = max(batch_tile, 128)  # lane dim pads to 128 either way
    state = graph.Z * lanes * (
        msg_bytes * graph.num_block_edges  # C (msg_dtype)
        + 4 * graph.nb                     # total (f32)
        + 2 * graph.nb                     # llr in (bf16)
        + 1 * graph.nb                     # bits out (int8)
        + 4 * graph.dcb_max                # vrow (f32)
    )
    return graph.Z % 8 == 0 and state <= 118 * 1024 * 1024


def _kernel(
    # scalar prefetch (SMEM)
    row_be_ref,    # int32 [mb*dcb]   block-edge id per (layer, slot)
    row_val_ref,   # int32 [mb*dcb]   1 if slot occupied
    be_col_ref,    # int32 [BE]
    be_shift_ref,  # int32 [BE]      forward shift s
    be_shiftb_ref, # int32 [BE]      precomputed (Z - s) % Z
    # VMEM in/out
    llr_ref,       # bf16 [nb, Z, Bt]
    bits_ref,      # int8 [nb, Z, Bt]
    ok_ref,        # f32 [1, Bt]
    iters_ref,     # f32 [1, Bt]
    # scratch
    total_s,       # f32 [nb, Z, Bt]
    C_s,           # msg_dtype [BE, Z, Bt]
    vrow_s,        # f32 [dcb, Z, Bt]
    *, mb: int, nb: int, dcb: int, Z: int, Bt: int,
    alpha: float, beta: float, max_iters: int, early_term: bool,
):
    total_s[:] = llr_ref[:].astype(jnp.float32)
    C_s[:] = jnp.zeros_like(C_s)

    def syndrome_fail():
        """f32 [1, Bt]: 1.0 where some check is unsatisfied."""
        def layer(li, fail):
            def slot(si, acc):
                e = row_be_ref[li * dcb + si]
                valid = (row_val_ref[li * dcb + si] == 1)
                col = be_col_ref[e]
                sb = be_shiftb_ref[e]
                hard = (total_s[col] < 0).astype(jnp.float32)
                contrib = pltpu.roll(hard, sb, 0)
                return acc + jnp.where(valid, contrib, 0.0)
            acc = jax.lax.fori_loop(0, dcb, slot, jnp.zeros((Z, Bt), jnp.float32))
            par = acc - 2.0 * jnp.floor(acc * 0.5)
            return jnp.maximum(fail, jnp.max(par, axis=0, keepdims=True))
        return jax.lax.fori_loop(0, mb, layer, jnp.zeros((1, Bt), jnp.float32))

    if early_term:
        done0 = 1.0 - syndrome_fail()
        iters0 = jnp.zeros((1, Bt), jnp.float32)

    def sweep(frozen, track):
        """One full layered iteration; `frozen` [1, Bt] lanes left unchanged.
        Returns the ON-THE-FLY syndrome fail flag [1, Bt] accumulated from
        each layer's parity as processed (identical accumulation to the XLA
        oracle's sweep) — no separate syndrome pass needed. track=False
        (fixed-iteration benchmark mode) skips parity/freeze bookkeeping
        entirely — the literal '25 iterations of min-sum' configuration."""
        def layer(li, fail):
            # pass 1: extrinsic slabs + running two-min / sign / parity.
            # Statically unrolled over slots (dcb is small): no inner-loop
            # scalar overhead, lets Mosaic software-pipeline the rolls.
            inf = jnp.full((Z, Bt), jnp.inf, jnp.float32)
            zero = jnp.zeros((Z, Bt), jnp.float32)
            min1, min2, negcnt, hardcnt = inf, inf, zero, zero
            for si in range(dcb):
                e = row_be_ref[li * dcb + si]
                valid = (row_val_ref[li * dcb + si] == 1)
                col = be_col_ref[e]
                sb = be_shiftb_ref[e]
                rolled = pltpu.roll(total_s[col], sb, 0)
                slab = rolled - C_s[e].astype(jnp.float32)
                vrow_s[si] = slab
                a = jnp.where(valid, jnp.abs(slab), jnp.inf)
                neg = jnp.where(valid & (slab < 0), 1.0, 0.0)
                min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                min1 = jnp.minimum(min1, a)
                negcnt = negcnt + neg
                if track:
                    hard = jnp.where(valid & (rolled < 0), 1.0, 0.0)
                    hardcnt = hardcnt + hard
            if track:
                hpar = hardcnt - 2.0 * jnp.floor(hardcnt * 0.5)
                fail = jnp.maximum(fail, jnp.max(hpar, axis=0, keepdims=True))
            par = negcnt - 2.0 * jnp.floor(negcnt * 0.5)
            sgn_prod = 1.0 - 2.0 * par
            min1c = jnp.minimum(min1, _MAG_CAP)
            min2c = jnp.minimum(min2, _MAG_CAP)
            mag1 = jnp.maximum(alpha * min1c - beta, 0.0)
            mag2 = jnp.maximum(alpha * min2c - beta, 0.0)

            # pass 2: emit messages, update posteriors (static unroll)
            keep = (frozen > 0.5) if track else None
            for si in range(dcb):
                e = row_be_ref[li * dcb + si]
                valid_i = row_val_ref[li * dcb + si]
                col = be_col_ref[e]
                s = be_shift_ref[e]

                @pl.when(valid_i == 1)
                def _(si=si, e=e, col=col, s=s):
                    v = vrow_s[si]
                    sv = jnp.where(v < 0, -1.0, 1.0)
                    a = jnp.abs(v)
                    mag = jnp.where(a == min1, mag2, mag1)
                    Cold = C_s[e].astype(jnp.float32)
                    Cnew = (sgn_prod * sv) * mag
                    if track:
                        Cnew = jnp.where(keep, Cold, Cnew)
                    # quantize through storage dtype BEFORE the posterior
                    # update so total and C stay consistent
                    Cq = Cnew.astype(C_s.dtype).astype(jnp.float32)
                    delta = pltpu.roll(Cq - Cold, s, 0)
                    total_s[col] = total_s[col] + delta
                    C_s[e] = Cq.astype(C_s.dtype)
            return fail
        return jax.lax.fori_loop(0, mb, layer, jnp.zeros((1, Bt), jnp.float32))

    if early_term:
        def body(carry):
            done, iters, it = carry
            fail = sweep(done, True)
            iters = iters + (1.0 - done)
            done = jnp.maximum(done, 1.0 - fail)
            return done, iters, it + 1

        def cond(carry):
            done, _, it = carry
            return (it < max_iters) & (jnp.min(done) < 0.5)
        carry = jax.lax.while_loop(cond, body, (done0, iters0, jnp.zeros((), jnp.int32)))
        done, iters, _ = carry
    else:
        # pure fixed-iteration mode: no freeze, no per-iteration syndrome
        jax.lax.fori_loop(
            0, max_iters, lambda _, c: (sweep(None, False), c)[1], 0
        )
        iters = jnp.full((1, Bt), float(max_iters), jnp.float32)
    bits_ref[:] = (total_s[:] < 0).astype(bits_ref.dtype)
    # truthful ok: one final posterior syndrome over the emitted bits
    ok_ref[:] = 1.0 - syndrome_fail()
    iters_ref[:] = iters


def make_layered_pallas_decoder(
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
    llr_dtype=jnp.float32,
):
    """decode(llr [B, n]) -> DecodeResult via the fused layered kernel.

    msg_dtype: storage dtype of the C message array — the dominant VMEM
    consumer. bf16 halves it (required to fit DVB-S2 at Bt=128) at the cost
    of message quantization; f32 is bit-exact with the XLA oracle. llr_dtype
    likewise for the input posteriors. The kernel computes in f32 either
    way and quantizes through the storage dtype so total/C stay consistent.
    """
    if graph.Z % 8 != 0:
        raise ValueError(
            f"{graph.name}: pallas layered kernel needs Z % 8 == 0 (got Z="
            f"{graph.Z}); use the xla layered tier or the fused_mm kernel"
        )
    Z, nb, mb, dcb = graph.Z, graph.nb, graph.mb, graph.dcb_max
    BE = graph.num_block_edges

    row_be = np.zeros(mb * dcb, np.int32)
    row_val = np.zeros(mb * dcb, np.int32)
    rb = np.asarray(graph.row_be)
    rm = np.asarray(graph.row_mask)
    for i in range(mb):
        for j in range(dcb):
            row_be[i * dcb + j] = rb[i, j]
            row_val[i * dcb + j] = int(rm[i, j])
    row_be = jnp.asarray(row_be)
    row_val = jnp.asarray(row_val)
    be_col = jnp.asarray(graph.be_col)
    be_shift = jnp.asarray(graph.be_shift)
    be_shiftb = jnp.asarray((Z - np.asarray(graph.be_shift)) % Z)

    kern = functools.partial(
        _kernel, mb=mb, nb=nb, dcb=dcb, Z=Z, Bt=batch_tile,
        alpha=alpha, beta=beta, max_iters=max_iters, early_term=early_term,
    )
    msg_bytes = jnp.dtype(msg_dtype).itemsize
    llr_bytes = jnp.dtype(llr_dtype).itemsize
    lanes = max(batch_tile, 128)
    state_bytes = Z * lanes * (
        msg_bytes * BE + 4 * nb + 4 * dcb + llr_bytes * nb + nb
    )
    vmem_limit = min(state_bytes + (1 << 23), 120 * 1024 * 1024)

    def decode_impl(llr, row_be, row_val, be_col, be_shift, be_shiftb):
        B = llr.shape[0]
        B_pad = _round_up(max(B, batch_tile), batch_tile)
        llr3 = jnp.zeros((nb, Z, B_pad), llr_dtype)
        llr3 = llr3.at[:, :, :B].set(
            llr.T.astype(llr_dtype).reshape(nb, Z, B)
        )
        itp = interpret
        if itp is None:
            itp = jax.default_backend() != "tpu"
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B_pad // batch_tile,),
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
                pltpu.VMEM((nb, Z, batch_tile), jnp.float32),
                pltpu.VMEM((BE, Z, batch_tile), msg_dtype),
                pltpu.VMEM((dcb, Z, batch_tile), jnp.float32),
            ],
        )
        bits, ok, iters = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb, Z, B_pad), jnp.int8),
                jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit),
            ),
            interpret=itp,
        )(row_be, row_val, be_col, be_shift, be_shiftb, llr3)
        return DecodeResult(
            bits=(bits.reshape(nb * Z, B_pad)[:, :B] > 0).astype(jnp.uint8).T,
            ok=ok[0, :B] > 0.5,
            iterations=iters[0, :B].astype(jnp.int32),
        )

    impl = jax.jit(decode_impl) if jit else decode_impl

    def decode(llr):
        return impl(llr, row_be, row_val, be_col, be_shift, be_shiftb)

    return decode
