"""Small-code fused_mm deep-dive (VERDICT r2 item 4, second pass).

Round-2's smallcode_opt.py concluded "bf16 neutral — dispatch/VPU-bound"
from chain=10 timings. That conclusion was half-harness-artifact: a
trivial chained jit costs a FLAT ~25 ms end-to-end in this environment
(the tunneled dispatch), so chain=10 added ~2.6 ms to every step — 40%
of a mackay1008 decode. chained_decode_time is differential now
(bench/throughput.py), so this experiment re-derives the true on-device
split three ways:

  1. iters sweep        -> fixed overhead vs marginal per-iteration cost
  2. ablation kernels   -> matmul-only / CN-only per-iteration floors
  3. layout variant     -> dc-major [dc, m_pad, Bt] edge storage: clean
                           (8,128) tiling per slab (the production
                           [m, dc, Bt] layout pads dc=6 sublanes to 8 and
                           relayouts on every reshape), tournament
                           two-min + bitxor sign tracking per slab
                           (the layered_qc kernel's tricks).

Run on real TPU:
  PYTHONPATH=/root/.axon_site:/root/repo JAX_COMPILATION_CACHE_DIR=/root/jax_cache \
    python experiments/smallcode_opt2.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SGN = np.int32(-(2**31))
_BIG = 1e12


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------- dc-major
def build_operators_dcmajor(graph, n_pad, m_pad, m2_pad):
    """Incidence operators with edge index e = j*m_pad + i (dc-major)."""
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


def _kernel_dcmajor(
    llr_ref, S_ref, St_ref, H_ref, mask_ref,
    bits_ref, ok_ref, iters_ref,
    *, m_pad, dc, alpha, beta, max_iters, variant,
):
    """Fixed-iteration min-sum, dc-major edge layout.

    V lives as [dc*m_pad, Bt]; slab j = V[j*m_pad:(j+1)*m_pad] is a clean
    (8,128)-tiled 2D block. CN update = unrolled tournament two-min +
    int32 sign-bit XOR across the dc slabs — no 3D arrays, no reductions
    over a padded sublane axis, no relayouts.
    variant: 'full' | 'mm_only' (CN = pass-through) | 'cn_only' (no MXU).
    """
    llr = llr_ref[:].astype(jnp.float32)  # [n_pad, Bt]
    S = S_ref[:]
    St = St_ref[:]
    H = H_ref[:]
    Bt = llr.shape[1]
    md = S.dtype
    # mask columns per slab: [dc, m_pad] -> each row broadcast over lanes
    masks = [mask_ref[j, :].reshape(m_pad, 1) > 0.5 for j in range(dc)]

    def dot(A, x):
        return jax.lax.dot_general(
            A, x.astype(md), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def cn_tournament(Vflat):
        """minsum on [dc*m_pad, Bt] -> same shape; tournament + bitxor."""
        slabs_a = []
        slabs_sb = []
        m1 = jnp.full((m_pad, Bt), _BIG, jnp.float32)
        m2 = m1
        sx = jnp.zeros((m_pad, Bt), jnp.int32)
        for j in range(dc):
            v = Vflat[j * m_pad:(j + 1) * m_pad]
            a = jnp.where(masks[j], jnp.abs(v), _BIG)
            sb = jnp.where(v < 0, _SGN, 0)
            slabs_a.append(a)
            slabs_sb.append(sb)
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

    def syndrome_fail(total):
        hard = (total < 0).astype(jnp.float32)
        cnt = dot(H, hard)
        par = cnt - 2.0 * jnp.floor(cnt * 0.5)
        return jnp.max(par, axis=0, keepdims=True)

    V = dot(St, llr)
    total = llr

    def body(_, c):
        V, total = c
        if variant == "mm_only":
            C = V  # CN ablated: pass-through (numerically wrong, same shapes)
        else:
            C = cn_tournament(V)
        if variant == "cn_only":
            # MXU ablated: keep the dependency alive without matmuls
            new_total = total + C[:m_pad] * 1e-9
            newV = C + new_total[:1] * 1e-9
        else:
            new_total = llr + dot(S, C)
            newV = dot(St, new_total) - C
        return newV, new_total

    _, total = jax.lax.fori_loop(0, max_iters, body, (V, total))
    done = 1.0 - syndrome_fail(total)
    bits_ref[:] = (total < 0).astype(jnp.float32)
    ok_ref[:] = done
    iters_ref[:] = jnp.full_like(done, float(max_iters))


def make_dcmajor_decoder(graph, *, alpha=0.8125, beta=0.0, max_iters=25,
                         batch_tile=128, mxu_dtype=jnp.bfloat16,
                         variant="full", interpret=None):
    from ecc_ldpc_tpu.decode.types import DecodeResult

    n_pad = _round_up(graph.n, 128)
    m_pad = _round_up(graph.m, 128)
    m2_pad = _round_up(graph.m, 8)
    dc = graph.dc_max
    e_pad = m_pad * dc
    S, St, H, maskf = build_operators_dcmajor(graph, n_pad, m_pad, m2_pad)
    S = jnp.asarray(S, mxu_dtype)
    St = jnp.asarray(St, mxu_dtype)
    H = jnp.asarray(H, mxu_dtype)
    maskf = jnp.asarray(maskf)

    kern = functools.partial(
        _kernel_dcmajor, m_pad=m_pad, dc=dc, alpha=alpha, beta=beta,
        max_iters=max_iters, variant=variant,
    )

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
                pl.BlockSpec((dc, m_pad), lambda b: (0, 0),
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
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=itp,
        )(llr_t, S, St, H, maskf)
        return DecodeResult(
            bits=(bits[: graph.n, :B] > 0.5).astype(jnp.uint8).T,
            ok=ok[0, :B] > 0.5,
            iterations=iters[0, :B].astype(jnp.int32),
        )

    impl = jax.jit(decode_impl)
    return lambda llr: impl(llr, S, St, H, maskf)


def main():
    code = sys.argv[1] if len(sys.argv) > 1 else "mackay1008"
    from ecc_ldpc_tpu.bench.throughput import chained_decode_time
    from ecc_ldpc_tpu.chan import awgn_llr
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode.pallas.fused_mm import make_pallas_decoder
    from ecc_ldpc_tpu.encode import DenseEncoder
    from ecc_ldpc_tpu.graph import compile_graph

    spec = get_code(code)
    graph = compile_graph(spec)
    enc = DenseEncoder.build(spec)
    key = jax.random.key(0)
    batch = 2048
    msg = jax.random.bernoulli(key, 0.5, (batch, spec.k)).astype(jnp.uint8)
    llr = awgn_llr(jax.random.fold_in(key, 1), enc(msg), 2.0, spec.rate)
    kbits = batch * spec.k

    def bench(name, dec, ref_fer=None):
        t0 = time.perf_counter()
        r = dec(llr)
        fer = float(jnp.mean(~r.ok))
        dt = chained_decode_time(dec, llr, chain=10, tries=3)
        note = "" if ref_fer is None else f" (ref {ref_fer:.4f})"
        print(f"{name:28s}: {kbits/dt/1e6:7.1f} Mbit/s  {dt*1e3:7.3f} ms  "
              f"FER={fer:.4f}{note}  warm {time.perf_counter()-t0:.0f}s",
              flush=True)
        return fer

    # production kernel, both dtypes (honest differential timing now)
    ref_fer = None
    for nm, kw in [("prod f32/Bt128", dict(mxu_dtype=jnp.float32)),
                   ("prod bf16/Bt128", dict(mxu_dtype=jnp.bfloat16))]:
        dec = make_pallas_decoder(graph, "minsum", alpha=0.8125,
                                  max_iters=25, early_term=False, **kw)
        f = bench(nm, dec)
        ref_fer = ref_fer if ref_fer is not None else f

    # dc-major variants: full + ablations
    for variant in ("full", "mm_only", "cn_only"):
        for dt_name, dt in (("bf16", jnp.bfloat16),):
            dec = make_dcmajor_decoder(graph, max_iters=25, mxu_dtype=dt,
                                       variant=variant)
            bench(f"dcmajor/{variant}/{dt_name}", dec,
                  ref_fer if variant == "full" else None)


if __name__ == "__main__":
    sys.exit(main())
