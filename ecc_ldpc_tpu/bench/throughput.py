"""Decoded-throughput benchmark: Mbit/s/chip at fixed-iteration min-sum.

The primary metric (BASELINE.json:2): decoded Mbit/s per chip, min-sum, 25
iterations. Methodology follows the retrieved pjit micro-benchmark pattern
(SNIPPETS.md:109-121): compile/warm-up call first, then timed runs with
block_until_ready, median-of-tries. The roofline check from SURVEY.md §6 is
computed alongside: bytes of edge traffic per iteration vs HBM bandwidth
gives the memory-bound speed-of-light for comparison.

vs_baseline convention: the reference publishes no numbers
(BASELINE.json:13 "published": {}), so vs_baseline reports the fraction of
the north-star target — 1 Gbit/s/chip (BASELINE.json:5).
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_MBPS = 1000.0

# TPU v5e: ~819 GB/s HBM bandwidth (public spec) — used for the roofline
# estimate only; harmless if the actual part differs.
HBM_GBPS = 819.0


@dataclasses.dataclass
class BenchResult:
    throughput_mbps: float
    code: str
    decoder: str
    batch: int
    iters: int
    k: int
    n: int
    num_edges: int
    wall_s_per_batch: float
    mean_iters: float
    roofline_mbps: float
    device: str
    roofline_form: str = "hbm-gather"

    def json_line(self) -> str:
        return json.dumps(
            {
                "metric": "decoded_throughput",
                "value": round(self.throughput_mbps, 3),
                "unit": "Mbit/s/chip",
                "vs_baseline": round(self.throughput_mbps / NORTH_STAR_MBPS, 4),
                "code": self.code,
                "decoder": self.decoder,
                "batch": self.batch,
                "iters": self.iters,
                "k_bits_per_frame": self.k,
                "wall_s_per_batch": round(self.wall_s_per_batch, 6),
                "roofline_mbps": round(self.roofline_mbps, 1),
                "roofline_form": self.roofline_form,
                "device": self.device,
            }
        )


def roofline_mbps(num_edges: int, k: int, iters: int, msg_bytes: int = 4) -> float:
    """Memory-bound speed-of-light if messages round-trip HBM every
    iteration: per frame per iter ~ 4 touches of E messages (CN read+write,
    VN read+write). SURVEY.md §6 shows the 1 Gbit/s target requires beating
    this via VMEM residency — the fused-kernel headroom this number bounds.

    FORM CAVEAT (DESIGN.md §3.6, round 4): this is the bound of a
    GATHER-form kernel. It is the right reference for the roll tiers
    (which beat it from VMEM); it is a category error for the
    incidence-matmul tiers, whose ceiling is MXU FLOPs — use
    mxu_roofline_mbps for those rows. BenchResult.roofline_form records
    which bound a row carries."""
    bytes_per_frame = 4.0 * num_edges * msg_bytes * iters
    frames_per_s = HBM_GBPS * 1e9 / bytes_per_frame
    return frames_per_s * k / 1e6


# TPU v5e bf16 MXU peak (public spec), for the incidence-form ceiling.
MXU_PEAK_TFLOPS = 197.0


def mxu_roofline_mbps(n: int, m: int, dc_max: int, k: int, iters: int) -> float:
    """Compute-bound speed-of-light of the incidence-matmul form: the
    per-iteration dot chain St@x [e_pad,n_pad]@[n_pad,B], S@C back, and
    the H@bits syndrome, at 100% MXU bf16 peak with zero fixed cost.
    Gives 293 Mbit/s on mackay1008 — 4% above the measured matmuls-only
    ablation floor of 281 (DESIGN.md §3.6), i.e. a true ceiling the
    production kernel reaches 92% of."""
    n_pad = -(-n // 128) * 128
    e_pad = (-(-m // 128) * 128) * dc_max
    m2_pad = -(-m // 8) * 8
    flops_per_frame = 2.0 * (2 * e_pad * n_pad + m2_pad * n_pad) * iters
    return MXU_PEAK_TFLOPS * 1e12 / flops_per_frame * k / 1e6


def time_fn(f, *args, tries: int = 5):
    """Warm-up + median-of-tries wall timing, forcing a value fetch.

    On this platform's tunneled device block_until_ready can return before
    the work retires, so each try fetches a host value. Includes per-call
    dispatch/sync overhead — use chained_decode_time for pure device time."""
    np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
    outcomes = []
    for _ in range(tries):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
        outcomes.append(time.perf_counter() - t0)
    return float(np.median(outcomes))


def chained_decode_time(dec, llr, chain: int = 20, tries: int = 3) -> float:
    """Per-decode DEVICE time: run `chain` decodes inside one jit, each
    consuming a perturbation of the previous output (so no call can be
    elided or overlapped dishonestly), fetch one scalar, and take the
    DIFFERENTIAL slope between two chain lengths.

    This is the per-chip number a production pipeline sees (decode steps
    back-to-back on device, no host round-trips). A single divide-by-chain
    does NOT exclude this environment's tunneled per-dispatch artifact: a
    trivial chained jit of ANY length costs a flat ~25 ms end-to-end
    (measured 2026-08-20: chain 1/10/40 of an elementwise body -> 25.8 /
    26.8 / 24.9 ms total), so chain=10 silently added ~2.6 ms to every
    step — 40% of a mackay1008 decode, 2% of the flagship's. Timing the
    SAME body at `chain` and `3*chain` and dividing the difference by
    2*chain cancels every per-dispatch constant exactly; only true
    per-step device time survives."""
    import jax.numpy as jnp

    def make(c):
        @jax.jit
        def run(llr):
            def body(_, l):
                res = dec(l)
                # scalar coupling over a full bit COLUMN: the reduction
                # reads one bit from every codeword, so every batch-chunk
                # kernel in the decode stays live (a single-element probe
                # let XLA dead-code 15 of 16 chunk calls — measured 10x
                # "speedup"), and decode k+1's input completes only after
                # decode k's bits exist, keeping the chain strictly
                # sequential. Unlike the old full-tensor `l + 1e-9*bits`
                # this costs one scalar update, not ~1 GB of HBM traffic
                # per step (~3% of measured time that was harness, not
                # decode, at n=64800 b=2048).
                probe = jnp.sum(res.bits[:, 0].astype(jnp.float32))
                return l.at[0, 0].add(1e-9 * probe.astype(l.dtype))
            out = jax.lax.fori_loop(0, c, body, llr)
            return jnp.sum(out[:, 0])
        return run

    run_lo, run_hi = make(chain), make(3 * chain)
    float(run_lo(llr))  # compile + warm
    float(run_hi(llr))
    outcomes, his = [], []
    for _ in range(tries):
        t0 = time.perf_counter()
        float(run_lo(llr))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_hi(llr))
        t_hi = time.perf_counter() - t0
        outcomes.append((t_hi - t_lo) / (2 * chain))
        his.append(t_hi)
    slope = float(np.median(outcomes))
    if slope <= 0.0:
        # pure-noise regime: for sub-microsecond bodies under host
        # contention the lo/hi difference can go negative. Fall back to
        # the hi-chain total as a conservative upper bound — the flat
        # dispatch constant is then charged to the step, which is the
        # honest direction for an estimate this coarse.
        slope = float(np.median(his)) / (3 * chain)
    return slope


def run_benchmark(
    code: str = "mackay1008",
    decoder: str = "minsum/norm:0.8125/25/noet",
    batch: int = 1024,
    ebn0_db: float = 2.5,
    tries: int = 5,
    backend: Optional[str] = None,
    profile_dir: Optional[str] = None,
) -> BenchResult:
    from ..chan import awgn_llr
    from ..codes import get_code
    from ..decode import get_decoder
    from ..decode.api import choose_graph, parse_decoder_spec
    from ..encode.structured import build_encoder

    spec = get_code(code)
    kw = parse_decoder_spec(decoder)
    graph = choose_graph(spec, decoder, backend=backend)
    overrides = {"backend": backend} if backend else {"backend": "auto"}
    dec = get_decoder(graph, decoder, **overrides)
    iters = kw.get("max_iters", 25)

    # Realistic operating-point LLRs (the metric decodes real noisy frames).
    # Channel is puncture/shorten-aware (make_channel) so rate-matched
    # codes see their true receiver-side LLR pattern. Families without a
    # shipped encoder (ccsds k=16384: dense-H guard) use the all-zero
    # codeword — valid for any linear code and, by the channel's sign
    # symmetry, decode-cost-identical to a random codeword.
    from ..chan.awgn import make_channel

    key = jax.random.key(0)
    try:
        enc = build_encoder(spec)
    except ValueError:
        enc = None  # no shipped encoder for this family (dense-H guard)
    if enc is None:
        cw = jnp.zeros((batch, spec.n), jnp.uint8)
    else:
        msg = jax.random.bernoulli(key, 0.5, (batch, spec.k)).astype(jnp.uint8)
        cw = enc(msg)
    llr = make_channel(spec)(jax.random.fold_in(key, 1), cw, ebn0_db)

    if profile_dir:
        jax.block_until_ready(dec(llr))  # compile outside the trace
        jax.profiler.start_trace(profile_dir)
    wall = chained_decode_time(dec, llr, tries=tries)
    if profile_dir:
        jax.profiler.stop_trace()

    res = dec(llr)
    mean_iters = float(jnp.mean(res.iterations))
    mbps = batch * spec.k / wall / 1e6
    # form-correct ceiling (VERDICT r4 item 7): incidence-matmul rows are
    # MXU-compute-bound; roll/xor-perm QC rows carry the gather-form HBM
    # bound as their reference (the VMEM-resident kernels beat it)
    from ..graph.qc import QCGraph

    if isinstance(graph, QCGraph):
        roof, form = roofline_mbps(spec.num_edges, spec.k, iters), "hbm-gather"
    else:
        roof = mxu_roofline_mbps(spec.n, spec.m, graph.dc_max, spec.k, iters)
        form = "mxu-incidence"
    return BenchResult(
        throughput_mbps=mbps,
        code=code,
        decoder=decoder,
        batch=batch,
        iters=iters,
        k=spec.k,
        n=spec.n,
        num_edges=spec.num_edges,
        wall_s_per_batch=wall,
        mean_iters=mean_iters,
        roofline_mbps=roof,
        roofline_form=form,
        device=jax.devices()[0].platform,
    )
