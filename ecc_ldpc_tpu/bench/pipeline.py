"""Encoder and full-pipeline throughput (the numbers around the decoder).

The headline metric is decoded Mbit/s/chip (bench/throughput.py); a
production system also needs to know what the O(n) structured encoders
and the complete encode -> channel -> decode step sustain, since a slow
front-end would cap the pipeline no matter how fast the kernel is.
Timing discipline matches chained_decode_time (bench/throughput.py):
`chain` dependent steps inside one jit, one scalar fetched, so the
tunneled per-dispatch artifact and dishonest overlap are both excluded.
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PipelineBenchResult:
    encode_mbps: float  # info bits through the encoder
    pipeline_mbps: float  # info bits through encode+channel+decode
    decode_share: float  # fraction of pipeline time in the decoder
    code: str
    decoder: str
    batch: int
    device: str

    def json_line(self) -> str:
        return json.dumps({
            "metric": "pipeline_throughput",
            "encode_mbps": round(self.encode_mbps, 1),
            "pipeline_mbps": round(self.pipeline_mbps, 3),
            "decode_share": round(self.decode_share, 4),
            "code": self.code,
            "decoder": self.decoder,
            "batch": self.batch,
            "device": self.device,
        })


def _chained_time(make_run, chain: int, tries: int = 3) -> float:
    """Differential per-step time: the same chained body at chain and
    3*chain, slope = (T_hi - T_lo)/(2*chain) — cancels this environment's
    flat ~25 ms per-dispatch constant exactly (bench/throughput.py)."""
    run_lo, run_hi = make_run(chain), make_run(3 * chain)
    float(run_lo())  # compile + warm
    float(run_hi())
    outcomes = []
    for _ in range(tries):
        t0 = time.perf_counter()
        float(run_lo())
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_hi())
        outcomes.append((time.perf_counter() - t0 - t_lo) / (2 * chain))
    return float(np.median(outcomes))


def run_pipeline_benchmark(
    code: str = "dvbs2/64800/12",
    decoder: str = "layered/norm:0.8125/25/noet",
    batch: int = 1024,
    ebn0_db: float = 2.5,
    chain: int = 20,
    tries: int = 3,
) -> PipelineBenchResult:
    from ..chan.awgn import make_channel
    from ..codes import get_code
    from ..decode import get_decoder
    from ..decode.api import choose_graph
    from ..encode.structured import build_encoder

    spec = get_code(code)
    enc = build_encoder(spec)
    channel = make_channel(spec)
    dec = get_decoder(choose_graph(spec, decoder), decoder, jit=False)
    key = jax.random.key(0)
    msg0 = jax.random.bernoulli(key, 0.5, (batch, spec.k)).astype(jnp.uint8)

    # chain rule: the next message XORs with a ROLLED view of the previous
    # step's output — a plain XOR with the extracted message would be
    # identically zero (systematic codes), collapsing the chain to
    # all-zero frames; the roll keeps every step's input data-dependent
    # and nondegenerate.
    def make_encode(c):
        @jax.jit
        def run_encode(msg0):
            def body(_, msg):
                cw = enc(msg)
                return jnp.bitwise_xor(
                    msg, jnp.roll(enc.extract_message(cw), 1, axis=1))
            out = jax.lax.fori_loop(0, c, body, msg0)
            return jnp.sum(out[:, 0].astype(jnp.int32))
        return lambda: run_encode(msg0)

    def make_pipeline(c):
        @jax.jit
        def run_pipeline(msg0):
            def body(t, msg):
                cw = enc(msg)
                llr = channel(jax.random.fold_in(key, t), cw, ebn0_db)
                res = dec(llr)
                return jnp.bitwise_xor(
                    msg, jnp.roll(enc.extract_message(res.bits), 1, axis=1))
            out = jax.lax.fori_loop(0, c, body, msg0)
            return jnp.sum(out[:, 0].astype(jnp.int32))
        return lambda: run_pipeline(msg0)

    t_enc = _chained_time(make_encode, chain, tries)
    t_pipe = _chained_time(make_pipeline, chain, tries)
    bits = batch * spec.k
    return PipelineBenchResult(
        encode_mbps=bits / t_enc / 1e6,
        pipeline_mbps=bits / t_pipe / 1e6,
        decode_share=max(0.0, (t_pipe - t_enc) / t_pipe),
        code=code,
        decoder=decoder,
        batch=batch,
        device=jax.devices()[0].platform,
    )
