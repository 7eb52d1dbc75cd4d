"""Round-5 flagship floor program (VERDICT r4 items 3 + 4).

All on the real TPU, dvbs2/64800/12:

1. RETRY TIMED END-TO-END (r4 weak item 4: retry's cost was inferred,
   never timed): amortized Mbit/s of the ';retry=' production decoder vs
   the bare primary through the SAME host-level loop (both pay this
   platform's per-dispatch constant, so the delta is the retry overhead;
   with_retry is host-level by design, so a host loop IS its production
   shape). Measured at the 2.5 dB operating point and at 1.35/1.5 dB
   tail points. Rows appended to docs/FLOOR_dvbs2_64800_12.json.

2. DEEP SCAN +1 DECADE WITH THE REMEDY ON (r4 item 4): retry-enabled
   points at 1.9 and 2.0 dB at multi-million-frame budgets through the
   standard run_sweep (the ';retry=' spec makes this a plain sweep).
   Survivor frames, if any, are classified by the trap harness.

3. STORED FAILURE BATCH (r4 item 3b): harvest primary failures at
   1.35 dB, keep those that reproduce on the XLA f32 tier, store their
   LLRs + codewords to tests/data/trap_batch_dvbs2_64800_12.npz, and
   verify spa/50 recovers every one — the artifact behind the CPU
   regression test tests/decode/test_retry_batch.py.

Run: JAX_COMPILATION_CACHE_DIR=/root/jax_cache python experiments/floor_r5.py [--quick]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")

CODE = "dvbs2/64800/12"
BASE = "layered/norm:0.8125/50"
# Fallback choice (r5 finding): flooding spa/50 clears the tail but its
# XLA roll tier is OVERHEAD-BOUND on small retry buckets (~8 s per
# 32-frame bucket of tiny [360, 32] tensors — measured 45-63 s per 8k
# frames at 1.35-1.5 dB, a 40-60x amortized cost when ~every batch has a
# not-proven frame). layered/spa/50 is served by the Pallas layered
# kernel (431 Mbit/s on this code), clears the stored trapping batch in
# 11-12 iterations, and makes retry's amortized cost negligible — the
# production recommendation.
RETRY = BASE + ";retry=layered/spa/50"
RETRY_SLOW = BASE + ";retry=spa/50"  # measured for the artifact
FLOOR_PATH = "docs/FLOOR_dvbs2_64800_12.json"
BATCH_PATH = "tests/data/trap_batch_dvbs2_64800_12.npz"


def _build(decoder):
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode import get_decoder
    from ecc_ldpc_tpu.decode.api import choose_graph

    spec = get_code(CODE)
    return spec, get_decoder(choose_graph(spec, decoder), decoder)


def timed_arm(ebn0, batch=1024, nbatches=8, tries=3):
    """Wall-clock Mbit/s of RETRY vs BASE over identical prestaged device
    LLR batches, same host-level loop for both (apples to apples)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecc_ldpc_tpu.chan.awgn import make_channel
    from ecc_ldpc_tpu.encode.structured import build_encoder

    spec, base_dec = _build(BASE)
    _, retry_dec = _build(RETRY)
    enc = build_encoder(spec)
    channel = make_channel(spec)
    key = jax.random.key(515)
    llrs = []
    for i in range(nbatches):
        msg = jax.random.bernoulli(
            jax.random.fold_in(key, 2 * i), 0.5, (batch, spec.k)
        ).astype(jnp.uint8)
        llrs.append(jax.block_until_ready(
            channel(jax.random.fold_in(key, 2 * i + 1), enc(msg), ebn0)
        ))

    def run(dec):
        fe = 0
        for llr in llrs:
            fe += int(np.sum(~np.asarray(dec(llr).ok)))
        return fe

    _, retry_slow_dec = _build(RETRY_SLOW)
    out = {"ebn0_db": ebn0, "batch": batch, "frames": batch * nbatches}
    arms = [("base", base_dec), ("retry", retry_dec)]
    if ebn0 < 2.0:  # the overhead-bound fallback, timed where it fires
        arms.append(("retry_flooding_spa", retry_slow_dec))
    for name, dec in arms:
        run(dec)  # warm (compiles both sub-decoders)
        walls = []
        for _ in range(tries):
            t0 = time.perf_counter()
            fe = run(dec)
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls))
        out[name] = dict(
            mbps=round(batch * nbatches * spec.k / w / 1e6, 1),
            wall_s=round(w, 3), not_ok=fe,
        )
    out["retry_cost_pct"] = round(
        100.0 * (out["base"]["mbps"] / out["retry"]["mbps"] - 1.0), 2
    )
    return out


def deep_retry_point(ebn0, max_frames, min_fe=8, batch=2048, seed=20260821):
    """Manual MC loop with the ';retry=' production decoder so any frame
    retry still fails is captured and classified on the spot (at these
    FERs a survivor cannot be re-harvested later)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecc_ldpc_tpu.chan.awgn import make_channel
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.encode.structured import build_encoder
    from ecc_ldpc_tpu.sim.microscope import classify_failure

    spec_c = get_code(CODE)
    _, dec = _build(RETRY)
    enc = build_encoder(spec_c)
    channel = make_channel(spec_c)

    import jax as _jax

    @_jax.jit
    def tx(key):
        kmsg, kch = _jax.random.split(key)
        msg = _jax.random.bernoulli(kmsg, 0.5, (batch, spec_c.k)).astype(jnp.uint8)
        cw = enc(msg)
        return msg, cw, channel(kch, cw, ebn0)

    @_jax.jit
    def tally(msg, res_bits, res_iters):
        # per-frame flags/counters only — NEVER the [B, k] matrix (a
        # 66 MB host pull through the tunnel costs ~5 s/step)
        diff = enc.extract_message(res_bits) != msg
        return (jnp.sum(diff, axis=1, dtype=jnp.int32),
                jnp.sum((res_iters > 50).astype(jnp.int32)))

    key = jax.random.key(seed)
    frames = fe = be = primary_fe = 0
    survivors = []
    t0 = time.time()
    step = 0
    while frames < max_frames and fe < min_fe:
        msg, cw, llr = tx(jax.random.fold_in(key, step))
        res = dec(llr)
        w, retried = tally(msg, res.bits, res.iterations)
        w = np.asarray(w)             # [B] int32 — tiny transfer
        primary_fe += int(retried)
        badf = np.flatnonzero(w > 0)
        fe += len(badf)
        be += int(w.sum())
        for i in badf[:16]:
            f = classify_failure(
                spec_c, np.asarray(cw[i]), np.asarray(res.bits[i]),
                detected=not bool(np.asarray(res.ok[i])),
            )
            survivors.append(dict(ab=list(f.ab), elementary=f.elementary,
                                  detected=f.detected))
        frames += batch
        step += 1
    return dict(
        decoder=RETRY, ebn0_db=ebn0, frames=frames, frame_errors=fe,
        bit_errors=be, fer=fe / frames if frames else 0.0,
        retried_frames=primary_fe, survivors=survivors,
        wall_s=round(time.time() - t0, 1),
    )


def harvest_batch(ebn0=1.35, want=8, max_frames=1 << 19, batch=2048,
                  seed=77):
    """Collect primary failures that REPRODUCE on the XLA f32 tier (the
    tier the CPU regression test runs), verify spa/50 clears them, and
    store llr/cw rows."""
    if os.path.exists(BATCH_PATH):
        return dict(skipped="batch already harvested", path=BATCH_PATH)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecc_ldpc_tpu.chan.awgn import make_channel
    from ecc_ldpc_tpu.codes import get_code
    from ecc_ldpc_tpu.decode import get_decoder
    from ecc_ldpc_tpu.decode.api import choose_graph
    from ecc_ldpc_tpu.encode.structured import build_encoder

    spec = get_code(CODE)
    graph = choose_graph(spec, BASE)
    enc = build_encoder(spec)
    channel = make_channel(spec)
    primary = get_decoder(graph, BASE)                      # production tier
    primary_f32 = get_decoder(graph, BASE, backend="xla")   # CPU-equivalent
    fallback = get_decoder(graph, "spa/50")

    key = jax.random.key(seed)
    rows_llr, rows_cw = [], []
    frames = 0
    step = 0
    while len(rows_llr) < want and frames < max_frames:
        msg = jax.random.bernoulli(
            jax.random.fold_in(key, 2 * step), 0.5, (batch, spec.k)
        ).astype(jnp.uint8)
        cw = enc(msg)
        llr = channel(jax.random.fold_in(key, 2 * step + 1), cw, ebn0)
        bad = np.flatnonzero(~np.asarray(primary(llr).ok))
        if len(bad):
            sub = jnp.take(llr, jnp.asarray(bad), axis=0)
            # keep only failures that reproduce on the f32 static-roll tier
            rep = np.flatnonzero(~np.asarray(primary_f32(sub).ok))
            for i in rep:
                rows_llr.append(np.asarray(sub[i], np.float32))
                rows_cw.append(np.asarray(cw[bad[i]], np.uint8))
        frames += batch
        step += 1
    if not rows_llr:
        return dict(error="no reproducible failures harvested", frames=frames)
    import numpy as np  # noqa: F811
    llrs = np.stack(rows_llr)[:want]
    cws = np.stack(rows_cw)[:want]
    rec = fallback(jnp.asarray(llrs))
    recovered = int(np.sum(np.asarray(rec.ok)))
    exact = int(np.sum((np.asarray(rec.bits) == cws).all(axis=1)))
    os.makedirs(os.path.dirname(BATCH_PATH), exist_ok=True)
    np.savez_compressed(BATCH_PATH, llr=llrs, cw=cws,
                        meta=np.array([ebn0, seed], np.float64))
    return dict(ebn0_db=ebn0, frames_scanned=frames, stored=len(llrs),
                spa50_recovered=recovered, spa50_exact=exact,
                path=BATCH_PATH)


def main() -> int:
    quick = "--quick" in sys.argv
    with open(FLOOR_PATH) as f:
        out = json.load(f)
    r5 = out.setdefault("r5", {})

    # 1. retry timed end-to-end (skipped when already recorded)
    if "retry_timing" in r5 and "--redo-timing" not in sys.argv:
        print("timing: already recorded, skipping", flush=True)
    else:
      r5["retry_timing"] = []
      for ebn0 in ([2.5] if quick else [2.5, 1.5, 1.35]):
        row = timed_arm(ebn0, nbatches=2 if quick else 8)
        print("timing:", json.dumps(row), flush=True)
        r5["retry_timing"].append(row)

    # 3. stored failure batch (before the long scans so it lands even if
    # the deep points are cut short)
    hb = harvest_batch(max_frames=(1 << 14) if quick else (1 << 19))
    print("harvest:", json.dumps(hb), flush=True)
    if "skipped" not in hb or "failure_batch" not in r5:
        r5["failure_batch"] = hb

    # 2. deep scan with the remedy on
    def flush():
        with open(FLOOR_PATH, "w") as f:
            json.dump(out, f, indent=1)

    flush()  # timing + harvest land even if a deep point is cut short
    budgets = [(1.9, 4_194_304), (2.0, 2_097_152)]
    if quick:
        budgets = [(1.9, 8_192)]
    r5["deep_retry"] = []
    for ebn0, mf in budgets:
        row = deep_retry_point(ebn0, mf)
        print("deep_retry:", json.dumps(row), flush=True)
        r5["deep_retry"].append(row)
        flush()
    print("wrote", FLOOR_PATH)
    return 0


if __name__ == "__main__":
    sys.exit(main())
