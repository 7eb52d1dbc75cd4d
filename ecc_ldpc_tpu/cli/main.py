"""CLI driver — the equivalent of the reference's `ecc` executable.

The reference's CLI takes Eb/N0 values plus slash-separated code-name strings
and prints a BER table with confidence intervals (SURVEY.md §2.1 R11). Usage:

  python -m ecc_ldpc_tpu.cli sweep \
      --code mackay1008 --code bpsk/1008 \
      --decoder minsum/norm:0.8125/25 \
      --ebn0 0:4:0.5 --batch 512 --min-frame-errors 100 \
      --out results.json --resume sweep_state.json

  python -m ecc_ldpc_tpu.cli codes          # list registered code families
  python -m ecc_ldpc_tpu.cli bench ...      # throughput benchmark
"""
from __future__ import annotations

import argparse
import sys


def parse_ebn0(text) -> tuple:
    """'0:4:0.5' (start:stop:step, inclusive), '1,2,3.5', or a list
    (from --config JSON files)."""
    if isinstance(text, (list, tuple)):
        return tuple(float(x) for x in text)
    if ":" in text:
        parts = [float(x) for x in text.split(":")]
        start, stop = parts[0], parts[1]
        step = parts[2] if len(parts) > 2 else 1.0
        out, v = [], start
        while v <= stop + 1e-9:
            out.append(round(v, 9))
            v += step
        return tuple(out)
    return tuple(float(x) for x in text.split(","))


def cmd_sweep(args) -> int:
    from ..bench.profile import trace
    from ..sim import StoppingRule, SweepSpec, format_table, run_sweep
    from ..sim.report import save_results

    if args.config:
        # JSON config file (SURVEY.md §5.6): keys mirror the CLI flags and
        # take precedence; "code"/"decoder" accept a string or a list.
        import json

        with open(args.config) as f:
            cfg = json.load(f)
        for k, v in cfg.items():
            k = k.replace("-", "_")
            if k in ("code", "decoder") and isinstance(v, str):
                v = [v]
            setattr(args, k, v)

    all_results = []
    with trace(args.profile_dir):
      for code in args.code:
        for decoder in args.decoder:
            spec = SweepSpec(
                code=code,
                decoder=decoder,
                ebn0_db=parse_ebn0(args.ebn0),
                batch=args.batch,
                seed=args.seed,
                stopping=StoppingRule(
                    min_frame_errors=args.min_frame_errors,
                    max_frames=args.max_frames,
                ),
                backend=args.backend,
                channel=args.channel,
            )
            def progress(pr):
                if args.verbose:
                    print(format_table([pr]).splitlines()[-1], flush=True)

            if args.mesh:
                from ..dist import MeshSpec, make_mesh, maybe_init_distributed
                from ..sim.runner import run_sweep_sharded

                maybe_init_distributed()
                b, s = (int(x) for x in args.mesh.split("x"))
                mesh = make_mesh(MeshSpec(batch=b, snr=s))
                all_results += run_sweep_sharded(
                    spec, mesh, resume_path=args.resume, progress=progress
                )
            else:
                all_results += run_sweep(
                    spec, resume_path=args.resume, progress=progress
                )
    print(format_table(all_results))
    if args.out:
        save_results(all_results, args.out)
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


def cmd_compare(args) -> int:
    """BER/FER-curve parity mode (SURVEY.md §2.2 C23): the mechanical form
    of the reference's overlapping-curves validation — two result sets
    match iff their Wilson CIs overlap at every shared Eb/N0 point."""
    import json

    from ..sim import curves_overlap
    from ..sim.runner import PointResult

    def load(path):
        with open(path) as f:
            return [PointResult.from_json(d) for d in json.load(f)]

    a, b = load(args.results[0]), load(args.results[1])
    rc = 0
    for metric in ("fer", "ber"):
        ok = curves_overlap(a, b, metric=metric)
        print(f"{metric.upper()} curves overlap: {'YES' if ok else 'NO'}")
        rc |= 0 if ok else 1
    return rc


def cmd_plot(args) -> int:
    """ASCII waterfall curves from saved sweep results."""
    import json

    from ..sim.report import plot_curves
    from ..sim.runner import PointResult

    results = []
    for path in args.results:
        with open(path) as f:
            results += [PointResult.from_json(d) for d in json.load(f)]
    print(plot_curves(results, metric=args.metric))
    return 0


def cmd_findsnr(args) -> int:
    """Inverse sweep: bisect the Eb/N0 hitting a target FER. Coding gain
    between two configs = the difference of their answers."""
    import json

    from ..sim.findsnr import find_operating_point

    lo, hi = (float(x) for x in args.bracket.split(":")[:2])
    for code in args.code or ["dvbs2/64800/12"]:
        for decoder in args.decoder or ["layered/norm:0.8125/25"]:
            op = find_operating_point(
                code, decoder, target_fer=args.target_fer,
                bracket=(lo, hi), tol_db=args.tol_db, batch=args.batch,
                max_frames_per_probe=args.max_frames, channel=args.channel,
                backend=args.backend, seed=args.seed,
                progress=(lambda e, f, ci, n: print(
                    f"  probe {e:+.3f} dB: FER {f:.3e} "
                    f"[{ci[0]:.1e},{ci[1]:.1e}] over {n} frames",
                    flush=True)) if args.verbose else None,
            )
            print(json.dumps(op.json_dict()))
    return 0


def cmd_codes(args) -> int:
    from ..codes import list_codes

    if args.threshold:
        from ..codes import get_code
        from ..codes.threshold import bec_threshold, de_threshold_ebn0

        for spec_str in args.threshold:
            spec = get_code(spec_str)
            th = de_threshold_ebn0(spec)
            eps = bec_threshold(spec)
            print(f"{spec_str}: rate {spec.rate:.4f}, "
                  f"BP threshold (GA-DE) {th:+.3f} dB Eb/N0, "
                  f"BEC threshold (exact DE) eps*={eps:.4f} "
                  f"(capacity {1 - spec.rate:.4f})")
        return 0
    if args.info:
        import json

        from ..codes import get_code
        from ..codes.analyze import analyze, format_info

        for spec_str in args.info:
            info = analyze(get_code(spec_str), cycles=not args.no_cycles)
            print(json.dumps(info) if args.json else format_info(info))
        return 0
    for name in list_codes():
        print(name)
    return 0


def cmd_learn(args) -> int:
    """Train a per-iteration min-sum schedule (learn/noms.py) and write a
    schedule JSON loadable with learn.load_schedule(path) or usable as
    make_decoder(alpha=..., beta=...)."""
    import json

    import numpy as np

    from ..learn import train_noms

    if args.alpha_only and args.beta_only:
        raise SystemExit(
            "--alpha-only and --beta-only together freeze every parameter "
            "— nothing to train"
        )
    code = args.code[0] if args.code else "80211n/648/12"
    # --ebn0 here is a TRAINING BAND, not a sweep grid: 'lo:hi' is the
    # band's endpoints (parse_ebn0's 1-dB default step would collapse
    # '1.8:2.6' to a single point), and a comma list contributes its
    # min/max.
    if ":" in args.ebn0:
        parts = [float(x) for x in args.ebn0.split(":")[:2]]
        ebn0 = (min(parts), max(parts))
    else:
        ebn0 = parse_ebn0(args.ebn0)
    params, losses = train_noms(
        code, iters=args.iters, steps=args.steps, batch=args.batch,
        seed=args.seed, ebn0_range=(min(ebn0), max(ebn0)),
        init_alpha=args.init_alpha, lr=args.lr,
        learn_alpha=not args.beta_only, learn_beta=not args.alpha_only,
    )
    out = {
        "code": code,
        "decoder": "layered min-sum",
        "iters": args.iters,
        "alphas": [round(float(a), 6) for a in np.asarray(params.alphas)],
        "betas": [round(float(b), 6) for b in np.asarray(params.betas)],
        "trained": {
            "objective": "multi-iteration soft-BER (learn/noms.py)",
            "init_alpha": args.init_alpha, "steps": args.steps,
            "batch": args.batch, "lr": args.lr, "seed": args.seed,
            "ebn0_range_db": [min(ebn0), max(ebn0)],
        },
        "caveats": "code-specific; beta-bearing schedules are "
                   "SNR-band-specific - use within ebn0_range_db",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"loss {losses[:3].mean():.4f} -> {losses[-5:].mean():.4f}; "
          f"wrote {args.out}")
    print(f"use: decode.make_decoder(graph, 'layered', "
          f"alpha=learn.load_schedule({args.out!r}).alphas, "
          f"beta=..., max_iters={args.iters})")
    return 0


def cmd_trap(args) -> int:
    from ..sim.microscope import harvest

    code = args.code[0] if args.code else "mackay1008"
    decoder = args.decoder[0] if args.decoder else "minsum/norm:0.8125/25"
    rep = harvest(code, decoder, ebn0_db=args.ebn0, frames=args.frames,
                  batch=args.batch, seed=args.seed, channel=args.channel,
                  backend=args.backend)
    print(rep.summary())
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(rep.to_json(), f, indent=1)
        print(f"report -> {args.out}")
    return 0


def cmd_bench(args) -> int:
    code = args.code[0] if args.code else "dvbs2/64800/12"
    decoder = (args.decoder[0] if args.decoder
               else "minsum/norm:0.8125/25/noet")
    if args.ab:
        # interleaved A/B: cross product of the --code/--decoder lists
        from ..bench.ab import ab_compare

        arms = [(c, d) for c in (args.code or [code])
                for d in (args.decoder or [decoder])]
        if len(arms) < 2:
            raise SystemExit("--ab needs >=2 (code, decoder) combos — "
                             "repeat --code and/or --decoder")
        print(ab_compare(arms, batch=args.batch).json_line())
        return 0
    if args.pipeline:
        from ..bench.pipeline import run_pipeline_benchmark

        print(run_pipeline_benchmark(
            code=code, decoder=decoder, batch=args.batch).json_line())
        return 0
    from ..bench.throughput import run_benchmark

    result = run_benchmark(
        code=code,
        decoder=decoder,
        batch=args.batch,
        profile_dir=args.profile_dir,
    )
    print(result.json_line())
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ecc-sim", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--code", action="append", default=None,
                        help="code spec string (repeatable)")
        sp.add_argument("--decoder", action="append", default=None,
                        help="decoder spec string (repeatable)")
        sp.add_argument("--batch", type=int, default=256)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--backend", default=None,
                        help="decoder backend: xla | xla-mm | pallas | auto")
        sp.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace here")
        sp.add_argument("--verbose", "-v", action="store_true")

    sp = sub.add_parser("sweep", help="Monte-Carlo BER/FER sweep")
    common(sp)
    sp.add_argument("--ebn0", required=True, help="'0:4:0.5' or '1,2,3'")
    sp.add_argument("--channel", default="bpsk",
                    help="channel spec: bpsk | hard | bsc:P | qpsk | "
                         "8psk | qam16 | qam64 (chan/modem.py)")
    sp.add_argument("--min-frame-errors", type=int, default=100)
    sp.add_argument("--max-frames", type=int, default=1_000_000)
    sp.add_argument("--out", default=None, help="write results JSON here")
    sp.add_argument("--resume", default=None, help="sweep state file")
    sp.add_argument("--config", default=None,
                    help="JSON config file whose keys mirror these flags")
    sp.add_argument("--mesh", default=None,
                    help="pod-sharded sweep over a BATCHxSNR device mesh, "
                         "e.g. '4x2' (config 5); initializes multi-host "
                         "rendezvous when launched one process per host")
    sp.set_defaults(fn=cmd_sweep)

    sp = sub.add_parser(
        "codes", help="list registered code families / inspect a code"
    )
    sp.add_argument("--info", action="append", default=None,
                    help="code spec string to analyze (repeatable): degree "
                         "profiles, 4-cycle census, QC block shape")
    sp.add_argument("--json", action="store_true",
                    help="emit --info reports as JSON lines")
    sp.add_argument("--threshold", action="append", default=None,
                    help="print the asymptotic BP threshold (protograph "
                         "Gaussian-approximation density evolution) of a "
                         "code spec (repeatable)")
    sp.add_argument("--no-cycles", action="store_true",
                    help="skip the 4-cycle census (O(sum col_deg^2))")
    sp.set_defaults(fn=cmd_codes)

    sp = sub.add_parser(
        "compare", help="BER/FER-curve parity check between two result files"
    )
    sp.add_argument("results", nargs=2, help="two results JSON files")
    sp.set_defaults(fn=cmd_compare)

    sp = sub.add_parser("plot", help="ASCII waterfall curves from results")
    sp.add_argument("results", nargs="+", help="results JSON files")
    sp.add_argument("--metric", default="fer", choices=("fer", "ber"))
    sp.set_defaults(fn=cmd_plot)

    sp = sub.add_parser(
        "findsnr", help="find the Eb/N0 hitting a target FER (inverse sweep)")
    common(sp)
    sp.add_argument("--target-fer", type=float, default=1e-2)
    sp.add_argument("--bracket", default="0:6",
                    help="'lo:hi' Eb/N0 search bracket in dB")
    sp.add_argument("--tol-db", type=float, default=0.05)
    sp.add_argument("--max-frames", type=int, default=65536,
                    help="frame budget per probe point")
    sp.add_argument("--channel", default="bpsk",
                    help="channel spec (chan/modem.py)")
    sp.set_defaults(fn=cmd_findsnr)

    sp = sub.add_parser(
        "trap", help="harvest + classify decoder failures as (a,b) "
                     "trapping sets (error-floor microscopy)")
    common(sp)
    sp.add_argument("--ebn0", type=float, required=True)
    sp.add_argument("--frames", type=int, default=1 << 14)
    sp.add_argument("--channel", default="bpsk")
    sp.add_argument("--out", default=None, help="write report JSON here")
    sp.set_defaults(fn=cmd_trap)

    sp = sub.add_parser("bench", help="decoded-throughput benchmark")
    common(sp)
    sp.add_argument("--pipeline", action="store_true",
                    help="measure encoder + full encode->channel->decode "
                         "throughput instead of decode-only")
    sp.add_argument("--ab", action="store_true",
                    help="interleaved A/B comparison over the --code x "
                         "--decoder grid (the only drift-safe way to "
                         "compare two configs)")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser(
        "learn", help="train a per-iteration min-sum schedule (NOMS)"
    )
    common(sp)
    sp.add_argument("--ebn0", required=True,
                    help="training SNR band, e.g. '1.8:2.6' or '2.0,2.4'")
    sp.add_argument("--iters", type=int, default=25)
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--lr", type=float, default=1e-2)
    sp.add_argument("--init-alpha", type=float, default=0.8125)
    sp.add_argument("--alpha-only", action="store_true",
                    help="freeze betas at 0 (scale-invariant schedule)")
    sp.add_argument("--beta-only", action="store_true",
                    help="freeze alphas at init")
    sp.add_argument("--out", required=True, help="schedule JSON path")
    sp.set_defaults(fn=cmd_learn)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "code", None) is None:
        args.code = ["mackay1008"]
    if getattr(args, "decoder", None) is None:
        args.decoder = ["minsum/norm:0.8125/25"]
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
