"""Worker for tests/dist/test_multiprocess.py: one process of a 2-process
CPU-collective (gloo) mesh running the pod-sharded sweep driver.

Run as: python mp_worker.py <process_id> <num_processes> <port> <outfile>
Each process owns 4 virtual CPU devices (global mesh: 8 devices, batch=4 x
snr=2). Process 0 writes the per-point counters to <outfile> as JSON.
"""
import json
import sys


def main() -> int:
    proc, nproc, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ecc_ldpc_tpu.dist import maybe_init_distributed

    maybe_init_distributed(
        coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=proc
    )
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    from ecc_ldpc_tpu.dist import MeshSpec, make_mesh
    from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec
    from ecc_ldpc_tpu.sim.runner import run_sweep_sharded

    mesh = make_mesh(MeshSpec(batch=-1, snr=2))
    spec = SweepSpec(
        code="gallager/96/3/6/s8",
        decoder="minsum/norm:0.8125/10",
        ebn0_db=(2.0, 4.0),
        batch=32,
        seed=1234,
        stopping=StoppingRule(min_frame_errors=10**9, max_frames=64),
        backend="xla",
    )
    results = run_sweep_sharded(spec, mesh)
    if proc == 0:
        with open(outfile, "w") as f:
            json.dump(
                [
                    {
                        "ebn0_db": r.ebn0_db,
                        "frames": r.frames,
                        "bit_errors": r.bit_errors,
                        "frame_errors": r.frame_errors,
                        "iters_sum": r.iters_sum,
                    }
                    for r in results
                ],
                f,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
