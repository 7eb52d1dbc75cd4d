"""Pod-sharded sweep driver tests (config 5; SURVEY.md §4.2 item 4)."""
import jax
import numpy as np
import pytest

from ecc_ldpc_tpu.dist import MeshSpec, make_mesh
from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec
from ecc_ldpc_tpu.sim.runner import run_sweep_sharded

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _spec(**kw):
    d = dict(
        code="gallager/96/3/6/s1",
        decoder="minsum/10",
        ebn0_db=(1.0, 4.0),
        batch=64,
        stopping=StoppingRule(min_frame_errors=5, max_frames=192),
    )
    d.update(kw)
    return SweepSpec(**d)


def test_sharded_sweep_runs_and_is_mesh_invariant():
    r82 = run_sweep_sharded(_spec(), make_mesh(MeshSpec(batch=4, snr=2)))
    r41 = run_sweep_sharded(_spec(), make_mesh(
        MeshSpec(batch=2, snr=2), devices=jax.devices()[:4]))
    for a, b in zip(r82, r41):
        assert a.frames == b.frames
        assert a.bit_errors == b.bit_errors
        assert a.frame_errors == b.frame_errors


def test_sharded_sweep_stopping():
    res = run_sweep_sharded(
        _spec(stopping=StoppingRule(min_frame_errors=10**9, max_frames=128)),
        make_mesh(MeshSpec(batch=4, snr=2)),
    )
    assert all(r.frames == 128 for r in res)


def test_sharded_sweep_resume(tmp_path):
    state = str(tmp_path / "s.json")
    mesh = make_mesh(MeshSpec(batch=4, snr=2))
    full = run_sweep_sharded(
        _spec(stopping=StoppingRule(min_frame_errors=10**9, max_frames=256)),
        mesh,
    )
    run_sweep_sharded(
        _spec(stopping=StoppingRule(min_frame_errors=10**9, max_frames=128)),
        mesh, resume_path=state,
    )
    resumed = run_sweep_sharded(
        _spec(stopping=StoppingRule(min_frame_errors=10**9, max_frames=256)),
        mesh, resume_path=state,
    )
    for a, b in zip(full, resumed):
        assert a.frames == b.frames and a.bit_errors == b.bit_errors


def test_sharded_sweep_nr_with_masks():
    """Punctured/shortened codes through the sharded path."""
    res = run_sweep_sharded(
        _spec(code="nr5g/bg2/16", decoder="minsum/norm:0.8125/15",
              ebn0_db=(3.0, 5.0), batch=32,
              stopping=StoppingRule(min_frame_errors=2, max_frames=64)),
        make_mesh(MeshSpec(batch=4, snr=2)),
    )
    assert all(r.frames >= 32 for r in res)


def test_grid_mismatch_rejected():
    with pytest.raises(ValueError):
        run_sweep_sharded(
            _spec(ebn0_db=(1.0, 2.0, 3.0)),
            make_mesh(MeshSpec(batch=4, snr=2)),
        )


def test_sharded_sweep_spa_on_qc_code():
    """Composition: pod-sharded sweep with the roll-form exact-BP decoder
    on a QC code (the runner's QC-graph routing under shard_map)."""
    res = run_sweep_sharded(
        _spec(code="80211n/648/12", decoder="spa/10",
              ebn0_db=(2.0, 3.0), batch=32,
              stopping=StoppingRule(min_frame_errors=1, max_frames=64)),
        make_mesh(MeshSpec(batch=4, snr=2)),
    )
    assert len(res) == 2
    assert all(r.frames >= 32 for r in res)
    assert res[1].frame_errors <= res[0].frame_errors


def test_sharded_sweep_channel_spec_mesh_invariant():
    """Non-default channel specs route through chan.modem in the sharded
    step (per-frame vmap) and stay mesh-shape-invariant."""
    for channel in ("hard", "bsc:0.02"):
        r82 = run_sweep_sharded(
            _spec(channel=channel), make_mesh(MeshSpec(batch=4, snr=2)))
        r41 = run_sweep_sharded(
            _spec(channel=channel), make_mesh(
                MeshSpec(batch=2, snr=2), devices=jax.devices()[:4]))
        assert sum(r.frame_errors for r in r82) > 0  # noisy channels do err
        for a, b in zip(r82, r41):
            assert a.frames == b.frames
            assert a.bit_errors == b.bit_errors
            assert a.frame_errors == b.frame_errors
