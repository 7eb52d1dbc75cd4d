"""Pallas RDMA ring collective tests (interpret mode on a virtual mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.dist.ring import ring_allreduce

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 (virtual) devices"
)

P = jax.sharding.PartitionSpec


def _sharded(x, mesh):
    return jax.device_put(x, jax.sharding.NamedSharding(mesh, P("batch")))


@pytest.mark.parametrize("D", [2, 4])
def test_ring_allreduce_sums(D):
    mesh = jax.make_mesh((D,), ("batch",), devices=jax.devices()[:D])
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(D, 16, 128)).astype(np.float32)
    )
    y = ring_allreduce(_sharded(x, mesh), mesh)
    want = np.broadcast_to(np.asarray(x).sum(axis=0), x.shape)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6)


def test_ring_single_device_degenerates():
    mesh = jax.make_mesh((1,), ("batch",), devices=jax.devices()[:1])
    x = jnp.ones((1, 8, 128))
    y = ring_allreduce(_sharded(x, mesh), mesh)
    assert np.array_equal(np.asarray(y), np.asarray(x))
