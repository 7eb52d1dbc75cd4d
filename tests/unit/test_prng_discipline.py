"""PRNG key-discipline tests (SURVEY.md §5.2): every random stream is
derived by fold_in from global indices; streams must be pairwise disjoint
and mesh-shape independent."""
import jax
import jax.numpy as jnp
import numpy as np

from ecc_ldpc_tpu.dist.montecarlo import per_frame_keys


def test_frame_key_streams_disjoint():
    root = jax.random.key(0)
    a = per_frame_keys(root, 0, 64)
    b = per_frame_keys(root, 64, 64)
    ka = np.asarray(jax.random.key_data(a))
    kb = np.asarray(jax.random.key_data(b))
    seen = {tuple(k) for k in ka.reshape(64, -1)}
    assert len(seen) == 64
    assert not seen & {tuple(k) for k in kb.reshape(64, -1)}


def test_frame_keys_depend_only_on_global_index():
    root = jax.random.key(7)
    # frames [32..64) computed as one chunk or two chunks — identical keys
    whole = np.asarray(jax.random.key_data(per_frame_keys(root, 32, 32)))
    parts = np.concatenate([
        np.asarray(jax.random.key_data(per_frame_keys(root, 32, 16))),
        np.asarray(jax.random.key_data(per_frame_keys(root, 48, 16))),
    ])
    assert np.array_equal(whole, parts)


def test_point_streams_disjoint_across_points():
    root = jax.random.key(1)
    k0 = jax.random.fold_in(root, 0)
    k1 = jax.random.fold_in(root, 1)
    a = np.asarray(jax.random.key_data(per_frame_keys(k0, 0, 32))).reshape(32, -1)
    b = np.asarray(jax.random.key_data(per_frame_keys(k1, 0, 32))).reshape(32, -1)
    assert not ({tuple(x) for x in a} & {tuple(x) for x in b})
