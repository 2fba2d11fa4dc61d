"""CUDA-texture-semantics sampling tests (clamp + linear filter model)."""

import numpy as np
import jax.numpy as jnp

from vrdd_tpu.core.sampling import (
    sample_linear_1d,
    sample_nearest_3d,
    sample_trilinear_3d,
    sample_trilinear_3d_unnormalized,
)


def test_linear_1d_texel_centers_exact():
    lut = jnp.asarray(np.arange(8, dtype=np.float32))
    # texel centers are at u = (i + 0.5) / N
    u = (jnp.arange(8, dtype=jnp.float32) + 0.5) / 8.0
    np.testing.assert_allclose(np.asarray(sample_linear_1d(lut, u)), np.arange(8), atol=1e-6)


def test_linear_1d_midpoint_blend_and_clamp():
    lut = jnp.asarray(np.array([0.0, 1.0], dtype=np.float32))
    out = sample_linear_1d(lut, jnp.asarray([0.5, 0.0, 1.0, -1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out), [0.5, 0.0, 1.0, 0.0, 1.0], atol=1e-6)


def test_trilinear_matches_manual_lerp():
    rng = np.random.default_rng(0)
    vol = rng.random((4, 5, 6)).astype(np.float32)
    # sample exactly at voxel centers -> exact values
    z, y, x = 2, 3, 4
    p01 = jnp.asarray([[(x + 0.5) / 6, (y + 0.5) / 5, (z + 0.5) / 4]], dtype=jnp.float32)
    out = sample_trilinear_3d(jnp.asarray(vol), p01)
    np.testing.assert_allclose(np.asarray(out), [vol[z, y, x]], rtol=1e-5)
    # halfway between two voxel centers along x -> average
    p01 = jnp.asarray([[(x + 1.0) / 6, (y + 0.5) / 5, (z + 0.5) / 4]], dtype=jnp.float32)
    out = sample_trilinear_3d(jnp.asarray(vol), p01)
    np.testing.assert_allclose(
        np.asarray(out), [(vol[z, y, x] + vol[z, y, x + 1]) / 2], rtol=1e-5
    )


def test_trilinear_edge_clamp():
    vol = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 2, 2))
    out = sample_trilinear_3d(vol, jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 7.0], atol=1e-6)


def test_nearest_floor_semantics():
    vol = jnp.asarray(np.arange(27, dtype=np.float32).reshape(3, 3, 3))
    # u in [i/N, (i+1)/N) -> texel i
    out = sample_nearest_3d(vol, jnp.asarray([[0.34, 0.0, 0.99], [0.99, 0.34, 0.0]]))
    np.testing.assert_allclose(np.asarray(out), [2 * 9 + 0 * 3 + 1, 0 * 9 + 1 * 3 + 2])


def test_unnormalized_matches_normalized():
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.random((4, 4, 4)).astype(np.float32))
    p01 = jnp.asarray(rng.random((16, 3)).astype(np.float32))
    a = sample_trilinear_3d(vol, p01)
    b = sample_trilinear_3d_unnormalized(vol, p01 * 4.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_trilinear_gradient_flows_to_volume():
    import jax

    vol = jnp.ones((3, 3, 3), dtype=jnp.float32)
    p01 = jnp.asarray([[0.5, 0.5, 0.5]])

    def loss(v):
        return sample_trilinear_3d(v, p01).sum()

    g = jax.grad(loss)(vol)
    np.testing.assert_allclose(float(g.sum()), 1.0, rtol=1e-5)
