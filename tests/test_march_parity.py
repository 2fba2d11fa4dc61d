"""End-to-end parity: JAX scan marcher vs the numpy d_render re-implementation.

This is the PR1 gate from SURVEY.md §7.3: 64^3 synthetic Gaussian-blob scalar
volume, 256^2 (here 64^2 for speed) image, grayscale-ramp TF, CPU-runnable,
allclose vs the numpy re-implementation of d_render.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vrdd_tpu.core.geometry import (
    default_benchmark_inv_view,
    inv_view_from_rotation_translation,
)
from vrdd_tpu.core.transfer import default_transfer_function, grayscale_ramp
from vrdd_tpu.io.synthetic import gaussian_blob_volume, random_histogram_volume
from vrdd_tpu.march.reference_numpy import np_sample_trilinear, reference_render
from vrdd_tpu.march.scan import render_image
from vrdd_tpu.models.renderer import stats_sample_fn, scalar_sample_fn
from vrdd_tpu.ops.histogram import raw_block_stats
from vrdd_tpu.utils.config import MarchConfig


def _compare(vol_np, inv_view, tf, W=64, H=64, march=MarchConfig(), **params):
    ref = reference_render(
        lambda p: np_sample_trilinear(vol_np, p),
        inv_view,
        W,
        H,
        tf,
        max_steps=march.max_steps,
        tstep=march.tstep,
        opacity_threshold=march.opacity_threshold,
        **params,
    )
    got = render_image(
        scalar_sample_fn(jnp.asarray(vol_np)),
        jnp.asarray(inv_view),
        W,
        H,
        jnp.asarray(tf),
        jnp.float32(params.get("density", 0.05)),
        jnp.float32(params.get("brightness", 1.0)),
        jnp.float32(params.get("transfer_offset", 0.0)),
        jnp.float32(params.get("transfer_scale", 1.0)),
        march,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)
    assert np.asarray(got)[..., 3].max() > 0.05, "render should not be empty"


def test_scalar_volume_benchmark_view_grayscale():
    vol = gaussian_blob_volume((32, 32, 32), seed=0)
    _compare(vol, default_benchmark_inv_view(), grayscale_ramp(16))


def test_scalar_volume_rotated_view_rainbow_tf():
    vol = gaussian_blob_volume((32, 32, 32), seed=1)
    inv_view = inv_view_from_rotation_translation(30.0, -45.0, (0.2, -0.1, -3.5))
    _compare(
        vol,
        inv_view,
        default_transfer_function(),
        density=0.08,
        brightness=1.2,
        transfer_offset=0.05,
        transfer_scale=1.3,
    )


def test_early_termination_parity():
    # high density forces opacity cutoff inside the volume
    vol = np.ones((8, 8, 8), dtype=np.float32) * 0.9
    _compare(
        vol,
        default_benchmark_inv_view(),
        grayscale_ramp(4),
        density=0.9,
    )


def test_histogram_stats_volume_parity():
    """Queries 1/2/3: stats volume trilinear fetch, vs numpy path."""
    hist = random_histogram_volume((10, 12, 12), seed=3)
    stats = np.asarray(raw_block_stats(jnp.asarray(hist)))
    tf = default_transfer_function()
    inv_view = default_benchmark_inv_view()
    for ch in range(3):
        ref = reference_render(
            lambda p: np_sample_trilinear(stats, p)[..., ch],
            inv_view,
            48,
            48,
            tf,
        )
        got = render_image(
            stats_sample_fn(jnp.asarray(stats), ch),
            jnp.asarray(inv_view),
            48,
            48,
            jnp.asarray(tf),
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_march_gradients_finite_difference():
    """Gradient of a pixel-loss w.r.t. volume matches finite differences."""
    vol = gaussian_blob_volume((8, 8, 8), seed=4)
    march = MarchConfig(max_steps=50, tstep=0.05)
    tf = jnp.asarray(grayscale_ramp(8))
    inv_view = jnp.asarray(default_benchmark_inv_view())

    def loss(v):
        img = render_image(
            scalar_sample_fn(v), inv_view, 8, 8, tf, 0.3, 1.0, 0.0, 1.0, march
        )
        return jnp.sum(img**2)

    v0 = jnp.asarray(vol)
    g = jax.grad(loss)(v0)
    rng = np.random.default_rng(0)
    idxs = [tuple(rng.integers(0, 8, size=3)) for _ in range(4)]
    eps = 1e-3
    for idx in idxs:
        dv = np.zeros_like(vol)
        dv[idx] = eps
        fd = (float(loss(v0 + dv)) - float(loss(v0 - dv))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=5e-2, atol=1e-4)


def test_brightness_not_applied_to_missed_rays():
    # camera inside looking away: some rays miss -> stay exactly zero
    vol = np.ones((4, 4, 4), dtype=np.float32)
    inv_view = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 10.0]], dtype=np.float32
    )
    got = np.asarray(
        render_image(
            scalar_sample_fn(jnp.asarray(vol)),
            jnp.asarray(inv_view),
            16,
            16,
            jnp.asarray(grayscale_ramp(4)),
            0.05,
            5.0,
        )
    )
    ref = reference_render(
        lambda p: np_sample_trilinear(vol, p),
        inv_view,
        16,
        16,
        grayscale_ramp(4),
        brightness=5.0,
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
