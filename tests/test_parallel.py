"""Distributed rendering / training tests on a virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vrdd_tpu.core.geometry import (
    default_benchmark_inv_view,
    inv_view_from_rotation_translation,
)
from vrdd_tpu.core.transfer import default_transfer_function, grayscale_ramp
from vrdd_tpu.io.synthetic import gaussian_blob_volume
from vrdd_tpu.march.scan import render_image
from vrdd_tpu.models.renderer import stats_sample_fn
from vrdd_tpu.parallel.bricks import distributed_render_image, shard_stats_volume
from vrdd_tpu.parallel.mesh import make_mesh
from vrdd_tpu.parallel.train import make_tf_fit_step, shard_target_image
from vrdd_tpu.utils.config import MarchConfig


def _stats_from_blob(n=16, seed=0):
    vol = gaussian_blob_volume((n, n, n), seed=seed)
    stats = np.stack([vol, vol * 0.5, 1.0 - vol], axis=-1).astype(np.float32)
    return jnp.asarray(stats)


def _single_device_image(stats, inv_view, W, H, tf, ch, march, **p):
    return render_image(
        stats_sample_fn(stats, ch),
        jnp.asarray(inv_view),
        W,
        H,
        jnp.asarray(tf),
        jnp.float32(p.get("density", 0.05)),
        jnp.float32(p.get("brightness", 1.0)),
        jnp.float32(p.get("transfer_offset", 0.0)),
        jnp.float32(p.get("transfer_scale", 1.0)),
        march,
    )


@pytest.mark.parametrize("bricks,rays", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_distributed_matches_single_device(bricks, rays):
    if len(jax.devices()) < bricks * rays:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(bricks, rays)
    stats = _stats_from_blob(16)
    inv_view = default_benchmark_inv_view()
    tf = default_transfer_function()
    march = MarchConfig()
    for ch in (0, 2):
        want = _single_device_image(stats, inv_view, 32, 32, tf, ch, march)
        got = distributed_render_image(
            shard_stats_volume(stats, mesh),
            jnp.asarray(inv_view),
            jnp.asarray(tf),
            jnp.float32(0.05),
            jnp.float32(1.0),
            jnp.float32(0.0),
            jnp.float32(1.0),
            width=32,
            height=32,
            channel=ch,
            march=march,
            mesh=mesh,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_distributed_rotated_view_rays_cross_bricks():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(4, 2)
    stats = _stats_from_blob(16, seed=3)
    # oblique view: rays traverse multiple Z slabs in both directions
    inv_view = inv_view_from_rotation_translation(50.0, 30.0, (0.1, 0.0, -3.0))
    tf = default_transfer_function()
    march = MarchConfig()
    want = _single_device_image(stats, inv_view, 32, 32, tf, 0, march)
    got = distributed_render_image(
        shard_stats_volume(stats, mesh),
        jnp.asarray(inv_view),
        jnp.asarray(tf),
        jnp.float32(0.05),
        jnp.float32(1.0),
        jnp.float32(0.0),
        jnp.float32(1.0),
        width=32,
        height=32,
        channel=0,
        march=march,
        mesh=mesh,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_distributed_early_termination_exact():
    """Two-pass cutoff handling makes saturating rays exact across bricks."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(2, 4)
    stats = jnp.ones((8, 8, 8, 3), dtype=jnp.float32) * 0.9
    inv_view = default_benchmark_inv_view()
    tf = grayscale_ramp(4)
    march = MarchConfig()
    want = np.asarray(
        _single_device_image(stats, inv_view, 16, 16, tf, 0, march, density=0.9)
    )
    got = np.asarray(
        distributed_render_image(
            shard_stats_volume(stats, mesh),
            jnp.asarray(inv_view),
            jnp.asarray(tf),
            jnp.float32(0.9),
            jnp.float32(1.0),
            jnp.float32(0.0),
            jnp.float32(1.0),
            width=16,
            height=16,
            channel=0,
            march=march,
            mesh=mesh,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tf_fit_step_reduces_loss():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(2, 4)
    stats = shard_stats_volume(_stats_from_blob(8, seed=5), mesh)
    inv_view = jnp.asarray(default_benchmark_inv_view())
    march = MarchConfig(max_steps=60, tstep=0.05)
    target_tf = default_transfer_function()
    target = distributed_render_image(
        stats, inv_view, jnp.asarray(target_tf),
        jnp.float32(0.05), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0),
        width=16, height=16, channel=0, march=march, mesh=mesh,
    )
    target = shard_target_image(target, mesh)

    init_fn, step_fn = make_tf_fit_step(mesh, 16, 16, channel=0, march=march)
    params, opt_state = init_fn(grayscale_ramp(9))
    losses = []
    for _ in range(30):
        params, opt_state, loss = step_fn(params, opt_state, stats, inv_view, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
