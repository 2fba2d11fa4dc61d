"""Gradient parity: analytic custom VJP of the slice sweep vs plain autodiff.

The slice sweep (vrdd_tpu/march/slice.py) ships an analytic O(1)-memory
backward built from the associativity of front-to-back "over" compositing.
These tests pin it against JAX autodiff through the identical primal
(``use_custom_vjp=False``) for every differentiable input: volume, TF LUT,
density, brightness, transfer offset/scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrdd_tpu.core.transfer import default_transfer_function, grayscale_ramp
from vrdd_tpu.march.slice import slice_render_image


def _loss(use_custom_vjp, tf_name="rainbow", **overrides):
    tf = jnp.asarray(
        default_transfer_function() if tf_name == "rainbow" else grayscale_ramp(8)
    )
    o = jnp.asarray([0.1, -0.05, 4.0])
    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.random((48, 48, 4), dtype=np.float32))

    def f(vol, lut, density, brightness, toff, tscl):
        img = slice_render_image(
            vol, o, 48, 48, lut,
            density=density, brightness=brightness,
            transfer_offset=toff, transfer_scale=tscl,
            n_planes=overrides.get("n_planes", 24),
            plane_chunk=overrides.get("plane_chunk", 8),
            use_custom_vjp=use_custom_vjp,
        )
        return jnp.sum((img - target) ** 2)

    return f, tf


@pytest.mark.parametrize("tf_name", ["rainbow", "gray"])
@pytest.mark.parametrize("density", [0.2, 3.0])  # low + saturating (early term)
def test_custom_vjp_matches_autodiff(tf_name, density):
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.random((8, 16, 16), dtype=np.float32))
    args = (
        vol, None, jnp.float32(density), jnp.float32(1.2),
        jnp.float32(0.02), jnp.float32(1.1),
    )
    grads = {}
    for custom in (False, True):
        f, tf = _loss(custom, tf_name)
        a = tuple(tf if x is None else x for x in args)
        grads[custom] = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(*a)
    for name, ga, gc in zip(
        ("volume", "lut", "density", "brightness", "toff", "tscl"),
        grads[False], grads[True],
    ):
        ga, gc = np.asarray(ga), np.asarray(gc)
        scale = max(np.abs(ga).max(), 1e-6)
        assert np.allclose(ga, gc, atol=2e-4 * scale, rtol=2e-4), (
            name, np.abs(ga - gc).max(), scale,
        )


def test_custom_vjp_primal_identical():
    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.random((8, 16, 16), dtype=np.float32))
    tf = jnp.asarray(default_transfer_function())
    o = jnp.asarray([0.0, 0.0, 4.0])
    a = np.asarray(slice_render_image(vol, o, 32, 32, tf, use_custom_vjp=True))
    b = np.asarray(slice_render_image(vol, o, 32, 32, tf, use_custom_vjp=False))
    np.testing.assert_array_equal(a, b)
