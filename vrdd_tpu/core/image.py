"""Image conversion / packing (outside the differentiable path).

Mirrors rgbaFloatToInt (volumeRender_kernel.cu:186-193): saturate to [0, 1]
then *truncate* ``uint(c * 255)`` — not round — so golden-image comparisons
against the reference tolerance model (eps 5/255, 30% outliers) line up.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgba_to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """float RGBA (..., 4) -> uint8 (..., 4) with saturate + truncation."""
    return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def pack_abgr(img: jnp.ndarray) -> jnp.ndarray:
    """float RGBA (..., 4) -> packed uint32 ABGR words (d_output layout)."""
    b = rgba_to_uint8(img).astype(jnp.uint32)
    return (b[..., 3] << 24) | (b[..., 2] << 16) | (b[..., 1] << 8) | b[..., 0]
