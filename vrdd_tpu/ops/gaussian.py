"""Gaussian-moment distribution decode.

The north-star configuration stores per-voxel ``(mu, sigma)`` instead of a full
histogram (BASELINE.json config 3). Decode maps moments to the same
(mean, variance, entropy) stat triple the histogram paths produce, so every
query method downstream is representation-agnostic.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_stats(mu: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """``(...,), (...,) -> (..., 3)``: mean, variance, normalized diff. entropy.

    Differential entropy of N(mu, sigma^2) is ``0.5 * log2(2*pi*e*sigma^2)``;
    we squash it to [0, 1) with a logistic so it is comparable to the
    normalized Shannon entropies of the histogram paths.

    NOTE: the entropy channel is a FRAMEWORK EXTENSION with no reference
    semantics to anchor it — the reference has no Gaussian-moment
    representation at all (its three families are raw/fractal/flexible
    histograms, volumeRender.cpp:129); the ``/ 8.0`` logistic temperature is
    a design choice (sigma = 1 maps to ~0.57, the dynamic range of
    float32-scaled data lands in the logistic's linear region) pinned by
    ``tests/test_ops.py::test_gaussian_stats_pinned_constants`` so it cannot
    drift silently.
    """
    var = sigma * sigma
    ent_bits = 0.5 * jnp.log2(2.0 * jnp.pi * jnp.e * jnp.maximum(var, 1e-12))
    ent01 = jax_sigmoid(ent_bits / 8.0)
    return jnp.stack([mu, var, ent01], axis=-1)


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))
