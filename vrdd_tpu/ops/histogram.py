"""Histogram -> (mean, variance, entropy) decode ops.

These are the distribution-decode building blocks of the framework — the TPU
equivalent of d_basicDataProcessing / d_computeBlock. All functions operate on
a trailing bins axis, broadcast over any leading shape (so the whole volume
decodes as one fused VPU pass), and are differentiable.

The reference's quirky normalizations are preserved bit-for-bit for parity
(SURVEY.md "hard parts (d)"):

- raw path (volumeRender_kernel.cu:742-769): mean uses bin *centers*
  ``binWidth * i + binWidth / 2``, variance uses bin *left edges*
  ``(i / nBins) * MaxHistogram`` against that mean; then ``mean /= 0.0217``,
  ``variance /= 0.000021``; entropy is Shannon/log2(nBins).
- fractal path (volumeRender_kernel.cu:841-867): mean AND variance both use
  bin centers; same normalizers.
- flexible path (volumeRender_kernel.cu:1083-1115): 64 bins over [0, 255],
  centers for both, NO mean/variance normalization, entropy/log2(64).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vrdd_tpu.utils.config import (
    FLEX_MAX_HISTOGRAM,
    FLEX_N_BINS,
    MAX_HISTOGRAM,
    MEAN_NORM,
    N_BINS,
    VARIANCE_NORM,
)


def _bin_centers(n_bins: int, vmax: float) -> jnp.ndarray:
    bin_width = vmax / n_bins
    i = jnp.arange(n_bins, dtype=jnp.float32)
    return bin_width * i + bin_width / 2.0


def _bin_left_edges(n_bins: int, vmax: float) -> jnp.ndarray:
    i = jnp.arange(n_bins, dtype=jnp.float32)
    return (i / n_bins) * vmax


def histogram_entropy(hist: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Normalized Shannon entropy ``-sum p log2 p / log2(n)``; 0-bins contribute 0."""
    safe = jnp.where(hist > 0.0, hist, 1.0)
    ent = -jnp.sum(hist * jnp.log2(safe), axis=-1)
    return ent / jnp.log2(jnp.float32(n_bins))


def _select_stats(builders, channels):
    """Stack only the requested stat channels (0=mean, 1=var, 2=entropy).

    ``channels=None`` keeps the full (..., 3) layout. Explicit selection
    exists because XLA does NOT reliably dead-code-eliminate the unused
    channels through a ``stack(...)[..., c]`` pattern inside larger
    differentiated graphs — measured 18.5 ms vs ~4 ms for a mean-only
    decode+grad of a 256^3 x 16-bin volume — so callers on a hot path
    should ask for exactly what they read."""
    if channels is None:
        channels = (0, 1, 2)
    return jnp.stack([builders[c]() for c in channels], axis=-1)


def raw_block_stats(hist: jnp.ndarray, channels=None) -> jnp.ndarray:
    """Raw-histogram decode: ``(..., N_BINS) -> (..., len(channels))``
    (default all three: mean, var, entropy)."""
    centers = _bin_centers(N_BINS, MAX_HISTOGRAM)
    edges = _bin_left_edges(N_BINS, MAX_HISTOGRAM)
    mean = jnp.sum(hist * centers, axis=-1)
    return _select_stats([
        lambda: mean / MEAN_NORM,
        lambda: jnp.sum(
            hist * (edges - mean[..., None]) ** 2, axis=-1) / VARIANCE_NORM,
        lambda: histogram_entropy(hist, N_BINS),
    ], channels)


def fractal_block_stats(hist: jnp.ndarray, channels=None) -> jnp.ndarray:
    """Fractal-decoded-histogram stats: centers for mean AND variance."""
    centers = _bin_centers(N_BINS, MAX_HISTOGRAM)
    mean = jnp.sum(hist * centers, axis=-1)
    return _select_stats([
        lambda: mean / MEAN_NORM,
        lambda: jnp.sum(
            hist * (centers - mean[..., None]) ** 2, axis=-1) / VARIANCE_NORM,
        lambda: histogram_entropy(hist, N_BINS),
    ], channels)


def flex_block_stats(hist: jnp.ndarray, channels=None) -> jnp.ndarray:
    """Flexible-block stats over [0, 255], unnormalized mean/variance.

    Bin count is inferred from the trailing axis (64 in the reference,
    volumeRender_kernel.cu:1083-1115).
    """
    n_bins = hist.shape[-1]
    centers = _bin_centers(n_bins, FLEX_MAX_HISTOGRAM)
    mean = jnp.sum(hist * centers, axis=-1)
    return _select_stats([
        lambda: mean,
        lambda: jnp.sum(hist * (centers - mean[..., None]) ** 2, axis=-1),
        lambda: histogram_entropy(hist, n_bins),
    ], channels)


def normalize_histogram(hist: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp negatives to 0 and renormalize to sum 1 (guarding empty histograms).

    Mirrors the clamp-then-renormalize in d_computeBlock
    (volumeRender_kernel.cu:1047-1081). Returns ``(normalized, total)``.
    """
    hist = jnp.maximum(hist, 0.0)
    total = jnp.sum(hist, axis=-1, keepdims=True)
    normed = jnp.where(total > 0.0, hist / jnp.where(total > 0.0, total, 1.0), hist)
    return jnp.clip(normed, 0.0, 1.0), total[..., 0]
