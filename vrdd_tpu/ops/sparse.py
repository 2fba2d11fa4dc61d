"""Sparse ("simple") histogram densification.

The reference stores small-span histograms as (binId, freq) pairs with a
per-histogram nonzero count and densifies them during the span query
(volumeRender_kernel.cu:1476-1516, loader volumeRender.cpp:877-949). Here the
whole codebook densifies in one masked scatter as a precompute.
"""

from __future__ import annotations

import jax.numpy as jnp


def densify_sparse_histograms(
    bin_ids: jnp.ndarray,
    freqs: jnp.ndarray,
    counts: jnp.ndarray,
    n_bins: int,
) -> jnp.ndarray:
    """``(H, E) int, (H, E) float, (H,) int -> (H, n_bins)`` dense histograms.

    Entries beyond ``counts[h]`` are padding and ignored. Duplicate bin ids
    within one histogram overwrite in the reference (assignment, not add,
    volumeRender_kernel.cu:1515); ids are unique by construction so a masked
    scatter-add is equivalent and differentiable.
    """
    bin_ids = jnp.asarray(bin_ids, dtype=jnp.int32)
    freqs = jnp.asarray(freqs, dtype=jnp.float32)
    k = jnp.arange(bin_ids.shape[-1], dtype=jnp.int32)
    valid = k[None, :] < jnp.asarray(counts, dtype=jnp.int32)[:, None]
    masked = jnp.where(valid, freqs, 0.0)
    onehot = (bin_ids[..., None] == jnp.arange(n_bins, dtype=jnp.int32)).astype(jnp.float32)
    return jnp.einsum("he,hen->hn", masked, onehot)
