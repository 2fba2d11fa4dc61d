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
    h, e = bin_ids.shape
    k = jnp.arange(e, dtype=jnp.int32)
    valid = k[None, :] < jnp.asarray(counts, dtype=jnp.int32)[:, None]
    masked = jnp.where(valid, freqs, 0.0)
    # row-wise scatter-add (a (H, E, n_bins) one-hot einsum materializes
    # H*E*n_bins floats — 2 GB for the 64^3 Fuel-scale bank at E = 64)
    rows = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, e))
    return (
        jnp.zeros((h, n_bins), dtype=jnp.float32)
        .at[rows, bin_ids].add(masked)
    )
