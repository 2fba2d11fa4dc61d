"""Flexible-block-size (integral distribution) volume family.

The third distribution representation (SURVEY.md §0.3): for a user-chosen
block size, per-block histograms are assembled from power-of-two span
histograms via the integral-histogram identity. Two construction paths:

- :meth:`FlexibleBlockVolume.from_raw` — the raw volume is available: build a
  3-D prefix-sum integral histogram and query every block in O(1)
  (replacing the reference's 5-kernel pipeline d_divideBlock ->
  d_allocateSpace -> d_queryBlockNew -> d_querySpanNew -> d_computeBlock,
  volumeRender_kernel.cu:1735-1796, including its 194 s span-search
  bottleneck).

- :meth:`FlexibleBlockVolume.from_codebooks` — only the reference-format
  compressed span banks exist (fractal-coded spans >= 8 voxels + sparse
  "simple" spans < 8): decode both banks *once* (vectorized), hash the span
  lists, then per block run the corner/Fenwick decomposition and accumulate
  voxel-count-weighted span histograms with inclusion-exclusion signs —
  exactly the reference's algorithm with the search and the per-span redundant
  decode removed, and deterministic segment-sums instead of shared-memory
  atomics (volumeRender_kernel.cu:1320-1325, 1447).

Both paths end in clamp -> normalize -> (mean, variance, entropy) over the
[0, 255] 64-bin domain (d_computeBlock semantics,
volumeRender_kernel.cu:1041-1115).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vrdd_tpu.ops.fractal import fractal_decode_batch
from vrdd_tpu.ops.histogram import flex_block_stats, normalize_histogram
from vrdd_tpu.ops.integral import (
    block_corner_prefixes,
    build_span_index,
    divide_blocks,
    integral_histogram,
    prefix_box_decomposition,
    query_block_histogram,
    span_sizes,
)
from vrdd_tpu.ops.sparse import densify_sparse_histograms
from vrdd_tpu.utils.config import FLEX_N_BINS
from vrdd_tpu.utils.timing import StageTimer


@dataclasses.dataclass
class FlexibleBlockVolume:
    """Per-block (mean, variance, entropy) grid for a flexible block size."""

    stats_grid: jnp.ndarray  # (nZb, nYb, nXb, 3)
    block_size: int
    volume_dim: Tuple[int, int, int]  # (x, y, z) extents
    timings: Optional[Dict[str, float]] = None

    @property
    def n_blocks(self) -> Tuple[int, int, int]:
        return self.stats_grid.shape[:3]

    def stat_ranges(self) -> np.ndarray:
        """(3, 2) per-channel (min, max) over blocks — what bindToTex computes
        and prints for TF calibration (volumeRender_kernel.cu:1592-1622)."""
        g = np.asarray(self.stats_grid).reshape(-1, 3)
        return np.stack([g.min(axis=0), g.max(axis=0)], axis=-1)

    def normalized(self) -> "FlexibleBlockVolume":
        """Copy with the mean/variance channels min-max mapped to [0, 1].

        The reference stores flexible-block mean/variance in RAW bin-domain
        units (mean in [0, 255], variance up to ~2e3 for the 64-bin domain),
        leaving their normalization as an open TODO ("think about how to
        normalize mean", volumeRender_kernel.cu:1092, commented-out min/max
        mapping at :1102-1104) — so queries 9/0 render black until the user
        manually winds transferScale down. This applies exactly the mapping
        the reference left commented out, using the min/max bindToTex already
        computes. The entropy channel is left UNTOUCHED: it is already
        normalized to [0, 1] at decode (volumeRender_kernel.cu:1106-1115),
        and remapping it would change query 8 away from the reference.
        Constant channels (max == min) map to 0.
        """
        g = self.stats_grid
        lo = jnp.min(g.reshape(-1, 3), axis=0)
        hi = jnp.max(g.reshape(-1, 3), axis=0)
        span = jnp.where(hi > lo, hi - lo, 1.0)
        entropy = jnp.asarray([0.0, 0.0, 1.0], dtype=g.dtype)
        mapped = (g - lo) / span
        return dataclasses.replace(
            self, stats_grid=mapped * (1.0 - entropy) + g * entropy
        )

    # ---------------------------------------------------------------- raw path
    @classmethod
    def from_raw(
        cls,
        raw: np.ndarray,
        block_size: int,
        n_bins: int = FLEX_N_BINS,
        vmin: float = 0.0,
        vmax: float = 255.0,
    ) -> "FlexibleBlockVolume":
        """O(1)-per-block construction from a raw scalar volume ``(Z, Y, X)``."""
        timer = StageTimer()
        nz, ny, nx = raw.shape
        with timer.stage("divide_blocks"):
            spans = divide_blocks((nx, ny, nz), block_size)  # (nb, 6) 1-indexed
        with timer.stage("integral_histogram"):
            sat = integral_histogram(jnp.asarray(raw), n_bins, vmin, vmax)
        with timer.stage("query_blocks"):
            low = np.stack([spans[:, 2], spans[:, 1], spans[:, 0]], -1) - 1  # zyx
            high = np.stack([spans[:, 5], spans[:, 4], spans[:, 3]], -1) - 1
            counts = query_block_histogram(sat, jnp.asarray(low), jnp.asarray(high))
        with timer.stage("compute_block_stats"):
            hist, _ = normalize_histogram(counts)
            stats = flex_block_stats(hist)
        nbx = -(-nx // block_size)
        nby = -(-ny // block_size)
        nbz = -(-nz // block_size)
        grid = stats.reshape(nbz, nby, nbx, 3)
        return cls(grid, block_size, (nx, ny, nz), timer.as_dict())

    # ----------------------------------------------------------- codebook path
    @classmethod
    def from_codebooks(
        cls,
        *,
        volume_dim: Tuple[int, int, int],
        block_size: int,
        fractal_spans: np.ndarray,  # (F, 6) 1-indexed inclusive
        fractal_codebook: np.ndarray,  # (F, 4) templateId, shift, flip, nErrors
        fractal_error_bins: np.ndarray,  # (F, E)
        fractal_error_values: np.ndarray,  # (F, E)
        templates: np.ndarray,  # (T, n_bins)
        simple_spans: np.ndarray,  # (S, 6) 0-indexed inclusive (reference quirk)
        simple_bin_ids: np.ndarray,  # (S, E2)
        simple_freqs: np.ndarray,  # (S, E2)
        simple_counts: np.ndarray,  # (S,)
        n_bins: int = FLEX_N_BINS,
    ) -> "FlexibleBlockVolume":
        """Reference-format construction (span codebooks, no raw volume)."""
        timer = StageTimer()
        with timer.stage("decode_banks"):
            cb = np.asarray(fractal_codebook)
            fractal_hists = np.asarray(
                fractal_decode_batch(
                    jnp.asarray(templates)[cb[:, 0]],
                    jnp.asarray(cb[:, 1]),
                    jnp.asarray(cb[:, 2]),
                    jnp.asarray(fractal_error_bins),
                    jnp.asarray(fractal_error_values),
                    jnp.asarray(cb[:, 3]),
                )
            )
            simple_hists = np.asarray(
                densify_sparse_histograms(
                    jnp.asarray(simple_bin_ids),
                    jnp.asarray(simple_freqs),
                    jnp.asarray(simple_counts),
                    n_bins,
                )
            )
            bank = np.concatenate([fractal_hists, simple_hists], axis=0)

        with timer.stage("build_span_index"):
            index = build_span_index(np.asarray(fractal_spans))
            n_fractal = len(fractal_spans)
            # simple spans are stored 0-indexed (volumeRender_kernel.cu:1464-1471)
            simple_1idx = np.asarray(simple_spans) + 1
            for i, row in enumerate(simple_1idx):
                index[tuple(int(v) for v in row)] = n_fractal + i

        nx, ny, nz = volume_dim
        with timer.stage("divide_blocks"):
            spans = divide_blocks(volume_dim, block_size)

        with timer.stage("corner_decomposition"):
            entry_block: list = []
            entry_span: list = []
            entry_coef: list = []
            for b, span in enumerate(spans):
                for corner, sign in block_corner_prefixes(span):
                    if min(corner) <= 0:
                        continue  # empty prefix box
                    subs = prefix_box_decomposition(corner)
                    if len(subs) == 0:
                        continue
                    weights = span_sizes(subs).astype(np.float64)
                    for row, w in zip(subs, weights):
                        key = tuple(int(v) for v in row)
                        idx = index.get(key)
                        if idx is None:
                            raise KeyError(f"span {key} missing from codebooks")
                        entry_block.append(b)
                        entry_span.append(idx)
                        entry_coef.append(sign * w)

        with timer.stage("accumulate"):
            eb = jnp.asarray(np.asarray(entry_block, dtype=np.int32))
            es = jnp.asarray(np.asarray(entry_span, dtype=np.int32))
            ec = jnp.asarray(np.asarray(entry_coef, dtype=np.float32))
            contribs = jnp.asarray(bank)[es] * ec[:, None]
            counts = jnp.zeros((len(spans), n_bins), dtype=jnp.float32).at[eb].add(
                contribs
            )

        with timer.stage("compute_block_stats"):
            hist, _ = normalize_histogram(counts)
            stats = flex_block_stats(hist)

        nbx = -(-nx // block_size)
        nby = -(-ny // block_size)
        nbz = -(-nz // block_size)
        grid = stats.reshape(nbz, nby, nbx, 3)
        return cls(grid, block_size, volume_dim, timer.as_dict())
