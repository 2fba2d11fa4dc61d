"""User-facing renderer: volumes + query methods -> images.

Replaces the reference's app shell (GLUT loop + render() orchestration,
volumeRender.cpp:194-295) with a jit-compiled offline renderer. The
``queryMethod`` keyboard selector (volumeRender.cpp:302-384) becomes an
explicit argument; each method builds a ``sample_fn`` closed over the relevant
precomputed stats volume, exactly like d_render's per-method texture fetches
(volumeRender_kernel.cu:581-680).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vrdd_tpu.core.geometry import default_benchmark_inv_view
from vrdd_tpu.core.sampling import (
    sample_nearest_3d,
    sample_trilinear_3d,
    sample_trilinear_3d_unnormalized,
)
from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.march.scan import render_image
from vrdd_tpu.utils.config import (
    INTERP_MEAN_SCALE,
    MAX_HISTOGRAM,
    N_BINS,
    MarchConfig,
    QueryMethod,
    RenderConfig,
    query_channel,
)

SampleFn = Callable[[jnp.ndarray], jnp.ndarray]


def scalar_sample_fn(values: jnp.ndarray, linear: bool = True) -> SampleFn:
    """Sampling of a plain scalar volume ``(Z, Y, X)``; ``linear=False`` is
    the point-filter mode of the reference's 'f' key (setTextureFilterMode,
    volumeRender.cpp:311-314)."""

    def f(p01: jnp.ndarray) -> jnp.ndarray:
        if linear:
            return sample_trilinear_3d(values, p01)
        return sample_nearest_3d(values, p01)

    return f


def stats_sample_fn(
    stats_vol: jnp.ndarray, channel: int, linear: bool = True
) -> SampleFn:
    """Channel fetch from a (Z, Y, X, 3) stats volume — queries 1-6 semantics
    (linear-filtered float4 fetch then channel select,
    volumeRender_kernel.cu:600-652); ``linear=False`` is the point-filter
    mode of the reference's 'f' key (volumeRender.cpp:311-314)."""

    def f(p01: jnp.ndarray) -> jnp.ndarray:
        if linear:
            return sample_trilinear_3d(stats_vol, p01)[..., channel]
        return sample_nearest_3d(stats_vol, p01)[..., channel]

    return f


def flex_sample_fn(flex_stats: jnp.ndarray, channel: int) -> SampleFn:
    """Flexible-block fetch — queries 8/9/0 semantics.

    ``flex_stats`` is the compact ``(nZb, nYb, nXb, 3)`` per-block stats grid.
    The reference scatters it into a zero 500^3 array and samples with
    *unnormalized* coords ``p01 * nFlexBlock`` under linear filtering
    (volumeRender_kernel.cu:654-680, 1637-1691); the zero padding past the last
    block is visible at the far faces, so we pad one zero layer on each high
    side and reproduce the unnormalized fetch.
    """
    nzb, nyb, nxb = flex_stats.shape[:3]
    padded = jnp.pad(flex_stats, ((0, 1), (0, 1), (0, 1), (0, 0)))
    scale = jnp.asarray([nxb, nyb, nzb], dtype=jnp.float32)

    def f(p01: jnp.ndarray) -> jnp.ndarray:
        return sample_trilinear_3d_unnormalized(padded, p01 * scale)[..., channel]

    return f


def interp_mean_volume(histograms: jnp.ndarray) -> jnp.ndarray:
    """Query-7 scalar field: per-block histogram means x50 ``(Z, Y, X)``.

    The decode half of the reference's query 7 (volumeRender_kernel.cu:
    354-367, x50 at :479). The mean is linear in the histogram, so
    interpolating this pre-reduced field equals the reference's per-corner
    in-march decode; the object-order sweeps consume it with
    ``tex_offset=0.0`` (query 7's block-boundary grid, :395-478)."""
    bin_width = MAX_HISTOGRAM / N_BINS
    centers = (
        bin_width * jnp.arange(N_BINS, dtype=jnp.float32) + bin_width / 2.0
    )
    return jnp.sum(histograms * centers, axis=-1) * INTERP_MEAN_SCALE


def interp_mean_sample_fn(histograms: jnp.ndarray) -> SampleFn:
    """Query 7 — on-the-fly trilinear-interpolated histogram mean.

    The only mode that decodes *during* the march (volumeRender_kernel.cu:
    354-480): the 8 surrounding block histograms are decoded to means (bin
    centers over [0, MaxHistogram]) and interpolated within the cell spanned by
    ``floor/ceil(p01 * N) / N``, then scaled x50. Because the mean is linear in
    the histogram, we pre-reduce each block to its mean and interpolate that —
    mathematically identical to the reference's 8x32 in-loop fetch, at 1/32 the
    bandwidth (the corner-cache optimization falls out for free).

    Divergence (measure-zero): when a sample lands exactly on a cell boundary
    the reference computes 0/0 = NaN; we return the boundary value.
    """
    bin_width = MAX_HISTOGRAM / N_BINS
    centers = bin_width * jnp.arange(N_BINS, dtype=jnp.float32) + bin_width / 2.0
    means = jnp.sum(histograms * centers, axis=-1)  # (Z, Y, X)
    nz, ny, nx = means.shape
    sizes = jnp.asarray([nx, ny, nz], dtype=jnp.float32)

    def f(p01: jnp.ndarray) -> jnp.ndarray:
        g = p01 * sizes  # (..., 3) block-boundary coordinates
        c0 = jnp.floor(g)
        c1 = jnp.ceil(g)
        frac = jnp.where(c1 > c0, (g - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), 0.0)
        i0 = jnp.clip(c0.astype(jnp.int32), 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
        i1 = jnp.clip(c1.astype(jnp.int32), 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
        ax, ay, az = frac[..., 0], frac[..., 1], frac[..., 2]

        def m(iz, iy, ix):
            return means[iz, iy, ix]

        x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
        x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
        c00 = m(z0, y0, x0) * (1 - ax) + m(z0, y0, x1) * ax
        c10 = m(z0, y1, x0) * (1 - ax) + m(z0, y1, x1) * ax
        c01 = m(z1, y0, x0) * (1 - ax) + m(z1, y0, x1) * ax
        c11 = m(z1, y1, x0) * (1 - ax) + m(z1, y1, x1) * ax
        c0_ = c00 * (1 - ay) + c10 * ay
        c1_ = c01 * (1 - ay) + c11 * ay
        return (c0_ * (1 - az) + c1_ * az) * INTERP_MEAN_SCALE

    return f


@functools.partial(jax.jit, static_argnames=("width", "height", "channel", "march"))
def _render_stats_volume(
    stats_vol: jnp.ndarray,
    inv_view: jnp.ndarray,
    tf_lut: jnp.ndarray,
    density: jnp.ndarray,
    brightness: jnp.ndarray,
    transfer_offset: jnp.ndarray,
    transfer_scale: jnp.ndarray,
    width: int,
    height: int,
    channel: int,
    march: MarchConfig,
) -> jnp.ndarray:
    return render_image(
        stats_sample_fn(stats_vol, channel),
        inv_view,
        width,
        height,
        tf_lut,
        density,
        brightness,
        transfer_offset,
        transfer_scale,
        march,
    )


class DistributionRenderer:
    """Convenience façade: hold a volume's precomputed stats + render images.

    ``volume`` is any of the model families in :mod:`vrdd_tpu.models.volumes`.
    Precompute happens once at construction (the dataProcessing /
    basicDataProcessing analogue); each ``render`` call is a single jitted
    device computation.
    """

    def __init__(self, volume, tf_lut: Optional[np.ndarray] = None):
        self.volume = volume
        self.stats = volume.stats_volume()
        self.tf_lut = jnp.asarray(
            default_transfer_function() if tf_lut is None else tf_lut,
            dtype=jnp.float32,
        )

    def render(
        self,
        inv_view: Optional[np.ndarray] = None,
        config: RenderConfig = RenderConfig(),
    ) -> jnp.ndarray:
        if inv_view is None:
            inv_view = default_benchmark_inv_view()
        return _render_stats_volume(
            self.stats,
            jnp.asarray(inv_view, dtype=jnp.float32),
            self.tf_lut,
            jnp.float32(config.density),
            jnp.float32(config.brightness),
            jnp.float32(config.tf.offset),
            jnp.float32(config.tf.scale),
            config.camera.width,
            config.camera.height,
            query_channel(config.query_method)
            if config.query_method != QueryMethod.INTERP_MEAN
            else 0,
            config.march,
        )
