"""Full render pipeline: all three distribution representations + 10 query methods.

The analogue of the reference's startup sequence (initCuda ->
dataProcessing -> basicDataProcessing, volumeRender.cpp:1200-1221): given any
subset of {raw histograms, fractal codebooks, flexible-block data}, precompute
the corresponding stats volumes once, then render with any query method
0-9 (volumeRender.cpp:129 legend):

    1/2/3  raw mean / variance / entropy          (originalQueryTex)
    4/5/6  fractal mean / variance / entropy      (fractalQueryTex)
    7      on-the-fly interpolated mean           (in-march decode)
    8/9/0  flexible entropy / mean / variance     (flexBlockTex)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vrdd_tpu.core.geometry import default_benchmark_inv_view
from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.march.scan import render_image
from vrdd_tpu.models.flexible import FlexibleBlockVolume
from vrdd_tpu.models.renderer import (
    flex_sample_fn,
    interp_mean_sample_fn,
    stats_sample_fn,
)
from vrdd_tpu.models.volumes import FractalHistogramVolume, RawHistogramVolume
from vrdd_tpu.utils.config import QueryMethod, RenderConfig, query_channel
from vrdd_tpu.utils.timing import StageTimer


class RenderPipeline:
    """Holds precomputed query volumes and renders by query method."""

    def __init__(
        self,
        raw: Optional[RawHistogramVolume] = None,
        fractal: Optional[FractalHistogramVolume] = None,
        flexible: Optional[FlexibleBlockVolume] = None,
        tf_lut: Optional[np.ndarray] = None,
    ):
        timer = StageTimer()
        self.raw = raw
        self.fractal = fractal
        self.flexible = flexible
        self.raw_stats = (
            timer.time("basic_data_processing/raw", raw.stats_volume)
            if raw is not None
            else None
        )
        self.fractal_stats = (
            timer.time("basic_data_processing/fractal", fractal.stats_volume)
            if fractal is not None
            else None
        )
        self.timings: Dict[str, float] = timer.as_dict()
        if flexible is not None and flexible.timings:
            self.timings.update(
                {f"data_processing/{k}": v for k, v in flexible.timings.items()}
            )
        self.tf_lut = jnp.asarray(
            default_transfer_function() if tf_lut is None else tf_lut,
            dtype=jnp.float32,
        )

    def sample_fn(self, method: QueryMethod):
        method = QueryMethod(method)
        if method in (
            QueryMethod.RAW_MEAN,
            QueryMethod.RAW_VARIANCE,
            QueryMethod.RAW_ENTROPY,
        ):
            if self.raw_stats is None:
                raise ValueError("no raw histogram volume loaded")
            return stats_sample_fn(self.raw_stats, query_channel(method))
        if method in (
            QueryMethod.FRACTAL_MEAN,
            QueryMethod.FRACTAL_VARIANCE,
            QueryMethod.FRACTAL_ENTROPY,
        ):
            if self.fractal_stats is None:
                raise ValueError("no fractal codebook volume loaded")
            return stats_sample_fn(self.fractal_stats, query_channel(method))
        if method == QueryMethod.INTERP_MEAN:
            if self.raw is None:
                raise ValueError("query 7 needs the raw histogram volume")
            return interp_mean_sample_fn(self.raw.histograms)
        # flexible-block queries
        if self.flexible is None:
            raise ValueError("no flexible-block volume loaded")
        return flex_sample_fn(self.flexible.stats_grid, query_channel(method))

    def render(
        self,
        inv_view: Optional[np.ndarray] = None,
        config: RenderConfig = RenderConfig(),
    ) -> jnp.ndarray:
        """Jitted render; returns (H, W, 4) float RGBA."""
        if inv_view is None:
            inv_view = default_benchmark_inv_view()
        fn = self._compiled(
            config.query_method,
            config.camera.width,
            config.camera.height,
            config.march,
        )
        return fn(
            jnp.asarray(inv_view, dtype=jnp.float32),
            self.tf_lut,
            jnp.float32(config.density),
            jnp.float32(config.brightness),
            jnp.float32(config.tf.offset),
            jnp.float32(config.tf.scale),
        )

    @functools.lru_cache(maxsize=32)
    def _compiled(self, method, width, height, march):
        sample_fn = self.sample_fn(method)

        @jax.jit
        def run(inv_view, tf_lut, density, brightness, offset, scale):
            return render_image(
                sample_fn, inv_view, width, height, tf_lut,
                density, brightness, offset, scale, march,
            )

        return run
