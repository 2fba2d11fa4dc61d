"""Typed configuration for the renderer.

Replaces the reference's compile-time constants + CLI flags + keyboard state
(volumeRender.cpp:57-134, 302-384, 1100-1153; volumeRender_kernel.cu:90-105,
276-280) with frozen dataclasses that can be passed to jitted functions as
static or traced arguments.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class QueryMethod(enum.IntEnum):
    """Per-sample scalar decode selector.

    Numbering matches the reference's keyboard legend (volumeRender.cpp:129):
      1/2/3: raw block-histogram mean / variance / entropy (precomputed)
      4/5/6: fractal-decoded histogram mean / variance / entropy (precomputed)
      7:     on-the-fly trilinear-interpolated histogram mean (decode inside march)
      8/9/0: flexible-block (integral distribution) entropy / mean / variance
    """

    FLEX_VARIANCE = 0
    RAW_MEAN = 1
    RAW_VARIANCE = 2
    RAW_ENTROPY = 3
    FRACTAL_MEAN = 4
    FRACTAL_VARIANCE = 5
    FRACTAL_ENTROPY = 6
    INTERP_MEAN = 7
    FLEX_ENTROPY = 8
    FLEX_MEAN = 9


# Stat channel selected by each query method inside the (mean, var, entropy) volume.
_QUERY_CHANNEL = {
    QueryMethod.RAW_MEAN: 0,
    QueryMethod.RAW_VARIANCE: 1,
    QueryMethod.RAW_ENTROPY: 2,
    QueryMethod.FRACTAL_MEAN: 0,
    QueryMethod.FRACTAL_VARIANCE: 1,
    QueryMethod.FRACTAL_ENTROPY: 2,
    QueryMethod.FLEX_MEAN: 0,
    QueryMethod.FLEX_VARIANCE: 1,
    QueryMethod.FLEX_ENTROPY: 2,
}


def query_channel(method: QueryMethod) -> int:
    """Channel index in a (..., 3) stats volume for a precomputed query method."""
    return _QUERY_CHANNEL[QueryMethod(method)]


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Ray-march loop constants (reference: volumeRender_kernel.cu:276-280)."""

    max_steps: int = 500
    tstep: float = 0.01
    opacity_threshold: float = 0.95
    box_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    box_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera matching the reference's NDC ray generation.

    The reference builds rays as ``d = normalize(u, v, -2)`` rotated by the
    inverse view matrix, with origin at the inverse-view translation
    (volumeRender_kernel.cu:288-296). ``focal`` is the ``2.0`` z-component.
    """

    width: int = 512
    height: int = 512
    focal: float = 2.0


@dataclasses.dataclass(frozen=True)
class TransferFunctionConfig:
    """1-D RGBA transfer-function lookup parameters.

    ``offset``/``scale`` mirror transferOffset/transferScale
    (volumeRender.cpp:132-133); the LUT itself is an array, see
    :func:`vrdd_tpu.core.transfer.default_transfer_function`.
    """

    offset: float = 0.0
    scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Top-level render parameters (reference defaults volumeRender.cpp:129-134)."""

    march: MarchConfig = dataclasses.field(default_factory=MarchConfig)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    tf: TransferFunctionConfig = dataclasses.field(default_factory=TransferFunctionConfig)
    density: float = 0.05
    brightness: float = 1.0
    query_method: QueryMethod = QueryMethod.RAW_MEAN
    #: linear vs point filtering of the query volume fetch — the reference's
    #: 'f' key (setTextureFilterMode, volumeRender.cpp:311-314). Applies to
    #: the scan renderer's stats fetch (queries 1-6); the object-order sweep
    #: is linear by construction.
    filter_linear: bool = True


# --- Distribution-decode constants (reference quirks preserved for parity) ---

#: Number of bins in the fixed-block histograms (volumeRender_kernel.cu:91).
N_BINS = 32
#: Number of bins in flexible-block histograms (volumeRender_kernel.cu:97).
FLEX_N_BINS = 64
#: Histogram value-domain maximum used for bin centers (volumeRender_kernel.cu:355).
MAX_HISTOGRAM = 0.0217
#: Post-hoc mean normalizer (volumeRender_kernel.cu:758).
MEAN_NORM = 0.0217
#: Post-hoc variance normalizer (volumeRender_kernel.cu:759).
VARIANCE_NORM = 0.000021
#: Value-domain maximum for flexible blocks (volumeRender_kernel.cu:1084).
FLEX_MAX_HISTOGRAM = 255.0
#: ×50 scale on the on-the-fly interpolated mean (volumeRender_kernel.cu:479).
INTERP_MEAN_SCALE = 50.0
