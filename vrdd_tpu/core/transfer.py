"""1-D RGBA transfer functions.

The transfer function is a linear-filtered, clamped LUT — and in this framework
it is a *learnable parameter*: gradients flow through the LUT fetch back into
the table (the differentiable TF-fitting config of BASELINE.json).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vrdd_tpu.core.sampling import sample_linear_1d


def default_transfer_function() -> np.ndarray:
    """The reference's 9-entry rainbow ramp (volumeRender_kernel.cu:2323-2326)."""
    return np.array(
        [
            [0.0, 0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0, 1.0],
            [1.0, 0.5, 0.0, 1.0],
            [1.0, 1.0, 0.0, 1.0],
            [0.0, 1.0, 0.0, 1.0],
            [0.0, 1.0, 1.0, 1.0],
            [0.0, 0.0, 1.0, 1.0],
            [1.0, 0.0, 1.0, 1.0],
            [0.0, 0.0, 0.0, 0.0],
        ],
        dtype=np.float32,
    )


def grayscale_ramp(n: int = 16) -> np.ndarray:
    """Grayscale ramp LUT (the PR1 CPU-runnable config in BASELINE.json)."""
    g = np.linspace(0.0, 1.0, n, dtype=np.float32)
    return np.stack([g, g, g, g], axis=-1)


def apply_transfer_function(
    lut: jnp.ndarray, sample: jnp.ndarray, offset: float = 0.0, scale: float = 1.0
) -> jnp.ndarray:
    """``tex1D(transferTex, (sample - offset) * scale)`` (volumeRender_kernel.cu:683-684).

    Returns RGBA of shape ``sample.shape + (4,)``.
    """
    return sample_linear_1d(lut, (sample - offset) * scale)
