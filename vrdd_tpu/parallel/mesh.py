"""Device mesh construction.

The reference has no distribution at all (single process, single GPU —
SURVEY.md §2.3); this layer *creates* the pod-scale story: a 2-D logical mesh

    ("bricks", "rays")

- ``bricks``: the volume's Z axis is sharded into slabs ("bricks-on-chips");
  halo exchange for boundary trilinear taps rides ICI `ppermute`.
- ``rays``: the image plane (flattened pixel batch) is sharded
  ("rays-on-hosts") — embarrassingly parallel.

On a real pod slice, put ``rays`` on the DCN/host axis and ``bricks`` on the
ICI axis so halo exchange uses chip-to-chip links.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

BRICK_AXIS = "bricks"
RAY_AXIS = "rays"


def make_mesh(
    bricks: int = 1,
    rays: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ("bricks", "rays") mesh over the available devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if rays is None:
        assert n % bricks == 0, f"{n} devices not divisible by bricks={bricks}"
        rays = n // bricks
    assert bricks * rays == n, f"bricks*rays={bricks * rays} != {n} devices"
    arr = np.asarray(devices).reshape(bricks, rays)
    return Mesh(arr, (BRICK_AXIS, RAY_AXIS))
