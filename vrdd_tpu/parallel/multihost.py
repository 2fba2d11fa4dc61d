"""Multi-host (multi-process) support.

On a pod slice each host runs one process; ``jax.distributed.initialize``
wires them into one global runtime, after which the ('bricks', 'rays') mesh
spans all chips and the SAME shard_map renderer (vrdd_tpu.parallel.bricks)
runs unchanged — rays-on-hosts means each host computes only its image rows,
bricks-on-chips halo exchange rides ICI within a host group.

Helpers here cover the process-boundary plumbing the single-host path doesn't
need: global-array construction from process-local data and gathering the
image shard back per host. Tested with a real 2-process CPU run in
tests/test_multihost.py (SURVEY.md §4's multi-process requirement).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vrdd_tpu.parallel.mesh import BRICK_AXIS, RAY_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the global distributed runtime (idempotent, env-var driven when
    arguments are None — JAX_COORDINATOR_ADDRESS etc.)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(bricks: int = 1, rays: Optional[int] = None) -> Mesh:
    """('bricks', 'rays') mesh over ALL devices across processes."""
    devices = jax.devices()
    n = len(devices)
    if rays is None:
        rays = n // bricks
    assert bricks * rays == n
    return Mesh(np.asarray(devices).reshape(bricks, rays), (BRICK_AXIS, RAY_AXIS))


def make_global(x: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Build a global array from identical process-local host data.

    Every process passes the FULL logical array (cheap for stats volumes and
    target images at host level); each device materializes only its shard.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def stats_volume_spec() -> P:
    return P(BRICK_AXIS, None, None, None)


def image_spec() -> P:
    return P(RAY_AXIS, None, None)


def gather_image(img: jax.Array) -> np.ndarray:
    """Fetch the full (H, W, 4) image to every host (allgather over DCN)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(img, tiled=True))
