"""Bricks-on-chips distributed rendering with ICI halo exchange.

The volume's Z axis is sharded into slabs across the ``bricks`` mesh axis and
the pixel batch across the ``rays`` axis. Each device marches every one of its
rays through *its own slab only* (sampling boundary trilinear taps from a
1-voxel ghost layer exchanged once via ``ppermute``), producing a premultiplied
partial RGBA per ray; partials are then composed in per-ray front-to-back
order with the associative "over" operator (sort-last compositing — the
spatial analogue of context parallelism, SURVEY.md §5).

Exactness vs the single-device marcher (and hence the CPU reference of
d_render):

- Sample positions are bitwise-identical: every brick advances the SAME global
  ``t = gnear + k * tstep`` grid and only *composites* the steps that fall in
  its half-open brick window ``[bnear, bfar)`` (windows partition the ray;
  adjacent bricks compute the shared plane's ``t`` with identical float ops).
- Early ray termination is made EXACT with a two-pass scheme: pass 1 marches
  all bricks without cutoff and folds the partials per ray to find the first
  brick where accumulated alpha crosses the threshold (if any) plus the
  upstream alpha entering it; pass 2 re-marches only that brick with the
  equivalent local threshold ``tau = (thr - a_up) / (1 - a_up)`` (the global
  test ``a_up + (1 - a_up) a_loc > thr`` is a monotone transform of the local
  alpha, so the cutoff lands on the same sample as the sequential loop).

Known measure-zero divergence: a sample landing exactly on an interior slab
plane when the ray origin lies on that plane (0 * inf = NaN in the slab test),
same NaN class as the reference's own intersectBox
(volumeRender_kernel.cu:140).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vrdd_tpu.core.geometry import camera_rays, intersect_box
from vrdd_tpu.core.transfer import apply_transfer_function
from vrdd_tpu.parallel.mesh import BRICK_AXIS, RAY_AXIS
from vrdd_tpu.utils.config import MarchConfig


def shard_stats_volume(stats, mesh: Mesh):
    """Place a (Z, Y, X, C) stats volume sharded over Z on the bricks axis."""
    return jax.device_put(stats, NamedSharding(mesh, P(BRICK_AXIS, None, None, None)))


def _halo_exchange(local: jnp.ndarray, n_bricks: int) -> jnp.ndarray:
    """Add one ghost Z-layer on each side of the local slab.

    Interior ghosts come from ICI neighbors via ``ppermute``; edge devices
    replicate their own edge layer (clamp-to-edge addressing globally).
    """
    if n_bricks == 1:
        return jnp.concatenate([local[:1], local, local[-1:]], axis=0)
    d = jax.lax.axis_index(BRICK_AXIS)
    fwd = [(i, (i + 1) % n_bricks) for i in range(n_bricks)]
    bwd = [(i, (i - 1) % n_bricks) for i in range(n_bricks)]
    lo_ghost = jax.lax.ppermute(local[-1:], BRICK_AXIS, fwd)  # from prev device
    hi_ghost = jax.lax.ppermute(local[:1], BRICK_AXIS, bwd)  # from next device
    lo_ghost = jnp.where(d == 0, local[:1], lo_ghost)
    hi_ghost = jnp.where(d == n_bricks - 1, local[-1:], hi_ghost)
    return jnp.concatenate([lo_ghost, local, hi_ghost], axis=0)


def _slab_trilinear(
    padded: jnp.ndarray,
    p01: jnp.ndarray,
    z0: jnp.ndarray,
    nz: int,
) -> jnp.ndarray:
    """CUDA-model trilinear fetch against a haloed local slab.

    ``padded`` is ``(zl + 2, ny, nx, C)``; ``z0`` the slab's global first
    layer. Global Z indices are clamped to the full volume then localized into
    the halo frame (+1); X/Y behave exactly as in
    :func:`vrdd_tpu.core.sampling.sample_trilinear_3d`.
    """
    zl2, ny, nx = padded.shape[:3]
    sizes = jnp.asarray([nx, ny, nz], dtype=jnp.float32)
    xf = p01 * sizes - 0.5
    i0 = jnp.floor(xf)
    a = xf - i0
    i0 = i0.astype(jnp.int32)
    x0 = jnp.clip(i0[..., 0], 0, nx - 1)
    x1 = jnp.clip(i0[..., 0] + 1, 0, nx - 1)
    y0 = jnp.clip(i0[..., 1], 0, ny - 1)
    y1 = jnp.clip(i0[..., 1] + 1, 0, ny - 1)
    zg0 = jnp.clip(i0[..., 2], 0, nz - 1)
    zg1 = jnp.clip(i0[..., 2] + 1, 0, nz - 1)
    z0_loc = jnp.clip(zg0 - z0 + 1, 0, zl2 - 1)
    z1_loc = jnp.clip(zg1 - z0 + 1, 0, zl2 - 1)
    ax, ay, az = a[..., 0:1], a[..., 1:2], a[..., 2:3]
    c00 = padded[z0_loc, y0, x0] * (1 - ax) + padded[z0_loc, y0, x1] * ax
    c10 = padded[z0_loc, y1, x0] * (1 - ax) + padded[z0_loc, y1, x1] * ax
    c01 = padded[z1_loc, y0, x0] * (1 - ax) + padded[z1_loc, y0, x1] * ax
    c11 = padded[z1_loc, y1, x0] * (1 - ax) + padded[z1_loc, y1, x1] * ax
    c0 = c00 * (1 - ay) + c10 * ay
    c1 = c01 * (1 - ay) + c11 * ay
    return c0 * (1 - az) + c1 * az


def _march_brick(
    padded: jnp.ndarray,
    z0: jnp.ndarray,
    nz: int,
    channel: int,
    origin: jnp.ndarray,
    dirs: jnp.ndarray,
    tf_lut: jnp.ndarray,
    density: jnp.ndarray,
    transfer_offset: jnp.ndarray,
    transfer_scale: jnp.ndarray,
    march: MarchConfig,
    brick_zlo: jnp.ndarray,
    brick_zhi: jnp.ndarray,
    threshold: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Partial premultiplied RGBA of this brick for a flat ray batch.

    ``threshold`` is a per-ray local opacity cutoff, or None for no cutoff.
    """
    origin_b = jnp.broadcast_to(origin, dirs.shape)
    gnear, gfar, hit = intersect_box(origin_b, dirs, march.box_min, march.box_max)
    gnear = jnp.maximum(gnear, 0.0)
    bmin = jnp.stack(
        [
            jnp.full_like(gnear, march.box_min[0]),
            jnp.full_like(gnear, march.box_min[1]),
            jnp.broadcast_to(brick_zlo, gnear.shape),
        ],
        axis=-1,
    )
    bmax = jnp.stack(
        [
            jnp.full_like(gnear, march.box_max[0]),
            jnp.full_like(gnear, march.box_max[1]),
            jnp.broadcast_to(brick_zhi, gnear.shape),
        ],
        axis=-1,
    )
    inv_d = 1.0 / dirs
    tbot = inv_d * (bmin - origin_b)
    ttop = inv_d * (bmax - origin_b)
    bnear = jnp.max(jnp.minimum(ttop, tbot), axis=-1)
    bfar = jnp.min(jnp.maximum(ttop, tbot), axis=-1)

    pos0 = origin_b + dirs * gnear[:, None]
    step = dirs * march.tstep
    sum0 = jnp.zeros(dirs.shape[:1] + (4,), dtype=jnp.float32)

    def body(carry, _):
        summ, t, pos, running, saturated = carry
        in_win = (t >= bnear) & (t < bfar)
        active = running & in_win & ~saturated & hit
        p01 = pos * 0.5 + 0.5
        sample = jnp.where(
            active, _slab_trilinear(padded, p01, z0, nz)[..., channel], 0.0
        )
        col = apply_transfer_function(tf_lut, sample, transfer_offset, transfer_scale)
        a = col[:, 3] * density
        col = jnp.concatenate([col[:, :3] * a[:, None], a[:, None]], axis=-1)
        new_sum = summ + col * (1.0 - summ[:, 3:4])
        summ = jnp.where(active[:, None], new_sum, summ)
        if threshold is not None:
            saturated = saturated | (summ[:, 3] > threshold)
        t_new = t + march.tstep
        running = running & ~(t_new > gfar)
        pos = pos + step
        return (summ, t_new, pos, running, saturated), None

    running0 = hit
    saturated0 = jnp.zeros_like(hit)
    (summ, _, _, _, _), _ = jax.lax.scan(
        body, (sum0, gnear, pos0, running0, saturated0), None, length=march.max_steps
    )
    return summ


def _over(acc: jnp.ndarray, part: jnp.ndarray) -> jnp.ndarray:
    return acc + part * (1.0 - acc[:, 3:4])


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "channel", "march", "mesh", "focal"),
)
def distributed_render_image(
    stats: jnp.ndarray,
    inv_view: jnp.ndarray,
    tf_lut: jnp.ndarray,
    density: jnp.ndarray,
    brightness: jnp.ndarray,
    transfer_offset: jnp.ndarray,
    transfer_scale: jnp.ndarray,
    *,
    width: int,
    height: int,
    channel: int = 0,
    march: MarchConfig = MarchConfig(),
    mesh: Mesh,
    focal: float = 2.0,
) -> jnp.ndarray:
    """Render with the volume sharded over bricks and pixels over rays.

    ``stats`` is ``(Z, Y, X, C)`` (use :func:`shard_stats_volume` to place it).
    Returns ``(H, W, 4)`` float32 RGBA sharded over rows on the rays axis.
    """
    nz = stats.shape[0]
    n_bricks = mesh.shape[BRICK_AXIS]
    assert nz % n_bricks == 0, f"Z={nz} must divide over {n_bricks} bricks"
    zl = nz // n_bricks
    assert height % mesh.shape[RAY_AXIS] == 0, "H must divide over rays axis"

    origin, dirs = camera_rays(inv_view, width, height, focal)
    dirs = dirs.reshape(-1, 3)

    box_zmin, box_zmax = march.box_min[2], march.box_max[2]
    z_extent = box_zmax - box_zmin
    thr = march.opacity_threshold

    def per_device(
        stats_local, dirs_local, origin, tf_lut, density, brightness,
        transfer_offset, transfer_scale,
    ):
        d = jax.lax.axis_index(BRICK_AXIS)
        z0 = d * zl
        padded = _halo_exchange(stats_local, n_bricks)
        zlo = box_zmin + z_extent * z0.astype(jnp.float32) / nz
        zhi = box_zmin + z_extent * (z0 + zl).astype(jnp.float32) / nz

        march_args = (
            padded, z0, nz, channel, origin, dirs_local, tf_lut,
            density, transfer_offset, transfer_scale, march, zlo, zhi,
        )
        # Pass 1: un-truncated brick partials.
        partial = _march_brick(*march_args, None)
        parts = jax.lax.all_gather(partial, BRICK_AXIS, axis=0)  # (D, Nl, 4)

        # Per-ray front-to-back brick order.
        k = jnp.arange(n_bricks, dtype=jnp.int32)[:, None]
        forward = dirs_local[None, :, 2] >= 0.0
        order = jnp.where(forward, k, n_bricks - 1 - k)  # (D, Nl)
        ordered = jnp.take_along_axis(parts, order[:, :, None], axis=0)

        # Exclusive-prefix fold to locate the cutoff brick.
        acc0 = jnp.zeros(partial.shape, dtype=jnp.float32)

        def fold(acc, part):
            return _over(acc, part), acc

        final_nc, prefixes = jax.lax.scan(fold, acc0, ordered)  # (Nl,4), (D,Nl,4)
        after_alpha = jnp.concatenate(
            [prefixes[1:, :, 3], final_nc[None, :, 3]], axis=0
        )  # alpha after composing each ordered brick
        crossed = after_alpha > thr  # (D, Nl)
        saturating = jnp.any(crossed, axis=0)
        j_star = jnp.argmax(crossed, axis=0)  # first crossing brick (ordered idx)
        prefix_at = jnp.take_along_axis(prefixes, j_star[None, :, None], axis=0)[0]
        a_up = prefix_at[:, 3]

        # Pass 2: re-march only the cutoff brick with the adjusted threshold.
        my_pos = jnp.where(dirs_local[:, 2] >= 0.0, d, n_bricks - 1 - d)
        flag = saturating & (j_star == my_pos)
        tau = (thr - a_up) / jnp.maximum(1.0 - a_up, 1e-6)
        partial2 = _march_brick(*march_args, jnp.where(flag, tau, 2.0))
        contrib2 = jax.lax.psum(
            jnp.where(flag[:, None], partial2, 0.0), BRICK_AXIS
        )
        exact = prefix_at + contrib2 * (1.0 - a_up[:, None])
        rgba = jnp.where(saturating[:, None], exact, final_nc)

        _, _, hit = intersect_box(
            jnp.broadcast_to(origin, dirs_local.shape),
            dirs_local,
            march.box_min,
            march.box_max,
        )
        return jnp.where(hit[:, None], rgba * brightness, rgba)

    out = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(BRICK_AXIS, None, None, None),
            P(RAY_AXIS, None),
            P(None),
            P(None, None),
            P(),
            P(),
            P(),
            P(),
        ),
        out_specs=P(RAY_AXIS, None),
        check_vma=False,
    )(
        stats,
        dirs,
        origin,
        tf_lut,
        jnp.asarray(density, dtype=jnp.float32),
        jnp.asarray(brightness, dtype=jnp.float32),
        jnp.asarray(transfer_offset, dtype=jnp.float32),
        jnp.asarray(transfer_scale, dtype=jnp.float32),
    )
    return out.reshape(height, width, 4)
