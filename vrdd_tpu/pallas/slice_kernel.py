"""Fused slice-sweep render kernel (Pallas TPU).

The XLA slice sweep (vrdd_tpu/march/slice.py) is HBM-bandwidth-bound: every
plane round-trips image-sized temporaries (resampled scalars, one-hot TF
weights, RGBA, the accumulator) through HBM — ~30 MB per plane. This kernel
fuses the whole per-plane pipeline and keeps the image accumulator resident in
VMEM for the entire sweep, so per-plane HBM traffic collapses to the plane's
voxel data.

Per image tile (grid cell = TILE x TILE pixels), for each plane front-to-back:

  1. separable CUDA-model bilinear weights built on the VPU from iota
     (``w = max(0, 1 - |clip(xf) - l|)`` — the tent form of the two-tap filter,
     exactly equal to the gather form incl. edge clamping),
  2. two MXU matmuls resample the plane onto the tile,
  3. transfer-function lookup as an unrolled tent-basis FMA over the small LUT
     (linear interp = sum of tent weights; no gathers, no one-hot tensors),
  4. masked front-to-back compositing with the opacity cutoff, in registers.

v1 keeps the pre-blended planes entirely in VMEM — right-sized for
distribution-data stats volumes (Isabel 50x50x10 x 500 planes = 5 MB). Larger
volumes fall back to the XLA path (``pallas_supported``); a DMA double-buffered
variant is the planned v2.

Numerics match vrdd_tpu/march/slice.py to float32 rounding (plus isolated
pixels whose opacity-cutoff plane flips at the threshold); parity is pinned in
tests/test_pallas_slice.py.

PERFORMANCE STATUS (v1, honest): on one v5e chip this kernel currently runs
~3x SLOWER than the XLA slice path. Cause: the per-(tile, plane) inner loop
rebuilds weight matrices and issues tiny (TILE x NY) matmuls that cannot fill
the 128x128 MXU, and TPU grid cells execute sequentially so the work
multiplies by tile count. The XLA path amortizes each plane across the full
image with larger matmuls. Planned v2: batch P planes per inner step so the
resample contracts (TILE, P*NY) x (P*NY, NX-tile) shapes onto the MXU, and DMA
plane batches from HBM with double buffering (removing the VMEM volume limit).
The XLA path remains the default (march/slice.py); this kernel is opt-in.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrdd_tpu.utils.config import MarchConfig

TILE = 128
_VMEM_PLANES_LIMIT = 10 * 1024 * 1024  # bytes of pre-blended planes for v1


def pallas_supported(
    volume_shape: Tuple[int, int, int], width: int, height: int, n_planes: int
) -> bool:
    nz, ny, nx = volume_shape
    planes_bytes = 4 * n_planes * ny * nx
    return (
        width % TILE == 0
        and height % TILE == 0
        and planes_bytes <= _VMEM_PLANES_LIMIT
    )


def _axis_tent_weights(coords, n: int, lo: float, hi: float, box_mask_dim):
    """(P,) world coords -> (P, n) CUDA-model bilinear weights, zero out-of-box.

    Tent identity: with ``q = clip(u * n - 0.5, 0, n - 1)``,
    ``w_l = max(0, 1 - |q - l|)`` reproduces clamp-to-edge two-tap filtering.
    """
    p01 = (coords - lo) / (hi - lo)
    q = jnp.clip(p01 * n - 0.5, 0.0, n - 1.0)
    l = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], n), 1).astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, None] - l))
    # boolean minor-dim broadcasts are unsupported in Mosaic; use f32 masks
    in_box = ((p01 >= 0.0) & (p01 <= 1.0)).astype(jnp.float32)
    return w * in_box[:, None]


def _make_kernel(
    H: int, W: int, NY: int, NX: int, n_planes: int, n_lut: int,
    focal: float, box_min, box_max, tstep: float, threshold: float,
    length_correction: bool,
):
    xlo, ylo, zlo = box_min
    xhi, yhi, zhi = box_max
    spacing = (zhi - zlo) / n_planes

    def kernel(params_ref, zs_ref, lut_ref, planes_ref, out_ref):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        ox = params_ref[0, 0]
        oy = params_ref[0, 1]
        oz = params_ref[0, 2]
        density = params_ref[0, 3]
        brightness = params_ref[0, 4]
        tf_off = params_ref[0, 5]
        tf_scale = params_ref[0, 6]

        py = (ti * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)).astype(
            jnp.float32
        )
        px = (tj * TILE + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)).astype(
            jnp.float32
        )
        u_row = (px / W) * 2.0 - 1.0  # (1, TILE)
        v_col = (py / H) * 2.0 - 1.0  # (TILE, 1)
        norm = jnp.sqrt(u_row * u_row + v_col * v_col + focal * focal)
        dz = -focal / norm  # (TILE, TILE)
        if length_correction:
            alpha_base = density * spacing / (jnp.abs(dz) * tstep)
        else:
            alpha_base = jnp.full((TILE, TILE), density, dtype=jnp.float32)

        u_vec = u_row[0, :]  # (TILE,)
        v_vec = v_col[:, 0]  # (TILE,)

        def body(k, carry):
            acc_r, acc_g, acc_b, acc_a = carry
            z = zs_ref[0, k]
            x_at = ox + (z - oz) * (u_vec / (-focal))  # (TILE,)
            y_at = oy + (z - oz) * (v_vec / (-focal))
            wx = _axis_tent_weights(x_at, NX, xlo, xhi, 0)  # (TILE, NX)
            wy = _axis_tent_weights(y_at, NY, ylo, yhi, 1)  # (TILE, NY)
            plane = planes_ref[k]  # (NY, NX)
            tmp = jnp.dot(wy, plane, preferred_element_type=jnp.float32)
            res = jax.lax.dot_general(
                tmp, wx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE, TILE)

            # transfer function: tent-basis FMA over the LUT
            qt = jnp.clip(
                (res - tf_off) * tf_scale * n_lut - 0.5, 0.0, n_lut - 1.0
            )
            col_r = jnp.zeros_like(res)
            col_g = jnp.zeros_like(res)
            col_b = jnp.zeros_like(res)
            col_a = jnp.zeros_like(res)
            for li in range(n_lut):
                wl = jnp.maximum(0.0, 1.0 - jnp.abs(qt - li))
                col_r += wl * lut_ref[0, li * 4 + 0]
                col_g += wl * lut_ref[0, li * 4 + 1]
                col_b += wl * lut_ref[0, li * 4 + 2]
                col_a += wl * lut_ref[0, li * 4 + 3]

            t = (z - oz) / dz
            covered = (
                (jnp.sum(wx, axis=1) > 0.0).astype(jnp.float32)[None, :]
                * (jnp.sum(wy, axis=1) > 0.0).astype(jnp.float32)[:, None]
                * (t > 0.0).astype(jnp.float32)
            )
            a = col_a * alpha_base * covered
            live = acc_a <= threshold
            trans = jnp.where(live, 1.0 - acc_a, 0.0)
            acc_r = acc_r + col_r * a * trans
            acc_g = acc_g + col_g * a * trans
            acc_b = acc_b + col_b * a * trans
            acc_a = acc_a + a * trans
            return acc_r, acc_g, acc_b, acc_a

        zero = jnp.zeros((TILE, TILE), dtype=jnp.float32)
        acc_r, acc_g, acc_b, acc_a = jax.lax.fori_loop(
            0, n_planes, body, (zero, zero, zero, zero)
        )
        out_ref[0] = acc_r * brightness
        out_ref[1] = acc_g * brightness
        out_ref[2] = acc_b * brightness
        out_ref[3] = acc_a * brightness

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "march", "focal", "n_planes", "length_correction",
    ),
)
def pallas_slice_render(
    volume: jnp.ndarray,
    origin: jnp.ndarray,
    tf_lut: jnp.ndarray,
    density=0.05,
    brightness=1.0,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    width: int,
    height: int,
    march: MarchConfig = MarchConfig(),
    focal: float = 2.0,
    n_planes: int = 0,
    length_correction: bool = True,
) -> jnp.ndarray:
    """Fused forward render; same semantics as slice_render_image."""
    nz, ny, nx = volume.shape
    if n_planes <= 0:
        n_planes = 2 * nz
    (xlo, ylo, zlo) = march.box_min
    (xhi, yhi, zhi) = march.box_max

    # plane schedule + pre-blend (same as the XLA path)
    spacing = (zhi - zlo) / n_planes
    zs = (zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)).astype(
        np.float32
    )[::-1].copy()
    zf_all = (zs - zlo) / (zhi - zlo) * nz - 0.5
    iz0 = np.clip(np.floor(zf_all).astype(np.int64), 0, nz - 1)
    az = (zf_all - np.floor(zf_all)).astype(np.float32)
    iz1 = np.clip(iz0 + 1, 0, nz - 1)
    wz = np.zeros((n_planes, nz), dtype=np.float32)
    wz[np.arange(n_planes), iz0] += 1.0 - az
    wz[np.arange(n_planes), iz1] += az
    planes_all = jax.lax.dot_general(
        jnp.asarray(wz), volume.reshape(nz, ny * nx),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(n_planes, ny, nx)

    origin = jnp.asarray(origin, dtype=jnp.float32)
    params = jnp.stack(
        [
            origin[0], origin[1], origin[2],
            jnp.float32(density), jnp.float32(brightness),
            jnp.float32(transfer_offset), jnp.float32(transfer_scale),
            jnp.float32(0.0),
        ]
    )[None, :]
    n_lut = tf_lut.shape[0]
    lut_flat = jnp.asarray(tf_lut, dtype=jnp.float32).reshape(1, -1)
    zs_in = jnp.asarray(zs)[None, :]

    kernel = _make_kernel(
        height, width, ny, nx, n_planes, n_lut, focal,
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, height, width), jnp.float32),
        grid=(height // TILE, width // TILE),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, n_planes), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 4 * n_lut), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (n_planes, ny, nx), lambda i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, TILE, TILE), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
    )(params, zs_in, lut_flat, planes_all)
    return jnp.transpose(out, (1, 2, 0))
