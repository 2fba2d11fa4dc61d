"""Fused slice-sweep render kernel (Pallas TPU) — v2, strip-resident accumulator.

The XLA slice sweep (vrdd_tpu/march/slice.py) is HBM-bandwidth-bound: every
plane round-trips the image accumulator and temporaries through HBM
(~40 MB/plane at 1024^2 — ~20 GB over a 512-plane sweep). This kernel keeps
the accumulator resident in VMEM for the entire sweep and fuses the whole
per-plane pipeline, so per-plane HBM traffic collapses to the plane's voxels.

Structure (v2):

- grid = (H / STRIP, n_planes); the output block is a full-width row strip
  (4, STRIP, W) whose index map depends only on the strip id, so Mosaic keeps
  it in VMEM across the entire inner plane sweep (classic revisited-block
  accumulation; zeroed at k == 0, brightness applied at k == n_planes - 1).
- the plane block (1, NY, NX) streams from HBM with automatic double-buffered
  DMA — no VMEM limit on volume size (the v1 limitation).
- per (strip, plane): separable CUDA-model bilinear weights built on the VPU
  from iota (tent identity ``w = max(0, 1 - |clip(xf) - l|)``, exactly equal
  to the two-tap gather form incl. edge clamping), then two full-width MXU
  matmuls resample the plane onto the strip — the same FLOPs as the XLA
  full-image path (nothing is recomputed per tile, unlike v1),
- transfer-function lookup as an unrolled tent-basis FMA over the small LUT,
- masked front-to-back compositing with the opacity cutoff, in registers.

Numerics match vrdd_tpu/march/slice.py to float32 rounding (plus isolated
pixels whose opacity-cutoff plane flips at the threshold); parity is pinned in
tests/test_pallas_slice.py. Semantics follow the reference's d_render
(volumeRender_kernel.cu:272-717) in the object-order formulation of
march/slice.py.

``precision='bf16'`` casts the resample matmul operands to bfloat16 (f32
accumulation) — the scalar field loses ~3 decimal digits, the image error
stays ~1e-3; the MXU runs at its fast path. Default 'f32' is bit-faithful to
the XLA slice path.

Measured (one v5e chip, amortized, plane_chunk=8): 512^3 volume -> 1024^2
image, 512 planes: 25.6 ms (41 Mrays/s) vs 39.4 ms XLA slice path;
Isabel-shaped stats volume (10x50x50) -> 512^2, 200 planes: 3.4 ms
(77 MTexels/s; the reference's published number on this geometry is
15.7 MTexels/s, presentation.pdf). Remaining cost is the 9-entry TF FMA loop
on the VPU (~8 ms at 1024^2) and the f32 resample matmuls.
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

STRIP = 128
# bytes per plane; the streamed block is plane_chunk (default 8) planes and
# double-buffered, so VMEM holds ~8x this alongside the output strip
_VMEM_PLANE_LIMIT = 2 * 1024 * 1024


def pallas_supported(
    volume_shape: Tuple[int, int, int], width: int, height: int, n_planes: int
) -> bool:
    nz, ny, nx = volume_shape
    return (
        width % 128 == 0
        and height % STRIP == 0
        and 4 * ny * nx <= _VMEM_PLANE_LIMIT
    )


def _tent_weights(coords, n: int, lo: float, hi: float):
    """(P,) world coords -> (P, n) bilinear weights + (P,) in-box f32 mask.

    Tent identity: with ``q = clip(u * n - 0.5, 0, n - 1)``,
    ``w_l = max(0, 1 - |q - l|)`` reproduces clamp-to-edge two-tap filtering.
    In-box rows always sum to exactly 1, so the returned mask doubles as the
    per-axis coverage predicate — NEVER reduce the weight matrix to test
    coverage (a cross-lane ``sum(w, axis=1)`` per grid step costs ~10x the
    whole kernel on Mosaic).
    """
    p01 = (coords - lo) / (hi - lo)
    q = jnp.clip(p01 * n - 0.5, 0.0, n - 1.0)
    l = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], n), 1).astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, None] - l))
    # boolean minor-dim broadcasts are unsupported in Mosaic; use f32 masks
    in_box = ((p01 >= 0.0) & (p01 <= 1.0)).astype(jnp.float32)
    return w * in_box[:, None], in_box


def _make_kernel(
    H: int, W: int, NY: int, NX: int, n_planes: int, n_lut: int,
    focal: float, box_min, box_max, tstep: float, threshold: float,
    length_correction: bool, mm_dtype, pchunk: int,
):
    xlo, ylo, zlo = box_min
    xhi, yhi, zhi = box_max
    spacing = (zhi - zlo) / n_planes
    n_chunks = n_planes // pchunk

    def kernel(params_ref, zs_ref, lut_ref, planes_ref, out_ref):
        si = pl.program_id(0)
        k = pl.program_id(1)
        ox = params_ref[0, 0]
        oy = params_ref[0, 1]
        oz = params_ref[0, 2]
        density = params_ref[0, 3]
        brightness = params_ref[0, 4]
        tf_off = params_ref[0, 5]
        tf_scale = params_ref[0, 6]

        @pl.when(k == 0)
        def _init():
            out_ref[...] = jnp.zeros((4, STRIP, W), dtype=jnp.float32)

        py = (si * STRIP + jax.lax.broadcasted_iota(
            jnp.int32, (STRIP, 1), 0)).astype(jnp.float32)
        px = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
        u_row = (px / W) * 2.0 - 1.0  # (1, W)
        v_col = (py / H) * 2.0 - 1.0  # (STRIP, 1)
        norm = jnp.sqrt(u_row * u_row + v_col * v_col + focal * focal)
        dz = -focal / norm  # (STRIP, W)
        if length_correction:
            alpha_base = density * spacing / (jnp.abs(dz) * tstep)
        else:
            alpha_base = jnp.full((STRIP, W), density, dtype=jnp.float32)

        acc_r = out_ref[0]
        acc_g = out_ref[1]
        acc_b = out_ref[2]
        acc_a = out_ref[3]
        # unrolled over the plane block: amortizes per-grid-step overhead
        # (weight/constant rebuilds, DMA bookkeeping) over pchunk planes
        for i in range(pchunk):
            z = zs_ref[0, k * pchunk + i]
            x_at = ox + (z - oz) * (u_row[0, :] / (-focal))  # (W,)
            y_at = oy + (z - oz) * (v_col[:, 0] / (-focal))  # (STRIP,)
            wx, inbox_x = _tent_weights(x_at, NX, xlo, xhi)
            wy, inbox_y = _tent_weights(y_at, NY, ylo, yhi)
            plane = planes_ref[i]  # (NY, NX)
            tmp = jnp.dot(
                wy.astype(mm_dtype), plane.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )  # (STRIP, NX)
            res = jax.lax.dot_general(
                tmp.astype(mm_dtype), wx.astype(mm_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (STRIP, W)

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

            # t > 0 <=> z < oz since dz < 0 everywhere (looking down -z);
            # per-axis coverage is the in-box predicate (tent rows sum to 1)
            in_front = (z < oz).astype(jnp.float32)
            covered = inbox_x[None, :] * inbox_y[:, None] * in_front
            a = jnp.minimum(col_a * alpha_base, 1.0) * covered
            live = acc_a <= threshold
            trans = jnp.where(live, 1.0 - acc_a, 0.0)
            at = a * trans
            acc_r += col_r * at
            acc_g += col_g * at
            acc_b += col_b * at
            acc_a = acc_a + at
        out_ref[0] = acc_r
        out_ref[1] = acc_g
        out_ref[2] = acc_b
        out_ref[3] = acc_a

        @pl.when(k == n_chunks - 1)
        def _finish():
            out_ref[...] = out_ref[...] * brightness

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "march", "focal", "n_planes", "length_correction",
        "precision", "plane_chunk",
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
    precision: str = "f32",
    plane_chunk: int = 8,
) -> jnp.ndarray:
    """Fused forward render; same semantics as slice_render_image."""
    nz, ny, nx = volume.shape
    if n_planes <= 0:
        n_planes = 2 * nz
    pchunk = plane_chunk
    while n_planes % pchunk:
        pchunk -= 1
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
    if np.all(az < 1e-6):
        planes_all = volume[jnp.asarray(iz0)]  # pure (reversed) selection
    else:
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

    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = _make_kernel(
        height, width, ny, nx, n_planes, n_lut, focal,
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction, mm_dtype, pchunk,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, height, width), jnp.float32),
        grid=(height // STRIP, n_planes // pchunk),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, n_planes), lambda i, k: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 4 * n_lut), lambda i, k: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (pchunk, ny, nx), lambda i, k: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, STRIP, width), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(params, zs_in, lut_flat, planes_all)
    return jnp.transpose(out, (1, 2, 0))
