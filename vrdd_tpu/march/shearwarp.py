"""Perspective shear-warp renderer: arbitrary rotated views on the MXU path.

The scan marcher (vrdd_tpu/march/scan.py) handles any view exactly but is
gather-bound on TPU. This module renders ROTATED pinhole views with the same
object-order matmul sweep as vrdd_tpu/march/slice.py, via the perspective
shear-warp factorization (Lacroute & Levoy, SIGGRAPH '94 — recast TPU-native;
the reference has no equivalent, its d_render re-marches per pixel for every
view, volumeRender_kernel.cu:272-717):

1. **Principal axis**: pick the volume axis a maximizing |view_dir_a| and
   permute volume axes so a -> z. A pure relabel + one jnp.transpose.
2. **Ray-slope (sheared-object) space**: every ray through the camera origin
   is identified by its slope ``m = (d_x / d_z, d_y / d_z)`` in (permuted)
   volume axes. On the volume plane ``z = zk`` the ray position is affine in
   m with a per-plane scale and translation, so resampling each plane onto a
   uniform m-grid is two small matmuls — the slice sweep runs UNCHANGED on a
   bounding m-grid (`sweep_slope_space`). Compositing in m-space is per-ray
   exact: each m-grid point IS one ray.
3. **Final 2-D warp**: pixels map to slopes by the projective map
   ``m(u, v) = (R(u,v,-f))_{xy} / (R(u,v,-f))_z`` — one bilinear resample of
   the composited (Hi, Wi, 4) m-space image. The only gather in the whole
   render, on a 2-D image, with host-precomputed static indices.

Requirements/limits (fall back to the scan marcher otherwise):
- d_z must keep one sign across the image (true for FOV < 90 deg with the
  principal-axis choice; `shearwarp_applicable` checks it),
- the warp resampling adds one bilinear filtering step: accuracy vs the scan
  marcher is ~1e-2 at oversample=2 (pinned in tests), not bit parity.

The view matrix is a HOST numpy array: geometry (principal axis, m-grid
bounds, warp indices) is computed host-side. On the 'pallas' backend the
sweep consumes the slope grid as TRACED params, so rotating the camera does
NOT recompile — only the principal-axis permutation (6) and dz_sign (2) key
compiles; the 'xla' backend embeds the grids as literals (view-static).
Differentiable w.r.t. volume and render params (the warp is linear; the
sweep has an analytic custom VJP).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vrdd_tpu.march.slice import sweep_slope_space
from vrdd_tpu.utils.config import MarchConfig

# permutation per principal axis: world-axis indices (x=0, y=1, z=2) of the
# sweep's (x', y', z'); volume arrays are (Z, Y, X) = world axes (2, 1, 0).
_PERMS = {
    2: (0, 1, 2),  # z-principal: identity
    1: (0, 2, 1),  # y-principal: (x, z, y)
    0: (2, 1, 0),  # x-principal: (z, y, x)
}


def _pixel_grid(width: int, height: int, focal: float):
    u = ((np.arange(width, dtype=np.float32) / width) * 2.0 - 1.0).astype(
        np.float32
    )
    v = ((np.arange(height, dtype=np.float32) / height) * 2.0 - 1.0).astype(
        np.float32
    )
    uu, vv = np.meshgrid(u, v)  # (H, W)
    d = np.stack([uu, vv, -focal * np.ones_like(uu)], axis=-1)  # camera space
    return d


def shearwarp_geometry(
    inv_view: np.ndarray, width: int, height: int, focal: float = 2.0
):
    """Host-side geometry: principal axis, slopes per pixel, validity.

    Returns ``(axis, perm, slopes (H, W, 2), dz_sign, ok)`` where slopes are
    (mx, my) in PERMUTED volume axes.
    """
    inv_view = np.asarray(inv_view, dtype=np.float32)
    rot = inv_view[:, :3]
    d_cam = _pixel_grid(width, height, focal)  # (H, W, 3)
    d_world = d_cam @ rot.T  # (H, W, 3) in (x, y, z) world order
    view_dir = rot @ np.array([0.0, 0.0, -1.0], dtype=np.float32)
    axis = int(np.argmax(np.abs(view_dir)))  # world axis index
    px, py, pz = _PERMS[axis]
    dz = d_world[..., pz]
    ok = bool((dz > 1e-6).all() or (dz < -1e-6).all())
    dz_sign = 1 if float(dz.flat[0]) > 0 else -1
    mx = d_world[..., px] / dz
    my = d_world[..., py] / dz
    return axis, (px, py, pz), np.stack([mx, my], axis=-1), dz_sign, ok


def _principal_axis_geometry(
    inv_view: np.ndarray, width: int, height: int, focal: float = 2.0
):
    """O(1) host geometry: ``(axis, perm, dz_sign, ok)`` from the 3x3 alone.

    ``d_z(u, v)`` is AFFINE in the pixel coords, so its sign over the whole
    image is decided at the four corners of the actual pixel rectangle
    (u in [-1, 1 - 2/W], v in [-1, 1 - 2/H]) — exactly equivalent to
    :func:`shearwarp_geometry`'s all-pixels check without building (H, W)
    grids on the host. The fused-kernel frame path calls this per frame
    (the full per-pixel slopes/warp maps are computed ON DEVICE inside the
    jit, see _pallas_frame): host work per rotated frame is 3x3 numpy."""
    inv_view = np.asarray(inv_view, dtype=np.float32)
    rot = inv_view[:, :3]
    view_dir = rot @ np.array([0.0, 0.0, -1.0], dtype=np.float32)
    axis = int(np.argmax(np.abs(view_dir)))
    px, py, pz = _PERMS[axis]
    u_ext = np.array([-1.0, 1.0 - 2.0 / width], dtype=np.float32)
    v_ext = np.array([-1.0, 1.0 - 2.0 / height], dtype=np.float32)
    dz = (
        u_ext[None, :] * rot[pz, 0]
        + v_ext[:, None] * rot[pz, 1]
        - focal * rot[pz, 2]
    )
    ok = bool((dz > 1e-6).all() or (dz < -1e-6).all())
    dz_sign = 1 if float(dz[0, 0]) > 0 else -1
    return axis, (px, py, pz), dz_sign, ok


def shearwarp_applicable(
    inv_view: np.ndarray, width: int = 64, height: int = 64, focal: float = 2.0
) -> bool:
    """True if d_z keeps one sign over the image for the best principal axis."""
    *_, ok = _principal_axis_geometry(inv_view, width, height, focal)
    return ok


def _bilinear_warp_2d_traced(
    img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray
) -> jnp.ndarray:
    """Traced twin of :func:`_bilinear_warp_2d`: the index maps are DATA, so
    one compiled executable serves every view (the eager host-index version
    dispatches ~15 device ops per frame — ~200 ms/frame over a tunneled
    remote chip)."""
    hi, wi = img.shape[0], img.shape[1]
    x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, wi - 1)
    y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, hi - 1)
    x1 = jnp.clip(x0 + 1, 0, wi - 1)
    y1 = jnp.clip(y0 + 1, 0, hi - 1)
    fx = (ix - jnp.floor(ix))[..., None]
    fy = (iy - jnp.floor(iy))[..., None]
    c00 = img[y0, x0]
    c01 = img[y0, x1]
    c10 = img[y1, x0]
    c11 = img[y1, x1]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def slope_corner_bounds(
    inv_view: np.ndarray, width: int, height: int, focal: float = 2.0
):
    """O(1) host geometry for the distributed rotated paths:
    ``(axis, (px, py, pz), dz_sign, ok, (mx_lo, mx_hi, my_lo, my_hi))``.

    The slopes ``mx(u, v) = d_px / d_pz`` are linear-fractional in the pixel
    coords (both components affine, ``d_pz`` of constant sign whenever
    ``ok``); restricted to an axis-parallel edge of the pixel rectangle the
    derivative's numerator is constant, so each edge is monotone and the
    extremes over the rectangle sit at its 4 CORNERS. These are exactly the
    m-grid bounds :func:`shearwarp_geometry` reads off the full (H, W)
    grid for Θ(H·W) host work — measured 55 ms/frame at 1024², the
    dominant per-frame cost of the distributed rotated entry points (the
    per-pixel warp maps they also used to consume are built on device by
    :func:`_warp_from_rotation_traced` inside their fused frame jits)."""
    inv_view = np.asarray(inv_view, dtype=np.float32)
    axis, (px, py, pz), dz_sign, ok = _principal_axis_geometry(
        inv_view, width, height, focal
    )
    rot = inv_view[:, :3]
    u_ext = np.array([-1.0, 1.0 - 2.0 / width], dtype=np.float32)
    v_ext = np.array([-1.0, 1.0 - 2.0 / height], dtype=np.float32)
    uu, vv = np.meshgrid(u_ext, v_ext)
    d = np.stack([uu, vv, -focal * np.ones_like(uu)], axis=-1) @ rot.T
    mx = d[..., px] / d[..., pz]
    my = d[..., py] / d[..., pz]
    return axis, (px, py, pz), dz_sign, ok, (
        float(mx.min()), float(mx.max()), float(my.min()), float(my.max())
    )


def _warp_from_rotation_traced(
    img_m, rot, mgrid, width, height, focal, perm_world
):
    """Homography warp m-space → pixels with the per-pixel index maps built
    ON DEVICE from the 3×3 rotation — 13 traced floats cross the link per
    frame instead of two (H, W) host index maps (16 MB/frame at 1024²
    eagerly re-uploaded; the `_pallas_frame` lesson applied to the
    distributed rotated paths, cf. volumeRender.cpp:225-232's
    copyInvViewMatrix-only upload). ``mgrid = [mx0, dmx, my0, dmy]`` are
    the m-grid's origin/spacing (traced); ``perm_world = (px, py, pz)``."""
    px, py, pz = perm_world
    u = ((jnp.arange(width, dtype=jnp.float32) / width) * 2.0 - 1.0)[None, :]
    v = ((jnp.arange(height, dtype=jnp.float32) / height) * 2.0 - 1.0)[:, None]

    def d_world(i):
        return u * rot[i, 0] + v * rot[i, 1] - focal * rot[i, 2]

    dzc = d_world(pz)
    mx_all = d_world(px) / dzc
    my_all = d_world(py) / dzc
    return _bilinear_warp_2d_traced(
        img_m, (mx_all - mgrid[0]) / mgrid[1], (my_all - mgrid[2]) / mgrid[3]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "wi", "hi", "focal", "march", "dz_sign",
        "n_planes", "length_correction", "plane_chunk", "tex_offset", "wrt",
        "axis_scale", "perm_axes", "perm_world", "pack_u8",
    ),
)
def _pallas_frame(
    volume, rot, origin, tf_lut, density, brightness,
    transfer_offset, transfer_scale, *, width, height, wi, hi, focal, march,
    dz_sign, n_planes, length_correction, plane_chunk, tex_offset, wrt,
    axis_scale, perm_axes, perm_world, pack_u8,
):
    """ONE jitted dispatch per rotated frame: per-pixel slope grids,
    m-grid bounds, axis permutation, fused m-space sweep, homography warp
    index maps, and the warp itself (+ optional uint8 pack) ALL inside the
    jit, computed from the 3x3 rotation + origin (12 traced floats). Only
    the principal-axis permutation and dz_sign key compiles — interactive
    dragging re-renders through one cached executable. The previous
    revision computed the (H, W) slope/warp maps on the HOST and uploaded
    them per frame: 2 MB host->device per rotated frame, ~50 ms over the
    tunneled link and the bulk of the rotated-drag fps gap (measured
    round 4; cf. volumeRender.cpp:225-232, which uploads only
    c_invViewMatrix per frame for the same reason)."""
    from vrdd_tpu.pallas.slice_vjp import _diff_call, _norm_wrt

    px, py, pz = perm_world
    vol_perm = jnp.transpose(volume, perm_axes)

    # pixel -> world direction components, permuted; d_world_i =
    # u*rot[i,0] + v*rot[i,1] - focal*rot[i,2] (shearwarp_geometry math)
    u = ((jnp.arange(width, dtype=jnp.float32) / width) * 2.0 - 1.0)[None, :]
    v = ((jnp.arange(height, dtype=jnp.float32) / height) * 2.0 - 1.0)[:, None]

    def d_world(i):
        return u * rot[i, 0] + v * rot[i, 1] - focal * rot[i, 2]

    dzc = d_world(pz)
    mx_all = d_world(px) / dzc  # (H, W)
    my_all = d_world(py) / dzc

    # bounding m-grid (+ one-texel margin), traced reductions
    mx_lo, mx_hi = jnp.min(mx_all), jnp.max(mx_all)
    my_lo, my_hi = jnp.min(my_all), jnp.max(my_all)
    mx_pad = jnp.maximum(jnp.float32(1e-6), (mx_hi - mx_lo) / wi)
    my_pad = jnp.maximum(jnp.float32(1e-6), (my_hi - my_lo) / hi)
    mx0 = mx_lo - mx_pad
    my0 = my_lo - my_pad
    dmx = (mx_hi - mx_lo + 2.0 * mx_pad) / (wi - 1)
    dmy = (my_hi - my_lo + 2.0 * my_pad) / (hi - 1)
    slopes = jnp.stack([mx0, dmx, my0, dmy])
    origin_p = jnp.stack([origin[px], origin[py], origin[pz]])

    img_m = _diff_call(
        vol_perm, origin_p, slopes, tf_lut, density, brightness,
        transfer_offset, transfer_scale, dz_sign=dz_sign, width=wi,
        height=hi, march=march, n_planes=n_planes,
        length_correction=length_correction, precision="f32",
        plane_chunk=plane_chunk, tex_offset=tex_offset, wrt=_norm_wrt(wrt),
        axis_scale=axis_scale,
    )
    img = _bilinear_warp_2d_traced(
        img_m, (mx_all - mx0) / dmx, (my_all - my0) / dmy
    )
    if pack_u8:  # True/4 = uint8 RGBA; 3 = uint8 RGB (smaller readback)
        from vrdd_tpu.core.image import rgba_to_uint8

        out = rgba_to_uint8(img)
        return out[..., :3] if pack_u8 == 3 else out
    return img


def _bilinear_warp_2d(
    img: jnp.ndarray, ix: np.ndarray, iy: np.ndarray
) -> jnp.ndarray:
    """Sample (Hi, Wi, C) image at fractional index maps ix/iy (H, W)."""
    hi, wi = img.shape[0], img.shape[1]
    x0 = np.clip(np.floor(ix).astype(np.int32), 0, wi - 1)
    y0 = np.clip(np.floor(iy).astype(np.int32), 0, hi - 1)
    x1 = np.clip(x0 + 1, 0, wi - 1)
    y1 = np.clip(y0 + 1, 0, hi - 1)
    fx = jnp.asarray((ix - np.floor(ix)).astype(np.float32))[..., None]
    fy = jnp.asarray((iy - np.floor(iy)).astype(np.float32))[..., None]
    c00 = img[y0, x0]
    c01 = img[y0, x1]
    c10 = img[y1, x0]
    c11 = img[y1, x1]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def shearwarp_render_image(
    volume: jnp.ndarray,
    inv_view: np.ndarray,
    width: int,
    height: int,
    tf_lut: jnp.ndarray,
    density: jnp.ndarray = 0.05,
    brightness: jnp.ndarray = 1.0,
    transfer_offset: jnp.ndarray = 0.0,
    transfer_scale: jnp.ndarray = 1.0,
    march: MarchConfig = MarchConfig(),
    focal: float = 2.0,
    n_planes: int = 0,
    oversample: float = 2.0,
    length_correction: bool = True,
    compute_dtype=jnp.float32,
    plane_chunk: int = 0,
    use_custom_vjp: bool = True,
    backend: str = "auto",
    tex_offset: float = 0.5,
    wrt: tuple = ("volume", "lut", "params"),
    axis_scale=(1.0, 1.0, 1.0),
    pack_u8: bool = False,
) -> jnp.ndarray:
    """Render ``(H, W, 4)`` RGBA for an ARBITRARY view on the matmul sweep.

    ``inv_view`` is the reference's 3x4 camera-to-world matrix as a HOST numpy
    array (on the pallas backend only the principal axis / dz_sign of the
    view key compiles; on the xla backend the view is static per compile).
    ``oversample`` scales the intermediate m-grid resolution relative to the
    output image (2.0 keeps the warp's filtering loss ~1e-2).

    ``axis_scale`` are per-WORLD-axis (sx, sy, sz) filter-grid scales (the
    padded-grid form of the flexible-block unnormalized fetch,
    volumeRender_kernel.cu:654-680); they are permuted together with the
    volume axes, so rotated flexible-block queries (8/9/0) ride this fast
    path too.

    ``backend``: 'xla' (march/slice.py sweep), 'pallas' (the fused TPU
    kernels of vrdd_tpu/pallas — the slope-space sweep is slope-grid-generic,
    so rotated views get the same fused forward+backward; the m-grid is
    rounded up to the kernel's 128-tile alignment), or 'auto' (pallas on TPU
    when supported).
    """
    inv_view = np.asarray(inv_view, dtype=np.float32)
    axis, (px, py, pz), dz_sign, ok = _principal_axis_geometry(
        inv_view, width, height, focal
    )
    if not ok:
        raise ValueError(
            "shear-warp inapplicable: d_z changes sign across the image "
            "(FOV too wide / degenerate view); use the scan marcher"
        )

    # permute volume (Z, Y, X) axes so the principal world axis becomes z'.
    # volume array axis for world axis w is (2 - w). (The pallas branch
    # permutes INSIDE its one jitted frame call.)
    volume = jnp.asarray(volume)
    origin_w = inv_view[:, 3]
    box_min = np.asarray(march.box_min, dtype=np.float32)
    box_max = np.asarray(march.box_max, dtype=np.float32)
    march_p = MarchConfig(
        max_steps=march.max_steps,
        tstep=march.tstep,
        opacity_threshold=march.opacity_threshold,
        box_min=(float(box_min[px]), float(box_min[py]), float(box_min[pz])),
        box_max=(float(box_max[px]), float(box_max[py]), float(box_max[pz])),
    )
    ascale_p = (
        float(axis_scale[px]), float(axis_scale[py]), float(axis_scale[pz])
    )

    # bounding m-grid resolution (the grid itself is traced on the pallas
    # path, host numpy on the xla path)
    wi = max(8, int(np.ceil(width * oversample)))
    hi = max(8, int(np.ceil(height * oversample)))
    if backend == "auto":
        from vrdd_tpu.pallas.slice_kernel import pallas_supported

        nzp, nyp, nxp = (
            volume.shape[2 - pz], volume.shape[2 - py], volume.shape[2 - px]
        )
        wi_r = -(-wi // 128) * 128
        hi_r = -(-hi // 128) * 128
        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and pallas_supported((nzp, nyp, nxp), wi_r, hi_r,
                                 max(1, n_planes),
                                 n_lut=int(jnp.shape(tf_lut)[0]))
            else "xla"
        )

    if backend == "pallas":  # round the m-grid up to the kernel tiling
        wi = -(-wi // 128) * 128
        hi = -(-hi // 128) * 128
        if n_planes <= 0:
            n_planes = 2 * int(volume.shape[2 - pz])
        return _pallas_frame(
            volume, jnp.asarray(inv_view[:, :3]), jnp.asarray(origin_w),
            tf_lut,
            jnp.asarray(density, jnp.float32),
            jnp.asarray(brightness, jnp.float32),
            jnp.asarray(transfer_offset, jnp.float32),
            jnp.asarray(transfer_scale, jnp.float32),
            width=width, height=height, wi=wi, hi=hi, focal=focal,
            march=march_p, dz_sign=dz_sign, n_planes=n_planes,
            length_correction=length_correction,
            # 0 = backend default (4: fastest measured for the fused bwd)
            plane_chunk=plane_chunk or 4, tex_offset=tex_offset,
            wrt=tuple(wrt), axis_scale=ascale_p,
            perm_axes=(2 - pz, 2 - py, 2 - px), perm_world=(px, py, pz),
            pack_u8=pack_u8,
        )

    # xla backend: host per-pixel slopes + host m-grid (view-static compile)
    *_, slopes, _, _ = shearwarp_geometry(inv_view, width, height, focal)
    mx_all, my_all = slopes[..., 0], slopes[..., 1]
    mx_lo, mx_hi = float(mx_all.min()), float(mx_all.max())
    my_lo, my_hi = float(my_all.min()), float(my_all.max())
    mx_pad = max(1e-6, (mx_hi - mx_lo) / wi)
    my_pad = max(1e-6, (my_hi - my_lo) / hi)
    mx = np.linspace(mx_lo - mx_pad, mx_hi + mx_pad, wi, dtype=np.float32)
    my = np.linspace(my_lo - my_pad, my_hi + my_pad, hi, dtype=np.float32)

    # homography warp index maps m-space -> pixels (host fractional indices)
    ix = (mx_all - mx[0]) / (mx[-1] - mx[0]) * (wi - 1)
    iy = (my_all - my[0]) / (my[-1] - my[0]) * (hi - 1)

    vol_perm = jnp.transpose(volume, (2 - pz, 2 - py, 2 - px))
    origin_p = np.array(
        [origin_w[px], origin_w[py], origin_w[pz]], dtype=np.float32
    )
    img_m = sweep_slope_space(
        vol_perm, origin_p, mx, my, tf_lut,
        density, brightness, transfer_offset, transfer_scale, march_p,
        dz_sign=dz_sign, n_planes=n_planes,
        length_correction=length_correction, compute_dtype=compute_dtype,
        plane_chunk=plane_chunk or 8, use_custom_vjp=use_custom_vjp,
        tex_offset=tex_offset, axis_scale=ascale_p,
    )

    # final warp (static fractional indices, XLA view-static branch)
    img = _bilinear_warp_2d(img_m, ix, iy)
    if pack_u8:
        from vrdd_tpu.core.image import rgba_to_uint8

        out = rgba_to_uint8(img)
        return out[..., :3] if pack_u8 == 3 else out
    return img
