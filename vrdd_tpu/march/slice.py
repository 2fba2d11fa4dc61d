"""Object-order slice-sweep renderer — the MXU fast path.

TPUs have no texture units, and per-sample scalar gathers (the direct
translation of d_render's tex3D fetches) run at ~1e8/s — thousands of times
off speed-of-light. This module reformulates the render *object-order*: sweep
the volume's Z planes front-to-back and composite each plane into the image.

The key fact making this TPU-native: for an **unrotated pinhole camera** (the
reference's benchmark view, volumeRender.cpp:1024-1043), the in-plane sample
position is separable —

    ray dir ~ normalize(u(px), v(py), -f);  at plane z:
    x(px, z) = ox + (z - oz) * u(px) / (-f)     (normalization cancels!)
    y(py, z) = oy + (z - oz) * v(py) / (-f)

so resampling plane ``z`` onto the pixel grid is two small matmuls

    resampled = Wy(z) @ plane @ Wx(z)^T,     Wx: (W, X), Wy: (H, Y)

with bilinear CUDA-model weights (2 nonzeros/row, built densely on the fly —
the MXU eats them). The transfer-function lookup is likewise a one-hot matmul
over the small LUT. Everything lands on the MXU; there are NO gathers.

Discretization difference vs the ray-order marcher: samples lie on constant-z
planes instead of constant-t shells, with per-ray segment length
``dz_plane / |dir_z|``. With ``length_correction=True`` (default), sample
opacity is scaled by ``segment / tstep`` so the sweep converges to the same
integral; parity tests compare against the scan marcher with tolerances, while
bit-exact reference parity remains the scan path's job.

Backward pass: compositing is an associative "over" chain, so the output
factors as ``out = sum_k m_k T_{k-1} c_k`` with transmittance
``T_{k-1} = prod_{j<k} (1 - m_j a_j)`` and freeze mask ``m_k`` (early
termination). The analytic custom VJP exploits this: cotangents are

    dL/dc_k[rgb] = m_k T_{k-1} g[rgb]
    dL/dc_k[a]   = m_k ( T_{k-1} g[a] - S_k / (1 - a_k) ),
    S_k = sum_{j>k} m_j (g . c_j) T_{j-1}   (suffix sums, two extra sweeps)

so backward memory is O(1) in plane count (no per-step residuals, no
full-volume cotangent carries) and cost ~3x forward. The per-plane local
transposes (TF lookup, separable resample) are delegated to jax.vjp of the
plane-decode function. Gradient parity vs plain autodiff is pinned in tests.

Rotated cameras: rotate the volume once then sweep (future work — shear-pass
matmuls); the scan marcher covers general views exactly meanwhile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vrdd_tpu.utils.config import MarchConfig


def _axis_weights(
    coords: jnp.ndarray, n: int, lo: float, hi: float
) -> jnp.ndarray:
    """Dense CUDA-model bilinear weight matrix (P, n) for world coords (P,).

    Out-of-box coords (outside [lo, hi]) get all-zero rows (no contribution);
    in-box coords clamp to edge texels exactly like the texture unit.
    """
    p01 = (coords - lo) / (hi - lo)
    xf = p01 * n - 0.5
    i0 = jnp.floor(xf)
    a = xf - i0
    i0i = i0.astype(jnp.int32)
    lo_idx = jnp.clip(i0i, 0, n - 1)
    hi_idx = jnp.clip(i0i + 1, 0, n - 1)
    in_box = (p01 >= 0.0) & (p01 <= 1.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], n), 1)
    w = (
        jnp.where(cols == lo_idx[:, None], (1.0 - a)[:, None], 0.0)
        + jnp.where(cols == hi_idx[:, None], a[:, None], 0.0)
    )
    return jnp.where(in_box[:, None], w, 0.0)


def _tf_onehot_matmul(
    sample: jnp.ndarray, lut: jnp.ndarray, offset: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """TF lookup as an unrolled tent-basis FMA: scalars (...,) -> RGBA (..., 4).

    Linear LUT interpolation with clamp equals a sum of tent basis functions:
    with ``q = clip(u * n - 0.5, 0, n - 1)``,
    ``col = sum_l max(0, 1 - |q - l|) * lut[l]``. The unrolled form fuses into
    pure elementwise VPU work — no (..., n) one-hot tensor ever materializes
    (which would dominate HBM traffic at image scale).
    """
    n = lut.shape[0]
    q = jnp.clip((sample - offset) * scale * n - 0.5, 0.0, n - 1.0)
    col = None
    for li in range(n):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(q - li))[..., None]
        term = w * lut[li]
        col = term if col is None else col + term
    return col


def slice_render_image(
    volume: jnp.ndarray,
    origin: jnp.ndarray,
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
    length_correction: bool = True,
    compute_dtype=jnp.float32,
    plane_chunk: int = 8,
    use_custom_vjp: bool = True,
) -> jnp.ndarray:
    """Render ``(H, W, 4)`` RGBA by plane sweep (unrotated camera at ``origin``).

    ``volume`` is a scalar field ``(Z, Y, X)``; ``origin`` the camera position
    (world), looking along -z with the reference's NDC frustum. ``n_planes``
    defaults to 2 * Z. ``use_custom_vjp`` selects the analytic O(1)-memory
    backward (disable for higher-order differentiation).
    """
    volume = jnp.asarray(volume)
    nz, ny, nx = volume.shape
    if n_planes <= 0:
        n_planes = 2 * nz
    origin = jnp.asarray(origin, dtype=jnp.float32)
    ox, oy, oz = origin[0], origin[1], origin[2]
    (xlo, ylo, zlo) = march.box_min
    (xhi, yhi, zhi) = march.box_max

    # Static camera-grid constants built with numpy on the host so they embed
    # as literals instead of device constants (device round-trips during
    # lowering are pathologically slow on remote-attached TPUs).
    u = ((np.arange(width, dtype=np.float32) / width) * 2.0 - 1.0).astype(np.float32)
    v = ((np.arange(height, dtype=np.float32) / height) * 2.0 - 1.0).astype(np.float32)
    uu, vv = np.meshgrid(u, v)
    norm = np.sqrt(uu * uu + vv * vv + focal * focal)
    dz = (-focal / norm).astype(np.float32)  # (H, W), camera looks down -z

    # Plane schedule: front-to-back along the viewing direction.
    spacing = (zhi - zlo) / n_planes
    zs = (zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)).astype(
        np.float32
    )[::-1].copy()  # camera looks -z: nearest plane has largest z

    seg = spacing / np.abs(dz)  # per-ray world path length through one slab
    alpha_scale = (
        (seg / march.tstep).astype(np.float32)
        if length_correction
        else np.ones_like(seg, dtype=np.float32)
    )

    dtype = compute_dtype
    thr = march.opacity_threshold

    # Pre-blend all sampling planes with ONE matmul (Wz has two CUDA-model
    # bilinear weights per row). Outside the sweep, so the volume cotangent is
    # a single transposed matmul.
    zf_all = (zs - zlo) / (zhi - zlo) * nz - 0.5
    iz0_all = np.floor(zf_all)
    az_all = (zf_all - iz0_all).astype(np.float32)
    iz0_all = np.clip(iz0_all.astype(np.int64), 0, nz - 1)
    iz1_all = np.clip(iz0_all + 1, 0, nz - 1)
    if np.all(az_all < 1e-6):
        planes_all = volume[jnp.asarray(iz0_all)]  # pure (reversed) selection
    else:
        wz = np.zeros((n_planes, nz), dtype=np.float32)
        wz[np.arange(n_planes), iz0_all] += 1.0 - az_all
        wz[np.arange(n_planes), iz1_all] += az_all
        planes_all = jax.lax.dot_general(
            jnp.asarray(wz),
            volume.reshape(nz, ny * nx),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n_planes, ny, nx)

    chunk = plane_chunk
    while n_planes % chunk:
        chunk -= 1
    n_chunks = n_planes // chunk
    zs_c = jnp.asarray(zs.reshape(n_chunks, chunk))
    planes_c = planes_all.reshape(n_chunks, chunk, ny, nx)

    def chunk_rgba(z, planes, lut, density_, toff, tscl):
        """Per-plane premultiplied RGBA for one chunk: (C, H, W, 4).

        Everything except compositing: separable resample (batched matmuls),
        TF lookup, opacity scaling and coverage masking.
        """
        x_at = ox + (z[:, None] - oz) * (u[None, :] / (-focal))  # (C, W)
        y_at = oy + (z[:, None] - oz) * (v[None, :] / (-focal))  # (C, H)
        wx = _axis_weights(x_at.reshape(-1), nx, xlo, xhi).reshape(
            chunk, width, nx
        ).astype(dtype)
        wy = _axis_weights(y_at.reshape(-1), ny, ylo, yhi).reshape(
            chunk, height, ny
        ).astype(dtype)
        tmp = jax.lax.dot_general(
            wy, planes.astype(dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, H, X)
        resampled = jax.lax.dot_general(
            tmp.astype(dtype), wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, H, W)
        col = _tf_onehot_matmul(resampled, lut, toff, tscl)
        t = (z[:, None, None] - oz) / dz[None]
        covered = (
            (jnp.sum(jnp.abs(wy), axis=2) > 0.0)[:, :, None]
            & (jnp.sum(jnp.abs(wx), axis=2) > 0.0)[:, None, :]
            & (t > 0.0)
        )
        a = jnp.where(covered, col[..., 3] * density_ * alpha_scale[None], 0.0)
        rgb = col[..., :3] * a[..., None]
        return jnp.concatenate([rgb, a[..., None]], axis=-1)

    def primal(planes_c, lut, density_, toff, tscl):
        def body(acc, xs):
            z, planes = xs
            rgba_all = chunk_rgba(z, planes, lut, density_, toff, tscl)
            for k in range(chunk):
                new_acc = acc + rgba_all[k] * (1.0 - acc[..., 3:4])
                acc = jnp.where(acc[..., 3:4] > thr, acc, new_acc)
            return acc, None

        acc0 = jnp.zeros((height, width, 4), dtype=jnp.float32)
        acc, _ = jax.lax.scan(jax.checkpoint(body), acc0, (zs_c, planes_c))
        return acc

    if not use_custom_vjp:
        acc = primal(planes_c, tf_lut, jnp.asarray(density, jnp.float32),
                     jnp.asarray(transfer_offset, jnp.float32),
                     jnp.asarray(transfer_scale, jnp.float32))
        return acc * jnp.asarray(brightness, dtype=jnp.float32)

    @jax.custom_vjp
    def sweep(planes_c, lut, density_, toff, tscl):
        return primal(planes_c, lut, density_, toff, tscl)

    def sweep_fwd(planes_c, lut, density_, toff, tscl):
        acc = primal(planes_c, lut, density_, toff, tscl)
        return acc, (planes_c, lut, density_, toff, tscl)

    def sweep_bwd(res, g):
        planes_c, lut, density_, toff, tscl = res

        # Sweep 1: total P = sum_k m_k (g . c_k) T_{k-1}.
        def pass1(carry, xs):
            T, Psum = carry
            z, planes = xs
            rgba_all = chunk_rgba(z, planes, lut, density_, toff, tscl)
            for k in range(chunk):
                m = T >= 1.0 - thr
                P_k = jnp.where(
                    m, jnp.sum(g * rgba_all[k], axis=-1) * T, 0.0
                )
                Psum = Psum + P_k
                T = jnp.where(m, T * (1.0 - rgba_all[k][..., 3]), T)
            return (T, Psum), None

        ones = jnp.ones((height, width), dtype=jnp.float32)
        zeros = jnp.zeros((height, width), dtype=jnp.float32)
        (_, Ptot), _ = jax.lax.scan(
            jax.checkpoint(pass1), (ones, zeros), (zs_c, planes_c)
        )

        # Sweep 2: assemble per-plane cotangents, transpose locally via vjp.
        def pass2(carry, xs):
            T, Ppre, g_lut, g_dens, g_toff, g_tscl = carry
            z, planes = xs
            rgba_all, chunk_vjp = jax.vjp(
                lambda p, l, d, to, ts: chunk_rgba(z, p, l, d, to, ts),
                planes, lut, density_, toff, tscl,
            )
            d_rgba = []
            for k in range(chunk):
                m = T >= 1.0 - thr
                c_k = rgba_all[k]
                P_k = jnp.where(m, jnp.sum(g * c_k, axis=-1) * T, 0.0)
                Ppre = Ppre + P_k
                S_k = Ptot - Ppre
                mT = jnp.where(m, T, 0.0)
                d_rgb = mT[..., None] * g[..., :3]
                one_minus_a = 1.0 - c_k[..., 3]
                chain = jnp.where(
                    jnp.abs(one_minus_a) > 1e-6, S_k / one_minus_a, 0.0
                )
                d_a = jnp.where(m, T * g[..., 3] - chain, 0.0)
                d_rgba.append(jnp.concatenate([d_rgb, d_a[..., None]], -1))
                T = jnp.where(m, T * one_minus_a, T)
            dp, dl, dd, dto, dts = chunk_vjp(jnp.stack(d_rgba, axis=0))
            return (
                (T, Ppre, g_lut + dl, g_dens + dd, g_toff + dto, g_tscl + dts),
                dp,
            )

        carry0 = (
            ones, zeros, jnp.zeros_like(lut), jnp.zeros_like(density_),
            jnp.zeros_like(toff), jnp.zeros_like(tscl),
        )
        (_, _, g_lut, g_dens, g_toff, g_tscl), g_planes = jax.lax.scan(
            jax.checkpoint(pass2), carry0, (zs_c, planes_c)
        )
        return g_planes, g_lut, g_dens, g_toff, g_tscl

    sweep.defvjp(sweep_fwd, sweep_bwd)

    brightness = jnp.asarray(brightness, dtype=jnp.float32)
    acc = sweep(
        planes_c, tf_lut, jnp.asarray(density, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
    )
    return acc * brightness
