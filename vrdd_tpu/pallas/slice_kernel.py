"""Fused slice-sweep render kernel (Pallas TPU) — v5, plane-major sweep with
hoisted x-weights.

The XLA slice sweep (vrdd_tpu/march/slice.py) is HBM-bandwidth-bound: every
plane round-trips the image accumulator and temporaries through HBM
(~40 MB/plane at 1024^2 — ~20 GB over a 512-plane sweep). This kernel fuses
the whole per-plane pipeline so per-plane HBM traffic collapses to the
plane's voxels plus one accumulator strip in/out per grid step.

Structure (v5 = v4 with the grid flipped to plane-major. The x tent-weight
build is strip-INVARIANT, and at 512^3 -> 1024^2 it measured ~26% of the v4
forward — rebuilt per strip, 8x more often than needed. Iterating
chunk-outer/strip-inner builds it once per chunk into a VMEM cache shared by
every strip, and the plane block also stays resident across the inner strip
loop: 23.3 ms -> 17.0 ms at the headline config. An earlier v3 plane-major
attempt kept a (4, H, W) image resident and addressed strips with
sublane-dynamic slices, which was SLOWER than v4; the v5 accumulator is one
(n_strips, n_rows, STRIP, W) output block with a CONSTANT index map —
VMEM-resident for the whole sweep, strips addressed by a cheap leading-dim
index, flushed once. Carrying it through HBM via input/output aliasing also
works on hardware but goes stale at n_strips == 1: Mosaic does not refetch
an input block whose index repeats between consecutive steps, so the
aliased write-back is missed — caught by the interpret-mode tests):

- grid = (n_planes / chunk, H / STRIP), chunk-major; brightness applied at
  the last chunk; images taller than the VMEM accumulator budget are banded
  at the call level (independent ray rows, one shared executable).
- the plane block (chunk, NY, NX) streams from HBM with automatic
  double-buffered DMA — no VMEM limit on volume size — and is revisited
  across the inner strip loop (fetched once per chunk).
- per (chunk, plane): separable CUDA-model bilinear weights built on the VPU
  from iota (tent identity ``w = max(0, 1 - |clip(xf) - l|)``, exactly equal
  to the two-tap gather form incl. edge clamping — TPUs have no texture
  units); the full-width x weights are built ONCE per chunk (first strip)
  into VMEM scratch; two full-width MXU matmuls resample the plane onto each
  strip. (The backward kernel keeps recomputing its x weights inline: feeding
  matmuls from big-scratch slices measured 13 ms SLOWER there.)
- transfer function in the RELU BASIS: the clamped linear-interp LUT is
  piecewise linear in ``q = clip((s-off)*scale*n - 0.5, 0, n-1)`` with
  integer knots, so ``col(q) = lut[0] + sum_l c_l relu(q - l)`` with
  second-difference coefficients ``c_l`` (a static linear map of the LUT,
  see tf_relu_coefficients) — mathematically identical to the tent form at
  ~2/3 the VPU ops (the kernel is VPU-bound: resample matmuls are ~3 ms of a
  ~20 ms kernel at 512^3 -> 1024^2; march/slice.py keeps the tent form as
  the parity oracle).
- masked front-to-back compositing with the opacity cutoff, in registers,
  plus STRIP-LEVEL EARLY RAY TERMINATION: an SMEM flag records when every ray
  in the strip is past the opacity threshold or permanently outside the
  volume's (shrinking) footprint; later chunks skip all compute for the strip
  (exact: frozen rays accumulate nothing — the reference's own ET
  optimization, volumeRender_kernel.cu:697-699, lifted to tile granularity).
  The footprint test applies only when it provably shrinks (camera x/y inside
  the box x/y range and in front of the box).

Numerics match vrdd_tpu/march/slice.py to float32 rounding (plus isolated
pixels whose opacity-cutoff plane flips at the threshold); parity is pinned in
tests/test_pallas_slice.py. Semantics follow the reference's d_render
(volumeRender_kernel.cu:272-717) in the object-order formulation of
march/slice.py.

``precision='bf16'`` casts the resample matmul operands to bfloat16 (f32
accumulation) — comparable to the reference GPU's 9-bit texture-filter
weights; default 'f32' is bit-faithful to the XLA slice path. MEASURED
(v5e, 2026-08): on hardware the cast is bitwise AND time-wise a no-op —
Mosaic's default f32 matmul already multiplies in bf16 with f32
accumulation (f32->bf16->HW-multiply == f32->HW-multiply, identical
truncation — the same default XLA matmul precision the non-Pallas paths
see, cf. _preblend_planes' bf16-rounding note).
The flag therefore only changes results off-hardware (interpret mode
computes f32 matmuls for real); the roofline MXU denominator is the bf16
peak (see bench.py roofline()).
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
# column-tile width for footprint/ET predication: per (strip, chunk) the
# kernel skips entire (STRIP, XTILE) pixel tiles that are provably outside
# the volume's footprint or fully past the opacity cutoff — at 512^3 -> 1024^2
# back planes cover <40% of the image width, and the kernel is VPU-bound in
# the per-sample transfer function, so dead tiles are pure savings
XTILE = 128
# bytes per plane; the streamed block is plane_chunk (default 8) planes and
# double-buffered, so VMEM holds ~8x this alongside the output strip.
# 4 MB admits 1024^2 planes (1024^3 volumes render single-chip; the sweep
# auto-shrinks plane_chunk to fit, see _fit_plane_chunk)
_VMEM_PLANE_LIMIT = 4 * 1024 * 1024
# keep the double-buffered plane block comfortably inside VMEM next to the
# resident accumulator and scratch
_VMEM_PLANE_BLOCK_BUDGET = 32 * 1024 * 1024
_VMEM_HIST_BLOCK_BUDGET = 72 * 1024 * 1024
# compiler scoped-vmem ceiling for the hist-decode pallas_call (see
# pallas_hist_render): headroom above the scalar path's 100 MB because the
# double-buffered histogram block is the dominant tenant
_HIST_VMEM_LIMIT = 112 * 1024 * 1024
# the resident accumulator block is (n_strips, n_rows, STRIP, W) =
# n_rows * H * W * 4 bytes (n_rows = max(4, n_lut) factorized rows, +1 for
# the checkpointing forward's T row — 10 at the reference's 9-entry LUT).
# The plain forward BANDS taller images into separate sweeps (one
# executable — the band's my0 is a traced param); the diff path falls back
# to the XLA VJP beyond this (pallas_diff_supported).
_VMEM_ACC_BUDGET = 48 * 1024 * 1024


def hist_manual_stream_ok(ny: int, nx: int, hist_dtype) -> bool:
    """Can the in-kernel decode use MANUAL double-buffered DMA streaming of
    the histogram volume (chunk-wide prefetch window — see _make_kernel)?
    HBM->VMEM DMA slices must be tile-aligned in their trailing dims
    ((sublane, lane) = (8, 128) f32 / (16, 128) bf16); unaligned (small)
    volumes fall back to the auto-pipelined block spec, whose one-step
    prefetch window is fine at their block sizes."""
    sub = 16 if jnp.dtype(hist_dtype).itemsize == 2 else 8
    return nx % 128 == 0 and ny % sub == 0


def acc_rows(n_lut: int, emit_ckpt: bool) -> int:
    """Accumulator rows of the factorized state [A, R_0..R_{n_lut-2}] (+T):
    at least 4 so the in-place RGBA expansion always has room."""
    return max(4, n_lut) + (1 if emit_ckpt else 0)


def _max_band_rows(width: int, n_lut: int = 9) -> int:
    """Largest STRIP-multiple row count whose accumulator block fits."""
    rows = _VMEM_ACC_BUDGET // (acc_rows(n_lut, False) * 4 * max(width, 1))
    return max(STRIP, (rows // STRIP) * STRIP)


def _fit_plane_chunk(pchunk: int, n_planes: int, ny: int, nx: int,
                     width: int = 0, bins: int = 0,
                     plane_bytes: int = 4) -> int:
    """Largest chunk <= pchunk that divides n_planes and whose double-buffered
    plane block PLUS the per-chunk x-weight cache (pchunk, width, nx) fits
    the VMEM budget. ``bins``: in-kernel decode streams (pchunk, bins, ny,
    nx) histogram blocks plus an f32 decoded-plane scratch;
    ``plane_bytes`` is the stream's element size (2 for bf16 histograms —
    half the VMEM, so twice the chunk at large NY*NX)."""
    per_plane = (
        plane_bytes * ny * nx * max(1, bins) + (4 * ny * nx if bins else 0)
    )
    # the decode path budgets higher: its (pchunk, B, NY, NX) histogram
    # blocks are the dominant VMEM tenant (no banding accumulator on top),
    # and clamping it to the scalar budget forces pchunk=2 at 256^3 x 16
    # bins — measured 3x slower than the amortized chunk (exp r4c/r4d)
    budget = _VMEM_HIST_BLOCK_BUDGET if bins else _VMEM_PLANE_BLOCK_BUDGET
    while pchunk > 1 and (
        2 * pchunk * per_plane + pchunk * 4 * width * nx > budget
    ):
        pchunk -= 1
    while n_planes % pchunk:
        pchunk -= 1
    return pchunk


def pallas_supported(
    volume_shape: Tuple[int, int, int], width: int, height: int,
    n_planes: int, n_lut: int = 9,
) -> bool:
    """Image sizes are unrestricted: the sweep pads the slope grid up to the
    (STRIP, 128) kernel tiling and crops the output (see _pad_grid). Very
    large LUTs are not: the factorized accumulator carries max(4, n_lut)
    rows (see acc_rows), so a LUT so big that ONE strip's rows outgrow the
    VMEM budget must use the XLA slice path instead."""
    nz, ny, nx = volume_shape
    Wp = width + (-width) % 128
    return (
        4 * ny * nx <= _VMEM_PLANE_LIMIT
        and acc_rows(n_lut, False) * 4 * STRIP * Wp <= _VMEM_ACC_BUDGET
    )


def _pad_grid(m: np.ndarray, mult: int) -> np.ndarray:
    """Extend a uniform slope grid to the next multiple of ``mult``.

    The kernel needs (H % STRIP == 0, W % 128 == 0); instead of refusing
    other sizes (and falling back to the ~6x slower XLA sweep), extend the
    grid with the same spacing — extra rays march like any others and the
    caller crops them away (their gradients are exact zeros through the
    crop's transpose)."""
    m = np.asarray(m, dtype=np.float32)
    n = m.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return m
    dm = float(m[1] - m[0]) if n > 1 else 1.0
    ext = m[-1] + dm * np.arange(1, pad + 1, dtype=np.float32)
    return np.concatenate([m, ext.astype(np.float32)])


def tf_relu_coefficients(lut: jnp.ndarray) -> jnp.ndarray:
    """(n, 4) LUT -> (n, 4) relu-basis coeffs [base; c_0; ..; c_{n-2}].

    ``col(q) = base + sum_{l=0}^{n-2} c_l * relu(q - l)`` equals clamped
    linear LUT interpolation for q in [0, n-1] (q >= 0 so relu(q-0) = q).
    """
    return jnp.asarray(_tf_coef_matrix(int(lut.shape[0]))) @ lut


@functools.lru_cache(maxsize=8)
def _tf_coef_matrix(n: int) -> np.ndarray:
    """A (n, n): coeffs = A @ lut[:, c]. Row 0 = base, row 1+l = c_l."""
    A = np.zeros((n, n), dtype=np.float32)
    A[0, 0] = 1.0
    A[1, 0], A[1, 1] = -1.0, 1.0  # c_0 = s_0 = lut[1] - lut[0]
    for l in range(1, n - 1):  # c_l = s_l - s_{l-1}
        A[1 + l, l - 1] += 1.0
        A[1 + l, l] += -2.0
        A[1 + l, l + 1] += 1.0
    return A


def _tent_weights(coords, n: int, lo: float, hi: float,
                  tex_offset: float = 0.5, scale: float = 1.0,
                  linear: bool = True):
    """(P,) world coords -> (P, n) bilinear weights + (P,) in-box f32 mask.

    Tent identity: with ``q = clip(u * n * scale - tex_offset, 0, n - 1)``,
    ``w_l = max(0, 1 - |q - l|)`` reproduces clamp-to-edge two-tap filtering.
    ``tex_offset=0.5`` is the CUDA texture model (texel centers at
    (i + 0.5)/n); ``0.0`` is the block-boundary grid of the reference's
    query 7 (volumeRender_kernel.cu:395-478). ``scale`` decouples the filter
    grid from the coverage box (flexible-block queries 8/9/0: the CUDA
    unnormalized fetch ``p01 * n_blocks - 0.5`` on an (n_blocks + 1)
    zero-padded grid => scale = n_blocks / (n_blocks + 1); see
    march/slice.py _axis_weights).
    ``linear=False`` is CUDA point sampling (``T[clamp(floor(u * n))]``, the
    reference's 'f' key): rounding q snaps the tent to a one-hot row —
    ``floor(q + 0.5) == clamp(floor(p01 * n * scale))`` exactly, including
    at the clamped edges.
    In-box rows always sum to exactly 1, so the returned mask doubles as the
    per-axis coverage predicate — NEVER reduce the weight matrix to test
    coverage (a cross-lane ``sum(w, axis=1)`` per grid step costs ~10x the
    whole kernel on Mosaic).
    """
    p01 = (coords - lo) / (hi - lo)
    q = jnp.clip(p01 * (n * scale) - tex_offset, 0.0, n - 1.0)
    if not linear:
        q = jnp.floor(q + 0.5)
    l = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], n), 1).astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, None] - l))
    # boolean minor-dim broadcasts are unsupported in Mosaic; use f32 masks
    in_box = ((p01 >= 0.0) & (p01 <= 1.0)).astype(jnp.float32)
    return w * in_box[:, None], in_box


def _tf_relu_forward(res, coef_ref, n_lut, tf_off, tf_scale,
                     channels=(0, 1, 2, 3)):
    """Relu-basis TF: returns (q, cols) with cols[c] = None for skipped
    channels (the backward caches the alpha channel from its replay pass and
    only recomputes rgb)."""
    q = jnp.clip((res - tf_off) * tf_scale * n_lut - 0.5, 0.0, n_lut - 1.0)
    cols = [
        coef_ref[0, c] + coef_ref[0, 4 + c] * q  # base + c_0 * relu(q - 0)
        if c in channels else None
        for c in range(4)
    ]
    for li in range(1, n_lut - 1):
        r = jnp.maximum(q - li, 0.0)
        for c in channels:
            cols[c] = cols[c] + coef_ref[0, (1 + li) * 4 + c] * r
    return q, cols


def _xtile(W: int) -> int:
    """Column-tile width for ET predication: divides W, gives at most 16
    tiles (the per-chunk live bitmap must fit an int32), lane-aligned when W
    is a multiple of 128. Falls back to one full-row tile for odd widths."""
    if W % XTILE != 0:
        return W
    n = W // XTILE
    m = (n + 15) // 16  # smallest group size keeping <= 16 tiles
    while n % m:
        m += 1
    return XTILE * m


def _corner_overlap(o, oz, m_a, m_b, z0, z1, lo, hi):
    """Scalar predicate: does {o + (z-oz)·m : z ∈ [z0,z1], m ∈ [m_a,m_b]}
    intersect [lo, hi]? The map is affine in both z and m, so its range over
    the rectangle is attained at the 4 corners — all-scalar (SMEM) math."""
    c00 = o + (z0 - oz) * m_a
    c01 = o + (z0 - oz) * m_b
    c10 = o + (z1 - oz) * m_a
    c11 = o + (z1 - oz) * m_b
    vmin = jnp.minimum(jnp.minimum(c00, c01), jnp.minimum(c10, c11))
    vmax = jnp.maximum(jnp.maximum(c00, c01), jnp.maximum(c10, c11))
    return (vmax >= lo) & (vmin <= hi)


def _chunk_covered(params_ref, zs_ref, si, k, pchunk, dz_sign, box_min,
                   box_max, W):
    """Scalar predicate: does ANY plane of chunk k intersect this strip's
    ray bundle? Skipping an uncovered (strip, chunk) saves the entire
    resample+TF+composite body (at 512^3 -> 1024^2 back planes cover <40%
    of the image)."""
    mx0 = params_ref[0, 8]
    dmx = params_ref[0, 9]
    my0 = params_ref[0, 10]
    dmy = params_ref[0, 11]
    xlo, ylo, zlo = box_min
    xhi, yhi, zhi = box_max
    ox = params_ref[0, 0]
    oy = params_ref[0, 1]
    oz = params_ref[0, 2]
    z0 = zs_ref[0, k * pchunk]
    z1 = zs_ref[0, k * pchunk + pchunk - 1]
    my_a = my0 + dmy * (si * STRIP)
    my_b = my0 + dmy * (si * STRIP + STRIP - 1)
    mx_a = mx0
    mx_b = mx0 + dmx * (W - 1)

    # any plane of the chunk in front of the camera along the sweep
    in_front = (
        (jnp.minimum(z0, z1) < oz) if dz_sign < 0
        else (jnp.maximum(z0, z1) > oz)
    )
    return (
        _corner_overlap(oy, oz, my_a, my_b, z0, z1, ylo, yhi)
        & _corner_overlap(ox, oz, mx_a, mx_b, z0, z1, xlo, xhi)
        & in_front
    )


def _shrinking_footprint(params_ref, box_min, box_max, dz_sign):
    """Scalar predicate: the volume's image footprint provably shrinks
    front-to-back (camera x/y over the box, in front of it along the sweep
    direction), so a pixel uncovered now is uncovered for all later planes."""
    xlo, ylo, zlo = box_min
    xhi, yhi, zhi = box_max
    ox = params_ref[0, 0]
    oy = params_ref[0, 1]
    oz = params_ref[0, 2]
    side = (oz > zhi) if dz_sign < 0 else (oz < zlo)
    return (
        (ox >= xlo) & (ox <= xhi) & (oy >= ylo) & (oy <= yhi) & side
    )


# block grid for the ESS plane statistics (an 8x8 grid of blocks per plane)
_ESS_YB = _ESS_XB = 8


def ess_plane_stats(planes_all: jnp.ndarray):
    """Per-PLANE block min/max of a plane stack: 2 x (n_planes, 8, 8).

    The expensive part of the ESS bitmap (one full pass over the volume,
    ~6 ms at 512^3). Depends only on the pre-blended stack — NOT on the
    camera, TF, or chunking — so callers rendering the same volume many
    times (the interactive viewer, a fitting loop) compute it once and pass
    it as ``ess_stats``; the per-view bitmap from cached stats costs ~nothing
    (see _ess_bitmap)."""
    n_planes, NY, NX = planes_all.shape
    by = -(-NY // _ESS_YB)
    bx = -(-NX // _ESS_XB)
    p = jnp.pad(
        planes_all,
        ((0, 0), (0, _ESS_YB * by - NY), (0, _ESS_XB * bx - NX)),
        mode="edge",
    )
    p = p.reshape(n_planes, _ESS_YB, by, _ESS_XB, bx)
    return p.min(axis=(2, 4)), p.max(axis=(2, 4))


@functools.partial(jax.jit, static_argnames=("n_planes", "march", "dz_sign",
                                             "tex_offset", "z_scale"))
def precompute_ess_stats(volume, *, n_planes=0, march=MarchConfig(),
                         dz_sign=-1, tex_offset=0.5, z_scale=1.0):
    """Pre-blend ``volume`` exactly as the sweep will and return the cached
    ESS plane statistics for it. The stats are camera- and TF-independent,
    but they ARE a function of everything the pre-blend sees: key your cache
    on (volume identity, n_planes, dz_sign, tex_offset, z_scale,
    march.box_min, march.box_max). Reusing stats across a change in ANY of
    those silently yields non-conservative culling (wrong pixels) with no
    shape mismatch to catch it — the render passes axis_scale[2] as z_scale,
    so flex-query renders need their own entry."""
    if n_planes <= 0:
        n_planes = 2 * volume.shape[0]
    planes_all, _ = _preblend_planes(
        jnp.asarray(volume), n_planes, march.box_min, march.box_max,
        dz_sign, tex_offset, z_scale=z_scale,
    )
    return ess_plane_stats(planes_all)


def _ess_bitmap(planes_all, zs, origin, tf_lut, tf_off, tf_scale,
                slopes, box_min, box_max, H, W, pchunk, tex_offset,
                plane_stats=None, axis_scale=(1.0, 1.0)):
    """Empty-space-skipping bitmaps: (n_strips, n_chunks) int32, bit t set
    iff x-tile t of the strip can contribute during the chunk.

    The classic TF-interval culling the reference lacks (cf. distance-map TF
    acceleration literature): per (strip, chunk, tile) bound the resampled
    value by block min/max of the plane stack (the bilinear tent weights are
    a convex combination, so res lies in [block_min, block_max] of the
    1-voxel-dilated footprint), map the value interval through the LUT's
    alpha channel (piecewise linear => extrema at knots and endpoints), and
    cull when max |alpha| == 0 — the tile's samples then contribute exactly
    nothing and leave transmittance unchanged, so skipping is EXACT for the
    rendered image and for volume cotangents (the flat-zero alpha segment
    has zero slope). It is NOT valid for alpha-LUT / density / TF-offset /
    TF-scale cotangents (raising a LUT alpha entry would make empty samples
    visible), so the diff path only applies it for wrt=('volume',).

    ``plane_stats``: optional cached (pmin, pmax) from
    :func:`ess_plane_stats` — skips the volume pass, leaving only cheap
    (strips x tiles x chunks)-sized interval math per view.
    """
    n_planes, NY, NX = planes_all.shape
    n_chunks = n_planes // pchunk
    n_strips = H // STRIP
    xt = _xtile(W)
    n_xt = W // xt
    mx0, dmx, my0, dmy = slopes[0], slopes[1], slopes[2], slopes[3]
    xlo, ylo, zlo = box_min
    xhi, yhi, zhi = box_max
    ox, oy, oz = origin[0], origin[1], origin[2]
    n_lut = tf_lut.shape[0]

    # per-(chunk, block) min/max of the plane stack
    YB, XB = _ESS_YB, _ESS_XB
    by = -(-NY // YB)
    bx = -(-NX // XB)
    if plane_stats is None:
        plane_stats = ess_plane_stats(planes_all)
    pmin, pmax = plane_stats
    bmin = pmin.reshape(n_chunks, pchunk, YB, XB).min(axis=1)
    bmax = pmax.reshape(n_chunks, pchunk, YB, XB).max(axis=1)

    # world-coordinate ranges: affine in (z, m) => extremes at the 4 corners
    zc = jnp.asarray(zs).reshape(n_chunks, pchunk)
    z_lo = zc.min(1)[None, :]  # (1, C)
    z_hi = zc.max(1)[None, :]

    def corner_range(o, m_a, m_b):
        c = jnp.stack([
            o + (z_lo - oz) * m_a, o + (z_lo - oz) * m_b,
            o + (z_hi - oz) * m_a, o + (z_hi - oz) * m_b,
        ])
        return c.min(0), c.max(0)

    srow = np.arange(n_strips, dtype=np.float32)[:, None]
    ylo_r, yhi_r = corner_range(
        oy, my0 + dmy * (srow * STRIP), my0 + dmy * (srow * STRIP + STRIP - 1)
    )  # (S, C)
    tcol = np.arange(n_xt, dtype=np.float32)[:, None]
    xlo_r, xhi_r = corner_range(
        ox, mx0 + dmx * (tcol * xt), mx0 + dmx * (tcol * xt + xt - 1)
    )  # (T, C)

    def block_range(lo_w, hi_w, lo_box, hi_box, N, bsz, nb, scale):
        # coordinate range -> 1-voxel-dilated texel range -> block range
        u_lo = (lo_w - lo_box) / (hi_box - lo_box)
        u_hi = (hi_w - lo_box) / (hi_box - lo_box)
        v_lo = jnp.floor(u_lo * (N * scale) - tex_offset) - 1.0
        v_hi = jnp.ceil(u_hi * (N * scale) - tex_offset) + 2.0
        return (jnp.clip(jnp.floor(v_lo / bsz), 0, nb - 1),
                jnp.clip(jnp.floor(v_hi / bsz), 0, nb - 1))

    sxs, sys = axis_scale
    yb_lo, yb_hi = block_range(ylo_r, yhi_r, ylo, yhi, NY, by, YB, sys)
    xb_lo, xb_hi = block_range(xlo_r, xhi_r, xlo, xhi, NX, bx, XB, sxs)

    ybi = jnp.arange(YB, dtype=jnp.float32)
    xbi = jnp.arange(XB, dtype=jnp.float32)
    ym = (ybi >= yb_lo[..., None]) & (ybi <= yb_hi[..., None])  # (S, C, YB)
    xm = (xbi >= xb_lo[..., None]) & (xbi <= xb_hi[..., None])  # (T, C, XB)
    m4 = ym[:, None, :, :, None] & xm[None, :, :, None, :]  # (S, T, C, YB, XB)
    # block_range clamps both ends into [0, nb-1], so every (s, t, c) selects
    # at least one block — the where-fallbacks are never the final extremum
    vmin = jnp.where(m4, bmin[None, None], jnp.inf).min(axis=(3, 4))
    vmax = jnp.where(m4, bmax[None, None], -jnp.inf).max(axis=(3, 4))

    # max |alpha| of the clamped piecewise-linear LUT over [vmin, vmax]
    la = jnp.asarray(tf_lut, jnp.float32)[:, 3]
    q_a = (vmin - tf_off) * tf_scale * n_lut - 0.5
    q_b = (vmax - tf_off) * tf_scale * n_lut - 0.5  # tf_scale sign-safe below
    q_lo = jnp.clip(jnp.minimum(q_a, q_b), 0.0, n_lut - 1.0)
    q_hi = jnp.clip(jnp.maximum(q_a, q_b), 0.0, n_lut - 1.0)

    def alpha_at(q):
        i0 = jnp.clip(jnp.floor(q).astype(jnp.int32), 0, n_lut - 1)
        i1 = jnp.clip(i0 + 1, 0, n_lut - 1)
        return la[i0] * (1.0 - (q - i0)) + la[i1] * (q - i0)

    amax = jnp.maximum(jnp.abs(alpha_at(q_lo)), jnp.abs(alpha_at(q_hi)))
    for l in range(n_lut):
        inside = (q_lo <= l) & (l <= q_hi)
        amax = jnp.maximum(amax, jnp.where(inside, jnp.abs(la[l]), 0.0))

    live = amax > 0.0  # (S, T, C)
    weights = jnp.asarray([1 << t for t in range(n_xt)], dtype=jnp.int32)
    return jnp.tensordot(
        live.astype(jnp.int32), weights, axes=((1,), (0,))
    ).astype(jnp.int32)  # (S, C)


#: smallest positive value fed to log2 in the in-kernel entropy decode —
#: only multiplied by an exactly-zero bin, so any tiny positive works
_ENT_TINY = 1e-30


def decode_weight_rows(stat: str, n_bins: int, *, family: str = "raw"):
    """Decode-weight rows + kernel combine mode for one histogram statistic.

    Returns ``(rows, mode)`` where ``rows`` is the ``(n_w, B)`` float32
    matrix the in-kernel decode contracts against and ``mode`` selects the
    prologue combine (see ``_decode_block``):

    - ``stat='mean'`` → ``mode='linear'``, 1 row: bin centers (scaled by
      the family's mean normalizer). dec = w·h.
    - ``stat='var'`` → ``mode='var'``, 4 rows ``[m, s·e, s·e², s·1]``:
      dec = C2 − 2·m·C1 + m²·C0 = s·Σ h (e − m)² — algebraically the
      reference's deviation-around-the-mean sum with NO Σh=1 assumption.
      The raw family deviates around bin *edges* while the mean uses
      *centers* (volumeRender_kernel.cu:742-755); fractal/flex use centers
      for both.
    - ``stat='entropy'`` → ``mode='entropy'``, 1 row whose [0, 0] is the
      1/log2(B) normalizer (Shannon entropy, :761-769).

    ``family``: 'raw' (MEAN_NORM / VARIANCE_NORM scaling, edge deviation),
    'fractal' (same normalizers, center deviation, :841-867), 'flex'
    ([0, 255] range, unnormalized, :1083-1115), or 'unit' (centers on
    [0, 1], no normalization — the framework's synthetic-volume default).
    """
    from vrdd_tpu.utils.config import (
        FLEX_MAX_HISTOGRAM, MAX_HISTOGRAM, MEAN_NORM, VARIANCE_NORM,
    )

    vmax, mnorm, vnorm = {
        "raw": (MAX_HISTOGRAM, MEAN_NORM, VARIANCE_NORM),
        "fractal": (MAX_HISTOGRAM, MEAN_NORM, VARIANCE_NORM),
        "flex": (FLEX_MAX_HISTOGRAM, 1.0, 1.0),
        "unit": (1.0, 1.0, 1.0),
    }[family]
    bw = vmax / n_bins
    i = np.arange(n_bins, dtype=np.float64)
    centers = bw * i + bw / 2.0
    edges = (i / n_bins) * vmax
    if stat == "mean":
        return (centers / mnorm).astype(np.float32)[None, :], "linear"
    if stat == "var":
        e = edges if family == "raw" else centers
        s = 1.0 / vnorm
        rows = np.stack([
            centers, s * e, s * e * e, s * np.ones_like(e),
        ])
        return rows.astype(np.float32), "var"
    if stat == "entropy":
        rows = np.zeros((1, n_bins), dtype=np.float32)
        rows[0, 0] = 1.0 / np.log2(n_bins)
        return rows, "entropy"
    raise ValueError(f"unknown stat {stat!r}; use mean / var / entropy")


def decode_with_rows(hist_bm, rows, mode):
    """Materialized (XLA) twin of the in-kernel decode: bins-major
    ``(nz, B, ny, nx)`` histogram volume → decoded ``(nz, ny, nx)`` scalar
    volume, same rows/mode as :func:`decode_weight_rows`. The off-TPU
    fallback path and the parity oracle for the fused kernel."""
    hf = jnp.asarray(hist_bm, jnp.float32)
    rows = jnp.asarray(rows, jnp.float32)
    if mode == "linear":
        return jnp.einsum("zbyx,b->zyx", hf, rows[0])
    if mode == "var":
        m = jnp.einsum("zbyx,b->zyx", hf, rows[0])
        c1 = jnp.einsum("zbyx,b->zyx", hf, rows[1])
        c2 = jnp.einsum("zbyx,b->zyx", hf, rows[2])
        c0 = jnp.einsum("zbyx,b->zyx", hf, rows[3])
        return c2 - 2.0 * m * c1 + m * m * c0
    safe = jnp.where(hf > 0.0, hf, 1.0)
    return rows[0, 0] * jnp.sum(-hf * jnp.log2(safe), axis=1)


def _decode_block(planes_ref, dw_ref, dec_ref, pchunk, B, mode, bi,
                  mom_out=None):
    """In-VMEM bins→scalar decode of one streamed histogram chunk.

    ``planes_ref`` is the (pchunk, B, NY, NX) bins-major block (block row
    ``bi(i)`` = front-to-back plane i), ``dw_ref`` the (n_w, B) SMEM weight
    rows from :func:`decode_weight_rows`, ``dec_ref`` the (pchunk, NY, NX)
    f32 scratch. Shared by the forward prologue and the backward's replay.

    ``mom_out`` (var mode, backward replay only): a (pchunk, 2, NY, NX)
    output ref receiving the two per-voxel chain moments ``[m, 2(mC0−C1)]``
    in BLOCK-ROW (z-layer) order — the variance cotangent chain
    ``d h_b = dw2[b] − 2m·dw1[b] + m²·dw3[b] + 2(mC0−C1)·dw0[b]`` then
    needs no separate moment pass over the histogram stream (a stacked
    einsum recomputing them cost a full 4.3 GB re-read at 512³×16).

    - 'linear': dec = Σ_b w0·h — B VPU FMAs/voxel (loop-carried: this
      association is the bitwise-exactness contract vs decode_with_rows).
    - 'var': four contractions (m, C1, C2, C0), dec = C2 − 2mC1 + m²C0,
      each summed as a BALANCED TREE over bins with every histogram plane
      loaded once and shared by all four rows — measured 30.6 → 26.1 ms
      on the 512³×16 → 1024² forward vs four loop-carried accumulators
      (shorter dependency chains; the reassociation is ~1e-7-level f32
      noise, within the pinned tolerances). Measured exact vs an f64
      oracle through the full sweep (9.6e-7 in image space at
      64³×16 → 256², loop-carried form).
    - 'entropy': dec = w00 · Σ_b −h·log2(max(h, tiny)) — exactly 0 at
      h == 0 (matches ops/histogram.py histogram_entropy's safe-log).
      Accuracy: the TPU's log2 is a ~1.5e-4-abs-error approximation in
      BOTH Mosaic and XLA (measured identical to 1.2e-6 pointwise between
      them), the analogue of the reference's device log2f; the remaining
      ~1e-3 image-space deviation from the materialized path is that
      pointwise difference amplified by the TF slope × composited planes,
      well under the 8-bit display quantum.
    """
    def _tree_sum(terms):
        while len(terms) > 1:
            terms = [
                terms[j] + terms[j + 1]
                for j in range(0, len(terms) - 1, 2)
            ] + ([terms[-1]] if len(terms) % 2 else [])
        return terms[0]

    for i in range(pchunk):
        b0 = bi(i)
        if mode == "entropy":
            def _t(b):
                h = planes_ref[b0, b].astype(jnp.float32)
                return -h * jnp.log2(jnp.maximum(h, _ENT_TINY))

            dec_ref[i] = dw_ref[0, 0] * _tree_sum(
                [_t(b) for b in range(B)]
            )
        elif mode == "var":
            hs = [planes_ref[b0, b] for b in range(B)]
            m = _tree_sum([dw_ref[0, b] * hs[b] for b in range(B)])
            c1 = _tree_sum([dw_ref[1, b] * hs[b] for b in range(B)])
            c2 = _tree_sum([dw_ref[2, b] * hs[b] for b in range(B)])
            c0 = _tree_sum([dw_ref[3, b] * hs[b] for b in range(B)])
            dec_ref[i] = c2 - 2.0 * m * c1 + m * m * c0
            if mom_out is not None:
                dt = mom_out.dtype
                mom_out[b0, 0] = m.astype(dt)
                mom_out[b0, 1] = (2.0 * (m * c0 - c1)).astype(dt)
        else:
            plane = dw_ref[0, 0] * planes_ref[b0, 0]
            for b in range(1, B):
                plane = plane + dw_ref[0, b] * planes_ref[b0, b]
            dec_ref[i] = plane


def _make_kernel(
    H: int, W: int, NY: int, NX: int, n_planes: int, n_lut: int,
    dz_sign, box_min, box_max, tstep: float, threshold: float,
    length_correction: bool, mm_dtype, pchunk: int, emit_ckpt: bool = False,
    tex_offset: float = 0.5, ess: bool = False, seed: bool = False,
    axis_scale=(1.0, 1.0), ck_stride: int = 0, filter_linear: bool = True,
    decode_bins: int = 0, reverse_planes: bool = False,
    decode_mode: str = "linear", manual_stream: bool = False,
):
    """``seed``: the accumulator initializes from a traced RGBA input image
    instead of zeros — "resume a sweep mid-flight". The distributed
    sort-last sweep's exact-early-termination pass 2 seeds each device's
    slab sweep with the true upstream prefix (crossing pixels) or alpha = 2
    (everything else, which freezes instantly and lets whole tiles skip), so
    the re-sweep costs only the crossing tiles. Mutually exclusive with
    ``emit_ckpt``.

    ``emit_ckpt``: additionally track per-ray transmittance in a trailing
    accumulator row (the backward pass's own T recursion, bit-identical to
    what the backward replays) and stream ONE T-at-chunk-start checkpoint per
    (strip, chunk) to a second output — the backward replays the within-chunk
    recursion from it, so it runs a SINGLE reverse sweep with exact prefix
    transmittance and suffix sums at 1/pchunk the per-plane checkpoint HBM
    traffic (see slice_vjp.py).

    FACTORIZED rgb ACCUMULATION (v6): compositing is linear in the rgb
    colors, and the relu-basis TF is linear in its per-knot features, so

        acc_c = sum_p col_c(q_p) at_p
              = base_c * A + sum_l c_{l,c} * R_l,
        A = sum_p at_p (== acc alpha),  R_l = sum_p relu(q_p - l) at_p

    — the per-plane loop therefore evaluates ONLY the alpha channel of the
    TF and accumulates the channel-independent R_l (one FMA per knot,
    reusing the relu features the alpha evaluation needs), and the rgb
    colors never materialize: 4 VPU ops per knot per sample instead of 6.
    The accumulator rows become [A, R_0..R_{n_lut-2}] (+T) and the last
    chunk expands them in place to premultiplied RGBA (exact algebra — the
    only float change vs the per-plane rgb form is reassociation of the
    per-plane sums into per-knot sums). A seeded sweep adds seed_rgb during
    the expansion (the recursion is additive in the seed).

    Grid is (n_chunks, n_strips) CHUNK-MAJOR: the accumulator is ONE
    (n_strips, n_rows, STRIP, W) output block with a CONSTANT index map, so
    Mosaic keeps the whole image VMEM-resident across the entire sweep and
    flushes it once (strips are addressed by a cheap leading-dim dynamic
    index; NOT aliasing — an aliased input block whose index repeats between
    consecutive steps is not refetched, which goes stale at n_strips == 1,
    and sublane-dynamic slices of a (n_rows, H, W) block were the v3
    mistake). The strip-invariant x weights are built once per chunk at the
    first strip into VMEM scratch and reused by all strips (~26% of the v4
    forward).

    The uniform ray-slope grid (ray j of row i has slope
    ``m = (mx0 + dmx * j, my0 + dmy * i)`` in volume axes, see
    march/slice.py's slope-space factorization) arrives as TRACED params
    (params_ref[0, 8:12]) — the unrotated pixel grid is one instance,
    shear-warp's bounding m-grid for rotated views is another, and a
    per-device row window under shard_map is a third; none of them force a
    recompile. Only ``dz_sign`` (sweep direction) is a static compile key."""
    xlo, ylo, zlo = box_min
    xhi, yhi, zhi = box_max
    sxs, sys = axis_scale  # x/y filter-grid scales (z folds into pre-blend)
    n_chunks = n_planes // pchunk
    n_strips = H // STRIP
    xt = _xtile(W)
    n_xt = W // xt
    # checkpoint stride: the backward may chunk FINER than this forward
    # (its preferred plane_chunk is smaller) — emit a T checkpoint every
    # ck_stride planes: row 0 from the persistent T state at chunk start,
    # later rows written per tile mid-loop (a full-strip mid-chunk T never
    # exists at one program point; skipped tiles' mid rows stay garbage and
    # the backward's live bitmap never reads them)
    ck_stride = ck_stride or pchunk
    assert pchunk % ck_stride == 0, (pchunk, ck_stride)

    # rows: [0] = A (accumulated alpha), [1..n_lut-1] = R_0..R_{n_lut-2},
    # [-1] = T when checkpointing; at least 4 so the final in-place RGBA
    # expansion always has room
    n_state = max(4, n_lut)
    n_rows = n_state + 1 if emit_ckpt else n_state
    t_row = n_rows - 1  # only meaningful when emit_ckpt

    def kernel(params_ref, zs_ref, coef_ref, planes_ref, *rest):
        # IN-KERNEL DISTRIBUTION DECODE (decode_bins = B > 0): planes_ref is
        # the FULL bins-major (nz, B, NY, NX) HISTOGRAM volume left in HBM
        # (memory_space=ANY) and streamed a (pchunk, B, NY, NX) z-layer
        # block at a time by MANUAL double-buffered DMA — chunk k+1's copy
        # is issued at the FIRST strip of chunk k, so the transfer overlaps
        # the whole chunk's sweep (~8 strip steps) instead of Mosaic's
        # one-step auto-prefetch window (the histogram block is 8-16x the
        # scalar path's plane block, and the one-step window stalled ~16 us
        # x n_chunks ~= 4 ms per pass at 512^3 x 16 -> 1024^2; measured
        # r5: fwd 18.2 -> ~12 ms on-chip). Layer blocks are walked in
        # z-ASCENDING storage order (backwards for dz < 0: block
        # n_chunks-1-k, and plane i of the chunk reads buffer row
        # pchunk-1-i) — the decoded scalar plane materializes only in
        # VMEM, via _decode_block in the y-resample prologue: the linear
        # contraction sum_b w[b] * hist[b] (mean and any linear
        # statistic), the 4-contraction variance combine, or the log2
        # entropy sum. This is the reference's in-march decode
        # (volumeRender_kernel.cu:354-480) fused into the sweep for EVERY
        # histogram statistic. Requires n_planes == nz (the pure-selection
        # pre-blend: zf = (p+0.5)*nz/n_planes - 0.5 = p, so no z-lerp ever
        # mixes two layers).
        if decode_bins:
            dw_ref = rest[0]  # (1, B) decode weights, SMEM
            rest = rest[1:]
        if ess:
            ess_ref = rest[0]
            rest = rest[1:]
        if seed:
            seed_ref = rest[0]  # (4, STRIP, W) initial accumulator block
            rest = rest[1:]
        out_ref = rest[0]  # (n_strips, n_rows, STRIP, W), VMEM-resident
        rest = rest[1:]
        if emit_ckpt:
            tck_ref, live_ref, flag_ref, tflag_ref, tmp_ref, wx_ref, ibx_ref \
                = rest[:7]
            rest = rest[7:]
        else:
            flag_ref, tflag_ref, tmp_ref, wx_ref, ibx_ref = rest[:5]
            rest = rest[5:]
        if decode_bins and manual_stream:
            dec_ref, hbuf_ref, hsem_ref = rest[:3]  # decode + DMA scratch
        elif decode_bins:
            dec_ref = rest[0]  # auto-pipelined block spec (unaligned dims)
        else:
            dec_ref = None
        k = pl.program_id(0)   # chunk (outer)
        si = pl.program_id(1)  # strip (inner)
        ox = params_ref[0, 0]
        oy = params_ref[0, 1]
        oz = params_ref[0, 2]
        density = params_ref[0, 3]
        brightness = params_ref[0, 4]
        tf_off = params_ref[0, 5]
        tf_scale = params_ref[0, 6]
        mx0 = params_ref[0, 8]
        dmx = params_ref[0, 9]
        my0 = params_ref[0, 10]
        dmy = params_ref[0, 11]
        # plane spacing is TRACED (params slot 7): a partial plane stack
        # (a distributed z-slab, a resumed sweep) has the FULL stack's
        # spacing, not (zhi - zlo) / local_n_planes
        spacing = params_ref[0, 7]
        row0 = si * STRIP

        @pl.when(jnp.logical_and(k == 0, si == 0))
        def _init_flags():
            for s in range(n_strips):
                flag_ref[s] = 0
            for j in range(n_strips * n_xt):
                tflag_ref[j] = 0

        @pl.when(k == 0)
        def _init_acc():
            out_ref[si] = jnp.zeros((n_rows, STRIP, W), dtype=jnp.float32)
            if seed:
                # only the seed ALPHA enters the recursion (row 0 = A);
                # seed rgb is added during the final expansion (additive)
                out_ref[si, 0] = seed_ref[3]
                if emit_ckpt:
                    # the backward's transmittance recursion starts from the
                    # seed: T_0 = 1 - seed alpha (frozen seeds give T_0 <= 0,
                    # below the cutoff, so every plane's freeze mask is 0)
                    out_ref[si, t_row] = 1.0 - seed_ref[3]
            elif emit_ckpt:
                out_ref[si, t_row] = jnp.ones((STRIP, W), dtype=jnp.float32)

        # --- all-scalar (SMEM) liveness: strip-chunk coverage, per-tile
        # x-footprint overlap, per-tile persistent early-termination flags ---
        z0 = zs_ref[0, k * pchunk]
        z1 = zs_ref[0, k * pchunk + pchunk - 1]
        strip_cov = _chunk_covered(
            params_ref, zs_ref, si, k, pchunk, dz_sign, box_min, box_max, W
        )
        live = jnp.logical_and(flag_ref[si] == 0, strip_cov)
        ebits = ess_ref[si, k] if ess else None
        tile_live = []
        for t in range(n_xt):
            m_a = mx0 + dmx * (t * xt)
            m_b = mx0 + dmx * (t * xt + xt - 1)
            xcov = _corner_overlap(ox, oz, m_a, m_b, z0, z1, xlo, xhi)
            tl = jnp.logical_and(
                live, jnp.logical_and(xcov, tflag_ref[si * n_xt + t] == 0)
            )
            if ess:
                # empty-space skip: no reachable value maps to nonzero alpha
                tl = jnp.logical_and(
                    tl,
                    jnp.bitwise_and(
                        jax.lax.shift_right_logical(ebits, t), 1
                    ) != 0,
                )
            tile_live.append(tl)

        if emit_ckpt:
            # per-(strip, chunk) bitmap of processed tiles: the backward
            # skips exactly what the forward skipped (zero cotangents there)
            bits = tile_live[0].astype(jnp.int32)
            for t in range(1, n_xt):
                bits = bits + tile_live[t].astype(jnp.int32) * (1 << t)
            live_ref[si, k] = bits
            # ONE chunk-start transmittance checkpoint (the backward replays
            # the within-chunk T recursion from it — 1/pchunk the HBM traffic
            # of per-plane streaming); must precede any tile update of T
            tck_ref[0] = out_ref[si, t_row]

        shrink = _shrinking_footprint(
            params_ref, box_min, box_max, dz_sign
        ).astype(jnp.float32)

        if seed:
            # seeded sweeps (the distributed pass 2) are mostly all-frozen:
            # once every strip froze, skip even the shared x-weight build.
            # (NOT on the plain forward: the extra SMEM reads serialize the
            # step and cost 0.7 ms at the headline config.)
            any_live = flag_ref[0] == 0
            for s in range(1, n_strips):
                any_live = jnp.logical_or(any_live, flag_ref[s] == 0)
            stage_x_when = jnp.logical_and(si == 0, any_live)
        else:
            stage_x_when = si == 0

        # reverse_planes: the plane input is stored z-ASCENDING (the raw
        # volume / histogram volume) and walked back-to-front by the index
        # map; front-to-back plane i of the chunk is block row pchunk-1-i.
        # This is what lets a pure-selection schedule (n_planes == nz)
        # stream the volume DIRECTLY instead of materializing a flipped
        # copy in HBM (measured: the flip fusions cost ~38 ms of the 95 ms
        # 1024^3 forward).
        def _bi(i):
            return pchunk - 1 - i if reverse_planes else i

        if decode_bins:
            if manual_stream:
                # manual double-buffered histogram stream (see kernel
                # docstring): slot k%2 carries chunk k; chunk k+1's copy is
                # issued before waiting on chunk k's, so it overlaps this
                # whole chunk's sweep
                def _hist_dma(kk, slot):
                    blk = (n_chunks - 1 - kk) if reverse_planes else kk
                    return pltpu.make_async_copy(
                        planes_ref.at[pl.ds(blk * pchunk, pchunk)],
                        hbuf_ref.at[slot],
                        hsem_ref.at[slot],
                    )

                @pl.when(jnp.logical_and(si == 0, k == 0))
                def _start_first_dma():
                    _hist_dma(0, 0).start()

                @pl.when(jnp.logical_and(si == 0, k + 1 < n_chunks))
                def _start_next_dma():
                    _hist_dma(k + 1, jax.lax.rem(k + 1, 2)).start()

                @pl.when(si == 0)
                def _wait_dma():
                    _hist_dma(k, jax.lax.rem(k, 2)).wait()

                hblock = hbuf_ref.at[jax.lax.rem(k, 2)]
            else:
                hblock = planes_ref  # auto-pipelined (pchunk, B, NY, NX)

            # decode the chunk's planes ONCE (at the first strip) into VMEM
            # scratch; every strip's y-resample reads the decoded planes.
            # The bins contraction / nonlinear combine (_decode_block) runs
            # on the VPU and the scalar plane never touches HBM. Gated on
            # ANY strip still live: once early termination froze the whole
            # image, later chunks skip their decode entirely (the stream
            # itself keeps running — an unawaited in-flight DMA at kernel
            # exit would leak its semaphore).
            if seed:
                decode_when = stage_x_when
            else:
                dec_live = flag_ref[0] == 0
                for s in range(1, n_strips):
                    dec_live = jnp.logical_or(dec_live, flag_ref[s] == 0)
                decode_when = jnp.logical_and(si == 0, dec_live)

            @pl.when(decode_when)
            def _stage_decode():
                _decode_block(hblock, dw_ref, dec_ref, pchunk,
                              decode_bins, decode_mode, _bi)

        @pl.when(stage_x_when)
        def _stage_x():
            # strip-invariant per-plane x weights: built once per chunk,
            # reused by every strip (the single biggest VPU block of v4)
            px = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0).astype(
                jnp.float32
            )
            mx_all = mx0 + dmx * px[:, 0]  # (W,)
            for i in range(pchunk):
                z = zs_ref[0, k * pchunk + i]
                x_at = ox + (z - oz) * mx_all
                wx, inbox_x = _tent_weights(x_at, NX, xlo, xhi, tex_offset,
                                            sxs, linear=filter_linear)
                wx_ref[i] = wx.astype(mm_dtype)
                ibx_ref[i] = inbox_x[None, :]

        @pl.when(live)
        def _stage_y():
            # per-plane y-resample, shared by every x-tile of the strip
            py = (row0 + jax.lax.broadcasted_iota(
                jnp.int32, (STRIP, 1), 0)).astype(jnp.float32)
            my_col = my0 + dmy * py  # (STRIP, 1)
            for i in range(pchunk):
                z = zs_ref[0, k * pchunk + i]
                y_at = oy + (z - oz) * my_col[:, 0]  # (STRIP,)
                wy, _ = _tent_weights(y_at, NY, ylo, yhi, tex_offset, sys,
                                      linear=filter_linear)
                plane = dec_ref[i] if decode_bins else planes_ref[_bi(i)]
                tmp_ref[i] = jnp.dot(
                    wy.astype(mm_dtype), plane.astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                )  # (STRIP, NX)

        for t in range(n_xt):
            sl = slice(t * xt, (t + 1) * xt)

            @pl.when(tile_live[t])
            def _tile(t=t, sl=sl):
                py = (row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (STRIP, 1), 0)).astype(jnp.float32)
                px = (t * xt + jax.lax.broadcasted_iota(
                    jnp.int32, (1, xt), 1)).astype(jnp.float32)
                mx_row = mx0 + dmx * px  # (1, xt)
                my_col = my0 + dmy * py  # (STRIP, 1)
                if length_correction:
                    # per-ray slab path length: spacing * |d| / |d_z|
                    stretch = jnp.sqrt(
                        1.0 + mx_row * mx_row + my_col * my_col
                    )  # (STRIP, xt)
                    alpha_base = density * spacing * stretch / tstep
                else:
                    alpha_base = jnp.full(
                        (STRIP, xt), density, dtype=jnp.float32
                    )

                acc_a = out_ref[si, 0, :, sl]
                R = [out_ref[si, 1 + l, :, sl] for l in range(n_lut - 1)]
                T = out_ref[si, t_row, :, sl] if emit_ckpt else None
                covered = None
                # unrolled over the plane block: amortizes per-grid-step
                # overhead over pchunk planes
                for i in range(pchunk):
                    z = zs_ref[0, k * pchunk + i]
                    y_at = oy + (z - oz) * my_col[:, 0]  # (STRIP,)
                    inbox_x = ibx_ref[i, 0, sl]  # (XTILE,)
                    y01 = (y_at - ylo) / (yhi - ylo)
                    inbox_y = ((y01 >= 0.0) & (y01 <= 1.0)).astype(
                        jnp.float32
                    )
                    res = jax.lax.dot_general(
                        tmp_ref[i].astype(mm_dtype), wx_ref[i, sl, :],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (STRIP, XTILE)

                    # alpha-only relu-basis TF; relu features r_l are reused
                    # by the R_l accumulation (see docstring: rgb factors)
                    q = jnp.clip(
                        (res - tf_off) * tf_scale * n_lut - 0.5,
                        0.0, n_lut - 1.0,
                    )
                    r_feat = [q] + [
                        jnp.maximum(q - li, 0.0) for li in range(1, n_lut - 1)
                    ]
                    col_a = coef_ref[0, 3] + coef_ref[0, 4 + 3] * q
                    for li in range(1, n_lut - 1):
                        col_a = (
                            col_a + coef_ref[0, (1 + li) * 4 + 3] * r_feat[li]
                        )

                    # t > 0 <=> (z - oz) has the sign of d_z; per-axis
                    # coverage is the in-box predicate (tent rows sum to 1)
                    in_front = (
                        (z < oz) if dz_sign < 0 else (z > oz)
                    ).astype(jnp.float32)
                    covered = inbox_x[None, :] * inbox_y[:, None] * in_front
                    a = jnp.minimum(col_a * alpha_base, 1.0) * covered
                    live_px = acc_a <= threshold
                    trans = jnp.where(live_px, 1.0 - acc_a, 0.0)
                    at = a * trans
                    for l in range(n_lut - 1):
                        R[l] = R[l] + r_feat[l] * at
                    acc_a = acc_a + at
                    if emit_ckpt:
                        mT = jnp.where(T >= 1.0 - threshold, T, 0.0)
                        T = T - mT * a  # the backward's own T recursion
                        if (i + 1) % ck_stride == 0 and i + 1 < pchunk:
                            # mid-chunk checkpoint for the finer-chunked bwd
                            tck_ref[(i + 1) // ck_stride, :, sl] = T
                out_ref[si, 0, :, sl] = acc_a
                for l in range(n_lut - 1):
                    out_ref[si, 1 + l, :, sl] = R[l]
                if emit_ckpt:
                    out_ref[si, t_row, :, sl] = T
                # tile-level early termination: every ray past the threshold
                # or permanently outside the (shrinking) footprint
                done = jnp.maximum(
                    (acc_a > threshold).astype(jnp.float32),
                    shrink * (1.0 - covered),
                )
                tflag_ref[si * n_xt + t] = (jnp.min(done) > 0.5).astype(
                    jnp.int32
                )

        # strip flag: cheap full-skip of later chunks once every tile froze
        allset = tflag_ref[si * n_xt + 0]
        for t in range(1, n_xt):
            allset = allset * tflag_ref[si * n_xt + t]
        flag_ref[si] = allset

        @pl.when(k == n_chunks - 1)
        def _finish():
            # in-place expansion [A, R_0..R_{n-2}] -> premultiplied RGBA
            # (all R rows are read before rows 0..2 are overwritten)
            A = out_ref[si, 0]
            # the base term multiplies ONLY the alpha accumulated during
            # THIS sweep: row 0 includes the seed's alpha, which contributed
            # no rgb here (its rgb is added back verbatim below)
            A_sweep = (A - seed_ref[3]) if seed else A
            rgb = []
            for c in range(3):
                col = coef_ref[0, c] * A_sweep
                for l in range(n_lut - 1):
                    col = col + (
                        coef_ref[0, (1 + l) * 4 + c] * out_ref[si, 1 + l]
                    )
                if seed:
                    col = col + seed_ref[c]
                rgb.append(col)
            out_ref[si, 0] = rgb[0] * brightness
            out_ref[si, 1] = rgb[1] * brightness
            out_ref[si, 2] = rgb[2] * brightness
            out_ref[si, 3] = A * brightness

    return kernel


def _preblend_planes(volume, n_planes, box_min, box_max, dz_sign=-1,
                     tex_offset=0.5, z_scale=1.0, filter_linear=True):
    """Front-to-back plane stack: CUDA-model z-resample via static two-tap
    gather lerp (march/slice.py sweep_slope_space semantics — BOTH taps
    clamp from the unclipped floor, so a below-range sample hits the edge
    texel twice, exactly like the texture unit). Static indices lower to
    slices, so this is exact f32 at memory-bound cost; the earlier
    (n_planes, nz) MXU formulation ran at the TPU's default bf16 matmul
    precision and silently rounded the volume to ~2e-3 (caught by the
    distributed sweep's exact static-tap pre-blend, parallel/sweep.py)."""
    nz, ny, nx = volume.shape
    zlo, zhi = box_min[2], box_max[2]
    spacing = (zhi - zlo) / n_planes
    zs = (zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)).astype(
        np.float32
    )
    if dz_sign < 0:
        zs = zs[::-1]
    zf_all = (zs - zlo) / (zhi - zlo) * (nz * z_scale) - tex_offset
    az = (zf_all - np.floor(zf_all)).astype(np.float32)
    if not filter_linear:  # point sampling: snap the lerp to the near tap
        az = np.floor(az + 0.5).astype(np.float32)
    iz1 = np.clip(np.floor(zf_all).astype(np.int64) + 1, 0, nz - 1)
    iz0 = np.clip(np.floor(zf_all).astype(np.int64), 0, nz - 1)
    if np.all(az < 1e-6):
        return volume[jnp.asarray(iz0)], zs  # pure (reversed) selection
    if not filter_linear and np.all(az > 1 - 1e-6):
        return volume[jnp.asarray(iz1)], zs  # pure selection, upper taps
    azj = jnp.asarray(az)[:, None, None]
    planes = (
        volume[jnp.asarray(iz0)] * (1.0 - azj)
        + volume[jnp.asarray(iz1)] * azj
    )
    return planes, zs


def _sweep_specs(H, W, NY, NX, n_planes, n_lut, pchunk, ess=False,
                 emit_ckpt=False, mm_dtype=jnp.float32, seed=False,
                 decode_bins=0, reverse_planes=False, decode_rows=1,
                 hist_dtype=jnp.float32, manual_stream=False):
    """(in_specs, out_spec, scratch, grid) shared by forward and pass 1:
    grid = (chunks, strips), CHUNK-major; the accumulator is ONE
    (n_strips, n_rows, STRIP, W) output block with a constant index map —
    VMEM-resident for the whole sweep, flushed once (the caller reshapes it
    back to (n_rows, H, W)).

    ``decode_bins = B > 0``: the plane input is the FULL bins-major
    histogram volume (nz, B, NY, NX) left in HBM (memory_space=ANY) and
    streamed a chunk of z-layers at a time by the kernel's own
    double-buffered DMA into a 2-slot VMEM scratch (chunk-wide prefetch
    window — see _make_kernel), plus a (decode_rows, B) decode-weight
    SMEM input and a decoded-plane VMEM scratch. ``reverse_planes`` walks
    the layer blocks back-to-front (dz < 0 front-to-back order without
    materializing a flipped copy of the histogram volume in HBM)."""
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    n_strips = H // STRIP
    n_chunks = n_planes // pchunk
    n_rows = acc_rows(n_lut, emit_ckpt)
    n_xt = W // _xtile(W)
    if reverse_planes:
        plane_ix = lambda k, s: (n_chunks - 1 - k, 0, 0, 0)
    else:
        plane_ix = lambda k, s: (k, 0, 0, 0)
    in_specs = [
        smem((1, 12), lambda k, s: (0, 0)),
        smem((1, n_planes), lambda k, s: (0, 0)),
        smem((1, 4 * n_lut), lambda k, s: (0, 0)),
        (pl.BlockSpec(memory_space=pltpu.ANY) if manual_stream
         else vmem((pchunk, decode_bins, NY, NX), plane_ix))
        if decode_bins
        else vmem((pchunk, NY, NX), lambda k, s: plane_ix(k, s)[:1] + (0, 0)),
    ]
    if decode_bins:
        in_specs.append(smem((decode_rows, decode_bins), lambda k, s: (0, 0)))
    if ess:
        in_specs.append(smem((n_strips, n_chunks), lambda k, s: (0, 0)))
    if seed:
        in_specs.append(vmem((4, STRIP, W), lambda k, s: (0, s, 0)))
    out_spec = vmem(
        (n_strips, n_rows, STRIP, W), lambda k, s: (0, 0, 0, 0)
    )
    scratch = [
        pltpu.SMEM((n_strips,), jnp.int32),           # strip ET flags
        pltpu.SMEM((n_strips * n_xt,), jnp.int32),    # per-tile ET flags
        pltpu.VMEM((pchunk, STRIP, NX), jnp.float32),  # y-resampled planes
        pltpu.VMEM((pchunk, W, NX), mm_dtype),         # hoisted x weights
        pltpu.VMEM((pchunk, 1, W), jnp.float32),       # x in-box masks
    ]
    if decode_bins:
        scratch.append(pltpu.VMEM((pchunk, NY, NX), jnp.float32))  # decoded
        if manual_stream:
            scratch.append(  # 2-slot manual double buffer, hist stream
                pltpu.VMEM((2, pchunk, decode_bins, NY, NX), hist_dtype)
            )
            scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid = (n_chunks, n_strips)
    return in_specs, out_spec, scratch, grid


def _uniform_grid_params(m: np.ndarray, name: str):
    """(m0, dm) of a uniform host grid; validates uniformity."""
    m = np.asarray(m, dtype=np.float32)
    if m.shape[0] < 2:
        return float(m[0]), 0.0
    dm = (float(m[-1]) - float(m[0])) / (m.shape[0] - 1)
    if not np.allclose(m, m[0] + dm * np.arange(m.shape[0]), atol=1e-5 * (abs(dm) + 1e-6) * m.shape[0]):
        raise ValueError(f"{name} slope grid must be uniform for the Pallas sweep")
    return float(m[0]), dm


def _pixel_slopes(width: int, height: int, focal: float):
    """The unrotated NDC pixel grid's ray slopes (march/slice.py semantics)."""
    u = ((np.arange(width, dtype=np.float32) / width) * 2.0 - 1.0)
    v = ((np.arange(height, dtype=np.float32) / height) * 2.0 - 1.0)
    return (u / (-focal)).astype(np.float32), (v / (-focal)).astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dz_sign", "width", "height", "march", "n_planes",
        "length_correction", "precision", "plane_chunk", "tex_offset",
        "empty_space_skip", "axis_scale", "filter_linear",
    ),
)
def _sweep_call(
    volume, origin, slopes, tf_lut, density, brightness, transfer_offset,
    transfer_scale, ess_stats=None, *, dz_sign, width, height, march,
    n_planes, length_correction, precision, plane_chunk, tex_offset=0.5,
    empty_space_skip=False, axis_scale=(1.0, 1.0, 1.0), filter_linear=True,
):
    nz, ny, nx = volume.shape
    pchunk = _fit_plane_chunk(plane_chunk, n_planes, ny, nx, width)

    # PURE-SELECTION fast path: with n_planes == nz (and the default z
    # filter grid) every plane IS a volume layer — zf = (p+0.5)*nz/n_planes
    # - 0.5 = p exactly — so instead of materializing a (possibly flipped)
    # copy of the whole volume in HBM, stream the volume directly and let
    # the kernel's reversed block index map walk it back-to-front
    # (measured: the flip fusions cost ~38 ms of the 95 ms 1024^3 forward
    # and ~2 ms at the 512^3 headline). Ineligible when inline ESS would
    # compute per-plane stats from the (unflipped) stack; cached ess_stats
    # describe the logical plane order and remain valid.
    pure_sel = (
        n_planes == nz and tex_offset == 0.5 and axis_scale[2] == 1.0
        and (not empty_space_skip or ess_stats is not None)
    )
    if pure_sel:
        (zlo, zhi) = march.box_min[2], march.box_max[2]
        spacing = (zhi - zlo) / n_planes
        zs = (
            zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)
        ).astype(np.float32)
        if dz_sign < 0:
            zs = zs[::-1].copy()
        planes_all = volume
    else:
        planes_all, zs = _preblend_planes(
            volume, n_planes, march.box_min, march.box_max, dz_sign,
            tex_offset, z_scale=axis_scale[2], filter_linear=filter_linear,
        )
    return sweep_preblended_planes(
        planes_all, jnp.asarray(zs), origin, slopes, tf_lut, density,
        brightness, transfer_offset, transfer_scale, dz_sign=dz_sign,
        width=width, height=height, march=march,
        length_correction=length_correction, precision=precision,
        plane_chunk=pchunk, tex_offset=tex_offset,
        empty_space_skip=empty_space_skip, axis_scale=axis_scale[:2],
        ess_stats=ess_stats, filter_linear=filter_linear,
        reverse_planes=pure_sel and dz_sign < 0,
    )


def sweep_preblended_planes(
    planes_all, zs, origin, slopes, tf_lut, density=0.05, brightness=1.0,
    transfer_offset=0.0, transfer_scale=1.0, *, dz_sign=-1, width, height,
    march: MarchConfig = MarchConfig(), length_correction=True,
    precision="f32", plane_chunk=8, tex_offset=0.5, empty_space_skip=False,
    acc_init=None, plane_spacing=None, axis_scale=(1.0, 1.0),
    ess_stats=None, filter_linear=True, reverse_planes=False,
):
    """Fused sweep over an ALREADY pre-blended, front-to-back plane stack.

    Everything is traced data: ``planes_all (P, NY, NX)``, ``zs (P,)`` (plane
    depths, matching the stack order), ``origin (3,)``, ``slopes (4,) =
    [mx0, dmx, my0, dmy]``. This is the entry point the distributed sort-last
    sweep uses per device inside shard_map (each device's slab planes, plane
    depths, and row window are shards — data, not compile keys); the
    single-device `_sweep_call` is pre-blend + this. Not jitted: call it
    inside your own jit/shard_map.

    ``acc_init``: optional (H, W, 4) initial accumulator (traced) — resumes
    the front-to-back recursion mid-flight; pixels seeded past the opacity
    threshold freeze instantly and their tiles skip (see _make_kernel).

    ``plane_spacing``: the inter-plane distance for the opacity length
    correction. REQUIRED knowledge when ``planes_all`` is a partial stack
    (a distributed z-slab, a resumed half-sweep): defaults to
    ``(box z-extent) / len(planes_all)``, which is only right for a full
    stack."""
    n_planes, ny, nx = planes_all.shape
    pchunk = _fit_plane_chunk(plane_chunk, n_planes, ny, nx, width)
    origin = jnp.asarray(origin, dtype=jnp.float32)
    slopes = jnp.asarray(slopes, dtype=jnp.float32)
    if plane_spacing is None:
        plane_spacing = (march.box_max[2] - march.box_min[2]) / n_planes
    params = jnp.stack(
        [
            origin[0], origin[1], origin[2],
            jnp.asarray(density, jnp.float32),
            jnp.asarray(brightness, jnp.float32),
            jnp.asarray(transfer_offset, jnp.float32),
            jnp.asarray(transfer_scale, jnp.float32),
            jnp.asarray(plane_spacing, jnp.float32),
            slopes[0], slopes[1], slopes[2], slopes[3],
        ]
    )[None, :]
    n_lut = tf_lut.shape[0]
    coef_flat = tf_relu_coefficients(
        jnp.asarray(tf_lut, dtype=jnp.float32)
    ).reshape(1, -1)
    zs_in = jnp.asarray(zs, jnp.float32)[None, :]

    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    seed = acc_init is not None
    kernel = _make_kernel(
        height, width, ny, nx, n_planes, n_lut, dz_sign,
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction, mm_dtype, pchunk, tex_offset=tex_offset,
        ess=empty_space_skip, seed=seed, axis_scale=tuple(axis_scale),
        filter_linear=filter_linear, reverse_planes=reverse_planes,
    )
    in_specs, out_spec, scratch, grid = _sweep_specs(
        height, width, ny, nx, n_planes, n_lut, pchunk, ess=empty_space_skip,
        mm_dtype=mm_dtype, seed=seed, reverse_planes=reverse_planes,
    )
    args = [params, zs_in, coef_flat, planes_all]
    if empty_space_skip:
        args.append(_ess_bitmap(
            planes_all, zs, origin, jnp.asarray(tf_lut, jnp.float32),
            jnp.asarray(transfer_offset, jnp.float32),
            jnp.asarray(transfer_scale, jnp.float32),
            slopes, march.box_min, march.box_max, height, width, pchunk,
            tex_offset, plane_stats=ess_stats, axis_scale=tuple(axis_scale),
        ))
    if seed:
        args.append(
            jnp.transpose(jnp.asarray(acc_init, jnp.float32), (2, 0, 1))
        )
    n_strips = height // STRIP
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_strips, acc_rows(n_lut, False), STRIP, width), jnp.float32
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    # (S, n_rows, STRIP, W) -> (H, W, 4); rows past 3 are spent R_l state
    return jnp.transpose(out[:, :4], (0, 2, 3, 1)).reshape(height, width, 4)


def pallas_sweep_slope_space(
    volume: jnp.ndarray,
    origin: jnp.ndarray,
    mx: np.ndarray,
    my: np.ndarray,
    tf_lut: jnp.ndarray,
    density=0.05,
    brightness=1.0,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    march: MarchConfig = MarchConfig(),
    dz_sign: int = -1,
    n_planes: int = 0,
    length_correction: bool = True,
    precision: str = "f32",
    plane_chunk: int = 8,
    tex_offset: float = 0.5,
    empty_space_skip: bool = False,
    axis_scale=(1.0, 1.0, 1.0),
    ess_stats=None,
    filter_linear: bool = True,
) -> jnp.ndarray:
    """Fused plane sweep over a UNIFORM ray-slope grid: (Hm, Wm, 4) RGBA.

    The Pallas counterpart of march/slice.py's ``sweep_slope_space`` —
    ``mx (Wm,)`` / ``my (Hm,)`` are HOST numpy slope grids (static per
    compile). Used directly by the shear-warp renderer for rotated views.
    Grids of any length are accepted: they are padded up to the kernel
    tiling and the output is cropped back (see _pad_grid). The grid
    parameters are TRACED (no recompile across views); only the sweep
    direction and the grid LENGTHS key the compile."""
    Wm = int(np.asarray(mx).shape[0])
    Hm = int(np.asarray(my).shape[0])
    mx = _pad_grid(mx, 128)
    my = _pad_grid(my, STRIP)
    mx0, dmx = _uniform_grid_params(mx, "mx")
    my0, dmy = _uniform_grid_params(my, "my")
    volume = jnp.asarray(volume)
    if n_planes <= 0:
        n_planes = 2 * volume.shape[0]
    W = int(mx.shape[0])
    band = _max_band_rows(W, int(jnp.shape(tf_lut)[0]))
    # taller images than the resident accumulator admits run as independent
    # row bands (rays are independent); every band shares ONE executable —
    # only its my0 (a traced param) differs
    my = _pad_grid(my, band) if my.shape[0] > band else my
    bands = []
    for row0 in range(0, my.shape[0], band):
        h = min(band, my.shape[0] - row0)
        bands.append(_sweep_call(
            volume, origin,
            jnp.asarray([mx0, dmx, my0 + dmy * row0, dmy], jnp.float32),
            tf_lut, density, brightness, transfer_offset,
            transfer_scale, ess_stats, dz_sign=int(dz_sign),
            width=W, height=h,
            march=march, n_planes=n_planes,
            length_correction=length_correction,
            precision=precision, plane_chunk=plane_chunk,
            tex_offset=float(tex_offset), empty_space_skip=empty_space_skip,
            axis_scale=tuple(axis_scale), filter_linear=filter_linear,
        ))
    out = bands[0] if len(bands) == 1 else jnp.concatenate(bands, axis=0)
    return out[:Hm, :Wm]


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
    tex_offset: float = 0.5,
    empty_space_skip: bool = False,
    axis_scale=(1.0, 1.0, 1.0),
    ess_stats=None,
    filter_linear: bool = True,
) -> jnp.ndarray:
    """Fused forward render; same semantics as slice_render_image.

    ``empty_space_skip``: exact TF-interval tile culling (see _ess_bitmap).
    Opt-in: the bitmap costs a block-min/max pass over the plane stack
    (~6 ms at 512^3), which pays off for sparse volumes under windowed TFs
    (zero-alpha bands) but is pure overhead on dense ramp TFs. Rendering the
    same volume repeatedly: pass ``ess_stats = precompute_ess_stats(volume,
    ...)`` to hoist that pass out of the per-frame cost entirely.
    """
    volume = jnp.asarray(volume)
    if n_planes <= 0:
        n_planes = 2 * volume.shape[0]
    mx, my = _pixel_slopes(width, height, focal)
    return pallas_sweep_slope_space(
        volume, origin, mx, my, tf_lut, density, brightness,
        transfer_offset, transfer_scale, march=march, dz_sign=-1,
        n_planes=n_planes, length_correction=length_correction,
        precision=precision, plane_chunk=plane_chunk, tex_offset=tex_offset,
        empty_space_skip=empty_space_skip, axis_scale=axis_scale,
        ess_stats=ess_stats, filter_linear=filter_linear,
    )


def hist_render_supported(hist_shape, width: int, height: int,
                          n_lut: int = 9) -> bool:
    """True when the in-kernel-decode sweep can serve this config: bins-major
    histogram volume (nz, B, ny, nx), kernel-tiled image, the histogram
    chunk + decoded scratch + accumulator within VMEM budgets."""
    nz, B, ny, nx = hist_shape
    return (
        width % 128 == 0
        and height % STRIP == 0
        and 4 * ny * nx * (B + 1) <= _VMEM_HIST_BLOCK_BUDGET // 2
        and acc_rows(n_lut, True) * height * width * 4 <= _VMEM_ACC_BUDGET
    )


def pallas_hist_render(
    hist_bm: jnp.ndarray,
    weights: jnp.ndarray,
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
    length_correction: bool = True,
    precision: str = "f32",
    plane_chunk: int = 0,
    focal: float = 2.0,
    stat: str = "linear",
) -> jnp.ndarray:
    """Fused render STRAIGHT FROM A DISTRIBUTION VOLUME: the per-voxel
    histogram decodes inside the sweep kernel.

    ``hist_bm`` is the bins-MAJOR histogram volume ``(nz, B, ny, nx)`` (the
    framework's native layout for in-kernel decode: B stays a sublane axis,
    so a streamed chunk of z-layers tiles VMEM perfectly; the (..., B)
    bins-minor layout would pad 16 bins onto 128 lanes). With the default
    ``stat='linear'``, ``weights (B,)`` are the linear decode coefficients:
    density = sum_b w[b] * hist[b] (e.g. bin centers / 255 for the mean
    statistic, volumeRender_kernel.cu:1083-1115). ``stat='var'`` /
    ``stat='entropy'`` select the nonlinear prologue combines (reference
    queries 2/3, volumeRender_kernel.cu:749-769); pass the matching weight
    rows from :func:`decode_weight_rows` (var: the (4, B) matrix; entropy:
    its (1, B) normalizer row). The decoded scalar volume NEVER exists in
    HBM — z-layer chunks stream into VMEM and the decode happens in the
    kernel's plane prologue, generalizing the reference's query-7 in-march
    decode (volumeRender_kernel.cu:354-480) to the fused MXU sweep for
    every histogram statistic.

    Constraints: ``n_planes == nz`` (the pure-selection plane schedule — no
    z-lerp mixes two layers, so planes ARE layers walked back-to-front) and
    the kernel tiling (width % 128, height % STRIP); check
    :func:`hist_render_supported`.
    """
    nz, B, ny, nx = hist_bm.shape
    n_planes = nz
    n_lut = int(jnp.shape(tf_lut)[0])
    assert width % 128 == 0 and height % STRIP == 0, (width, height)
    pchunk = _fit_plane_chunk(
        plane_chunk or 8, n_planes, ny, nx, width, bins=B,
        plane_bytes=jnp.dtype(hist_bm.dtype).itemsize,
    )

    (xlo, ylo, zlo) = march.box_min
    (xhi, yhi, zhi) = march.box_max
    spacing = (zhi - zlo) / n_planes
    zs = (
        zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)
    ).astype(np.float32)[::-1]  # front-to-back for the -z camera

    mxh, myh = _pixel_slopes(width, height, focal)
    slopes = jnp.asarray(
        [mxh[0], mxh[1] - mxh[0] if width > 1 else 0.0,
         myh[0], myh[1] - myh[0] if height > 1 else 0.0], jnp.float32,
    )
    origin = jnp.asarray(origin, dtype=jnp.float32)
    params = jnp.stack(
        [
            origin[0], origin[1], origin[2],
            jnp.asarray(density, jnp.float32),
            jnp.asarray(brightness, jnp.float32),
            jnp.asarray(transfer_offset, jnp.float32),
            jnp.asarray(transfer_scale, jnp.float32),
            jnp.asarray(spacing, jnp.float32),
            slopes[0], slopes[1], slopes[2], slopes[3],
        ]
    )[None, :]
    coef_flat = tf_relu_coefficients(
        jnp.asarray(tf_lut, dtype=jnp.float32)
    ).reshape(1, -1)
    zs_in = jnp.asarray(zs, jnp.float32)[None, :]
    dw = jnp.asarray(weights, jnp.float32)
    if dw.ndim == 1:
        dw = dw[None, :]
    n_w = {"linear": 1, "var": 4, "entropy": 1}[stat]
    assert dw.shape == (n_w, B), (dw.shape, stat, B)

    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    ms = hist_manual_stream_ok(ny, nx, hist_bm.dtype)
    kernel = _make_kernel(
        height, width, ny, nx, n_planes, n_lut, -1,
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction, mm_dtype, pchunk, decode_bins=B,
        reverse_planes=True, decode_mode=stat, manual_stream=ms,
    )
    in_specs, out_spec, scratch, grid = _sweep_specs(
        height, width, ny, nx, n_planes, n_lut, pchunk,
        mm_dtype=mm_dtype, decode_bins=B, reverse_planes=True,
        decode_rows=n_w, hist_dtype=hist_bm.dtype, manual_stream=ms,
    )
    n_strips = height // STRIP
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_strips, acc_rows(n_lut, False), STRIP, width), jnp.float32
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # above the scalar path's 100 MB: SMALL bin counts (B <= 8)
            # leave room for a larger plane chunk whose histogram block
            # Mosaic then double-buffers — measured 103.5 MB scoped vmem
            # at B=4, 512^3 -> 1024^2, pchunk 8
            vmem_limit_bytes=_HIST_VMEM_LIMIT,
        ),
    )(params, zs_in, coef_flat, jnp.asarray(hist_bm), dw)
    return jnp.transpose(out[:, :4], (0, 2, 3, 1)).reshape(height, width, 4)
