"""Distributed object-order sweep: z-slabs on bricks, image rows on rays.

The single-device slice sweep (vrdd_tpu/march/slice.py) is the per-chip fast
path; this module scales it over the ("bricks", "rays") mesh
(vrdd_tpu/parallel/mesh.py):

- the volume's Z axis is sharded into slabs on the ``bricks`` axis; each
  device PRE-BLENDS only the sweep planes falling inside its slab (one
  ghost layer each side via ICI ``ppermute`` covers cross-slab bilinear
  taps) and sweeps them with the same separable-matmul resample + composite,
- image ROWS are sharded on the ``rays`` axis (each device resamples only
  its row strip: the Wy matmul shrinks proportionally),
- per-slab partial images combine front-to-back with the associative "over"
  operator — sort-last compositing, the compositing-tree analogue of
  context/sequence parallelism (SURVEY.md §5),
- early ray termination is EXACT at plane granularity via a two-pass
  scheme (cf. vrdd_tpu/parallel/bricks.py): pass 1 sweeps the slabs and
  locates, per pixel, the slab where accumulated alpha crosses the
  threshold plus the upstream prefix entering it; pass 2 re-sweeps only
  that slab, RESUMING the sequential recursion from the true prefix (the
  fused kernel's acc_init seed — everything else seeds past the threshold,
  freezes instantly, and its tiles skip). On the pallas backend pass 1
  keeps the kernel's own cutoff: slabs before the crossing provably never
  truncate, truncation at/after the crossing still registers the first
  crossing, and non-saturating pixels never truncate anywhere.

Unlike the host-static single-device path, per-device quantities (plane
z-values, row coordinates) arrive as SHARDED ARRAYS — shard_map traces one
program for all devices, so anything device-dependent must be data, not
Python constants. The plane pre-blend therefore builds its z tent weights in
jnp (same CUDA-model math as the host path).

The reference has no distribution at all (single process, single GPU;
SURVEY.md §2.3) — this subsystem is created per the TPU-native plan.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vrdd_tpu.march.slice import _axis_weights, _tf_onehot_matmul
from vrdd_tpu.pallas.slice_kernel import (
    STRIP,
    pallas_supported,
)
from vrdd_tpu.pallas.slice_vjp import (
    sweep_preblended_hist_diff,
    sweep_preblended_planes_diff,
)
from vrdd_tpu.parallel.bricks import _halo_exchange
from vrdd_tpu.parallel.mesh import BRICK_AXIS, RAY_AXIS
from vrdd_tpu.utils.config import MarchConfig


def shard_scalar_volume(volume, mesh: Mesh):
    """Place a (Z, Y, X) scalar volume sharded over Z on the bricks axis."""
    return jax.device_put(
        volume, NamedSharding(mesh, P(BRICK_AXIS, None, None))
    )


def shard_hist_volume(hist_bm, mesh: Mesh):
    """Place a bins-major (Z, B, Y, X) DISTRIBUTION volume z-slab-sharded
    on the bricks axis (the layout :func:`distributed_hist_render`
    consumes — each brick streams its own histogram slab straight into the
    in-kernel decode)."""
    return jax.device_put(
        hist_bm, NamedSharding(mesh, P(BRICK_AXIS, None, None, None))
    )


def _local_sweep(
    planes: jnp.ndarray,  # (P, Y, X) front-to-back
    zs: jnp.ndarray,  # (P,)
    mx: np.ndarray,  # (W,) host
    my: jnp.ndarray,  # (Hl,) traced (row-sharded)
    origin: jnp.ndarray,
    tf_lut, density, toff, tscl,
    alpha_scale: jnp.ndarray,  # (Hl, W)
    box, threshold, plane_chunk: int, dz_sign: int = -1,
    tex_offset: float = 0.5, axis_scale=(1.0, 1.0),
):
    """Front-to-back composite of pre-blended planes on a row strip.

    ``threshold`` is a per-pixel (Hl, W) freeze level (>1 disables ET).
    """
    (xlo, ylo, zlo), (xhi, yhi, zhi) = box
    n_planes, ny, nx = planes.shape
    width, height = mx.shape[0], my.shape[0]
    ox, oy, oz = origin[0], origin[1], origin[2]

    chunk = plane_chunk
    while n_planes % chunk:
        chunk -= 1
    n_chunks = n_planes // chunk
    zs_c = zs.reshape(n_chunks, chunk)
    planes_c = planes.reshape(n_chunks, chunk, ny, nx)
    mx_j = jnp.asarray(mx)

    def body(acc, xs):
        z, pl = xs
        x_at = ox + (z[:, None] - oz) * mx_j[None, :]  # (C, W)
        y_at = oy + (z[:, None] - oz) * my[None, :]  # (C, Hl)
        wx = _axis_weights(
            x_at.reshape(-1), nx, xlo, xhi, tex_offset, axis_scale[0]
        ).reshape(chunk, width, nx)
        wy = _axis_weights(
            y_at.reshape(-1), ny, ylo, yhi, tex_offset, axis_scale[1]
        ).reshape(chunk, height, ny)
        tmp = jax.lax.dot_general(
            wy, pl, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        resampled = jax.lax.dot_general(
            tmp, wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        col = _tf_onehot_matmul(resampled, tf_lut, toff, tscl)
        in_front = (jnp.sign(z - oz) * dz_sign) > 0
        covered = (
            (jnp.sum(jnp.abs(wy), axis=2) > 0.0)[:, :, None]
            & (jnp.sum(jnp.abs(wx), axis=2) > 0.0)[:, None, :]
            & in_front[:, None, None]
        )
        # clamped like the single-device sweep: monotone alpha is also what
        # makes the two-pass distributed ET detection exact
        a = jnp.where(
            covered,
            jnp.minimum(col[..., 3] * density * alpha_scale[None], 1.0),
            0.0,
        )
        rgba = jnp.concatenate(
            [col[..., :3] * a[..., None], a[..., None]], axis=-1
        )
        for k in range(chunk):
            new_acc = acc + rgba[k] * (1.0 - acc[..., 3:4])
            acc = jnp.where(acc[..., 3:4] > threshold[..., None], acc, new_acc)
        return acc, None

    acc0 = jnp.zeros((height, width, 4), dtype=jnp.float32)
    acc, _ = jax.lax.scan(jax.checkpoint(body), acc0, (zs_c, planes_c))
    return acc


def _over(acc, part):
    return acc + part * (1.0 - acc[..., 3:4])


#: octant cache for the rotated paths' permuted+re-sharded volume: ONE slot
#: per entry point ('scalar' / 'hist'), each holding (source_array, perm,
#: mesh, spec, permuted). Rotating within a principal-axis octant then
#: really moves no volume data (the docstring contract) — without this,
#: every frame re-dispatched the transpose + device_put eagerly (measured
#: ~400 ms/frame for a 4.3 GB bins-major histogram volume on the tunneled
#: v5e). Per-entry-point slots keep the amortization when scalar and hist
#: renders alternate (one shared slot thrashed); one slot per entry point
#: bounds pinned device memory at one permuted copy each. Long-lived
#: processes that drop a volume should call :func:`clear_octant_cache` —
#: the slot holds strong references to both the source and the permuted
#: copy until then.
_OCTANT_CACHE: dict = {}


def clear_octant_cache(slot: str = None) -> None:
    """Release the octant cache's pinned device arrays (``slot`` = 'scalar'
    or 'hist'; default both). The cache holds strong references to the last
    rotated render's source volume AND its permuted copy (~2x the volume's
    bytes pinned in HBM) so same-octant frames skip the transpose; call
    this when a long-lived process (the viewer, a fitting loop) is done
    with a volume."""
    if slot is None:
        _OCTANT_CACHE.clear()
    else:
        _OCTANT_CACHE.pop(slot, None)


def _permuted_sharded(src, perm, mesh, spec, slot="scalar"):
    """Transpose ``src`` by ``perm`` and place it as ``spec`` on ``mesh``,
    memoized per (source identity, perm, mesh) in the entry point's cache
    slot. Tracers bypass the cache so the transpose stays inside the
    autodiff graph (its transpose is the gradient's inverse permutation)."""
    if isinstance(src, jax.core.Tracer):
        return jax.device_put(jnp.transpose(src, perm), NamedSharding(mesh, spec))
    ent = _OCTANT_CACHE.get(slot)
    if ent is not None:
        s, p, m, sp, out = ent
        if s is src and p == perm and m == mesh and sp == spec:
            return out
    out = jax.device_put(jnp.transpose(src, perm), NamedSharding(mesh, spec))
    _OCTANT_CACHE[slot] = (src, perm, mesh, spec, out)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "mx_bytes", "my_bytes", "march", "mesh", "dz_sign", "n_planes",
        "length_correction", "plane_chunk", "backend", "wrt",
        "tex_offset", "axis_scale", "volume_mode",
    ),
)
def _sweep_slope_space_call(
    volume: jnp.ndarray,
    origin: jnp.ndarray,
    tf_lut: jnp.ndarray,
    density,
    brightness,
    transfer_offset,
    transfer_scale,
    *,
    mx_bytes: bytes,
    my_bytes: bytes,
    march: MarchConfig,
    mesh: Mesh,
    dz_sign: int,
    n_planes: int,
    length_correction: bool,
    plane_chunk: int,
    backend: str,
    wrt: tuple,
    tex_offset: float = 0.5,
    axis_scale: tuple = (1.0, 1.0, 1.0),
    volume_mode: str = "slab",
) -> jnp.ndarray:
    """Distributed sweep over an arbitrary uniform slope grid (core).

    The slope grids arrive as raw float32 bytes so they key the jit cache
    (host numpy, like the single-device sweeps). ``dz_sign`` is the common
    sign of d_z over the grid — it flips the front-to-back plane order and
    the sort-last compositing order. See :func:`distributed_sweep_render`
    for semantics/backends and :func:`distributed_shearwarp_render` for the
    rotated-camera entry point.
    """
    mx = np.frombuffer(mx_bytes, dtype=np.float32)
    my_host = np.frombuffer(my_bytes, dtype=np.float32)
    width, height = mx.shape[0], my_host.shape[0]
    nz, ny, nx = volume.shape
    if n_planes <= 0:
        n_planes = 2 * nz
    nb = mesh.shape[BRICK_AXIS]
    nr = mesh.shape[RAY_AXIS]
    if volume_mode == "slab":
        # z-slab sharding needs the default filter grid: a scaled grid
        # (axis_scale[2] != 1, the flexible-block padded-grid fetch) maps a
        # plane's z-taps OUTSIDE its owning slab's +-1 ghost layer, so those
        # taps are unreachable by the halo exchange. Flexible stats grids
        # are tiny (tens of blocks per axis) — use volume_mode='replicated'
        # (plane-schedule sharding) for them instead.
        assert tex_offset == 0.5 and tuple(axis_scale) == (1.0, 1.0, 1.0), (
            "volume_mode='slab' supports only the default filter grid; use "
            "volume_mode='replicated' for tex_offset/axis_scale variants"
        )
        assert nz % nb == 0, f"Z={nz} must divide over {nb} bricks"
    else:
        assert volume_mode == "replicated", volume_mode
    assert n_planes % nb == 0, f"n_planes={n_planes} must divide over {nb}"
    assert height % nr == 0, f"H={height} must divide over {nr} ray shards"
    zl = nz // nb if volume_mode == "slab" else nz
    (xlo, ylo, zlo) = march.box_min
    (xhi, yhi, zhi) = march.box_max
    thr = march.opacity_threshold

    # ascending global plane schedule, sharded so device d's planes lie in
    # slab d (plane k of slab d is plane d*Pl + k globally)
    spacing = (zhi - zlo) / n_planes
    zs_global = (
        zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)
    ).astype(np.float32)

    stretch = np.sqrt(1.0 + my_host[:, None] ** 2 + mx[None, :] ** 2)
    alpha_scale_host = (
        (spacing * stretch / march.tstep).astype(np.float32)
        if length_correction
        else np.ones((height, width), dtype=np.float32)
    )

    origin = jnp.asarray(origin, dtype=jnp.float32)
    box = (march.box_min, march.box_max)

    # host-static pre-blend taps: plane k of slab d sits at padded-frame
    # position lf = zf - d*zl + 1 with zf = (d*ppd + k + 0.5)*nz/n_planes
    # - 0.5; the d-terms cancel exactly (ppd*nz == n_planes*zl), so
    # lf = (k + 0.5)*nz/n_planes + 0.5 — the SAME static two-tap weights on
    # every device. The global clamp-to-edge (zf clipped to [0, nz-1]) only
    # bites at the outermost planes of the boundary devices, where
    # _halo_exchange replicates the edge layer — making the unclamped
    # two-tap lerp equal the clamped one identically. (A traced dense
    # (P, zl+2) MXU pre-blend measured ~9 ms at 512^3 on one chip; these
    # static-index gathers are the memory-bound minimum, flip folded in.)
    lf = (
        (np.arange(n_planes // nb, dtype=np.float64) + 0.5)
        * nz / n_planes + 0.5
    )
    if dz_sign < 0:
        lf = lf[::-1]  # front-to-back for dz < 0: descending z
    iz0_host = np.floor(lf).astype(np.int32)
    az_host = (lf - np.floor(lf)).astype(np.float32)[:, None, None]
    # low-z boundary: any plane with lf < 1 on device 0 samples below the
    # volume; _halo_exchange replicates the edge layer into the ghost, so
    # the two-tap lerp equals the clamped edge texel identically — the same
    # clamp-from-the-unclipped-floor semantics as the single-device
    # pre-blends (march/slice.py, pallas _preblend_planes) and the CUDA
    # texture unit. (An earlier revision of those pre-blends leaked the
    # below-range tap onto texel 1 and this path patched device 0's planes
    # to match; both sides now clamp properly.)
    # n_planes == nz lands planes exactly on layers: pure (reversed) layer
    # selection, no lerp, no halo taps (mirrors _preblend_planes)
    pure_select = bool(np.all(az_host < 1e-6)) and bool(np.all(lf >= 1.0))

    hl = height // nr
    ppd = n_planes // nb  # planes per device slab
    n_lut = int(tf_lut.shape[0])
    pallas_ok = (
        width % 128 == 0 and hl % STRIP == 0
        and pallas_supported((nz, ny, nx), width, hl, ppd, n_lut=n_lut)
    )
    if backend == "pallas" and not pallas_ok:
        raise ValueError(
            f"backend='pallas' needs width % 128 == 0 and (height/rays) % "
            f"{STRIP} == 0 and the plane AND the max(4, n_lut)-row factorized "
            f"accumulator to fit VMEM; got width={width}, "
            f"height/rays={hl}, plane=({ny},{nx}), n_lut={n_lut}"
        )
    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_ok and jax.default_backend() == "tpu"
    )

    def per_device(
        vol_local, zs_local, my_local, alpha_local,
        origin, tf_lut, density, brightness, toff, tscl,
    ):
        d = jax.lax.axis_index(BRICK_AXIS)
        zs_ftb = (
            jnp.flip(zs_local, axis=0) if dz_sign < 0 else zs_local
        )  # front-to-back order

        if volume_mode == "replicated":
            # plane-schedule sharding: the volume is replicated (coarse
            # stats grids are KBs — the flexible-block representation's
            # whole point is compression), each brick pre-blends only ITS
            # contiguous plane subrange, straight from the full volume with
            # the exact single-device clamp-from-the-unclipped-floor taps
            # (march/slice.py _preblend_planes semantics) — valid for ANY
            # tex_offset/axis_scale, no halo needed. Sort-last compositing
            # and the two-pass ET are unchanged: a contiguous plane range
            # IS a z interval.
            zf = (
                (zs_ftb - zlo) / (zhi - zlo) * (nz * axis_scale[2])
                - tex_offset
            )
            izf = jnp.floor(zf)
            az_t = (zf - izf)[:, None, None]
            iz0_t = jnp.clip(izf.astype(jnp.int32), 0, nz - 1)
            iz1_t = jnp.clip(izf.astype(jnp.int32) + 1, 0, nz - 1)
            planes = (
                vol_local[iz0_t] * (1.0 - az_t) + vol_local[iz1_t] * az_t
            )
        # pre-blend local planes with the host-static two-tap weights (see
        # the derivation above distributed_sweep_render's per_device call);
        # differentiable through XLA's gather transpose (scatter-add into
        # the haloed slab, then the ppermute adjoint returns ghost-layer
        # cotangents to their owners).
        elif pure_select and use_pallas:
            # pure selection on the fused kernel: stream the slab shard
            # DIRECTLY (reversed block index map for dz < 0; d_planes come
            # back in slab-layer order) — no flipped copy of the slab in
            # HBM on either side of either pass (slice_kernel.py
            # reverse_planes)
            planes = vol_local
        elif pure_select:
            planes = vol_local[jnp.asarray(iz0_host - 1)]  # local frame
        else:
            padded = _halo_exchange(vol_local, nb)  # (zl + 2, Y, X)
            planes = (
                padded[jnp.asarray(iz0_host)] * (1.0 - az_host)
                + padded[jnp.asarray(iz0_host + 1)] * az_host
            )

        sweep = lambda threshold: _local_sweep(
            planes, zs_ftb, mx, my_local, origin, tf_lut, density,
            toff, tscl, alpha_local, box, threshold, plane_chunk, dz_sign,
            tex_offset, axis_scale[:2],
        )
        no_cut = jnp.full((hl, width), 2.0, dtype=jnp.float32)

        # pass 1: slab partials, folded front-to-back. On the pallas backend
        # the fused kernel keeps its own opacity cutoff: a slab BEFORE the
        # crossing slab never truncates (its local alpha <= the composited
        # prefix <= thr there), so prefixes up to the crossing are
        # bit-identical to the untruncated sweep; a truncated partial at or
        # after the crossing still registers after_alpha > thr (truncation
        # freezes only once local alpha exceeded thr), so the first-crossing
        # detection is exact, later partials are discarded, and
        # non-saturating pixels never truncated anywhere. The slope grid /
        # plane depths / row window are traced, so the one compiled kernel
        # serves every device's shard. The XLA sweep's masked scan does the
        # same work either way — it keeps the simpler no-cutoff partials.
        if use_pallas:
            dmy_l = (
                my_local[1] - my_local[0] if hl > 1 else jnp.float32(0.0)
            )
            slopes = jnp.stack(
                [
                    jnp.float32(mx[0]),
                    jnp.float32(mx[1] - mx[0]) if width > 1 else jnp.float32(0.0),
                    my_local[0],
                    dmy_l,
                ]
            )
            rev = pure_select and dz_sign < 0
            partial = sweep_preblended_planes_diff(
                planes, zs_ftb, origin, slopes, tf_lut, density, 1.0,
                toff, tscl, dz_sign=dz_sign, width=width, height=hl,
                march=march, length_correction=length_correction,
                plane_chunk=plane_chunk, plane_spacing=spacing, wrt=wrt,
                tex_offset=tex_offset, axis_scale=axis_scale[:2],
                reverse_planes=rev,
            )
        else:
            partial = sweep(no_cut)  # (Hl, W, 4)

        if nb == 1:
            # one brick: the kernel's own cutoff IS the global early
            # termination, so pass 1 is already exact (pass 2 would seed
            # with the zero prefix and recompute it bitwise — value AND
            # gradient). The XLA partial was computed cutoff-free; one
            # thresholded sweep is its exact single-pass form.
            if not use_pallas:
                partial = sweep(jnp.full((hl, width), thr, dtype=jnp.float32))
            return partial * brightness

        parts = jax.lax.all_gather(partial, BRICK_AXIS, axis=0)  # (nb, Hl, W, 4)
        # dz < 0: device nb-1 (largest z) is nearest the camera
        ordered = jnp.flip(parts, axis=0) if dz_sign < 0 else parts

        acc0 = jnp.zeros_like(partial)

        def fold(acc, part):
            return _over(acc, part), acc

        final_nc, prefixes = jax.lax.scan(fold, acc0, ordered)
        after_alpha = jnp.concatenate(
            [prefixes[1:, ..., 3], final_nc[None, ..., 3]], axis=0
        )
        crossed = after_alpha > thr  # (nb, Hl, W)
        saturating = jnp.any(crossed, axis=0)
        j_star = jnp.argmax(crossed, axis=0)
        prefix_at = jnp.take_along_axis(
            prefixes, j_star[None, ..., None], axis=0
        )[0]
        a_up = prefix_at[..., 3]

        # pass 2: re-sweep only the crossing slab
        my_pos = (nb - 1 - d) if dz_sign < 0 else d  # ordered device index
        flag = saturating & (j_star == my_pos)
        if use_pallas:
            # resume the sequential recursion mid-flight on the fused kernel:
            # crossing pixels seed with their true upstream prefix (the
            # global freeze test is then the kernel's own acc_a <= thr);
            # everything else seeds past the threshold, freezes instantly,
            # and whole tiles skip — the re-sweep costs only crossing tiles
            frozen = jnp.concatenate(
                [jnp.zeros((hl, width, 3), jnp.float32),
                 jnp.full((hl, width, 1), 2.0, jnp.float32)], axis=-1,
            )
            seed_img = jnp.where(flag[..., None], prefix_at, frozen)
            out2 = sweep_preblended_planes_diff(
                planes, zs_ftb, origin, slopes, tf_lut, density, 1.0,
                toff, tscl, dz_sign=dz_sign, width=width, height=hl,
                march=march, length_correction=length_correction,
                plane_chunk=plane_chunk, acc_init=seed_img,
                plane_spacing=spacing, wrt=wrt,
                tex_offset=tex_offset, axis_scale=axis_scale[:2],
                reverse_planes=pure_select and dz_sign < 0,
            )
            exact = jax.lax.psum(
                jnp.where(flag[..., None], out2, 0.0), BRICK_AXIS
            )
        else:
            # XLA fallback: local-threshold form of the same resume
            tau = (thr - a_up) / jnp.maximum(1.0 - a_up, 1e-6)
            partial2 = sweep(jnp.where(flag, tau, 2.0))
            contrib2 = jax.lax.psum(
                jnp.where(flag[..., None], partial2, 0.0), BRICK_AXIS
            )
            exact = prefix_at + contrib2 * (1.0 - a_up[..., None])
        rgba = jnp.where(saturating[..., None], exact, final_nc)
        return rgba * brightness

    out = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(BRICK_AXIS, None, None) if volume_mode == "slab"
            else P(None, None, None),
            P(BRICK_AXIS),
            P(RAY_AXIS),
            P(RAY_AXIS, None),
            P(None), P(None, None), P(), P(), P(), P(),
        ),
        out_specs=P(RAY_AXIS, None, None),
        check_vma=False,
    )(
        volume,
        jnp.asarray(zs_global),
        jnp.asarray(my_host),
        jnp.asarray(alpha_scale_host),
        origin,
        tf_lut,
        jnp.asarray(density, jnp.float32),
        jnp.asarray(brightness, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
    )
    return out


def distributed_sweep_slope_space(
    volume: jnp.ndarray,
    origin,
    mx: np.ndarray,
    my: np.ndarray,
    tf_lut: jnp.ndarray,
    density=0.05,
    brightness=1.0,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    march: MarchConfig = MarchConfig(),
    mesh: Mesh,
    dz_sign: int = -1,
    n_planes: int = 0,
    length_correction: bool = True,
    plane_chunk: int = 8,
    backend: str = "auto",
    wrt: tuple = ("volume", "lut", "params"),
    tex_offset: float = 0.5,
    axis_scale: tuple = (1.0, 1.0, 1.0),
    volume_mode: str = "auto",
) -> jnp.ndarray:
    """Distributed sweep over HOST numpy slope grids ``mx (W,)`` / ``my (H,)``.

    The distributed twin of ``march/slice.py sweep_slope_space`` — any
    uniform m-grid, either sweep direction; image rows (the my grid) are
    sharded on the rays axis, the volume's leading axis on bricks.

    ``volume_mode``: 'slab' shards the volume's leading axis over bricks
    (halo exchange; default-filter-grid only), 'replicated' keeps the
    volume whole on every brick and shards the PLANE SCHEDULE instead —
    the right layout for coarse flexible-block stats grids, and required
    for non-default ``tex_offset``/``axis_scale`` (the scaled filter grid
    maps plane taps outside their slab). 'auto' picks 'replicated' exactly
    when a non-default filter grid demands it."""
    if volume_mode == "auto":
        volume_mode = (
            "slab"
            if tex_offset == 0.5 and tuple(axis_scale) == (1.0, 1.0, 1.0)
            else "replicated"
        )
    mx = np.ascontiguousarray(np.asarray(mx, dtype=np.float32))
    my = np.ascontiguousarray(np.asarray(my, dtype=np.float32))
    return _sweep_slope_space_call(
        volume,
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(brightness, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        mx_bytes=mx.tobytes(),
        my_bytes=my.tobytes(),
        march=march,
        mesh=mesh,
        dz_sign=int(dz_sign),
        n_planes=int(n_planes),
        length_correction=length_correction,
        plane_chunk=plane_chunk,
        backend=backend,
        wrt=wrt,
        tex_offset=float(tex_offset),
        axis_scale=tuple(float(s) for s in axis_scale),
        volume_mode=volume_mode,
    )


def distributed_sweep_render(
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
    mesh: Mesh,
    focal: float = 2.0,
    n_planes: int = 0,
    length_correction: bool = True,
    plane_chunk: int = 8,
    backend: str = "auto",
    wrt: tuple = ("volume", "lut", "params"),
    tex_offset: float = 0.5,
    axis_scale: tuple = (1.0, 1.0, 1.0),
    volume_mode: str = "auto",
) -> jnp.ndarray:
    """Sweep-render with the volume sharded over bricks and rows over rays.

    ``volume`` is ``(Z, Y, X)`` (use :func:`shard_scalar_volume` to place it);
    unrotated benchmark camera at ``origin`` looking down -z. Returns
    ``(H, W, 4)`` float32 RGBA, rows sharded on the rays axis. Matches the
    single-device ``slice_render_image`` to float32 rounding (ET exact at
    plane granularity via the two-pass scheme; bitwise vs the fused kernel
    on the one-brick mesh). Rotated cameras: use
    :func:`distributed_shearwarp_render`.

    ``backend``: 'pallas' runs BOTH passes on the fused TPU kernel PER
    DEVICE inside shard_map — possible because the kernel takes its slope
    grid, plane depths, row window, plane spacing, and accumulator seed as
    traced data, so ONE compile serves all devices. 'auto' selects
    'pallas' on a real TPU backend when the shapes allow, else 'xla' (the
    kernel cannot run on CPU outside the Mosaic interpreter).

    DIFFERENTIABLE on both backends: the pallas passes go through the fused
    custom VJP (pallas/slice_vjp.py) whose seed cotangent
    (d seed_a = g_a - S/T_0) backprops pass 2 into the upstream bricks'
    prefixes; everything else (static-tap pre-blend, halo ppermute,
    all_gather compositing, psum) transposes under XLA autodiff. ``wrt``
    statically prunes pallas cotangent paths ("volume"/"lut"/"params") —
    list only what you train. Gradients match the single-device
    ``slice_render_image`` VJP (tests/test_dist_sweep.py).
    """
    u = ((np.arange(width, dtype=np.float32) / width) * 2.0 - 1.0)
    v = ((np.arange(height, dtype=np.float32) / height) * 2.0 - 1.0)
    return distributed_sweep_slope_space(
        volume, origin, (u / (-focal)), (v / (-focal)), tf_lut,
        density, brightness, transfer_offset, transfer_scale,
        march=march, mesh=mesh, dz_sign=-1, n_planes=n_planes,
        length_correction=length_correction, plane_chunk=plane_chunk,
        backend=backend, wrt=wrt, tex_offset=tex_offset,
        axis_scale=axis_scale, volume_mode=volume_mode,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mx_bytes", "my_bytes", "march", "mesh", "dz_sign",
        "length_correction", "plane_chunk", "wrt", "stat",
    ),
)
def _hist_sweep_slope_space_call(
    hist_bm: jnp.ndarray,
    weights: jnp.ndarray,
    origin: jnp.ndarray,
    tf_lut: jnp.ndarray,
    density,
    brightness,
    transfer_offset,
    transfer_scale,
    *,
    mx_bytes: bytes,
    my_bytes: bytes,
    march: MarchConfig,
    mesh: Mesh,
    dz_sign: int,
    length_correction: bool,
    plane_chunk: int,
    wrt: tuple,
    stat: str,
) -> jnp.ndarray:
    """Distribution-native distributed sweep over an arbitrary uniform slope
    grid (core of :func:`distributed_hist_render` and
    :func:`distributed_shearwarp_hist_render`). The grid arrives as raw
    float32 bytes keying the jit cache; ``dz_sign`` flips the front-to-back
    plane order, the kernel's block walk (``reverse_planes``), and the
    sort-last compositing order — exactly like the scalar
    :func:`_sweep_slope_space_call`."""
    mx = np.frombuffer(mx_bytes, dtype=np.float32)
    my_host = np.frombuffer(my_bytes, dtype=np.float32)
    width, height = mx.shape[0], my_host.shape[0]
    nz, B, ny, nx = hist_bm.shape
    n_planes = nz  # pure-selection schedule: layers ARE planes
    nb = mesh.shape[BRICK_AXIS]
    nr = mesh.shape[RAY_AXIS]
    assert nz % nb == 0, f"Z={nz} must divide over {nb} bricks"
    assert height % nr == 0, f"H={height} must divide over {nr} ray shards"
    hl = height // nr
    assert width % 128 == 0 and hl % STRIP == 0, (
        f"the fused hist kernel tiles width % 128 and (height/rays) % "
        f"{STRIP}; got width={width}, height/rays={hl}"
    )
    (xlo, ylo, zlo) = march.box_min
    (xhi, yhi, zhi) = march.box_max
    thr = march.opacity_threshold
    spacing = (zhi - zlo) / n_planes
    zs_global = (
        zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)
    ).astype(np.float32)

    def per_device(
        hist_local, zs_local, my_local,
        origin, weights, tf_lut, density, brightness, toff, tscl,
    ):
        d = jax.lax.axis_index(BRICK_AXIS)
        # front-to-back: descending z for dz < 0 (reversed block walk),
        # ascending (= storage order) for dz > 0
        zs_ftb = jnp.flip(zs_local, axis=0) if dz_sign < 0 else zs_local
        dmy_l = my_local[1] - my_local[0] if hl > 1 else jnp.float32(0.0)
        slopes = jnp.stack([
            jnp.float32(mx[0]),
            jnp.float32(mx[1] - mx[0]) if width > 1 else jnp.float32(0.0),
            my_local[0],
            dmy_l,
        ])
        sweep = lambda seed: sweep_preblended_hist_diff(
            hist_local, weights, zs_ftb, origin, slopes, tf_lut, density,
            1.0, toff, tscl, dz_sign=dz_sign, width=width, height=hl,
            march=march, length_correction=length_correction,
            plane_chunk=plane_chunk, plane_spacing=spacing, wrt=wrt,
            stat=stat, acc_init=seed, reverse_planes=dz_sign < 0,
        )
        # pass 1: slab partials with the kernel's own cutoff (exact
        # first-crossing detection — see _sweep_slope_space_call's
        # pass-1 truncation argument, which is representation-agnostic)
        partial = sweep(None)
        if nb == 1:
            return partial * brightness

        parts = jax.lax.all_gather(partial, BRICK_AXIS, axis=0)
        # dz < 0: device nb-1 (largest z) is nearest the camera
        ordered = jnp.flip(parts, axis=0) if dz_sign < 0 else parts
        acc0 = jnp.zeros_like(partial)

        def fold(acc, part):
            return _over(acc, part), acc

        final_nc, prefixes = jax.lax.scan(fold, acc0, ordered)
        after_alpha = jnp.concatenate(
            [prefixes[1:, ..., 3], final_nc[None, ..., 3]], axis=0
        )
        crossed = after_alpha > thr
        saturating = jnp.any(crossed, axis=0)
        j_star = jnp.argmax(crossed, axis=0)
        prefix_at = jnp.take_along_axis(
            prefixes, j_star[None, ..., None], axis=0
        )[0]

        # pass 2: re-sweep only the crossing slab, seeded with the true
        # upstream prefix; everything else freezes instantly (alpha 2)
        my_pos = (nb - 1 - d) if dz_sign < 0 else d  # ordered device index
        flag = saturating & (j_star == my_pos)
        frozen = jnp.concatenate(
            [jnp.zeros((hl, width, 3), jnp.float32),
             jnp.full((hl, width, 1), 2.0, jnp.float32)], axis=-1,
        )
        seed_img = jnp.where(flag[..., None], prefix_at, frozen)
        out2 = sweep(seed_img)
        exact = jax.lax.psum(
            jnp.where(flag[..., None], out2, 0.0), BRICK_AXIS
        )
        rgba = jnp.where(saturating[..., None], exact, final_nc)
        return rgba * brightness

    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(BRICK_AXIS, None, None, None),
            P(BRICK_AXIS),
            P(RAY_AXIS),
            P(None), P(None, None), P(None, None), P(), P(), P(), P(),
        ),
        out_specs=P(RAY_AXIS, None, None),
        check_vma=False,
    )(
        hist_bm,
        jnp.asarray(zs_global),
        jnp.asarray(my_host),
        origin,
        weights,
        tf_lut,
        jnp.asarray(density, jnp.float32),
        jnp.asarray(brightness, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
    )


def distributed_hist_render(
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
    mesh: Mesh,
    focal: float = 2.0,
    length_correction: bool = True,
    plane_chunk: int = 4,
    wrt: tuple = ("hist", "lut", "params"),
    stat: str = "linear",
) -> jnp.ndarray:
    """DISTRIBUTION-NATIVE distributed render: the bins-major histogram
    volume ``(Z, B, Y, X)`` z-slab-sharded over bricks (use
    :func:`shard_hist_volume`), image rows over rays, per-voxel statistic
    decoded INSIDE each brick's fused sweep kernel — the decoded scalar
    volume never exists anywhere, on any chip, in either direction.

    Composition of two capabilities the reference never had together (or
    separately): the in-kernel decode (its query-7 in-march decode,
    volumeRender_kernel.cu:354-480, generalized to every statistic —
    'linear'/'var'/'entropy' with rows from ``decode_weight_rows``) and
    the sort-last bricks × rays sharding with seeded-pass-2 EXACT early
    termination. Differentiable end-to-end: histogram cotangents come back
    per-slab through the kernel's replay chain, the pass-2 seed cotangent
    backprops into upstream bricks, LUT/param grads psum over the mesh.

    Constraints: pure-selection schedule (n_planes == Z), unrotated -z
    camera, Z % bricks == 0, width % 128 == 0, (height/rays) % STRIP == 0,
    fused-kernel VMEM budgets (hist_render_supported at the per-device
    image shard). Pallas-only — run under the Mosaic interpreter on CPU.
    Rotated cameras: :func:`distributed_shearwarp_hist_render`.
    """
    weights = jnp.asarray(weights, jnp.float32)
    if weights.ndim == 1:
        weights = weights[None, :]
    u = ((np.arange(int(width), dtype=np.float32) / width) * 2.0 - 1.0)
    v = ((np.arange(int(height), dtype=np.float32) / height) * 2.0 - 1.0)
    mx = np.ascontiguousarray((u / (-focal)).astype(np.float32))
    my = np.ascontiguousarray((v / (-focal)).astype(np.float32))
    return _hist_sweep_slope_space_call(
        hist_bm,
        weights,
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(brightness, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        mx_bytes=mx.tobytes(),
        my_bytes=my.tobytes(),
        march=march,
        mesh=mesh,
        dz_sign=-1,
        length_correction=length_correction,
        plane_chunk=int(plane_chunk),
        wrt=tuple(wrt),
        stat=str(stat),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mx_bytes", "my_bytes", "march", "mesh", "dz_sign",
        "length_correction", "plane_chunk", "wrt", "stat",
        "width", "height", "focal", "perm_world",
    ),
)
def _rot_hist_frame(
    hist_p, weights, origin, tf_lut, density, brightness,
    transfer_offset, transfer_scale, rot, mgrid, *,
    mx_bytes, my_bytes, march, mesh, dz_sign, length_correction,
    plane_chunk, wrt, stat, width, height, focal, perm_world,
):
    """ONE jitted dispatch per rotated distribution-native frame: m-grid
    sweep + homography warp fused (each dispatch costs ~28 ms RTT on the
    tunneled chip — the _pallas_frame lesson, march/shearwarp.py)."""
    from vrdd_tpu.march.shearwarp import _warp_from_rotation_traced

    img_m = _hist_sweep_slope_space_call(
        hist_p, weights, origin, tf_lut, density, brightness,
        transfer_offset, transfer_scale, mx_bytes=mx_bytes,
        my_bytes=my_bytes, march=march, mesh=mesh, dz_sign=dz_sign,
        length_correction=length_correction, plane_chunk=plane_chunk,
        wrt=wrt, stat=stat,
    )
    return _warp_from_rotation_traced(
        img_m, rot, mgrid, width, height, focal, perm_world
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mx_bytes", "my_bytes", "march", "mesh", "dz_sign", "n_planes",
        "length_correction", "plane_chunk", "backend", "wrt", "tex_offset",
        "axis_scale", "volume_mode", "width", "height", "focal",
        "perm_world",
    ),
)
def _rot_sweep_frame(
    vol_perm, origin, tf_lut, density, brightness, transfer_offset,
    transfer_scale, rot, mgrid, *,
    mx_bytes, my_bytes, march, mesh, dz_sign, n_planes, length_correction,
    plane_chunk, backend, wrt, tex_offset, axis_scale, volume_mode,
    width, height, focal, perm_world,
):
    """Scalar twin of :func:`_rot_hist_frame` (fused sweep + warp)."""
    from vrdd_tpu.march.shearwarp import _warp_from_rotation_traced

    img_m = _sweep_slope_space_call(
        vol_perm, origin, tf_lut, density, brightness, transfer_offset,
        transfer_scale, mx_bytes=mx_bytes, my_bytes=my_bytes, march=march,
        mesh=mesh, dz_sign=dz_sign, n_planes=n_planes,
        length_correction=length_correction, plane_chunk=plane_chunk,
        backend=backend, wrt=wrt, tex_offset=tex_offset,
        axis_scale=axis_scale, volume_mode=volume_mode,
    )
    return _warp_from_rotation_traced(
        img_m, rot, mgrid, width, height, focal, perm_world
    )


def shearwarp_hist_supported(
    hist_shape,
    inv_view,
    width: int,
    height: int,
    *,
    focal: float = 2.0,
    oversample: float = 1.0,
    n_lut: int = 9,
    mesh=None,
) -> bool:
    """Can :func:`distributed_shearwarp_hist_render` serve this view on the
    fused kernel? Checks the budgets against the PERMUTED volume shape and
    the ACTUAL bounding m-grid dims (wi x padded hi) the call will sweep —
    `hist_render_supported` on the unrotated shape with the output
    width/height is NOT sufficient: a y-principal view permutes the
    spatial axes and the m-grid is ``oversample``x the output, so configs
    that pass the naive check can exceed the VMEM accumulator budget.
    Also False when shear-warp itself is inapplicable (d_z sign flip) or
    the principal extent does not divide over the mesh's bricks."""
    from vrdd_tpu.march.shearwarp import slope_corner_bounds
    from vrdd_tpu.pallas.slice_kernel import (
        STRIP as _STRIP, hist_render_supported,
    )

    nz, B, ny, nx = hist_shape
    axis, (px, py, pz), dz_sign, ok, _ = slope_corner_bounds(
        np.asarray(inv_view, np.float32), width, height, focal
    )
    if not ok:
        return False
    sp = lambda a: 0 if a == 2 else 3 - a
    dims = {0: nz, 2: ny, 3: nx}
    shape_p = (dims[sp(pz)], B, dims[sp(py)], dims[sp(px)])
    nr = mesh.shape[RAY_AXIS] if mesh is not None else 1
    nb = mesh.shape[BRICK_AXIS] if mesh is not None else 1
    if shape_p[0] % nb:
        return False
    wi = max(8, int(np.ceil(width * oversample)))
    hi = max(8, int(np.ceil(height * oversample)))
    wi = -(-wi // 128) * 128
    hi += (-hi) % (nr * _STRIP)
    return hist_render_supported(shape_p, wi, hi, n_lut=n_lut)


def distributed_shearwarp_hist_render(
    hist_bm: jnp.ndarray,
    weights: jnp.ndarray,
    inv_view: np.ndarray,
    width: int,
    height: int,
    tf_lut: jnp.ndarray,
    density=0.05,
    brightness=1.0,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    march: MarchConfig = MarchConfig(),
    mesh: Mesh,
    focal: float = 2.0,
    oversample: float = 2.0,
    length_correction: bool = True,
    plane_chunk: int = 4,
    wrt: tuple = ("hist", "lut", "params"),
    stat: str = "linear",
) -> jnp.ndarray:
    """ARBITRARY rotated views, DISTRIBUTION-NATIVE, under sharding — the
    last cell of the composition matrix: shear-warp (march/shearwarp.py)
    × in-kernel histogram decode (slice_kernel.py _decode_block) ×
    sort-last bricks+rays sharding.

    The bins-major ``(Z, B, Y, X)`` histogram volume's SPATIAL axes permute
    so the view's principal world axis becomes the sweep/shard axis (B stays
    the sublane axis the in-kernel decode streams), the permuted volume
    re-shards over bricks (one all-to-all; amortized across every view in
    the same principal-axis octant — rotating within an octant moves no
    histogram data), each brick decodes its slab's statistic in the fused
    kernel prologue while sweeping the bounding m-grid with rows sharded on
    rays, and the m-space image warps to pixels. Pure-selection schedule
    throughout (planes ARE layers of the permuted volume, walked in storage
    order for dz > 0 and by the reversed block index map for dz < 0), so
    the decoded scalar volume never exists on any chip in either direction.

    The reference serves rotated views of its distribution volumes by
    per-pixel marching precomputed query textures (volumeRender.cpp:225-246
    → volumeRender_kernel.cu:654-680); this is that capability with the
    decode still fused into the march (its query-7 pattern, :354-480) AND
    the volume sharded — a composition its single-GPU design never had.
    Differentiable like :func:`distributed_hist_render` (per-slab replay
    chains, seed cotangent into upstream bricks, psum'd LUT/param grads;
    the axis permutation and warp transpose under XLA autodiff).
    """
    from vrdd_tpu.march.shearwarp import slope_corner_bounds
    from vrdd_tpu.pallas.slice_kernel import _pad_grid

    inv_view = np.asarray(inv_view, dtype=np.float32)
    axis, (px, py, pz), dz_sign, ok, (mx_lo, mx_hi, my_lo, my_hi) = (
        slope_corner_bounds(inv_view, width, height, focal)
    )
    if not ok:
        raise ValueError(
            "shear-warp inapplicable: d_z changes sign across the image"
        )

    nb = mesh.shape[BRICK_AXIS]
    nr = mesh.shape[RAY_AXIS]
    # spatial axis of the bins-major volume holding world axis a
    # (x → 3, y → 2, z → 0; axis 1 is always the bins axis)
    sp = lambda a: 0 if a == 2 else 3 - a
    hist_bm = jnp.asarray(hist_bm)
    if hist_bm.shape[sp(pz)] % nb:
        raise ValueError(
            f"principal axis extent {hist_bm.shape[sp(pz)]} must divide "
            f"over {nb} bricks"
        )
    hist_p = _permuted_sharded(
        hist_bm, (sp(pz), 1, sp(py), sp(px)), mesh,
        P(BRICK_AXIS, None, None, None), slot="hist",
    )
    inv_view = np.asarray(inv_view, dtype=np.float32)
    origin_w = inv_view[:, 3]
    origin_p = np.array(
        [origin_w[px], origin_w[py], origin_w[pz]], dtype=np.float32
    )
    bmin = np.asarray(march.box_min, dtype=np.float32)
    bmax = np.asarray(march.box_max, dtype=np.float32)
    march_p = MarchConfig(
        max_steps=march.max_steps, tstep=march.tstep,
        opacity_threshold=march.opacity_threshold,
        box_min=(float(bmin[px]), float(bmin[py]), float(bmin[pz])),
        box_max=(float(bmax[px]), float(bmax[py]), float(bmax[pz])),
    )

    # bounding m-grid: the fused hist kernel is pallas-only, so always
    # 128-align columns and pad rows to the shard × STRIP multiple (the
    # same construction as the single-device pallas shear-warp, so a
    # rays=1 mesh reproduces its m-grid exactly)
    wi = max(8, int(np.ceil(width * oversample)))
    hi = max(8, int(np.ceil(height * oversample)))
    wi = -(-wi // 128) * 128
    mx_pad = max(1e-6, (mx_hi - mx_lo) / wi)
    my_pad = max(1e-6, (my_hi - my_lo) / hi)
    mx = np.linspace(mx_lo - mx_pad, mx_hi + mx_pad, wi, dtype=np.float32)
    my = np.linspace(my_lo - my_pad, my_hi + my_pad, hi, dtype=np.float32)
    my = _pad_grid(my, nr * STRIP)

    weights = jnp.asarray(weights, jnp.float32)
    if weights.ndim == 1:
        weights = weights[None, :]
    # one fused dispatch: m-grid sweep + homography warp (the per-pixel
    # warp maps build on device from the rotation; spacing-based, so the
    # row extension never shifts in-range samples)
    mgrid = jnp.asarray(
        [mx[0], (mx[-1] - mx[0]) / (wi - 1), my[0], my[1] - my[0]],
        jnp.float32,
    )
    return _rot_hist_frame(
        hist_p,
        weights,
        jnp.asarray(origin_p, jnp.float32),
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(brightness, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        jnp.asarray(inv_view[:, :3]),
        mgrid,
        mx_bytes=np.ascontiguousarray(mx).tobytes(),
        my_bytes=np.ascontiguousarray(my).tobytes(),
        march=march_p,
        mesh=mesh,
        dz_sign=int(dz_sign),
        length_correction=length_correction,
        plane_chunk=int(plane_chunk),
        wrt=tuple(wrt),
        stat=str(stat),
        width=int(width),
        height=int(height),
        focal=float(focal),
        perm_world=(px, py, pz),
    )


def distributed_shearwarp_render(
    volume: jnp.ndarray,
    inv_view: np.ndarray,
    width: int,
    height: int,
    tf_lut: jnp.ndarray,
    density=0.05,
    brightness=1.0,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    march: MarchConfig = MarchConfig(),
    mesh: Mesh,
    focal: float = 2.0,
    n_planes: int = 0,
    oversample: float = 2.0,
    length_correction: bool = True,
    plane_chunk: int = 8,
    backend: str = "auto",
    wrt: tuple = ("volume", "lut", "params"),
    tex_offset: float = 0.5,
    axis_scale: tuple = (1.0, 1.0, 1.0),
    volume_mode: str = "auto",
) -> jnp.ndarray:
    """ARBITRARY rotated views on the distributed sweep (shear-warp).

    Composes the shear-warp factorization (march/shearwarp.py) with the
    distributed slope-space sweep: pick the principal volume axis for the
    view, permute so it becomes the sweep axis and RE-SHARD the permuted
    volume over bricks (one all-to-all, amortized across every view in the
    same principal-axis octant — rotating within an octant re-renders
    through cached executables and moves no volume data), sweep the bounding
    m-grid with rows sharded on rays, then warp m-space to pixels (a 2-D
    bilinear gather on the row-sharded image; XLA inserts the gather
    collectives). Matches single-device ``shearwarp_render_image`` (the
    m-grid rows are only EXTENDED to the shard multiple — same spacing, so
    in-range warp samples see identical values).

    The reference renders arbitrary cameras by re-marching per pixel
    (volumeRender.cpp:225-246 -> volumeRender_kernel.cu:288-296); this is
    that capability under the BASELINE bricks+rays sharding contract.
    """
    from vrdd_tpu.march.shearwarp import slope_corner_bounds
    from vrdd_tpu.pallas.slice_kernel import _pad_grid

    inv_view = np.asarray(inv_view, dtype=np.float32)
    axis, (px, py, pz), dz_sign, ok, (mx_lo, mx_hi, my_lo, my_hi) = (
        slope_corner_bounds(inv_view, width, height, focal)
    )
    if not ok:
        raise ValueError(
            "shear-warp inapplicable: d_z changes sign across the image; "
            "use the scan-marcher bricks path (parallel/bricks.py)"
        )
    nb = mesh.shape[BRICK_AXIS]
    nr = mesh.shape[RAY_AXIS]

    # permute so the principal world axis is the sweep/shard axis, then
    # re-shard the permuted volume over bricks (all-to-all on ICI); the
    # per-world-axis filter-grid scales permute with it (rotated
    # flexible-block queries, march/shearwarp.py axis_scale semantics)
    ascale_p = (
        float(axis_scale[px]), float(axis_scale[py]), float(axis_scale[pz])
    )
    if volume_mode == "auto":
        volume_mode = (
            "slab"
            if tex_offset == 0.5 and ascale_p == (1.0, 1.0, 1.0)
            else "replicated"
        )
    volume = jnp.asarray(volume)
    if volume_mode == "slab" and volume.shape[2 - pz] % nb:
        raise ValueError(
            f"principal axis extent {volume.shape[2 - pz]} must divide "
            f"over {nb} bricks"
        )
    vol_perm = _permuted_sharded(
        volume, (2 - pz, 2 - py, 2 - px), mesh,
        P(BRICK_AXIS, None, None) if volume_mode == "slab"
        else P(None, None, None),
    )
    origin_w = inv_view[:, 3]
    origin_p = np.array(
        [origin_w[px], origin_w[py], origin_w[pz]], dtype=np.float32
    )
    bmin = np.asarray(march.box_min, dtype=np.float32)
    bmax = np.asarray(march.box_max, dtype=np.float32)
    march_p = MarchConfig(
        max_steps=march.max_steps, tstep=march.tstep,
        opacity_threshold=march.opacity_threshold,
        box_min=(float(bmin[px]), float(bmin[py]), float(bmin[pz])),
        box_max=(float(bmax[px]), float(bmax[py]), float(bmax[pz])),
    )

    # bounding m-grid (march/shearwarp.py construction), rows extended to
    # the shard multiple (and the kernel tiling when the fused path is on)
    wi = max(8, int(np.ceil(width * oversample)))
    hi = max(8, int(np.ceil(height * oversample)))
    want_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if want_pallas:
        wi = -(-wi // 128) * 128
        row_mult = nr * STRIP
    else:
        row_mult = nr
    mx_pad = max(1e-6, (mx_hi - mx_lo) / wi)
    my_pad = max(1e-6, (my_hi - my_lo) / hi)
    mx = np.linspace(mx_lo - mx_pad, mx_hi + mx_pad, wi, dtype=np.float32)
    my = np.linspace(my_lo - my_pad, my_hi + my_pad, hi, dtype=np.float32)
    my = _pad_grid(my, row_mult)

    # one fused dispatch: m-grid sweep + homography warp (per-pixel warp
    # maps built on device from the rotation; spacing-based, so the row
    # extension never shifts in-range samples)
    mgrid = jnp.asarray(
        [mx[0], (mx[-1] - mx[0]) / (wi - 1), my[0], my[1] - my[0]],
        jnp.float32,
    )
    return _rot_sweep_frame(
        vol_perm,
        jnp.asarray(origin_p, jnp.float32),
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(brightness, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        jnp.asarray(inv_view[:, :3]),
        mgrid,
        mx_bytes=np.ascontiguousarray(mx).tobytes(),
        my_bytes=np.ascontiguousarray(my).tobytes(),
        march=march_p,
        mesh=mesh,
        dz_sign=int(dz_sign),
        n_planes=int(n_planes),
        length_correction=length_correction,
        plane_chunk=int(plane_chunk),
        backend=backend,
        wrt=tuple(wrt),
        tex_offset=float(tex_offset),
        axis_scale=ascale_p,
        volume_mode=volume_mode,
        width=int(width),
        height=int(height),
        focal=float(focal),
        perm_world=(px, py, pz),
    )
