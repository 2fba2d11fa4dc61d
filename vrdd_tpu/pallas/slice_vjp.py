"""Fused Pallas forward+backward for the slice sweep (analytic custom VJP).

The XLA analytic VJP in vrdd_tpu/march/slice.py is O(1)-memory but still
HBM-bound: every plane's premultiplied RGBA and cotangents round-trip HBM in
each of its three sweeps. This module runs the whole thing as TWO fused Pallas
kernels with the per-pixel state VMEM-resident:

- FORWARD (vrdd_tpu/pallas/slice_kernel.py with ``emit_ckpt=True``): the
  normal fused sweep, additionally tracking per-ray transmittance with the
  backward's own recursion ``T <- T - [T >= 1-thr] T a`` and streaming ONE
  T-at-chunk-start checkpoint per (strip, plane-chunk) to HBM
  (4 B/ray/chunk = 1/plane_chunk the per-plane traffic: 0.5 GB vs 2 GB at
  512^3 -> 1024^2 x 512 planes with the default plane_chunk=4;
  brightness is folded outside so it stays
  differentiable). The diff path defaults to plane_chunk=4, measured fastest
  on v5e for the backward (49 vs 66 ms with plane_chunk=8 at
  512^3 -> 1024^2): smaller chunks keep the backward's plane / plane-grad /
  replay-cache blocks comfortably double-buffered (the plain forward
  prefers 8).
- BACKWARD: ONE reverse-order sweep. With per-plane premultiplied colors
  ``c_k = (col_rgb * a_k, a_k)``, freeze mask ``m_k = [T_{k-1} >= 1 - thr]``
  (early ray termination) and ``P_k = m_k (g . c_k) T_{k-1}``, the cotangents

      dL/dc_k[rgb] = m_k T_{k-1} g[rgb]
      dL/dc_k[a]   = m_k (T_{k-1} g[a] - S_k / (1 - a_k)),
      S_k = sum_{j>k} P_j

  need the PREFIX transmittance T_{k-1} (replayed within each chunk from its
  checkpoint by the forward's own recursion — only the alpha channel of the
  TF is needed, and res / col_a are cached in VMEM so the reverse loop skips
  its resample matmul and alpha-TF entirely) and the SUFFIX sum S_k — which
  accumulates naturally when sweeping back-to-front
  (an earlier design ran two forward-order passes, one to total the P_j; the
  checkpoint stream replaces that entire pass for ~2x less backward work).
  The kernel is plane-major (grid = (chunks, strips), chunk index maps
  REVERSED) so the ``(pchunk, NY, NX)`` plane-gradient output block is
  revisited consecutively across strips and stays VMEM-resident; the local
  transposes are two extra MXU matmuls (``d_tmp = d_res @ Wx``,
  ``d_plane += Wy^T @ d_tmp``); x-weights are recomputed inline per plane
  (hoisting them to a shared VMEM cache like the forward does measured 13 ms
  SLOWER here — matmuls fed from big-scratch slices); LUT gradients
  accumulate in the TENT basis (the
  relu-coefficient transpose is ill-conditioned — its second-difference map
  cancels large ``sum q * d_col`` terms) into VMEM scratch, cross-lane
  reduced exactly once at the final grid step into an SMEM output; a chunk
  whose checkpointed transmittance is below the cutoff for every ray in the
  strip is skipped outright (exact: frozen rays contribute zero cotangent).

Gradients flow to: volume (through the pre-blend matmul outside the kernel),
TF LUT, density, brightness, transfer offset/scale — the same set as the XLA
custom VJP (camera origin is non-differentiable there too).

Semantics follow the reference's d_render (volumeRender_kernel.cu:272-717) in
the object-order formulation; see march/slice.py for the derivation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrdd_tpu.utils.config import MarchConfig
from vrdd_tpu.pallas.slice_kernel import (
    STRIP,
    _ENT_TINY,
    _decode_block,
    _ess_bitmap,
    _fit_plane_chunk,
    _make_kernel,
    _pad_grid,
    _xtile,
    _pixel_slopes,
    _preblend_planes,
    _sweep_specs,
    _tent_weights,
    _tf_relu_forward,
    _uniform_grid_params,
    acc_rows as _acc_rows,
    pallas_supported,
    tf_relu_coefficients,
)

__all__ = [
    "pallas_slice_render_diff",
    "pallas_sweep_slope_space_diff",
    "sweep_preblended_planes_diff",
    "sweep_preblended_hist_diff",
    "pallas_hist_render_diff",
    "pallas_diff_supported",
    "live_fractions",
]


def pallas_diff_supported(volume_shape, width, height, n_planes,
                          n_lut: int = 9) -> bool:
    """The diff path additionally needs the (checkpointing) forward's
    resident factorized accumulator (max(4, n_lut) + 1 rows) to fit VMEM —
    the plain forward bands taller images instead, but banding the VJP would
    split the checkpoint/live-map plumbing, so beyond this the caller should
    use the XLA analytic VJP."""
    from vrdd_tpu.pallas.slice_kernel import _VMEM_ACC_BUDGET, acc_rows

    Hp = height + (-height) % STRIP
    Wp = width + (-width) % 128
    return (
        pallas_supported(volume_shape, width, height, n_planes, n_lut=n_lut)
        and acc_rows(n_lut, True) * 4 * Hp * Wp <= _VMEM_ACC_BUDGET
    )


def _norm_wrt(wrt) -> tuple:
    """Canonical hashable form (it keys the kernel cache)."""
    allowed = ("volume", "lut", "params")
    wset = set(wrt)
    bad = wset - set(allowed)
    if bad:
        raise ValueError(f"unknown wrt entries {sorted(bad)}; use {allowed}")
    return tuple(w for w in allowed if w in wset)



def _make_bwd_kernel(H, W, NY, NX, n_planes, n_lut, dz_sign, box_min,
                     box_max, tstep, threshold, length_correction, mm_dtype,
                     pchunk, tex_offset=0.5,
                     wrt=("volume", "lut", "params"),
                     axis_scale=(1.0, 1.0), decode_bins=0,
                     reverse_planes=False, decode_mode="linear",
                     manual_stream=False):
    """Reverse-order cotangent sweep; see module docstring.

    ``wrt`` statically prunes cotangent paths: "volume" (d_planes — the
    x-transpose matmuls and the plane-gradient accumulation), "lut" (the
    per-LUT-entry tent accumulation, the single largest VPU cost), "params"
    (density / TF offset / TF scale). Skipped outputs come back as exact
    zeros (their accumulators are zero-initialized and never touched).

    ``decode_bins = B > 0``: the replay decodes (pchunk, B, NY, NX)
    bins-major histogram blocks in VMEM exactly like the forward
    (slice_kernel.py _make_kernel), and ``d_planes`` stays the DECODED
    plane cotangent — the linear chain to the histogram cotangent
    (d_hist[L, b] = w[b] * d_dec[L]) is one XLA broadcast outside."""
    g_vol = "volume" in wrt
    g_lut = "lut" in wrt
    g_par = "params" in wrt
    need_dres = g_vol or g_par  # d_res feeds d_planes and toff/tscl
    xlo, ylo, zlo = box_min
    xhi, yhi, zhi = box_max
    sxs, sys = axis_scale
    n_chunks = n_planes // pchunk
    n_strips = H // STRIP
    xt = _xtile(W)
    n_xt = W // xt

    def kernel(params_ref, zs_ref, coef_ref, planes_ref, *rest):
        if decode_bins:
            dw_ref = rest[0]
            rest = rest[1:]
        (g_ref, tck_ref, live_ref, dplanes_ref, small_ref, S_ref) = rest[:6]
        rest = rest[6:]
        if decode_mode == "var":
            mom_ref = rest[0]  # (pchunk, 2, NY, NX) chain-moment output
            rest = rest[1:]
        else:
            mom_ref = None
        (cg_ref, sg_ref, tmp_ref, dtmp_ref, tloc_ref, resloc_ref,
         caloc_ref) = rest[:7]
        rest = rest[7:]
        if decode_bins and manual_stream:
            dec_ref, hbuf_ref, hsem_ref = rest[:3]
        elif decode_bins:
            dec_ref = rest[0]
        else:
            dec_ref = None
        k = pl.program_id(0)      # reversed: chunk kk = n_chunks - 1 - k
        si = pl.program_id(1)
        kk = n_chunks - 1 - k
        ox = params_ref[0, 0]
        oy = params_ref[0, 1]
        oz = params_ref[0, 2]
        density = params_ref[0, 3]
        tf_off = params_ref[0, 5]
        tf_scale = params_ref[0, 6]
        mx0 = params_ref[0, 8]
        dmx = params_ref[0, 9]
        my0 = params_ref[0, 10]
        dmy = params_ref[0, 11]
        spacing = params_ref[0, 7]  # traced plane spacing (see slice_kernel)
        row0 = si * STRIP

        first = jnp.logical_and(k == 0, si == 0)

        @pl.when(first)
        def _init_acc():
            cg_ref[...] = jnp.zeros((4 * n_lut, STRIP, W), dtype=jnp.float32)
            sg_ref[...] = jnp.zeros((3, STRIP, W), dtype=jnp.float32)
            for j in range(4 * n_lut + 3):
                small_ref[0, j] = 0.0

        @pl.when(k == 0)
        def _init_state():
            S_ref[pl.ds(row0, STRIP), :] = jnp.zeros(
                (STRIP, W), dtype=jnp.float32
            )

        @pl.when(si == 0)
        def _init_dplanes():
            dplanes_ref[...] = jnp.zeros((pchunk, NY, NX), dtype=jnp.float32)

        # process exactly the tiles the forward processed (its live bitmap):
        # everything else has identically-zero cotangents. One scalar SMEM
        # read replaces a (STRIP, W) cross-lane reduction.
        bits = live_ref[si, kk]
        chunk_live = bits != 0

        if decode_bins:
            if manual_stream:
                # manual double-buffered histogram stream, mirroring the
                # forward (slice_kernel.py _make_kernel): the reverse
                # walk's z-layer block for grid step k is block k when
                # reverse_planes (z-ascending storage, sweep reversed by
                # kk) else n_chunks-1-k; chunk k+1's copy is issued before
                # waiting on chunk k's so it overlaps the chunk's tiles
                def _hist_dma(kg, slot):
                    blk = kg if reverse_planes else (n_chunks - 1 - kg)
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
                hblock = planes_ref

            # decode the chunk's histogram layers ONCE into VMEM scratch
            # (strip-invariant; mirrors the forward's _stage_decode). Block
            # row pchunk-1-i = front-to-back plane i of this chunk. Gated
            # on any strip having processed this chunk in the forward:
            # fully skipped chunks have identically-zero d_dec, so their
            # decode is dead work (the var-mode moment output is zeroed
            # instead of decoded — d_hist = 0 * moment must not multiply
            # garbage buffer contents, which could be Inf/NaN patterns).
            any_live_k = live_ref[0, kk] != 0
            for s in range(1, n_strips):
                any_live_k = jnp.logical_or(any_live_k, live_ref[s, kk] != 0)

            @pl.when(jnp.logical_and(si == 0, any_live_k))
            def _stage_decode():
                _decode_block(
                    hblock, dw_ref, dec_ref, pchunk, decode_bins,
                    decode_mode,
                    lambda i: pchunk - 1 - i if reverse_planes else i,
                    mom_out=mom_ref,
                )

            if mom_ref is not None:
                @pl.when(jnp.logical_and(si == 0,
                                         jnp.logical_not(any_live_k)))
                def _zero_mom():
                    mom_ref[...] = jnp.zeros(
                        (pchunk, 2, NY, NX), dtype=mom_ref.dtype
                    )

        @pl.when(chunk_live)
        def _stage_y():
            # forward y-resample (shared by every x-tile) + d_tmp zeroing
            py = (row0 + jax.lax.broadcasted_iota(
                jnp.int32, (STRIP, 1), 0)).astype(jnp.float32)
            my_col = my0 + dmy * py
            for i in range(pchunk):
                z = zs_ref[0, kk * pchunk + i]
                y_at = oy + (z - oz) * my_col[:, 0]
                wy, _ = _tent_weights(y_at, NY, ylo, yhi, tex_offset, sys)
                if decode_bins:
                    plane = dec_ref[i]
                elif reverse_planes:
                    plane = planes_ref[pchunk - 1 - i]
                else:
                    plane = planes_ref[i]
                tmp_ref[i] = jnp.dot(
                    wy.astype(mm_dtype), plane.astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                )
                if g_vol:
                    dtmp_ref[i] = jnp.zeros((STRIP, NX), dtype=jnp.float32)

        for t in range(n_xt):
            sl = slice(t * xt, (t + 1) * xt)
            tile_live = (
                jnp.bitwise_and(jax.lax.shift_right_logical(bits, t), 1) != 0
            )

            @pl.when(tile_live)
            def _tile(t=t, sl=sl):
                S = S_ref[pl.ds(row0, STRIP), sl]
                g0 = g_ref[0, :, sl]
                g1 = g_ref[1, :, sl]
                g2 = g_ref[2, :, sl]
                g3 = g_ref[3, :, sl]

                py = (row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (STRIP, 1), 0)).astype(jnp.float32)
                px = (t * xt + jax.lax.broadcasted_iota(
                    jnp.int32, (1, xt), 1)).astype(jnp.float32)
                mx_row = mx0 + dmx * px  # (1, xt)
                my_col = my0 + dmy * py  # (STRIP, 1)
                if length_correction:
                    stretch = jnp.sqrt(
                        1.0 + mx_row * mx_row + my_col * my_col
                    )
                    ab = spacing * stretch / tstep
                    # abd uses EXACTLY the forward kernel's float association
                    # (alpha_base, slice_kernel.py) so the replayed T
                    # recursion and freeze masks are bit-identical to the
                    # forward that wrote the chunk-start checkpoints
                    abd = density * spacing * stretch / tstep
                else:
                    ab = jnp.ones((STRIP, xt), dtype=jnp.float32)
                    abd = jnp.full((STRIP, xt), density, dtype=jnp.float32)

                # --- replay pass (front-to-back): rebuild the per-plane
                # prefix transmittance from the chunk-start checkpoint with
                # the forward's own recursion (bit-identical: same alpha-
                # channel relu-basis arithmetic), caching T / res / col_a in
                # VMEM for the reverse loop — per-plane checkpoints would
                # cost pchunk x the HBM traffic for the same information ---
                T = tck_ref[0, :, sl]
                for i in range(pchunk):
                    z = zs_ref[0, kk * pchunk + i]
                    y_at = oy + (z - oz) * my_col[:, 0]
                    x_at = ox + (z - oz) * mx_row[0, :]
                    wx_i, inbox_x = _tent_weights(x_at, NX, xlo, xhi,
                                                  tex_offset, sxs)
                    y01 = (y_at - ylo) / (yhi - ylo)
                    inbox_y = ((y01 >= 0.0) & (y01 <= 1.0)).astype(
                        jnp.float32
                    )
                    in_front = (
                        (z < oz) if dz_sign < 0 else (z > oz)
                    ).astype(jnp.float32)
                    covered = inbox_x[None, :] * inbox_y[:, None] * in_front
                    res = jax.lax.dot_general(
                        tmp_ref[i].astype(mm_dtype), wx_i.astype(mm_dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (STRIP, XTILE)
                    _, ca = _tf_relu_forward(
                        res, coef_ref, n_lut, tf_off, tf_scale, channels=(3,)
                    )
                    a = jnp.minimum(ca[3] * abd, 1.0) * covered
                    tloc_ref[i, :, sl] = T
                    resloc_ref[i, :, sl] = res
                    caloc_ref[i, :, sl] = ca[3]
                    mT_ = jnp.where(T >= 1.0 - threshold, T, 0.0)
                    T = T - mT_ * a

                cga_acc = [None] * n_lut   # alpha-channel LUT cotangents
                w_acc = [None] * n_lut     # shared rgb weights (see below)
                dens_acc = None
                toff_acc = None
                tscl_acc = None

                def _add(acc, v):
                    return v if acc is None else acc + v

                # the image cotangent g is plane-invariant, so EVERY rgb
                # quantity factors through G[li] = g . c_li and B = g . base:
                # - LUT cotangents: cg[li, c] = g_c * sum_planes wl*mT*a —
                #   ONE weight accumulation per (plane, li) instead of three,
                #   expanded rank-1 once per tile (after the plane loop);
                # - the slope dot in dq uses G[li] directly;
                # - g . col_rgb(q) = B + sum_l G[l] relu(q - l), so the
                #   reverse loop never evaluates the rgb TF at all (one FMA
                #   per knot instead of one relu + three FMAs).
                G = [
                    g0 * coef_ref[0, (1 + li) * 4 + 0]
                    + g1 * coef_ref[0, (1 + li) * 4 + 1]
                    + g2 * coef_ref[0, (1 + li) * 4 + 2]
                    for li in range(0, n_lut - 1)
                ]
                B = (
                    g0 * coef_ref[0, 0] + g1 * coef_ref[0, 1]
                    + g2 * coef_ref[0, 2]
                )

                for i in reversed(range(pchunk)):
                    z = zs_ref[0, kk * pchunk + i]
                    y_at = oy + (z - oz) * my_col[:, 0]  # (STRIP,)
                    x_at = ox + (z - oz) * mx_row[0, :]
                    wx_i, inbox_x = _tent_weights(x_at, NX, xlo, xhi,
                                                  tex_offset, sxs)
                    y01 = (y_at - ylo) / (yhi - ylo)
                    inbox_y = ((y01 >= 0.0) & (y01 <= 1.0)).astype(
                        jnp.float32
                    )
                    in_front = (
                        (z < oz) if dz_sign < 0 else (z > oz)
                    ).astype(jnp.float32)
                    covered = inbox_x[None, :] * inbox_y[:, None] * in_front
                    res = resloc_ref[i, :, sl]  # cached by the replay pass
                    q = jnp.clip(
                        (res - tf_off) * tf_scale * n_lut - 0.5,
                        0.0, n_lut - 1.0,
                    )  # _tf_relu_forward's exact q
                    col_a = caloc_ref[i, :, sl]
                    raw = col_a * abd  # forward's exact alpha expression
                    a = jnp.minimum(raw, 1.0) * covered
                    T = tloc_ref[i, :, sl]  # prefix transmittance BEFORE this plane
                    m = (T >= 1.0 - threshold).astype(jnp.float32)
                    mT = m * T

                    # composited-chain cotangents; S = sum_{j>k} P_j so far.
                    # gc3 = g . col_rgb via the g-contracted relu basis.
                    gc3 = B + G[0] * q
                    for li in range(1, n_lut - 1):
                        gc3 = gc3 + G[li] * jnp.maximum(q - li, 0.0)
                    gdotc = (gc3 + g3) * a
                    one_minus_a = 1.0 - a
                    chain = jnp.where(
                        jnp.abs(one_minus_a) > 1e-6, S / one_minus_a, 0.0
                    )
                    d_ca = mT * g3 - m * chain
                    S = S + gdotc * mT  # includes P_k for the next-front plane

                    # transpose through (rgb, a) = (col_rgb * a, a);
                    # d_col_rgb = mT*a*g_c never materializes (factored out)
                    mTa = mT * a
                    d_a = d_ca + mT * gc3
                    # a = min(col_a * density * ab, 1) * covered
                    openm = covered * (raw < 1.0).astype(jnp.float32)
                    d_open = d_a * openm
                    d_col_a = d_open * abd  # d raw / d col_a
                    if g_par:
                        dens_acc = _add(dens_acc, d_open * col_a * ab)

                    # transpose through the TF: LUT cotangent in the TENT
                    # basis (well-conditioned: localized weights, no
                    # cancellation); dq from the relu-basis slope (c_0 +
                    # sum_l c_l [q > l] is exactly the local LUT slope,
                    # equal a.e. to the tent-form derivative of the oracle)
                    dq = (
                        mTa * G[0] + d_col_a * coef_ref[0, 4 + 3]
                    ) if need_dres else None
                    for li in range(n_lut):
                        if g_lut:
                            wl = jnp.maximum(0.0, 1.0 - jnp.abs(q - li))
                            w_acc[li] = _add(w_acc[li], wl * mTa)
                            cga_acc[li] = _add(cga_acc[li], wl * d_col_a)
                        if need_dres and 1 <= li <= n_lut - 2:
                            step = (q > li).astype(jnp.float32)
                            gl = (
                                mTa * G[li]
                                + d_col_a * coef_ref[0, (1 + li) * 4 + 3]
                            )
                            dq = dq + gl * step
                    if need_dres:
                        qraw = (res - tf_off) * tf_scale * n_lut - 0.5
                        inm = ((qraw > 0.0) & (qraw < n_lut - 1.0)).astype(
                            jnp.float32
                        )
                        dq_in = dq * inm
                        if g_par:
                            d_res_p = dq_in * (tf_scale * n_lut)
                            toff_acc = _add(toff_acc, -d_res_p)
                            tscl_acc = _add(
                                tscl_acc, dq_in * (res - tf_off) * n_lut
                            )
                    if g_vol:
                        d_res = dq_in * (tf_scale * n_lut)
                        # transpose through the x-resample; the y-transpose
                        # is deferred to one full-width matmul per plane
                        dtmp_ref[i] += jnp.dot(
                            d_res.astype(mm_dtype), wx_i.astype(mm_dtype),
                            preferred_element_type=jnp.float32,
                        )  # (STRIP, NX)

                S_ref[pl.ds(row0, STRIP), sl] = S
                for li in range(n_lut):
                    # rank-1 expansion of the factored rgb cotangents
                    if w_acc[li] is not None:
                        cg_ref[li * 4 + 0, :, sl] += g0 * w_acc[li]
                        cg_ref[li * 4 + 1, :, sl] += g1 * w_acc[li]
                        cg_ref[li * 4 + 2, :, sl] += g2 * w_acc[li]
                    if cga_acc[li] is not None:
                        cg_ref[li * 4 + 3, :, sl] += cga_acc[li]
                if dens_acc is not None:
                    sg_ref[0, :, sl] += dens_acc
                if toff_acc is not None:
                    sg_ref[1, :, sl] += toff_acc
                if tscl_acc is not None:
                    sg_ref[2, :, sl] += tscl_acc

        if g_vol:
            @pl.when(chunk_live)
            def _stage_dplane():
                # y-transpose of the accumulated d_tmp: d_plane = wy^T @ d_tmp
                py = (row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (STRIP, 1), 0)).astype(jnp.float32)
                my_col = my0 + dmy * py
                for i in range(pchunk):
                    z = zs_ref[0, kk * pchunk + i]
                    y_at = oy + (z - oz) * my_col[:, 0]
                    wy, _ = _tent_weights(y_at, NY, ylo, yhi, tex_offset,
                                          sys)
                    # reverse_planes: write LAYER order (row pchunk-1-i)
                    # so d_volume / the d_hist chain needs no flip copy
                    oi = pchunk - 1 - i if reverse_planes else i
                    dplanes_ref[oi] += jax.lax.dot_general(
                        wy.astype(mm_dtype), dtmp_ref[i].astype(mm_dtype),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (NY, NX)

        last = jnp.logical_and(k == n_chunks - 1, si == n_strips - 1)

        @pl.when(last)
        def _finish():
            for j in range(4 * n_lut):
                small_ref[0, j] = jnp.sum(cg_ref[j])
            small_ref[0, 4 * n_lut + 0] = jnp.sum(sg_ref[0])
            small_ref[0, 4 * n_lut + 1] = jnp.sum(sg_ref[1])
            small_ref[0, 4 * n_lut + 2] = jnp.sum(sg_ref[2])

    return kernel, n_chunks, n_strips


def _pack_params(origin, density, toff, tscl, slopes, spacing):
    origin = jnp.asarray(origin, dtype=jnp.float32)
    slopes = jnp.asarray(slopes, dtype=jnp.float32)
    return jnp.stack(
        [
            origin[0], origin[1], origin[2],
            jnp.asarray(density, jnp.float32), jnp.float32(1.0),
            jnp.asarray(toff, jnp.float32), jnp.asarray(tscl, jnp.float32),
            jnp.asarray(spacing, jnp.float32),
            slopes[0], slopes[1], slopes[2], slopes[3],
        ]
    )[None, :]


@functools.lru_cache(maxsize=64)
def _make_diff_sweep(H, W, NY, NX, n_planes, n_lut, dz_sign, box_min,
                     box_max, tstep, threshold, length_correction, precision,
                     pchunk, tex_offset=0.5, wrt=("volume", "lut", "params"),
                     ess=False, seed=False, axis_scale=(1.0, 1.0),
                     decode_bins=0, plane_bytes=4, reverse_planes=False,
                     decode_mode="linear"):
    """Build the custom-VJP sweep for one static configuration.

    The returned ``sweep(planes, zs, acc0, origin, slopes, lut, density,
    toff, tscl, spacing)`` takes the plane depths ``zs``, the accumulator
    seed ``acc0`` and the plane ``spacing`` as TRACED data — the distributed
    sort-last sweep feeds per-device slab shards through ONE compile (see
    parallel/sweep.py).

    ``seed``: resume the front-to-back recursion from ``acc0`` (H, W, 4).
    The seed's own cotangent is analytic: out_rgb = seed_rgb + Σ_k m_k
    T_{k-1} c_k so d seed_rgb = g_rgb; and T_{j} is proportional to
    T_0 = 1 - seed_a through the (mask-frozen) recursion, so d seed_a =
    g_a - S / T_0 with S = Σ_k m_k (g·c_k) T_{k-1} — exactly the suffix
    sum the backward kernel already accumulates, exported as an extra
    (H, W) output. When ``seed`` is False acc0 is ignored (zero cotangent).

    ``ess`` (opt-in): empty-space skipping — exact for the image and for
    volume cotangents only (see _ess_bitmap), so it requires
    wrt=('volume',); the caller enforces that.

    FORWARD/BACKWARD CHUNK DECOUPLING: the backward's preferred plane
    chunk (default 4 — keeps its many VMEM blocks double-buffered) is
    SLOWER for the forward, which prefers 8. The checkpointing forward
    therefore runs at ``fwd_pchunk`` (the largest multiple of ``pchunk``
    that divides n_planes, fits VMEM, and is <= 8) while emitting T
    checkpoints every ``pchunk`` planes (mid-chunk rows written per tile;
    see _make_kernel ck_stride) and duplicating its live bitmap per
    backward sub-chunk — a tile processed for a forward chunk was
    processed for all its planes, so both halves are genuinely live.
    """
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    assert not (ess and seed), "ESS bitmap + seeded resume not wired together"
    assert not (ess and decode_bins), "ESS stats describe decoded planes"
    assert not (ess and reverse_planes), "inline ESS needs the plane stack"
    # rev: the plane input is z-ascending storage walked back-to-front by
    # the index maps (raw volume or bins-major histograms for dz < 0); the
    # backward also EMITS d_planes in z-layer order, so no flip copy
    # exists on either side of either pass
    rev = reverse_planes
    n_w = {"linear": 1, "var": 4, "entropy": 1}[decode_mode]
    assert decode_mode == "linear" or "weights" not in wrt, (
        "decode-weight cotangents are linear-mode only (nonlinear modes "
        "take fixed reference-semantics rows from decode_weight_rows)"
    )

    fwd_pchunk = _fit_plane_chunk(
        max(8 // pchunk * pchunk, pchunk), n_planes, NY, NX, W,
        bins=decode_bins, plane_bytes=plane_bytes,
    )
    while fwd_pchunk % pchunk or n_planes % fwd_pchunk:
        fwd_pchunk -= 1
    ck_per_chunk = fwd_pchunk // pchunk

    from vrdd_tpu.pallas.slice_kernel import hist_manual_stream_ok

    hist_dtype = jnp.bfloat16 if plane_bytes == 2 else jnp.float32
    ms = decode_bins > 0 and hist_manual_stream_ok(NY, NX, hist_dtype)

    fwd_kernel = _make_kernel(
        H, W, NY, NX, n_planes, n_lut, dz_sign, box_min, box_max, tstep,
        threshold, length_correction, mm_dtype, fwd_pchunk,
        tex_offset=tex_offset, ess=ess, seed=seed, axis_scale=axis_scale,
        decode_bins=decode_bins, reverse_planes=rev,
        decode_mode=decode_mode, manual_stream=ms,
    )
    fwd_ckpt_kernel = _make_kernel(
        H, W, NY, NX, n_planes, n_lut, dz_sign, box_min, box_max, tstep,
        threshold, length_correction, mm_dtype, fwd_pchunk, emit_ckpt=True,
        tex_offset=tex_offset, ess=ess, seed=seed, axis_scale=axis_scale,
        ck_stride=pchunk, decode_bins=decode_bins, reverse_planes=rev,
        decode_mode=decode_mode, manual_stream=ms,
    )
    # the kernel's d_planes path serves BOTH the histogram cotangent and
    # the decode-weight cotangent (each is a linear function of d_dec)
    kernel_wrt = tuple(dict.fromkeys(
        ("volume" if w == "weights" else w) for w in wrt
    )) if decode_bins else wrt
    bwd_kernel, n_chunks, n_strips = _make_bwd_kernel(
        H, W, NY, NX, n_planes, n_lut, dz_sign, box_min, box_max, tstep,
        threshold, length_correction, mm_dtype, pchunk,
        tex_offset=tex_offset, wrt=kernel_wrt, axis_scale=axis_scale,
        decode_bins=decode_bins, reverse_planes=rev,
        decode_mode=decode_mode, manual_stream=ms,
    )
    n_chunks_fwd = n_planes // fwd_pchunk

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs, out_spec, scratch, grid = _sweep_specs(
        H, W, NY, NX, n_planes, n_lut, fwd_pchunk, ess=ess,
        mm_dtype=mm_dtype, seed=seed, decode_bins=decode_bins,
        reverse_planes=rev, decode_rows=n_w, hist_dtype=hist_dtype,
        manual_stream=ms,
    )
    in_specs_ck, out_spec_ck, scratch_ck, grid_ck = _sweep_specs(
        H, W, NY, NX, n_planes, n_lut, fwd_pchunk, ess=ess, emit_ckpt=True,
        mm_dtype=mm_dtype, seed=seed, decode_bins=decode_bins,
        reverse_planes=rev, decode_rows=n_w, hist_dtype=hist_dtype,
        manual_stream=ms,
    )
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        # the hist-decode forwards carry the 2-slot stream buffer + the
        # decode scratch on top of the scalar path's tenants (the var
        # tree decode peaks ~113 MB at 512^3 x 16 -> 1024^2)
        vmem_limit_bytes=(118 if decode_bins else 100) * 1024 * 1024,
    )
    # the backward carries the suffix-sum image + grad scratch on top of the
    # double-buffered plane / plane-grad / checkpoint blocks
    cparams_bwd = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=118 * 1024 * 1024,
    )

    def _ess_args(planes_all, zs_in, params, lut):
        if not ess:
            return ()
        return (_ess_bitmap(
            planes_all, zs_in[0], params[0, :3], lut,
            params[0, 5], params[0, 6], params[0, 8:12], box_min, box_max,
            H, W, fwd_pchunk, tex_offset, axis_scale=tuple(axis_scale),
        ),)

    def _seed_args(acc0):
        if not seed:
            return ()
        return (jnp.transpose(acc0, (2, 0, 1)),)

    def _dw_args(dw):
        # dw arrives (n_w, B) — row layout per decode_weight_rows
        return (dw,) if decode_bins else ()

    def _fwd_call(planes_all, zs_in, acc0, params, coef_flat, lut, dw=None):
        out = pl.pallas_call(
            fwd_kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_strips, _acc_rows(n_lut, False), STRIP, W), jnp.float32
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
            compiler_params=cparams,
        )(params, zs_in, coef_flat, planes_all, *_dw_args(dw),
          *_ess_args(planes_all, zs_in, params, lut), *_seed_args(acc0))
        return jnp.transpose(out[:, :4], (0, 2, 3, 1)).reshape(H, W, 4)

    def _fwd_ckpt_call(planes_all, zs_in, acc0, params, coef_flat, lut,
                       dw=None):
        out, tck, live_map = pl.pallas_call(
            fwd_ckpt_kernel,
            out_shape=(
                jax.ShapeDtypeStruct(
                    (n_strips, _acc_rows(n_lut, True), STRIP, W), jnp.float32
                ),
                # one T checkpoint per BACKWARD chunk (ck_per_chunk rows
                # per forward chunk; row 0 = chunk start, rest mid-chunk)
                jax.ShapeDtypeStruct((n_chunks, H, W), jnp.float32),
                jax.ShapeDtypeStruct((n_strips, n_chunks_fwd), jnp.int32),
            ),
            grid=grid_ck,
            in_specs=in_specs_ck,
            out_specs=(
                out_spec_ck,
                vmem((ck_per_chunk, STRIP, W), lambda k, s: (k, s, 0)),
                smem((n_strips, n_chunks_fwd), lambda k, s: (0, 0)),
            ),
            scratch_shapes=scratch_ck,
            compiler_params=cparams,
        )(params, zs_in, coef_flat, planes_all, *_dw_args(dw),
          *_ess_args(planes_all, zs_in, params, lut), *_seed_args(acc0))
        img = jnp.transpose(out[:, :4], (0, 2, 3, 1)).reshape(H, W, 4)
        # duplicate the per-forward-chunk live bits over backward sub-chunks
        if ck_per_chunk > 1:
            live_map = jnp.repeat(live_map, ck_per_chunk, axis=1)
        return img, tck, live_map

    def _bwd_call(planes_all, zs_in, params, coef_flat, tck, live_map, g,
                  dw=None):
        g4 = jnp.transpose(g, (2, 0, 1)).astype(jnp.float32)  # (4, H, W)
        if decode_bins and ms:
            # the full histogram volume stays in HBM; the kernel's own
            # double-buffered DMA streams z-layer blocks (block k when rev
            # — bwd chunk k processes front-to-back chunk kk = n_chunks-1-k
            # whose z-ascending layer block is n_chunks-1-kk = k)
            plane_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        elif decode_bins:
            plane_spec = vmem(
                (pchunk, decode_bins, NY, NX),
                (lambda k, s: (k, 0, 0, 0)) if rev
                else (lambda k, s: (n_chunks - 1 - k, 0, 0, 0)),
            )
        else:
            plane_spec = vmem(
                (pchunk, NY, NX),
                (lambda k, s: (k, 0, 0)) if rev
                else (lambda k, s: (n_chunks - 1 - k, 0, 0)),
            )
        in_specs_bwd = [
            smem((1, 12), lambda k, s: (0, 0)),
            smem((1, n_planes), lambda k, s: (0, 0)),
            smem((1, 4 * n_lut), lambda k, s: (0, 0)),
            plane_spec,
            *([smem((n_w, decode_bins), lambda k, s: (0, 0))]
              if decode_bins else []),
            vmem((4, STRIP, W), lambda k, s: (0, s, 0)),
            vmem((1, STRIP, W), lambda k, s: (n_chunks - 1 - k, s, 0)),
            smem((n_strips, n_chunks), lambda k, s: (0, 0)),
        ]
        # var decode: the kernel's replay additionally emits the two chain
        # moments [m, 2(mC0-C1)] per voxel (z-layer order, the histogram's
        # storage dtype) so the cotangent chain never re-reads the
        # histogram stream
        mom_shape, mom_spec = (), ()
        if decode_mode == "var":
            mom_dtype = planes_all.dtype
            mom_shape = (jax.ShapeDtypeStruct(
                (n_planes, 2, NY, NX), mom_dtype),)
            mom_spec = (vmem(
                (pchunk, 2, NY, NX),
                (lambda k, s: (k, 0, 0, 0)) if rev
                else (lambda k, s: (n_chunks - 1 - k, 0, 0, 0))),)
        d_planes, small, S_img, *mom = pl.pallas_call(
            bwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n_planes, NY, NX), jnp.float32),
                jax.ShapeDtypeStruct((1, 4 * n_lut + 3), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            ) + mom_shape,
            grid=(n_chunks, n_strips),
            in_specs=in_specs_bwd,
            out_specs=(
                # decode variant emits d_dec in z-LAYER order (block k =
                # the chunk's layer block; rows flipped in-kernel)
                vmem((pchunk, NY, NX),
                     (lambda k, s: (k, 0, 0)) if rev
                     else (lambda k, s: (n_chunks - 1 - k, 0, 0))),
                smem((1, 4 * n_lut + 3), lambda k, s: (0, 0)),
                vmem((H, W), lambda k, s: (0, 0)),
            ) + mom_spec,
            scratch_shapes=[
                pltpu.VMEM((4 * n_lut, STRIP, W), jnp.float32),
                pltpu.VMEM((3, STRIP, W), jnp.float32),
                pltpu.VMEM((pchunk, STRIP, NX), jnp.float32),
                pltpu.VMEM((pchunk, STRIP, NX), jnp.float32),
                pltpu.VMEM((pchunk, STRIP, W), jnp.float32),  # T replay
                pltpu.VMEM((pchunk, STRIP, W), jnp.float32),  # res cache
                pltpu.VMEM((pchunk, STRIP, W), jnp.float32),  # col_a cache
            ] + ([
                pltpu.VMEM((pchunk, NY, NX), jnp.float32),
            ] if decode_bins else []) + ([
                pltpu.VMEM((2, pchunk, decode_bins, NY, NX), hist_dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ] if (decode_bins and ms) else []),
            compiler_params=cparams_bwd,
        )(params, zs_in, coef_flat, planes_all, *_dw_args(dw), g4, tck,
          live_map)
        g_lut = small[0, : 4 * n_lut].reshape(n_lut, 4)
        g_density = small[0, 4 * n_lut + 0]
        g_toff = small[0, 4 * n_lut + 1]
        g_tscl = small[0, 4 * n_lut + 2]
        return d_planes, g_lut, g_density, g_toff, g_tscl, S_img, \
            (mom[0] if mom else None)

    if decode_bins:
        # histogram variant: planes_all is the bins-major (nz, B, NY, NX)
        # histogram volume, dw the (n_w, B) decode-weight rows
        # (decode_weight_rows). d_hist chains d_dec through the decode's
        # jacobian per decode_mode (linear: one broadcast; var/entropy:
        # fused with one extra histogram-stream read); d_dw = <hist layer
        # L, d_dec> summed over layers (the template-coefficient
        # cotangent), linear mode only, pruned unless wrt has "weights".
        g_dw = "weights" in wrt

        @jax.custom_vjp
        def sweep_h(hist_bm, dw, zs, acc0, origin, slopes, lut, density,
                    toff, tscl, spacing):
            params = _pack_params(origin, density, toff, tscl, slopes,
                                  spacing)
            coef_flat = tf_relu_coefficients(lut).reshape(1, -1)
            return _fwd_call(hist_bm, zs[None, :], acc0, params, coef_flat,
                             lut, dw)

        def sweep_h_fwd(hist_bm, dw, zs, acc0, origin, slopes, lut, density,
                        toff, tscl, spacing):
            params = _pack_params(origin, density, toff, tscl, slopes,
                                  spacing)
            coef_flat = tf_relu_coefficients(lut).reshape(1, -1)
            out, tck, live_map = _fwd_ckpt_call(
                hist_bm, zs[None, :], acc0, params, coef_flat, lut, dw
            )
            return out, (hist_bm, dw, zs, acc0, origin, slopes, lut,
                         density, toff, tscl, spacing, tck, live_map)

        def sweep_h_bwd(res, g):
            (hist_bm, dw, zs, acc0, origin, slopes, lut, density, toff,
             tscl, spacing, tck, live_map) = res
            params = _pack_params(origin, density, toff, tscl, slopes,
                                  spacing)
            coef_flat = tf_relu_coefficients(lut).reshape(1, -1)
            d_dec, g_lut, g_density, g_toff, g_tscl, S_img, mom = _bwd_call(
                hist_bm, zs[None, :], params, coef_flat, tck, live_map, g,
                dw
            )
            # d_dec arrives in z-LAYER order (the bwd kernel writes layer
            # blocks directly when rev). Cotangent dtype follows the
            # histogram's storage dtype: a bf16-stored distribution volume
            # (2x stream bandwidth, decode accuracy == the materialized
            # path's bf16 decode matmul) gets bf16 cotangents.
            d_dec_z = d_dec
            if "volume" not in wrt:
                d_hist = jnp.zeros_like(hist_bm)
            elif decode_mode == "linear":
                # rank-1 chain: one broadcast
                d_hist = (
                    d_dec_z[:, None, :, :] * dw[0][None, :, None, None]
                ).astype(hist_bm.dtype)
            elif decode_mode == "var":
                # dec = C2 - 2 m C1 + m^2 C0 (C_k = dw[k]·h, m = dw[0]·h):
                # d h_b = dw2[b] - 2 m dw1[b] + m^2 dw3[b]
                #         + 2 (m C0 - C1) dw0[b].
                # m and e = 2(mC0 - C1) come from the bwd kernel's own
                # decode replay (mom output) — no moment pass ever re-reads
                # the histogram stream (a stacked einsum doing so measured
                # +~20 ms at 512^3 x 16; three separate einsums +110 ms).
                m = mom[:, 0].astype(jnp.float32)
                e = mom[:, 1].astype(jnp.float32)
                quad = (
                    dw[2][None, :, None, None]
                    - 2.0 * m[:, None] * dw[1][None, :, None, None]
                    + (m * m)[:, None] * dw[3][None, :, None, None]
                    + e[:, None] * dw[0][None, :, None, None]
                )
                d_hist = (d_dec_z[:, None] * quad).astype(hist_bm.dtype)
            else:  # entropy: d h_b = -s (log2 h_b + 1/ln2), 0 at h_b == 0
                hf = hist_bm.astype(jnp.float32)
                dlog = jnp.where(
                    hf > 0.0,
                    -dw[0, 0]
                    * (jnp.log2(jnp.maximum(hf, _ENT_TINY))
                       + np.float32(1.0 / np.log(2.0))),
                    0.0,
                )
                d_hist = (d_dec_z[:, None] * dlog).astype(hist_bm.dtype)
            d_dw = (
                jnp.einsum("zbyx,zyx->b", hist_bm, d_dec_z)[None, :]
                if g_dw
                else jnp.zeros_like(dw)
            )
            if seed:
                # seed cotangent as the scalar variant (see sweep_bwd):
                # d seed_rgb = g_rgb, d seed_a = g_a - S / T_0 — the chain
                # that backprops the distributed pass 2 into upstream
                # bricks' prefixes, now through the in-kernel decode too
                T0 = 1.0 - acc0[..., 3]
                d_seed_a = g[..., 3] - jnp.where(
                    jnp.abs(T0) > 1e-6, S_img / T0, 0.0
                )
                d_acc0 = jnp.concatenate(
                    [g[..., :3], d_seed_a[..., None]], axis=-1
                )
            else:
                d_acc0 = jnp.zeros_like(acc0)
            return (
                d_hist, d_dw,
                jnp.zeros_like(zs),
                d_acc0,
                jnp.zeros((3,), dtype=jnp.float32),
                jnp.zeros((4,), dtype=jnp.float32),
                g_lut.astype(lut.dtype),
                g_density.astype(jnp.float32),
                g_toff.astype(jnp.float32),
                g_tscl.astype(jnp.float32),
                jnp.zeros((), dtype=jnp.float32),
            )

        sweep_h.defvjp(sweep_h_fwd, sweep_h_bwd)
        sweep_h._fwd_ckpt_call = _fwd_ckpt_call  # see live_fractions
        return sweep_h

    @jax.custom_vjp
    def sweep(planes_all, zs, acc0, origin, slopes, lut, density, toff,
              tscl, spacing):
        params = _pack_params(origin, density, toff, tscl, slopes, spacing)
        coef_flat = tf_relu_coefficients(lut).reshape(1, -1)
        return _fwd_call(planes_all, zs[None, :], acc0, params, coef_flat,
                         lut)

    def sweep_fwd(planes_all, zs, acc0, origin, slopes, lut, density, toff,
                  tscl, spacing):
        params = _pack_params(origin, density, toff, tscl, slopes, spacing)
        coef_flat = tf_relu_coefficients(lut).reshape(1, -1)
        out, tck, live_map = _fwd_ckpt_call(
            planes_all, zs[None, :], acc0, params, coef_flat, lut
        )
        return out, (planes_all, zs, acc0, origin, slopes, lut, density,
                     toff, tscl, spacing, tck, live_map)

    def sweep_bwd(res, g):
        (planes_all, zs, acc0, origin, slopes, lut, density, toff, tscl,
         spacing, tck, live_map) = res
        params = _pack_params(origin, density, toff, tscl, slopes, spacing)
        coef_flat = tf_relu_coefficients(lut).reshape(1, -1)
        d_planes, g_lut, g_density, g_toff, g_tscl, S_img, _ = _bwd_call(
            planes_all, zs[None, :], params, coef_flat, tck, live_map, g
        )
        if seed:
            # d seed_rgb = g_rgb (passthrough); d seed_a = g_a - S / T_0
            # (frozen seeds — T_0 <= 0 < 1-thr — have S = 0, so the where
            # never hides a real contribution)
            T0 = 1.0 - acc0[..., 3]
            d_seed_a = g[..., 3] - jnp.where(
                jnp.abs(T0) > 1e-6, S_img / T0, 0.0
            )
            d_acc0 = jnp.concatenate(
                [g[..., :3], d_seed_a[..., None]], axis=-1
            )
        else:
            d_acc0 = jnp.zeros_like(acc0)
        return (
            d_planes,
            jnp.zeros_like(zs),                  # plane depths: non-diff
            d_acc0,
            jnp.zeros((3,), dtype=jnp.float32),  # origin: non-diff (as XLA path)
            jnp.zeros((4,), dtype=jnp.float32),  # slope grid: non-diff
            g_lut.astype(lut.dtype),
            g_density.astype(jnp.float32),
            g_toff.astype(jnp.float32),
            g_tscl.astype(jnp.float32),
            jnp.zeros((), dtype=jnp.float32),    # spacing: non-diff
        )

    sweep.defvjp(sweep_fwd, sweep_bwd)
    sweep._fwd_ckpt_call = _fwd_ckpt_call  # see live_fractions
    return sweep


def pallas_sweep_slope_space_diff(
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
    plane_chunk: int = 4,
    tex_offset: float = 0.5,
    wrt: tuple = ("volume", "lut", "params"),
    empty_space_skip: bool = False,
    axis_scale=(1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Differentiable fused sweep over a UNIFORM ray-slope grid.

    The custom-VJP counterpart of ``pallas_sweep_slope_space`` — used by the
    shear-warp renderer for rotated views. ``mx``/``my`` are HOST numpy
    grids (static per compile). Grids of any length are accepted: padded up
    to the kernel tiling and cropped back (the crop's transpose zero-pads
    the incoming image cotangent, so gradients are exact)."""
    Wm = int(np.asarray(mx).shape[0])
    Hm = int(np.asarray(my).shape[0])
    mx = _pad_grid(mx, 128)
    my = _pad_grid(my, STRIP)
    mx0, dmx = _uniform_grid_params(mx, "mx")
    my0, dmy = _uniform_grid_params(my, "my")
    out = _diff_call(
        jnp.asarray(volume), origin,
        jnp.asarray([mx0, dmx, my0, dmy], jnp.float32), tf_lut, density,
        brightness, transfer_offset, transfer_scale, dz_sign=int(dz_sign),
        width=int(mx.shape[0]),
        height=int(my.shape[0]), march=march, n_planes=n_planes,
        length_correction=length_correction, precision=precision,
        plane_chunk=plane_chunk, tex_offset=float(tex_offset),
        wrt=_norm_wrt(wrt), empty_space_skip=empty_space_skip,
        axis_scale=tuple(axis_scale),
    )
    return out[:Hm, :Wm]


@functools.partial(
    jax.jit,
    static_argnames=(
        "dz_sign", "width", "height", "march", "n_planes",
        "length_correction", "precision", "plane_chunk", "tex_offset", "wrt",
        "empty_space_skip", "axis_scale",
    ),
)
def _diff_call(
    volume, origin, slopes, tf_lut, density, brightness, transfer_offset,
    transfer_scale, *, dz_sign, width, height, march, n_planes,
    length_correction, precision, plane_chunk, tex_offset=0.5,
    wrt=("volume", "lut", "params"), empty_space_skip=False,
    axis_scale=(1.0, 1.0, 1.0),
):
    nz, ny, nx = volume.shape
    if n_planes <= 0:
        n_planes = 2 * nz
    pchunk = _fit_plane_chunk(plane_chunk, n_planes, ny, nx, width)
    if empty_space_skip and tuple(wrt) != ("volume",):
        raise ValueError(
            "empty_space_skip is exact only for wrt=('volume',): alpha-LUT / "
            "density / TF-offset / TF-scale cotangents are nonzero in empty "
            "space (raising a LUT alpha entry would make it visible)"
        )
    # PURE-SELECTION fast path (see slice_kernel.py _sweep_call): with
    # n_planes == nz and the default z filter grid, stream the volume
    # directly (reversed block index map for dz < 0) instead of
    # materializing a flipped copy — and the backward writes its plane
    # cotangents in z-LAYER order, so d_volume needs no un-flip either.
    # Inline ESS computes per-plane stats from the stack, so it keeps the
    # materialized pre-blend.
    pure_sel = (
        n_planes == nz and tex_offset == 0.5 and axis_scale[2] == 1.0
        and not empty_space_skip
    )
    sweep = _make_diff_sweep(
        height, width, ny, nx, n_planes, int(tf_lut.shape[0]), dz_sign,
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction, precision, pchunk, tex_offset, wrt,
        ess=empty_space_skip, axis_scale=tuple(axis_scale[:2]),
        reverse_planes=pure_sel and dz_sign < 0,
    )
    if pure_sel:
        zlo, zhi = march.box_min[2], march.box_max[2]
        spacing_h = (zhi - zlo) / n_planes
        zs = (
            zlo + spacing_h * (np.arange(n_planes, dtype=np.float32) + 0.5)
        ).astype(np.float32)
        if dz_sign < 0:
            zs = zs[::-1].copy()
        planes_all = volume
    else:
        planes_all, zs = _preblend_planes(
            volume, n_planes, march.box_min, march.box_max, dz_sign,
            tex_offset, z_scale=axis_scale[2],
        )
    if "volume" not in wrt:
        # also kills the pre-blend transpose matmul in the outer XLA graph
        planes_all = jax.lax.stop_gradient(planes_all)
    spacing = (march.box_max[2] - march.box_min[2]) / n_planes
    acc = sweep(
        planes_all,
        jnp.asarray(zs, jnp.float32),
        jnp.zeros((height, width, 4), jnp.float32),  # no seed: ignored + DCE'd
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(slopes, jnp.float32),
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        jnp.float32(spacing),
    )
    return acc * jnp.asarray(brightness, dtype=jnp.float32)


def sweep_preblended_planes_diff(
    planes_all,
    zs,
    origin,
    slopes,
    tf_lut,
    density=0.05,
    brightness=1.0,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    dz_sign=-1,
    width,
    height,
    march: MarchConfig = MarchConfig(),
    length_correction=True,
    precision="f32",
    plane_chunk=4,
    tex_offset=0.5,
    wrt: tuple = ("volume", "lut", "params"),
    acc_init=None,
    plane_spacing=None,
    axis_scale=(1.0, 1.0),
    reverse_planes=False,
):
    """Differentiable twin of ``sweep_preblended_planes`` (slice_kernel.py).

    ``reverse_planes``: ``planes_all`` is stored z-ASCENDING and walked
    back-to-front by the kernel's index maps (and ``d_planes`` comes back
    in the same storage order) — the distributed sweep's pure-selection
    fast path streams each slab shard directly instead of materializing a
    flipped copy.

    Same value, same traced-data contract — plane stack, plane depths, slope
    grid, seed and spacing are all data, so ONE compile serves every device's
    shard inside shard_map. Under ``jax.grad`` the forward emits transmittance
    checkpoints and the fused reverse sweep produces cotangents for the plane
    stack, TF LUT, density, brightness, TF offset/scale AND the ``acc_init``
    seed (see _make_diff_sweep: d seed_a = g_a - S / T_0) — the seed
    cotangent is what lets the distributed two-pass exact-ET scheme backprop
    into upstream bricks' prefixes. When not differentiated, the primal is
    the plain fused kernel (no checkpoint traffic).

    Not jitted: call inside your own jit/shard_map. This distributes the
    capability of the reference's d_render hot loop
    (volumeRender_kernel.cu:272-717) per the BASELINE sharding contract.
    """
    n_planes, ny, nx = planes_all.shape
    pchunk = _fit_plane_chunk(plane_chunk, n_planes, ny, nx, width)
    if plane_spacing is None:
        plane_spacing = (march.box_max[2] - march.box_min[2]) / n_planes
    seed = acc_init is not None
    sweep = _make_diff_sweep(
        height, width, ny, nx, n_planes, int(tf_lut.shape[0]), int(dz_sign),
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction, precision, pchunk, float(tex_offset),
        _norm_wrt(wrt), ess=False, seed=seed, axis_scale=tuple(axis_scale),
        reverse_planes=reverse_planes,
    )
    acc0 = (
        jnp.asarray(acc_init, jnp.float32) if seed
        else jnp.zeros((height, width, 4), jnp.float32)
    )
    out = sweep(
        jnp.asarray(planes_all, jnp.float32),
        jnp.asarray(zs, jnp.float32),
        acc0,
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(slopes, jnp.float32),
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        jnp.asarray(plane_spacing, jnp.float32),
    )
    return out * jnp.asarray(brightness, dtype=jnp.float32)


def sweep_preblended_hist_diff(
    hist_bm,
    weights,
    zs,
    origin,
    slopes,
    tf_lut,
    density=0.05,
    brightness=1.0,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    dz_sign=-1,
    width,
    height,
    march: MarchConfig = MarchConfig(),
    length_correction=True,
    precision="f32",
    plane_chunk=4,
    wrt: tuple = ("hist", "lut", "params"),
    stat: str = "linear",
    acc_init=None,
    plane_spacing=None,
    reverse_planes=True,
):
    """``sweep_preblended_planes_diff`` for a bins-major HISTOGRAM slab.

    ``hist_bm (P, B, NY, NX)`` is a z-layer shard of the distribution
    volume (pure-selection schedule: the P layers ARE the slab's planes,
    streamed back-to-front by the kernel's index maps when
    ``reverse_planes``); the per-voxel statistic decodes in the kernel
    prologue (slice_kernel.py ``_decode_block``: stat =
    'linear'/'var'/'entropy', weight rows from ``decode_weight_rows``).
    Everything else — plane depths, seed, spacing, slope grid — is traced
    data, so ONE compile serves every brick's shard inside shard_map, and
    the seeded pass-2 exact early termination backprops into upstream
    bricks through the seed cotangent, exactly like the scalar sweep.
    This is the distributed form of the reference's in-march decode
    (volumeRender_kernel.cu:354-480) — a capability the reference's
    single-GPU design never had.
    """
    n_planes, B, ny, nx = hist_bm.shape
    weights = jnp.asarray(weights, jnp.float32)
    if weights.ndim == 1:
        weights = weights[None, :]
    n_w = {"linear": 1, "var": 4, "entropy": 1}[stat]
    assert weights.shape == (n_w, B), (weights.shape, stat, B)
    kw = tuple(("volume" if w == "hist" else w) for w in wrt)
    kw = tuple(w for w in ("volume", "weights", "lut", "params") if w in kw)
    pbytes = jnp.dtype(hist_bm.dtype).itemsize
    pchunk = _fit_plane_chunk(plane_chunk, n_planes, ny, nx, width,
                              bins=B, plane_bytes=pbytes)
    if plane_spacing is None:
        plane_spacing = (march.box_max[2] - march.box_min[2]) / n_planes
    seed = acc_init is not None
    sweep = _make_diff_sweep(
        height, width, ny, nx, n_planes, int(tf_lut.shape[0]), int(dz_sign),
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction, precision, pchunk,
        wrt=kw, seed=seed, decode_bins=B, plane_bytes=pbytes,
        reverse_planes=reverse_planes, decode_mode=stat,
    )
    acc0 = (
        jnp.asarray(acc_init, jnp.float32) if seed
        else jnp.zeros((height, width, 4), jnp.float32)
    )
    out = sweep(
        jnp.asarray(hist_bm),  # storage dtype preserved (bf16 streams 2x)
        weights,
        jnp.asarray(zs, jnp.float32),
        acc0,
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(slopes, jnp.float32),
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        jnp.asarray(plane_spacing, jnp.float32),
    )
    return out * jnp.asarray(brightness, dtype=jnp.float32)


def pallas_slice_render_diff(
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
    plane_chunk: int = 4,
    tex_offset: float = 0.5,
    wrt: tuple = ("volume", "lut", "params"),
    empty_space_skip: bool = False,
    axis_scale=(1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Differentiable fused render: same value as ``pallas_slice_render``.

    Gradients flow to volume, tf_lut, density, brightness, transfer
    offset/scale via the fused analytic Pallas backward. ``wrt`` statically
    prunes cotangent paths ("volume" / "lut" / "params"): a LUT-only fit
    skips the plane-gradient matmul transposes, a volume-only fit skips the
    per-LUT-entry tent accumulation (the backward's largest VPU cost).
    Pruned inputs receive exact-zero gradients — only list what you train.
    """
    volume = jnp.asarray(volume)
    if n_planes <= 0:
        n_planes = 2 * volume.shape[0]
    mx, my = _pixel_slopes(width, height, focal)
    return pallas_sweep_slope_space_diff(
        volume, origin, mx, my, tf_lut, density, brightness,
        transfer_offset, transfer_scale, march=march, dz_sign=-1,
        n_planes=n_planes, length_correction=length_correction,
        precision=precision, plane_chunk=plane_chunk, tex_offset=tex_offset,
        wrt=wrt, empty_space_skip=empty_space_skip, axis_scale=axis_scale,
    )


def pallas_hist_render_diff(
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
    plane_chunk: int = 4,
    focal: float = 2.0,
    wrt: tuple = ("hist", "lut"),
    stat: str = "linear",
    route: str = "inkernel",
) -> jnp.ndarray:
    """DIFFERENTIABLE fused render straight from a bins-major histogram
    volume — the in-kernel-decode twin of ``pallas_slice_render_diff``.

    Forward (inkernel route): pallas_slice_render-style fused sweep whose
    plane prologue decodes the per-voxel statistic in VMEM (see
    slice_kernel.py pallas_hist_render: ``stat='linear'`` contracts
    ``density = sum_b weights[b] * hist_bm[:, b]``; 'var'/'entropy' run
    the nonlinear combines with rows from ``decode_weight_rows``) — the
    decoded scalar volume never exists in HBM, in EITHER direction: the
    backward's replay re-decodes each chunk in VMEM and emits
    decoded-plane cotangents, which chain through the decode's jacobian
    (linear: ``d_hist[L, b] = weights[b] * d_dec[L]``, one XLA broadcast;
    var/entropy: one fused elementwise pass with a histogram re-read) and
    optionally ``d_weights[b] = <hist[:, b], d_dec>`` (linear only).

    ``wrt`` entries: "hist" (histogram cotangent), "weights" (decode
    coefficients — the template/bin-center analogue; linear stat only),
    "lut", "params". Constraints as pallas_hist_render: n_planes == nz,
    width % 128 == 0, height % STRIP == 0.

    ``route`` selects the implementation (same value, same gradients):

    - ``'inkernel'``: the streamed in-kernel decode described below — the
      histogram volume is read by BOTH sweeps and nothing decoded ever
      lands in HBM (minimum-memory; the only route when the decoded f32
      volume + its cotangent would not fit beside the histograms).
    - ``'materialized'``: decode the statistic with XLA
      (:func:`decode_with_rows`), render with the SCALAR fused VJP, and
      let autodiff transpose the decode (one fused broadcast back to
      d_hist). Reads the 2-byte histogram stream ONCE instead of twice at
      the price of one decoded f32 volume in HBM — measured faster at the
      512^3 x 16-bin headline shape (36.4 vs 38.9 ms recorded fwd+bwd,
      2026-08) where the extra 0.5 GB fits easily.
    - ``'auto'``: the measured-best policy (BENCH r5 route A/Bs):
      'inkernel' for entropy (XLA's log2-heavy decode pass loses, 10.5 vs
      16.6 Mrays/s) and whenever the materialized route's extra residency
      (decoded f32 volume + its cotangent beside the histograms and
      d_hist) would crowd a 16 GB chip; 'materialized' otherwise (wins at
      the 512^3 x 16 mean/var configs).
    """
    if route == "auto":
        hist_bytes = int(np.prod(hist_bm.shape)) * jnp.dtype(
            hist_bm.dtype).itemsize
        voxels = hist_bm.shape[0] * hist_bm.shape[2] * hist_bm.shape[3]
        fits = 2 * hist_bytes + 12 * voxels < 13 * 1024 ** 3
        route = "materialized" if (stat != "entropy" and fits) else "inkernel"
    if route == "materialized":
        from vrdd_tpu.pallas.slice_kernel import decode_with_rows

        nz = hist_bm.shape[0]
        w = jnp.asarray(weights, jnp.float32)
        if w.ndim == 1:
            w = w[None, :]
        mode = {"linear": "linear", "var": "var", "entropy": "entropy"}[stat]
        vol = decode_with_rows(hist_bm, w, mode)
        if "hist" not in wrt:
            vol = jax.lax.stop_gradient(vol)
        kw = tuple(w2 for w2 in ("volume", "lut", "params")
                   if (w2 in wrt or (w2 == "volume" and "hist" in wrt)))
        return pallas_slice_render_diff(
            vol, origin, tf_lut, density, brightness, transfer_offset,
            transfer_scale, width=width, height=height, march=march,
            focal=focal, n_planes=nz, length_correction=length_correction,
            precision=precision, plane_chunk=plane_chunk or 4, wrt=kw,
        )
    assert route == "inkernel", route
    nz, B, ny, nx = hist_bm.shape
    n_planes = nz
    assert width % 128 == 0 and height % STRIP == 0, (width, height)
    kw = tuple(("volume" if w == "hist" else w) for w in wrt)
    allowed = ("volume", "weights", "lut", "params")
    assert all(w in allowed for w in kw), (wrt, allowed)
    kw = tuple(w for w in allowed if w in kw)
    weights = jnp.asarray(weights, jnp.float32)
    if weights.ndim == 1:
        weights = weights[None, :]
    n_w = {"linear": 1, "var": 4, "entropy": 1}[stat]
    assert weights.shape == (n_w, B), (weights.shape, stat, B)

    pbytes = jnp.dtype(hist_bm.dtype).itemsize
    sweep = _make_diff_sweep(
        height, width, ny, nx, n_planes, int(jnp.shape(tf_lut)[0]), -1,
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        length_correction, precision,
        _fit_plane_chunk(plane_chunk or 4, n_planes, ny, nx, width, bins=B,
                         plane_bytes=pbytes),
        wrt=kw, decode_bins=B, plane_bytes=pbytes, reverse_planes=True,
        decode_mode=stat,
    )

    (xlo, ylo, zlo) = march.box_min
    (xhi, yhi, zhi) = march.box_max
    spacing = (zhi - zlo) / n_planes
    zs = (
        zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5)
    ).astype(np.float32)[::-1]
    mxh, myh = _pixel_slopes(width, height, focal)
    slopes = jnp.asarray(
        [mxh[0], mxh[1] - mxh[0] if width > 1 else 0.0,
         myh[0], myh[1] - myh[0] if height > 1 else 0.0], jnp.float32,
    )
    acc0 = jnp.zeros((height, width, 4), dtype=jnp.float32)
    out = sweep(
        jnp.asarray(hist_bm),  # dtype preserved: bf16 storage streams 2x
        jnp.asarray(weights, jnp.float32),
        jnp.asarray(zs), acc0,
        jnp.asarray(origin, jnp.float32), slopes,
        jnp.asarray(tf_lut, jnp.float32),
        jnp.asarray(density, jnp.float32),
        jnp.asarray(transfer_offset, jnp.float32),
        jnp.asarray(transfer_scale, jnp.float32),
        jnp.asarray(spacing, jnp.float32),
    )
    return out * jnp.asarray(brightness, jnp.float32)


def live_fractions(
    volume,
    origin,
    tf_lut,
    density=0.05,
    transfer_offset=0.0,
    transfer_scale=1.0,
    *,
    width: int,
    height: int,
    march: MarchConfig = MarchConfig(),
    n_planes: int = 0,
    plane_chunk: int = 4,
    focal: float = 2.0,
) -> dict:
    """MEASURED culling effectivity of the fused sweep at one config.

    Runs the checkpointing forward (the exact kernel the fwd+bwd headline
    times) and reduces its per-(strip, chunk) live-tile bitmap — the bits
    that gate every x-tile body in the forward AND the backward
    (slice_kernel.py `_make_kernel` emit_ckpt; slice_vjp.py `_bwd_call`
    processes exactly these bits). Returns

    - ``tile_live_frac``: fraction of (strip, chunk, x-tile) bodies that
      actually ran — scales the per-sample VPU work and the x-resample
      matmul of an effective-work roofline bound,
    - ``strip_live_frac``: fraction of (strip, chunk) pairs with any live
      tile — scales the per-strip y-resample matmul,

    against the no-culling model (bench.py roofline()). The HBM stream is
    NOT scaled by liveness: plane blocks stream even for frozen chunks
    (the index map walks regardless). Requires the kernel-tiled image
    sizes of the diff path (width % 128 == 0, height % STRIP == 0).
    """
    volume = jnp.asarray(volume)
    nz, ny, nx = volume.shape
    if n_planes <= 0:
        n_planes = 2 * nz
    assert width % 128 == 0 and height % STRIP == 0, (width, height)
    pchunk = _fit_plane_chunk(plane_chunk, n_planes, ny, nx, width)
    pure_sel = n_planes == nz
    sweep = _make_diff_sweep(
        height, width, ny, nx, n_planes, int(tf_lut.shape[0]), -1,
        march.box_min, march.box_max, march.tstep, march.opacity_threshold,
        True, "f32", pchunk, 0.5, ("volume", "lut"),
        reverse_planes=pure_sel,
    )
    if pure_sel:
        zlo, zhi = march.box_min[2], march.box_max[2]
        spacing = (zhi - zlo) / n_planes
        zs = (zlo + spacing * (np.arange(n_planes, dtype=np.float32) + 0.5))
        zs = zs.astype(np.float32)[::-1].copy()
        planes_all = volume
    else:
        planes_all, zs = _preblend_planes(
            volume, n_planes, march.box_min, march.box_max, -1, 0.5
        )
        spacing = (march.box_max[2] - march.box_min[2]) / n_planes
    mxh, myh = _pixel_slopes(width, height, focal)
    slopes = jnp.asarray(
        [mxh[0], mxh[1] - mxh[0] if width > 1 else 0.0,
         myh[0], myh[1] - myh[0] if height > 1 else 0.0], jnp.float32,
    )
    params = _pack_params(origin, density, transfer_offset, transfer_scale,
                          slopes, spacing)
    lut = jnp.asarray(tf_lut, jnp.float32)
    coef_flat = tf_relu_coefficients(lut).reshape(1, -1)
    acc0 = jnp.zeros((height, width, 4), jnp.float32)
    _, _, live_map = sweep._fwd_ckpt_call(
        planes_all, jnp.asarray(zs, jnp.float32)[None, :], acc0, params,
        coef_flat, lut,
    )
    bits = np.asarray(live_map).astype(np.int64)  # (n_strips, n_chunks)
    n_xt = width // _xtile(width)
    pops = ((bits[..., None] >> np.arange(n_xt)) & 1).sum(axis=-1)
    return {
        "tile_live_frac": float(pops.mean() / n_xt),
        "strip_live_frac": float((bits != 0).mean()),
        "n_xt": n_xt,
    }
