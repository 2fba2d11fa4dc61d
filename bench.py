#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (round 5+): Mrays/s/chip forward+backward at the BASELINE.json
config-5 semantics — a 512^3 x 16-bin DISTRIBUTION volume (bf16 bins-major
histograms, 4.3 GB), 1024^2 image, gradients w.r.t. the histograms and the
transfer-function LUT. The scalar-volume number the r1-r4 headline tracked
stays on record as ``scalar512_fwdbwd_mrays``.

``vs_baseline`` compares our *forward* 512^2 throughput (MTexels/s, the
reference's own benchmark metric, volumeRender.cpp:1066-1067) against the
reference's published 60 fps at 512^2 => 15.73 MTexels/s on a Quadro K5000.

Timings amortize iterations inside one jit to exclude host-relay latency
(the tunneled chip's dispatch+readback RTT is ~25 ms, so a 2-iteration
amortization inflates every key by ~12 ms — headline keys amortize >= 10
iterations, the reference's own discipline, volumeRender.cpp:1049-1063);
completion is forced by a scalar readback.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.march.slice import slice_render_image
from vrdd_tpu.pallas.slice_kernel import pallas_slice_render, pallas_supported
from vrdd_tpu.pallas.slice_vjp import (
    pallas_diff_supported,
    pallas_hist_render_diff,
    pallas_slice_render_diff,
)

REFERENCE_MTEXELS_PER_S = 60.0 * 512 * 512 / 1e6  # 15.73, presentation.pdf

# Nominal single-chip peaks for the roofline denominators (TPU v5e / "v5
# lite": 197 TFLOP/s bf16 matmul, ~819 GB/s HBM, VPU = 8x128 lanes x FMA x
# ~1.74 GHz ~= 3.6 Top/s f32). Published/derived figures; used only to
# report "fraction of speed-of-light", never for correctness.
#
# MEASURED on this hardware (see VERDICT item 7 experiments): Mosaic's
# default "f32" matmul multiplies in bf16 with f32 accumulation — casting
# the resample operands to bf16 explicitly is bitwise a no-op and exactly
# as fast — so the MXU denominator is the bf16 peak, and `precision='bf16'`
# only matters off-hardware (interpret mode rounds f32 matmuls for real).
PEAK_MXU_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0
PEAK_VPU_TOPS = 3.6


def roofline(n, W, n_planes, n_lut, dt_fwd, dt_fb, pchunk_bwd=4,
             live=None):
    """Analytic per-plane bytes / MXU flops / VPU ops for the fused sweep —
    upper bounds against measured times. H = W = image edge; NY = NX = n;
    S = H*W samples per plane.

    ``live``: measured culling effectivity from
    vrdd_tpu.pallas.slice_vjp.live_fractions (tile_live_frac /
    strip_live_frac of the checkpointing forward's own live bitmap — the
    bits that gate every tile body in BOTH passes). When given, the
    PRIMARY ``roofline_*_sol_frac`` keys use the EFFECTIVE-work bound:
    per-sample VPU work and the x-resample matmul scale by tile liveness,
    the per-strip y-resample by strip liveness, HBM unscaled (plane blocks
    stream even for frozen chunks). The no-culling bound stays on record
    as ``roofline_*_sol_frac_nocull`` — by construction >= the effective
    fraction, and >1.0 exactly when culling beats the no-culling model
    (the round-4 1.07/1.50 readings, explained: tile liveness was ~0.5).

    FORWARD, per plane (slice_kernel.py kernel body):
      HBM : plane stream in, NY*NX*4 B (accumulator + x-weight cache are
            VMEM-resident and flushed once).
      MXU : y-resample (H, NY) @ (NY, NX) + x-resample (H, NX) @ (NX, W)
            = 2*H*NY*NX + 2*H*W*NX flops.
      VPU : per sample, alpha-only relu TF + factorized R_l accumulation
            = 4 ops/interior knot + ~8 setup, compositing/masks ~16,
            tent-weight builds amortize to ~10 -> ~4*(n_lut-2) + 34 ops.

    BACKWARD, per plane (slice_vjp.py; pchunk_bwd chunking): the replay
    re-runs both resamples and the reverse adds the two transposes
    (d_res @ Wx, Wy^T @ d_tmp) -> 2x forward MXU flops; HBM re-reads the
    plane, writes the plane cotangent, and streams the chunk-start T
    checkpoints (H*W*4/pchunk in fwd, read back in bwd); VPU = alpha-only
    replay TF (3/knot) + g-contracted gc3 (2/knot) + tent LUT-grad
    (6/knot) + dq slope (4/knot) + ~45 fixed -> ~15*(n_lut-2) + 45.

    Measured anchors at 512^3 -> 1024^2 (n_lut sweep, 2026-08): each TF
    knot costs ~0.6 ms in the forward and ~2.4 ms across the whole fwd+bwd
    — i.e. the per-knot VPU blocks run at ~2.8 Top/s, ~80% of the nominal
    VPU peak: the kernel is VPU-bound at speed-of-light within ~20%, and
    the MXU/HBM terms are minor (see fractions below). Culling (footprint,
    tile ET, ESS) only REDUCES real work, so achieved fractions are lower
    bounds on kernel efficiency.
    """
    H = W
    NY = NX = n
    S = H * W
    fwd_mxu_y = n_planes * 2 * H * NY * NX   # per-strip y-resample
    fwd_mxu_x = n_planes * 2 * H * W * NX    # per-tile x-resample
    fwd_mxu = fwd_mxu_y + fwd_mxu_x
    fwd_hbm = n_planes * NY * NX * 4 + 2 * H * W * 4 * 4
    fwd_vpu = n_planes * S * (4 * (n_lut - 2) + 34)
    bwd_mxu_y, bwd_mxu_x = 2 * fwd_mxu_y, 2 * fwd_mxu_x
    bwd_hbm = (
        n_planes * 2 * NY * NX * 4
        + 2 * (n_planes // pchunk_bwd) * H * W * 4
    )
    bwd_vpu = n_planes * S * (15 * (n_lut - 2) + 45)
    fb_mxu_y, fb_mxu_x, fb_hbm, fb_vpu = (
        fwd_mxu_y + bwd_mxu_y, fwd_mxu_x + bwd_mxu_x, fwd_hbm + bwd_hbm,
        fwd_vpu + bwd_vpu,
    )
    tile_f = live["tile_live_frac"] if live else 1.0
    strip_f = live["strip_live_frac"] if live else 1.0

    def bounds(mxu_y, mxu_x, hbm, vpu, dt):
        t_mxu = (mxu_y + mxu_x) / (PEAK_MXU_TFLOPS * 1e12)
        t_hbm = hbm / (PEAK_HBM_GBPS * 1e9)
        t_vpu = vpu / (PEAK_VPU_TOPS * 1e12)
        nocull = (t_mxu + t_hbm + t_vpu) / dt
        t_mxu_eff = (mxu_y * strip_f + mxu_x * tile_f) / (
            PEAK_MXU_TFLOPS * 1e12
        )
        eff = (t_mxu_eff + t_hbm + t_vpu * tile_f) / dt
        return t_mxu, t_hbm, t_vpu, nocull, eff

    fm, fh, fv, ffrac_nc, ffrac = bounds(
        fwd_mxu_y, fwd_mxu_x, fwd_hbm, fwd_vpu, dt_fwd
    )
    bm, bh, bv, bfrac_nc, bfrac = bounds(
        fb_mxu_y, fb_mxu_x, fb_hbm, fb_vpu, dt_fb
    )
    out = {
        "roofline_fwd_mxu_gflop": fwd_mxu / 1e9,
        "roofline_fwd_hbm_gb": fwd_hbm / 1e9,
        "roofline_fwd_vpu_gop": fwd_vpu / 1e9,
        "roofline_fwdbwd_mxu_gflop": (fb_mxu_y + fb_mxu_x) / 1e9,
        "roofline_fwdbwd_hbm_gb": fb_hbm / 1e9,
        "roofline_fwdbwd_vpu_gop": fb_vpu / 1e9,
        "roofline_fwd_sol_frac": ffrac,
        "roofline_fwdbwd_sol_frac": bfrac,
        "roofline_fwd_sol_frac_nocull": ffrac_nc,
        "roofline_fwdbwd_sol_frac_nocull": bfrac_nc,
    }
    if live:
        out["roofline_tile_live_frac"] = tile_f
        out["roofline_strip_live_frac"] = strip_f
    print(
        f"roofline (MXU {PEAK_MXU_TFLOPS:.0f} TFLOP/s bf16-rate [measured: "
        f"default f32 matmul IS bf16-multiply], "
        f"HBM {PEAK_HBM_GBPS:.0f} GB/s, VPU ~{PEAK_VPU_TOPS:.1f} Top/s; "
        f"measured liveness: tile {tile_f:.3f}, strip {strip_f:.3f}):\n"
        f"  fwd    : MXU {fwd_mxu / 1e9:6.0f} GF ({fm * 1e3:4.1f} ms) + "
        f"HBM {fwd_hbm / 1e9:5.2f} GB ({fh * 1e3:4.1f} ms) + "
        f"VPU {fwd_vpu / 1e9:6.0f} Gop ({fv * 1e3:5.1f} ms) -> measured "
        f"{dt_fwd * 1e3:5.1f} ms = {100 * ffrac:.0f}% of effective-work "
        f"SoL ({100 * ffrac_nc:.0f}% of no-culling)\n"
        f"  fwd+bwd: MXU {(fb_mxu_y + fb_mxu_x) / 1e9:6.0f} GF "
        f"({bm * 1e3:4.1f} ms) + "
        f"HBM {fb_hbm / 1e9:5.2f} GB ({bh * 1e3:4.1f} ms) + "
        f"VPU {fb_vpu / 1e9:6.0f} Gop ({bv * 1e3:5.1f} ms) -> measured "
        f"{dt_fb * 1e3:5.1f} ms = {100 * bfrac:.0f}% of effective-work "
        f"SoL ({100 * bfrac_nc:.0f}% of no-culling)",
        file=sys.stderr,
    )
    return out


def blob_volume(n: int, seed: int = 0) -> np.ndarray:
    """Memory-light float32 sum-of-gaussians volume (n, n, n)."""
    rng = np.random.default_rng(seed)
    z = np.linspace(0, 1, n, dtype=np.float32)
    vol = np.zeros((n, n, n), dtype=np.float32)
    for _ in range(3):
        c = rng.uniform(0.3, 0.7, size=3).astype(np.float32)
        s = np.float32(rng.uniform(0.1, 0.25))
        gz = np.exp(-((z - c[0]) ** 2) / (2 * s * s))
        gy = np.exp(-((z - c[1]) ** 2) / (2 * s * s))
        gx = np.exp(-((z - c[2]) ** 2) / (2 * s * s))
        vol += gz[:, None, None] * gy[None, :, None] * gx[None, None, :]
    vol /= vol.max()
    return vol


def hist_supported(n: int, W: int, tf) -> bool:
    from vrdd_tpu.pallas.slice_kernel import hist_render_supported

    return hist_render_supported((n, 16, n, n), W, W, n_lut=int(tf.shape[0]))


def hist512_volume(n: int, B: int = 16) -> jnp.ndarray:
    """The headline DISTRIBUTION fixture: a bf16 bins-major (n, B, n, n)
    histogram volume — per-voxel softmax histograms around a separable-blob
    mean (structured like the raw-histogram data of
    volumeRender_kernel.cu:722-742, generated on device: the host array
    would be 4.3 GB over the tunneled link). Shared by the headline and
    big sections."""

    @jax.jit
    def gen():
        z = jnp.linspace(0, 1, n, dtype=jnp.float32)
        base = (jnp.exp(-((z - 0.45) ** 2) / 0.05)[:, None, None]
                * jnp.exp(-((z - 0.55) ** 2) / 0.08)[None, :, None]
                * jnp.exp(-((z - 0.5) ** 2) / 0.06)[None, None, :])
        centers = ((jnp.arange(B) + 0.5) / B)[None, :, None, None]
        logits = -((centers - base[:, None]) ** 2) / 0.02
        return jax.nn.softmax(logits, axis=1).astype(jnp.bfloat16)

    return gen()


def time_amortized(fn, *args, iters: int = 1, repeats: int = 1) -> float:
    """Seconds per call; fn must return a scalar (readback forces sync).

    ``repeats``: take the MIN over that many timed calls (after the one
    warmup) — the headline keys use 2 so a transient chip/link stall
    (observed: one ~20x episode mid-session) cannot sink the round's
    one-shot record; every repeat is the same full amortized call."""
    float(fn(*args))  # warmup + compile
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        s = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters, s


def emit(out: dict) -> None:
    """Print the CURRENT merged result as one JSON line, immediately.

    The driver parses the LAST JSON line on stdout, so every section ends
    with a re-emission of the (grown) dict: a timeout mid-run still leaves
    the best-so-far record on stdout. This mirrors the reference's contract
    of always printing its throughput (volumeRender.cpp:1049-1067) — the
    round-2 all-or-nothing bench lost its number to a driver timeout."""
    print(json.dumps(out), flush=True)


def main() -> None:
    try:
        from vrdd_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512, help="volume edge")
    p.add_argument("--image", type=int, default=1024, help="image edge")
    p.add_argument("--iters", type=int, default=4, help="amortized inner iterations")
    p.add_argument(
        "--sections",
        default=os.environ.get(
            "VRDD_BENCH_SECTIONS", "headline,decode,dist,view,big,rot,scaling"
        ),
        help="comma list of sections to run, in order: headline (forward "
        "MTexels/s, distribution fwd+bwd — the metric — and the scalar "
        "fwd+bwd), decode (Gaussian + hist16 differentiable decode), dist "
        "(distributed overhead + culling-aware roofline), view "
        "(interactive-viewer fps at the reference's 512^2 Isabel config, "
        "median of 5 runs), big (1024^3 fwd + fwd+bwd and the nonlinear "
        "in-kernel stats), rot (rotated distribution-native views), "
        "extras (--full only by default: ESS windowed-TF win + distributed "
        "Gaussian decode), scaling (pod linear-scaling efficiency over "
        "all attached devices, forward AND training step; reports n/a "
        "on one chip). A JSON line is (re-)emitted after every "
        "measurement; last line wins; per-section wall time lands as "
        "sec_<name>_s keys.",
    )
    p.add_argument("--full", action="store_true",
                   help="also run the extras section (ESS-windowed-TF and "
                        "distributed-Gaussian variants: extra compiles)")
    args = p.parse_args()
    sections = [s.strip() for s in args.sections.split(",") if s.strip()]

    n, W, K = args.size, args.image, args.iters
    dev = jax.devices()[0]
    t_start = time.perf_counter()

    def note(msg):
        print(f"[{time.perf_counter() - t_start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    note(f"device: {dev}; sections: {','.join(sections)}")

    vol = jnp.asarray(blob_volume(n))
    tf = jnp.asarray(default_transfer_function())
    origin = jnp.asarray([0.0, 0.0, 4.0], dtype=jnp.float32)
    use_pallas_diff = (
        jax.default_backend() == "tpu"
        and pallas_diff_supported((n, n, n), W, W, n)
    )

    out = {
        "metric": (
            f"Mrays/s/chip fwd+bwd {n}^3x16-bin distribution vol {W}^2 img "
            "(in-march decode, slice-sweep)"
        ),
        "value": None,
        "unit": "Mrays/s",
        "vs_baseline": None,
        "reference_mtexels_per_s": REFERENCE_MTEXELS_PER_S,
    }
    dt_fb = None

    class sec:
        """Per-section wall-clock (compiles included) -> sec_<name>_s key,
        so regressions in bench COST are visible in the record itself
        (round-2's bench lost its number to a driver timeout; the round-3
        fix was incremental emission, this makes the budget observable)."""

        def __init__(self, name):
            self.name = name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            out[f"sec_{self.name}_s"] = round(
                time.perf_counter() - self.t0, 1
            )
            emit(out)

    if "headline" in sections:
      with sec("headline"):
          # --- forward, the reference's own benchmark geometry: 512^2 image
          # over an Isabel-shaped (50x50x10) decoded stats volume, 200 sampling
          # planes (~ the reference's effective step count under early
          # termination). Runs FIRST: smallest compile, lands vs_baseline. ---
          W0 = 512
          rng = np.random.default_rng(0)
          isabel = jnp.asarray(rng.random((10, 50, 50), dtype=np.float32))
          use_pallas = pallas_supported((10, 50, 50), W0, W0, 200)

          @jax.jit
          def fwd_isabel(v, tf, o):
              def it(i, acc):
                  # loop-carry via DENSITY (a traced scalar): perturbing the
                  # volume materializes a copy the Pallas input cannot fuse
                  # (the reference's runSingleTest re-renders the SAME
                  # volume, volumeRender.cpp:1049-1063)
                  de = 0.05 * (1.0 + 1e-6 * i)
                  if use_pallas:
                      # plane_chunk=20 measured fastest for the tiny 50x50
                      # plane (8 -> 111.9, 20 -> 123.8, 40 -> 99.0 MTexels/s:
                      # fewer grid steps amortize per-step overhead until the
                      # x-weight cache pressures VMEM)
                      img = pallas_slice_render(
                          v, o, tf, density=de, width=W0, height=W0,
                          n_planes=200, plane_chunk=20,
                      )
                  else:
                      img = slice_render_image(v, o, W0, W0, tf, density=de,
                                               n_planes=200)
                  return acc + jnp.sum(img)

              return jax.lax.fori_loop(0, 4 * K, it, 0.0)

          dt_fwd, _ = time_amortized(fwd_isabel, isabel, tf, origin, iters=4 * K)
          fwd_mtexels = W0 * W0 / dt_fwd / 1e6
          note(f"forward 512^2 Isabel-shaped (50x50x10): {dt_fwd * 1e3:.2f} ms "
               f"-> {fwd_mtexels:.1f} MTexels/s")
          out["vs_baseline"] = round(fwd_mtexels / REFERENCE_MTEXELS_PER_S, 3)
          out["forward_512_mtexels_per_s"] = round(fwd_mtexels, 2)
          if out["value"] is None:
              # provisional headline until the fwd+bwd lands (a timed-out run
              # then still reports the reference's own metric)
              out.update(
                  metric="MTexels/s forward 512^2 Isabel (fwd+bwd pending)",
                  value=round(fwd_mtexels, 2), unit="MTexels/s",
              )
          emit(out)

          # --- THE HEADLINE: fwd+bwd at the BASELINE.json config-5 shape —
          # a 512^3 x 16-bin bf16 DISTRIBUTION volume (4.3 GB of per-voxel
          # histograms; the reference's whole premise, README.md:4-6,
          # volumeRender_kernel.cu:722-872) rendered to 1024^2 with
          # gradients to the histograms and the TF LUT. Both routes of
          # pallas_hist_render_diff are timed (in-kernel streamed decode vs
          # materialized decode + scalar VJP) and the faster one is the
          # recorded value, named by hist512_fwdbwd_route. KH >= 20
          # amortized iterations (the reference's own discipline is 10 on
          # LOCAL hardware, volumeRender.cpp:1049; the tunneled chip's
          # ~25 ms dispatch RTT still leaks RTT/KH into the record, so
          # more amortization = closer to the on-chip number a locally
          # attached TPU would report; the count is recorded). ---
          KH = max(20, K)
          if jax.default_backend() == "tpu" and hist_supported(n, W, tf):
              hist = jax.block_until_ready(hist512_volume(n))
              dwh = jnp.asarray((np.arange(16) + 0.5) / 16, jnp.float32)
              route_mrays = {}
              for route in ("materialized", "inkernel"):
                  @jax.jit
                  def hfb(h, lut, o, route=route):
                      def loss(h, lut, i):
                          img = pallas_hist_render_diff(
                              h, dwh, o, lut,
                              density=0.05 * (1.0 + 1e-6 * i),
                              width=W, height=W, wrt=("hist", "lut"),
                              route=route,
                          )
                          return jnp.mean((img - 0.25) ** 2)

                      def it(i, acc):
                          l, (gh, gt) = jax.value_and_grad(
                              loss, argnums=(0, 1))(h, lut, i)
                          return acc + l + jnp.sum(gt) + gh[
                              0, 0, 0, 0].astype(jnp.float32)
                      return jax.lax.fori_loop(0, KH, it, 0.0)

                  dt, _ = time_amortized(hfb, hist, tf, origin, iters=KH,
                                         repeats=2)
                  route_mrays[route] = W * W / dt / 1e6
                  note(f"fwd+bwd DISTRIBUTION {n}^3x16 -> {W}^2 "
                       f"[{route}]: {dt * 1e3:.2f} ms -> "
                       f"{route_mrays[route]:.2f} Mrays/s")
                  out[f"hist512_fwdbwd_{route}_mrays"] = round(
                      route_mrays[route], 2)
              best = max(route_mrays, key=route_mrays.get)
              out.update(
                  metric=(
                      f"Mrays/s/chip fwd+bwd {n}^3x16-bin distribution vol "
                      f"{W}^2 img (in-march decode, slice-sweep)"
                  ),
                  value=round(route_mrays[best], 2), unit="Mrays/s",
              )
              out["hist512_fwdbwd_route"] = best
              out["hist512_fwdbwd_iters"] = KH
              del hist
              emit(out)

          # --- forward+backward on the SCALAR 512^3 volume (the r1-r4
          # headline, kept as the secondary datapoint): fused Pallas
          # analytic VJP when supported, else the XLA analytic VJP ---
          @jax.jit
          def fwdbwd_many(v, tf, o):
              def loss(v, tf, i):
                  de = 0.05 * (1.0 + 1e-6 * i)  # scalar loop-carry (no copy)
                  if use_pallas_diff:
                      # wrt mirrors value_and_grad(argnums=(0, 1)): volume +
                      # LUT cotangents only (XLA autodiff would prune the rest)
                      img = pallas_slice_render_diff(
                          v, o, tf, density=de, width=W, height=W,
                          n_planes=n, wrt=("volume", "lut"),
                      )
                  else:
                      img = slice_render_image(
                          v, o, W, W, tf, density=de, n_planes=n,
                          plane_chunk=1,
                      )
                  return jnp.mean((img - 0.25) ** 2)

              def it(i, acc):
                  l, (gv, gt) = jax.value_and_grad(loss, argnums=(0, 1))(v, tf, i)
                  return acc + l + jnp.sum(gt) + gv[0, 0, 0]

              return jax.lax.fori_loop(0, KH, it, 0.0)

          dt_fb, _ = time_amortized(fwdbwd_many, vol, tf, origin, iters=KH,
                                    repeats=2)
          fb_mrays = W * W / dt_fb / 1e6
          note(f"fwd+bwd SCALAR {W}^2 over {n}^3: {dt_fb * 1e3:.2f} ms -> "
               f"{fb_mrays:.1f} Mrays/s")
          out["scalar512_fwdbwd_mrays"] = round(fb_mrays, 2)
          if out.get("hist512_fwdbwd_route") is None:
              # no distribution config on this backend: the scalar number
              # remains the headline (CPU runs, tiny configs)
              out.update(
                  metric=(f"Mrays/s/chip fwd+bwd {n}^3 vol {W}^2 img "
                          "(slice-sweep)"),
                  value=round(fb_mrays, 2), unit="Mrays/s",
              )
          emit(out)

    if "decode" in sections:
      with sec("decode"):
          # --- distribution decode INSIDE the timed fwd+bwd graph (BASELINE
          # configs 3/4; the reference decodes during marching only for query
          # 7, volumeRender_kernel.cu:722-872 precomputes the rest — here the
          # decode is differentiable and fused into the render step) ---
          nd, Wd = min(n, 256), min(W, 512)
          gauss_mrays = decode_config_gaussian(nd, Wd, K, tf, origin)
          note(f"fwd+bwd Gaussian-decode {Wd}^2 over {nd}^3: "
               f"{gauss_mrays:.1f} Mrays/s")
          out["gaussian_decode_fwdbwd_mrays"] = round(gauss_mrays, 2)
          emit(out)
          hist_mrays = decode_config_hist16(nd, Wd, K, tf, origin)
          note(f"fwd+bwd 16-bin-histogram-decode {Wd}^2 over {nd}^3: "
               f"{hist_mrays:.1f} Mrays/s")
          out["hist16_decode_fwdbwd_mrays"] = round(hist_mrays, 2)
          emit(out)
          hist_stream = decode_config_hist16_streamed(nd, Wd, K, tf, origin)
          note(f"fwd+bwd CHUNK-STREAMED 16-bin-histogram-decode {Wd}^2 over "
               f"{nd}^3: {hist_stream:.1f} Mrays/s")
          out["hist16_chunked_stream_fwdbwd_mrays"] = round(hist_stream, 2)
          emit(out)
          ik = decode_config_hist16_inkernel(nd, Wd, K, tf, origin)
          if ik is not None:
              note(f"fwd+bwd IN-KERNEL 16-bin-histogram-decode {Wd}^2 over "
                   f"{nd}^3: f32 {ik['f32']:.1f} / bf16 {ik['bf16']:.1f} "
                   f"Mrays/s (streamed decode never materializes: fwd temp "
                   f"{ik['fwd_temp_mb']:.0f} MB vs materialized "
                   f"{ik['mat_fwd_temp_mb']:.0f} MB)")
              out["hist16_streamed_fwdbwd_mrays"] = round(ik["bf16"], 2)
              # the key has always meant "streamed-decode fwd+bwd"; its
              # implementation changed round 4 (chunked XLA -> in-kernel
              # bf16) — recorded explicitly so cross-round comparisons
              # attribute the jump to the implementation, not the config
              out["hist16_streamed_impl"] = "in-kernel-bf16 (r3: chunked-xla)"
              out["hist16_streamed_f32_fwdbwd_mrays"] = round(ik["f32"], 2)
              # the exactness-vs-speed tradeoff on record (VERDICT r4 #7):
              # f32 histogram storage makes the in-kernel decode bitwise
              # exact but streams 2x the bytes; the bf16 default carries
              # ~1e-3 decode rounding — the SAME rounding the materialized
              # route's default-precision decode matmul applies
              out["hist16_streamed_f32_note"] = (
                  "f32 = bitwise-exact decode at 2x stream bytes; bf16 "
                  "default trades ~1e-3 decode rounding (== materialized "
                  "route's matmul precision) for throughput"
              )
              out["hist16_streamed_fwd_temp_mb"] = round(
                  ik["fwd_temp_mb"], 1)
              out["hist16_materialized_fwd_temp_mb"] = round(
                  ik["mat_fwd_temp_mb"], 1)
              emit(out)

    if "dist" in sections:
      with sec("dist"):
          # --- distributed-vs-unsharded per-chip overhead (the scaling proxy
          # measurable on one chip: real multi-chip efficiency = 1 /
          # (overhead_ratio + true comm time, which a 1-device mesh
          # undercounts)) ---
          dist = dist_overhead(n, W, K, vol, tf, origin, use_pallas_diff)
          if dist is not None:
              note(
                  f"distributed (1-chip mesh) fwd {dist['dist_fwd_ms']:.2f} ms "
                  f"vs unsharded {dist['unsharded_fwd_ms']:.2f} ms (ESS "
                  f"{dist['unsharded_fwd_ess_ms']:.2f} ms) -> overhead "
                  f"ratio {dist['dist_overhead_ratio']:.3f}; dist fwd+bwd "
                  f"{dist['dist_fwdbwd_ms']:.2f} ms")
              out.update({k: round(v, 3) for k, v in dist.items()})
              emit(out)
              if dt_fb is not None:
                  # the roofline's forward is the unsharded (W, W) fused
                  # kernel the distributed section already timed. The
                  # MEASURED tile/strip liveness of the checkpointing
                  # forward (the same bitmap that gates both passes)
                  # converts the no-culling model into an effective-work
                  # bound (roofline v2, VERDICT r4 weak #1): the primary
                  # sol_frac keys are <= 1 by construction up to model
                  # error, the no-culling fractions stay as *_nocull
                  from vrdd_tpu.pallas.slice_vjp import live_fractions

                  live = live_fractions(
                      vol, origin, tf, width=W, height=W, n_planes=n,
                  )
                  note(f"measured liveness: tile "
                       f"{live['tile_live_frac']:.3f}, strip "
                       f"{live['strip_live_frac']:.3f}")
                  roof = roofline(
                      n, W, n, int(tf.shape[0]),
                      dist["unsharded_fwd_ms"] / 1e3, dt_fb, live=live,
                  )
                  roof["roofline_fwd_sol_frac_ess"] = (
                      roof["roofline_fwd_sol_frac"]
                      * dist["unsharded_fwd_ms"]
                      / dist["unsharded_fwd_ess_ms"]
                  )
                  out.update({k: round(v, 4) for k, v in roof.items()})
                  emit(out)

    if "view" in sections:
      with sec("view"):
          # MEDIAN of 5 runs with the band recorded: the tunneled link's
          # weather swings single-run fps by +-40% (r4: one draw landed at
          # 45.3 from a 27-75 band); the median reflects the pipeline, the
          # band shows the link (VERDICT r4 weak #4)
          unrots, rots = viewer_fps_config(K, runs=5)
          fps_unrot, fps_rot = float(np.median(unrots)), float(np.median(rots))
          note(f"viewer 512^2 Isabel config: median {fps_unrot:.1f} fps "
               f"unrotated (band {min(unrots):.1f}-{max(unrots):.1f}), "
               f"median {fps_rot:.1f} fps under rotation drag (band "
               f"{min(rots):.1f}-{max(rots):.1f}); reference: 60 fps")
          out["viewer_fps_512"] = round(fps_unrot, 1)
          out["viewer_fps_rotated_512"] = round(fps_rot, 1)
          out["viewer_fps_512_band"] = [
              round(min(unrots), 1), round(max(unrots), 1)]
          out["viewer_fps_rotated_512_band"] = [
              round(min(rots), 1), round(max(rots), 1)]
          emit(out)

    if "big" in sections and jax.default_backend() == "tpu":
      with sec("big"):
          big = bench_big(tf, note)
          out.update(big)
          emit(out)

    if "rot" in sections and jax.default_backend() == "tpu":
      with sec("rot"):
          out.update(bench_rot(tf, note))
          emit(out)

    if "scaling" in sections:
      with sec("scaling"):
          from vrdd_tpu.parallel.scaling import measure_scaling

          sc = measure_scaling(iters=K)
          note(f"scaling: {sc}")
          out.update({k: v for k, v in sc.items()})
          emit(out)

    if args.full or "extras" in sections:
      with sec("extras"):
          out.update(bench_variants(n, W, K, vol, tf, origin, use_pallas_diff))
          emit(out)
    if out["value"] is None:
        emit(out)  # no sections ran: still print the (empty) record


def blob_volume_device(n: int, seed: int = 0) -> jnp.ndarray:
    """blob_volume generated ON DEVICE (host params only): at 1024^3 the
    host array would be 4 GB uploaded over the tunneled link (~minutes);
    three separable gaussians are microseconds of device broadcasting."""
    rng = np.random.default_rng(seed)
    cs = [rng.uniform(0.3, 0.7, size=3).astype(np.float32) for _ in range(3)]
    ss = [np.float32(rng.uniform(0.1, 0.25)) for _ in range(3)]

    @jax.jit
    def gen():
        z = jnp.linspace(0, 1, n, dtype=jnp.float32)
        vol = jnp.zeros((n, n, n), jnp.float32)
        for c, s in zip(cs, ss):
            gz = jnp.exp(-((z - c[0]) ** 2) / (2 * s * s))
            gy = jnp.exp(-((z - c[1]) ** 2) / (2 * s * s))
            gx = jnp.exp(-((z - c[2]) ** 2) / (2 * s * s))
            vol = vol + (
                gz[:, None, None] * gy[None, :, None] * gx[None, None, :]
            )
        return vol / vol.max()

    return gen()


def bench_big(tf, note, n: int = 1024, W: int = 1024):
    """The above-512^3 datapoints: 1024^3 -> 1024^2 forward and
    forward+backward, both on the DIRECT fused Pallas VJP. Round 4's
    pure-selection streaming removed every flip copy from both passes, so
    the 4 GB volume + 4 GB cotangent + ~1 GB transmittance checkpoints fit
    a 16 GB chip and the streamed chunk-chain route (3.1 Mrays/s in
    BENCH_r04 — r5's `fwdbwd_1024_route` key records the change) is now
    only the beyond-HBM fallback (march/streaming.py scope note). Grads
    reach the volume and the TF LUT."""
    out = {}
    vol = jax.block_until_ready(blob_volume_device(n))
    origin = jnp.asarray([0.0, 0.0, 4.0], dtype=jnp.float32)

    @jax.jit
    def fwd(v, lut, o):
        def it(i, acc):
            img = pallas_slice_render(
                v, o, lut, density=0.05 * (1.0 + 1e-6 * i), width=W,
                height=W, n_planes=n
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, 4, it, 0.0)

    dt_f, _ = time_amortized(fwd, vol, tf, origin, iters=4)
    out["fwd_1024_ms"] = round(dt_f * 1e3, 2)
    out["fwd_1024_mrays"] = round(W * W / dt_f / 1e6, 2)
    note(f"forward 1024^2 over 1024^3: {dt_f * 1e3:.1f} ms -> "
         f"{out['fwd_1024_mrays']:.1f} Mrays/s "
         f"({W * W * n / dt_f / 1e9:.1f} Gsamples/s)")

    @jax.jit
    def fwdbwd(v, lut, o):
        def loss(v, lut, i):
            img = pallas_slice_render_diff(
                v, o, lut, density=0.05 * (1.0 + 1e-6 * i), width=W,
                height=W, n_planes=n, wrt=("volume", "lut"),
            )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gv, gt) = jax.value_and_grad(loss, argnums=(0, 1))(v, lut, i)
            return acc + l + jnp.sum(gt) + gv[0, 0, 0]
        return jax.lax.fori_loop(0, 4, it, 0.0)

    dt_fb, _ = time_amortized(fwdbwd, vol, tf, origin, iters=4)
    out["fwdbwd_1024_ms"] = round(dt_fb * 1e3, 2)
    out["fwdbwd_1024_mrays"] = round(W * W / dt_fb / 1e6, 2)
    out["fwdbwd_1024_route"] = "direct-pallas (r4: streamed-chunk-chain)"
    note(f"fwd+bwd (direct) 1024^2 over 1024^3: {dt_fb * 1e3:.1f} ms -> "
         f"{out['fwdbwd_1024_mrays']:.1f} Mrays/s")
    del vol
    out.update(bench_big_hist(tf, note))
    return out


def bench_big_hist(tf, note, n: int = 512, W: int = 1024, B: int = 16):
    """Distribution-NATIVE rendering at the headline scale: the 512^3 x
    16-bin bf16 histogram volume (4.3 GB — 16x the scalar headline
    volume's data) through the in-kernel decode; the decoded scalar volume
    never exists in HBM on these keys (the fwd+bwd headline itself now
    lives in the headline section and picks the faster route).
    Nonlinear stats: variance = 4-contraction combine, entropy = per-bin
    log2 sum, both in the same VMEM prologue (reference queries 2/3,
    volumeRender_kernel.cu:749-769)."""
    from vrdd_tpu.pallas.slice_kernel import (
        decode_weight_rows, hist_render_supported, pallas_hist_render,
    )

    if not hist_render_supported((n, B, n, n), W, W, n_lut=int(tf.shape[0])):
        return {}

    KB = 8
    hist = jax.block_until_ready(hist512_volume(n, B))
    dw = jnp.asarray((np.arange(B) + 0.5) / B, jnp.float32)
    origin = jnp.asarray([0.0, 0.0, 4.0], jnp.float32)
    out = {}

    @jax.jit
    def fwd(h, lut, o):
        def it(i, acc):
            img = pallas_hist_render(
                h, dw, o, lut, density=0.05 * (1.0 + 1e-6 * i),
                width=W, height=W,
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, KB, it, 0.0)

    dt, _ = time_amortized(fwd, hist, tf, origin, iters=KB)
    out["hist512_inkernel_fwd_ms"] = round(dt * 1e3, 2)
    out["hist512_inkernel_fwd_mrays"] = round(W * W / dt / 1e6, 2)
    note(f"512^3x16 bf16 distribution-native fwd 1024^2: {dt*1e3:.1f} ms "
         f"-> {out['hist512_inkernel_fwd_mrays']:.1f} Mrays/s "
         f"({n * B * n * n * 2 / dt / 1e9:.0f} GB/s histogram stream)")

    # the reference's OWN bin count (32, volumeRender.cpp N_BINS) at the
    # headline volume: an 8.6 GB distribution volume rendered forward
    # straight through the in-kernel decode (training at this size needs
    # the pod: d_hist alone is another 8.6 GB)
    B32 = 32
    hist32 = jax.block_until_ready(hist512_volume(n, B32))
    dw32 = jnp.asarray((np.arange(B32) + 0.5) / B32, jnp.float32)

    @jax.jit
    def fwd32(h, lut, o):
        def it(i, acc):
            img = pallas_hist_render(
                h, dw32, o, lut, density=0.05 * (1.0 + 1e-6 * i),
                width=W, height=W,
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, KB, it, 0.0)

    dt, _ = time_amortized(fwd32, hist32, tf, origin, iters=KB)
    out["hist512_b32_fwd_ms"] = round(dt * 1e3, 2)
    out["hist512_b32_fwd_mrays"] = round(W * W / dt / 1e6, 2)
    note(f"512^3x32 bf16 (the reference's own bin count; 8.6 GB) fwd "
         f"1024^2: {dt*1e3:.1f} ms -> "
         f"{out['hist512_b32_fwd_mrays']:.1f} Mrays/s "
         f"({n * B32 * n * n * 2 / dt / 1e9:.0f} GB/s histogram stream)")
    del hist32

    for stat, tscl in (("var", 30.0), ("entropy", 1.0)):
        rows, mode = decode_weight_rows(stat, B, family="unit")
        rows = jnp.asarray(rows)

        @jax.jit
        def fwd_s(h, lut, o, rows=rows, mode=mode, tscl=tscl):
            def it(i, acc):
                img = pallas_hist_render(
                    h, rows, o, lut, density=0.05 * (1.0 + 1e-6 * i),
                    transfer_scale=tscl, width=W, height=W, stat=mode,
                )
                return acc + jnp.sum(img)
            return jax.lax.fori_loop(0, KB, it, 0.0)

        dt, _ = time_amortized(fwd_s, hist, tf, origin, iters=KB)
        out[f"hist512_inkernel_{stat}_fwd_ms"] = round(dt * 1e3, 2)
        out[f"hist512_inkernel_{stat}_fwd_mrays"] = round(W * W / dt / 1e6, 2)
        note(f"512^3x16 bf16 in-kernel {stat} fwd 1024^2: {dt*1e3:.1f} ms "
             f"-> {out[f'hist512_inkernel_{stat}_fwd_mrays']:.1f} Mrays/s")

        best = (None, None)
        for route in ("inkernel", "materialized"):
            @jax.jit
            def fwdbwd_s(h, lut, o, rows=rows, mode=mode, tscl=tscl,
                         route=route):
                def loss(h, lut, i):
                    img = pallas_hist_render_diff(
                        h, rows, o, lut, density=0.05 * (1.0 + 1e-6 * i),
                        transfer_scale=tscl, width=W, height=W,
                        wrt=("hist", "lut"), stat=mode, route=route,
                    )
                    return jnp.mean((img - 0.25) ** 2)

                def it(i, acc):
                    l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(
                        h, lut, i)
                    return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0].astype(
                        jnp.float32)
                return jax.lax.fori_loop(0, KB, it, 0.0)

            dt, _ = time_amortized(fwdbwd_s, hist, tf, origin, iters=KB)
            if route == "inkernel":
                out[f"hist512_inkernel_{stat}_fwdbwd_ms"] = round(
                    dt * 1e3, 2)
                out[f"hist512_inkernel_{stat}_fwdbwd_mrays"] = round(
                    W * W / dt / 1e6, 2)
            if best[0] is None or dt < best[0]:
                best = (dt, route)
            note(f"512^3x16 bf16 {stat} fwd+bwd [{route}] 1024^2: "
                 f"{dt*1e3:.1f} ms -> {W * W / dt / 1e6:.1f} Mrays/s")
        out[f"hist512_{stat}_fwdbwd_mrays"] = round(
            W * W / best[0] / 1e6, 2)
        out[f"hist512_{stat}_fwdbwd_route"] = best[1]

    # DISTRIBUTED distribution-native: histogram slabs on bricks, decode
    # in each brick's kernel, sort-last exact-ET compositing — the 1-chip
    # mesh records the full machinery's per-chip cost next to the
    # unsharded in-kernel numbers above
    from vrdd_tpu.parallel.mesh import make_mesh
    from vrdd_tpu.parallel.sweep import (
        distributed_hist_render, shard_hist_volume,
    )

    mesh = make_mesh(1, 1)
    hs = shard_hist_volume(hist, mesh)

    @jax.jit
    def dist_fwdbwd(h, lut, o):
        def loss(h, lut, i):
            img = distributed_hist_render(
                h, dw, o, lut, density=0.05 * (1.0 + 1e-6 * i),
                width=W, height=W, mesh=mesh, wrt=("hist", "lut"),
            )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(h, lut, i)
            return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, KB, it, 0.0)

    dt, _ = time_amortized(dist_fwdbwd, hs, tf, origin, iters=KB)
    out["hist512_dist_fwdbwd_ms"] = round(dt * 1e3, 2)
    out["hist512_dist_fwdbwd_mrays"] = round(W * W / dt / 1e6, 2)
    note(f"512^3x16 bf16 DISTRIBUTED in-kernel decode fwd+bwd 1024^2 "
         f"(1-chip mesh): {dt*1e3:.1f} ms -> "
         f"{out['hist512_dist_fwdbwd_mrays']:.1f} Mrays/s")
    return out


def bench_rot(tf, note, n: int = 512, W: int = 1024, B: int = 16):
    """ROTATED distribution-native under sharding (its own section — the
    two keys cost a 4.3 GB octant permute + compiles, VERDICT r4 weak #7):
    the bins-major volume's spatial axes permute with the view's principal
    axis, the slab shard follows, the decode stays in-kernel. The
    y-principal view pays the honest per-octant cost (a 4.3 GB axis
    transpose + re-shard — amortized across every view in the same octant
    in interactive use); the z-principal view shows the amortized-octant
    cost (identity permute)."""
    from vrdd_tpu.core.geometry import inv_view_from_rotation_translation
    from vrdd_tpu.pallas.slice_kernel import hist_render_supported
    from vrdd_tpu.parallel.mesh import make_mesh
    from vrdd_tpu.parallel.sweep import distributed_shearwarp_hist_render

    if not hist_render_supported((n, B, n, n), W, W, n_lut=int(tf.shape[0])):
        return {}
    hist = jax.block_until_ready(hist512_volume(n, B))
    dw = jnp.asarray((np.arange(B) + 0.5) / B, jnp.float32)
    mesh = make_mesh(1, 1)
    out = {}

    for tag, (rx, ry) in (("zrot", (20.0, 30.0)), ("yrot", (80.0, 10.0))):
        iv = np.asarray(
            inv_view_from_rotation_translation(rx, ry, (0.0, 0.0, -4.0)),
            dtype=np.float32,
        )

        def rot_fwd(h, lut, i, iv=iv):
            # oversample 1.0: the fused hist kernel keeps its whole
            # accumulator VMEM-resident (no row banding), so a 2x
            # oversampled m-grid at 1024^2 would outgrow the budget; the
            # 1x m-grid matches the output ray count (the scalar plain
            # forward bands instead — slice_kernel.py _max_band_rows)
            img = distributed_shearwarp_hist_render(
                h, dw, iv, W, W, lut, density=0.05 * (1.0 + 1e-6 * float(i)),
                mesh=mesh, oversample=1.0,
            )
            return jnp.sum(img)

        # the permute/re-shard amortizes through the octant cache
        # (parallel/sweep.py _OCTANT_CACHE); scalar readback per iteration
        # forces a real sync like time_amortized
        r = float(rot_fwd(hist, tf, 0))
        t0 = time.perf_counter()
        for i in range(1, 4):
            r = float(rot_fwd(hist, tf, i))
        dt = (time.perf_counter() - t0) / 3
        out[f"hist512_{tag}_fwd_ms"] = round(dt * 1e3, 2)
        note(f"512^3x16 bf16 ROTATED ({tag}) distribution-native fwd "
             f"{W}^2 (1-chip mesh, octant-cached permute): {dt*1e3:.1f} ms")
    return out


def bench_variants(n, W, K, vol, tf, origin, use_pallas_diff):
    """--full extras: ESS under a windowed TF (sparse volume, cached plane
    stats). TPU-only. (An explicit bf16-resample variant was benchmarked and
    retired: on this hardware Mosaic's default f32 matmul already multiplies
    in bf16 — the cast is bitwise and time-wise a no-op; see roofline().)"""
    if jax.default_backend() != "tpu" or not use_pallas_diff:
        return {}
    from vrdd_tpu.pallas.slice_kernel import precompute_ess_stats

    out = {}

    def fwd_fn(prec, ess=False, stats=None):
        @jax.jit
        def f(v, lut, o):
            def it(i, acc):
                img = pallas_slice_render(
                    v, o, lut, density=0.05 * (1.0 + 1e-6 * i), width=W,
                    height=W, n_planes=n, precision=prec,
                    empty_space_skip=ess, ess_stats=stats,
                )
                return acc + jnp.sum(img)
            return jax.lax.fori_loop(0, K, it, 0.0)
        return f

    # ESS: sparse volume + windowed TF (zero-alpha band); cached plane stats
    sparse = np.zeros((n, n, n), dtype=np.float32)
    q = n // 4
    sparse[q:2 * q, q:3 * q, q:3 * q] = np.asarray(
        blob_volume(n, seed=3)
    )[q:2 * q, q:3 * q, q:3 * q] + 0.6
    sparse = jnp.asarray(np.clip(sparse, 0.0, 1.0))
    lutw = np.zeros((9, 4), dtype=np.float32)
    lutw[:, 0] = np.linspace(0.0, 1.0, 9)
    lutw[6:, 3] = [0.3, 0.7, 1.0]  # alpha only above ~0.6
    lutw = jnp.asarray(lutw)
    stats = jax.block_until_ready(precompute_ess_stats(sparse, n_planes=n))

    dt_plain, _ = time_amortized(fwd_fn("f32"), sparse, lutw, origin, iters=K)
    dt_ess, _ = time_amortized(
        fwd_fn("f32", ess=True, stats=stats), sparse, lutw, origin, iters=K
    )
    out["ess_windowed_plain_ms"] = round(dt_plain * 1e3, 3)
    out["ess_windowed_cached_ms"] = round(dt_ess * 1e3, 3)
    print(
        f"ESS windowed-TF sparse {n}^3: plain {dt_plain * 1e3:.2f} ms vs "
        f"ESS(cached stats) {dt_ess * 1e3:.2f} ms "
        f"({dt_plain / dt_ess:.2f}x)", file=sys.stderr)

    # BASELINE config 5 with a DISTRIBUTION volume: per-voxel Gaussian
    # (mu, sigma) bricked on the mesh, decoded per shard inside the
    # differentiated graph, rendered by the distributed sweep (the 1-chip
    # mesh measures the full machinery's per-chip cost)
    from vrdd_tpu.ops.gaussian import gaussian_stats
    from vrdd_tpu.parallel.mesh import make_mesh
    from vrdd_tpu.parallel.sweep import (
        distributed_sweep_render,
        shard_scalar_volume,
    )

    mesh = make_mesh(1, 1)
    rng = np.random.default_rng(2)
    mu = shard_scalar_volume(vol, mesh)
    sigma = shard_scalar_volume(jnp.asarray(
        0.05 + 0.2 * rng.random((n, n, n), dtype=np.float32)), mesh)

    @jax.jit
    def dist_gauss_fb(mu, sigma, lut, o):
        def loss(mu, sigma, lut, i):
            v = gaussian_stats(mu * (1.0 + 1e-6 * i), sigma)[..., 0]
            img = distributed_sweep_render(
                v, o, lut, width=W, height=W, mesh=mesh, n_planes=n,
                backend="pallas", plane_chunk=4, wrt=("volume", "lut"),
            )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gm, gs, gt) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                mu, sigma, lut, i
            )
            return acc + l + jnp.sum(gt) + gm[0, 0, 0] + gs[0, 0, 0]
        return jax.lax.fori_loop(0, K, it, 0.0)

    dt_dg, _ = time_amortized(dist_gauss_fb, mu, sigma, tf, origin, iters=K)
    out["dist_gaussian_fwdbwd_mrays"] = round(W * W / dt_dg / 1e6, 2)
    print(
        f"distributed Gaussian-decode fwd+bwd {W}^2 over {n}^3 (1-chip "
        f"mesh): {dt_dg * 1e3:.2f} ms -> "
        f"{out['dist_gaussian_fwdbwd_mrays']:.1f} Mrays/s", file=sys.stderr)
    return out


def decode_config_gaussian(n, W, K, tf, origin):
    """BASELINE config 3: per-voxel Gaussian (mu, sigma) decoded to density
    inside the differentiated render; grads reach mu, sigma and the LUT."""
    from vrdd_tpu.ops.gaussian import gaussian_stats

    rng = np.random.default_rng(1)
    mu = jnp.asarray(blob_volume(n, seed=1))
    sigma = jnp.asarray(
        0.05 + 0.2 * rng.random((n, n, n), dtype=np.float32)
    )
    use_pallas_diff = (
        jax.default_backend() == "tpu" and pallas_diff_supported((n, n, n), W, W, n)
    )

    @jax.jit
    def fwdbwd(mu, sigma, tf, o):
        def loss(mu, sigma, tf, i):
            vol = gaussian_stats(mu * (1.0 + 1e-6 * i), sigma)[..., 0]
            if use_pallas_diff:
                img = pallas_slice_render_diff(
                    vol, o, tf, width=W, height=W, n_planes=n,
                    wrt=("volume", "lut"),
                )
            else:
                img = slice_render_image(
                    vol, o, W, W, tf, n_planes=n, plane_chunk=1
                )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gm, gs, gt) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                mu, sigma, tf, i
            )
            return acc + l + jnp.sum(gt) + gm[0, 0, 0] + gs[0, 0, 0]

        return jax.lax.fori_loop(0, K, it, 0.0)

    dt, _ = time_amortized(fwdbwd, mu, sigma, tf, origin, iters=K)
    return W * W / dt / 1e6


def decode_config_hist16(n, W, K, tf, origin):
    """BASELINE config 4: per-voxel 16-bin histogram decoded (mean channel)
    inside the differentiated render — TF-LUT fitting config; grads reach
    the histograms and the LUT (decode: ops/histogram.py flex_block_stats,
    the bin-count-generic stats of volumeRender_kernel.cu:1083-1115)."""
    from vrdd_tpu.ops.histogram import flex_block_stats

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (n, n, n, 16), dtype=jnp.float32)
    hist = jax.nn.softmax(2.0 * logits, axis=-1)
    use_pallas_diff = (
        jax.default_backend() == "tpu" and pallas_diff_supported((n, n, n), W, W, n)
    )

    @jax.jit
    def fwdbwd(hist, tf, o):
        def loss(hist, tf, i):
            # mean channel only — explicit selection: XLA does not DCE the
            # var/entropy branches through stack()[..., 0] (see _select_stats)
            vol = flex_block_stats(
                hist * (1.0 + 1e-6 * i), channels=(0,)
            )[..., 0] / 255.0
            if use_pallas_diff:
                img = pallas_slice_render_diff(
                    vol, o, tf, width=W, height=W, n_planes=n,
                    wrt=("volume", "lut"),
                )
            else:
                img = slice_render_image(
                    vol, o, W, W, tf, n_planes=n, plane_chunk=1
                )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(hist, tf, i)
            return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0]

        return jax.lax.fori_loop(0, K, it, 0.0)

    dt, _ = time_amortized(fwdbwd, hist, tf, origin, iters=K)
    return W * W / dt / 1e6


def decode_config_hist16_inkernel(n, W, K, tf, origin):
    """BASELINE config 4 with the decode INSIDE the Pallas kernel: the
    bins-major histogram volume streams straight from HBM into the sweep,
    whose plane prologue contracts sum_b w[b] * hist[b] in VMEM — the
    reference's query-7 in-march decode (volumeRender_kernel.cu:354-480)
    fused into the MXU sweep for any linear bins->scalar statistic, in
    BOTH directions (the backward replays the same prologue and chains
    decoded-plane cotangents to d_hist by one broadcast). The decoded
    scalar volume never exists in HBM; the fwd temp-bytes column proves it
    against the materialized path. bf16 histogram storage (2x stream
    bandwidth; decode accuracy == the materialized path's bf16 decode
    matmul) is the throughput default — measured 2026-08: bf16 26.3 vs
    materialized 24.9 Mrays/s at 256^3 -> 512^2, f32 (bitwise-exact
    decode) 23.1."""
    from vrdd_tpu.pallas.slice_kernel import (
        hist_render_supported, pallas_hist_render,
    )
    from vrdd_tpu.pallas.slice_vjp import pallas_hist_render_diff

    B = 16
    if jax.default_backend() != "tpu" or not hist_render_supported(
        (n, B, n, n), W, W, n_lut=int(tf.shape[0])
    ):
        return None
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (n, n, n, B), dtype=jnp.float32)
    hist_bm = jnp.transpose(jax.nn.softmax(2.0 * logits, axis=-1),
                            (0, 3, 1, 2))
    hist16 = jax.block_until_ready(hist_bm.astype(jnp.bfloat16))
    hist_bm = jax.block_until_ready(hist_bm)
    dw = jnp.asarray((np.arange(B) + 0.5) / B, jnp.float32)

    @jax.jit
    def fwdbwd(h, tf, o):
        def loss(h, tf, i):
            img = pallas_hist_render_diff(
                h, dw, o, tf, density=0.05 * (1.0 + 1e-6 * i),
                width=W, height=W, wrt=("hist", "lut"),
            )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(h, tf, i)
            return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, K, it, 0.0)

    out = {}
    dt, _ = time_amortized(fwdbwd, hist_bm, tf, origin, iters=K)
    out["f32"] = W * W / dt / 1e6
    dt, _ = time_amortized(fwdbwd, hist16, tf, origin, iters=K)
    out["bf16"] = W * W / dt / 1e6

    # memory proof: forward-only temp bytes exclude any (n, n, n) decoded
    # volume for the in-kernel path; the materialized path's include it
    from vrdd_tpu.ops.histogram import flex_block_stats

    @jax.jit
    def fwd_ik(h, tf, o):
        return jnp.sum(pallas_hist_render(h, dw, o, tf, width=W, height=W))

    @jax.jit
    def fwd_mat(h, tf, o):
        vol = flex_block_stats(h, channels=(0,))[..., 0] / 255.0
        return jnp.sum(pallas_slice_render(
            vol, o, tf, width=W, height=W, n_planes=n))

    hist_lm = jnp.transpose(hist_bm, (0, 2, 3, 1))
    try:
        m = fwd_ik.lower(hist16, tf, origin).compile().memory_analysis()
        out["fwd_temp_mb"] = m.temp_size_in_bytes / 1e6
        m = fwd_mat.lower(hist_lm, tf, origin).compile().memory_analysis()
        out["mat_fwd_temp_mb"] = m.temp_size_in_bytes / 1e6
    except Exception:
        out["fwd_temp_mb"] = out["mat_fwd_temp_mb"] = float("nan")
    return out


def decode_config_hist16_streamed(n, W, K, tf, origin):
    """BASELINE config 4 with the decode STREAMED into the sweep: per-voxel
    16-bin histograms are decoded per plane-chunk inside seeded chunk sweeps
    (march/streaming.py), so neither the decoded scalar volume nor the
    plane-stack residuals ever materialize in HBM — the in-march decode of
    the reference's query 7 generalized to every distribution family
    (volumeRender_kernel.cu:354-480). Same loss/grads as
    decode_config_hist16.

    This is the MEMORY mode, not the speed mode: measured 2026-08 at
    256^3/512^2, remat costs an extra decode + forward-sweep replay
    (20.1 ms vs 11.0 ms materialized; chunked-no-remat 14.7, single-chunk
    16.5/11.8) — at sizes where everything fits, XLA already streams the
    materialized decode optimally. The win is peak HBM: ~2x the decoded
    volume + plane residuals, which raises the largest differentiable
    Gaussian-decode volume from <= 768^3 (materialized OOM at 896^3) to
    896^3 on a 16 GB chip (PARITY.md round 3)."""
    from vrdd_tpu.march.streaming import streaming_decode_render
    from vrdd_tpu.ops.histogram import flex_block_stats

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (n, n, n, 16), dtype=jnp.float32)
    hist = jax.nn.softmax(2.0 * logits, axis=-1)

    def decode(h):
        return flex_block_stats(h, channels=(0,))[..., 0] / 255.0

    @jax.jit
    def fwdbwd(hist, tf, o):
        def loss(hist, tf, i):
            img = streaming_decode_render(
                hist * (1.0 + 1e-6 * i), decode, o, tf, width=W, height=W,
                n_planes=n, chunk_planes=64, backend="auto",
            )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(hist, tf, i)
            return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0]

        return jax.lax.fori_loop(0, K, it, 0.0)

    dt, _ = time_amortized(fwdbwd, hist, tf, origin, iters=K)
    return W * W / dt / 1e6


def viewer_fps_config(K, runs: int = 1):
    """Interactive-viewer frame rate through the viewer's EXACT frame path
    (ViewerServer.render_frame: pipeline auto-render + uint8 pack + bytes),
    at the reference's interactive config — 512^2 image over the
    Isabel-shaped decoded stats volume (presentation.pdf "Frame rate:
    60 fps" on a Quadro K5000). Two regimes: the fixed benchmark view
    (object-order fused path) and a continuous rotation drag (shear-warp
    path, slope grids traced so dragging never recompiles). Returns two
    lists of ``runs`` fps samples (one server, back-to-back passes) so the
    caller can take the median + band across link weather."""
    from vrdd_tpu.io.synthetic import random_histogram_volume
    from vrdd_tpu.models.pipeline import RenderPipeline
    from vrdd_tpu.models.volumes import RawHistogramVolume
    from vrdd_tpu.viewer import ViewerServer

    hist = random_histogram_volume((10, 50, 50), n_bins=32, seed=0)
    pipe = RenderPipeline(raw=RawHistogramVolume(jnp.asarray(hist)))
    srv = ViewerServer(pipe, width=512, height=512, port=0)
    unrots, rots = [], []
    try:
        n_frames = max(16, 8 * K)
        # the browser client's exact request: RGB payload + pipelined server
        # (frame N+2 dispatch + async host copies overlap frame N's
        # readback over the tunneled link). Warm 3 frames per regime:
        # compile + fill the 2-deep pipeline, as a real drag does within
        # its first ~100 ms
        for r in range(runs):
            for i in range(3):  # compile + pipeline fill, unrotated
                srv.render_frame(
                    {"density": 0.04 + 1e-7 * i, "fmt": "rgb", "pipe": "1"})
            t0 = time.perf_counter()
            for i in range(n_frames):
                srv.render_frame(
                    {"density": 0.05 + 1e-7 * i, "fmt": "rgb", "pipe": "1"})
            unrots.append(n_frames / (time.perf_counter() - t0))
            for i in range(3):  # compile + pipeline fill, shear-warp
                srv.render_frame(
                    {"rx": 9.0 + 0.05 * i, "ry": 5.0, "fmt": "rgb",
                     "pipe": "1"}
                )
            t0 = time.perf_counter()
            for i in range(n_frames):
                srv.render_frame(
                    {"rx": 10.0 + 0.05 * i, "ry": 5.0, "fmt": "rgb",
                     "pipe": "1"}
                )
            rots.append(n_frames / (time.perf_counter() - t0))
    finally:
        srv.httpd.server_close()
    return unrots, rots


def dist_overhead(n, W, K, vol, tf, origin, use_pallas_diff):
    """Distributed sweep on a 1-device mesh vs the unsharded kernel: the
    per-chip overhead of the full distribution machinery (halo exchange,
    static-tap pre-blend, two-pass exact ET, sort-last compositing).
    TPU-only (the fused kernel needs real hardware)."""
    if jax.default_backend() != "tpu" or not use_pallas_diff:
        return None
    from vrdd_tpu.pallas.slice_kernel import precompute_ess_stats
    from vrdd_tpu.parallel.mesh import make_mesh
    from vrdd_tpu.parallel.sweep import (
        distributed_sweep_render,
        shard_scalar_volume,
    )

    mesh = make_mesh(1, 1)
    vs = shard_scalar_volume(vol, mesh)
    ess_stats = jax.block_until_ready(precompute_ess_stats(vol, n_planes=n))

    @jax.jit
    def un_fwd(v, tf, o):
        def it(i, acc):
            # density loop-carry: a volume perturbation materializes a
            # 0.5 GB copy the Pallas input cannot fuse (~1 ms noise on
            # every key in this section)
            img = pallas_slice_render(
                v, o, tf, density=0.05 * (1.0 + 1e-6 * i), width=W,
                height=W, n_planes=n
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)

    @jax.jit
    def un_fwd_ess(v, tf, o, stats):
        # ESS TF-interval culling with cached plane stats — exact for the
        # rendered image and ON by default on the pipeline's plain
        # forwards; recorded next to the plain kernel so the roofline
        # fraction is reported both culled and uncplled
        def it(i, acc):
            img = pallas_slice_render(
                v, o, tf, density=0.05 * (1.0 + 1e-6 * i), width=W,
                height=W, n_planes=n,
                empty_space_skip=True, ess_stats=stats,
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)

    @jax.jit
    def d_fwd(v, tf, o):
        def it(i, acc):
            img = distributed_sweep_render(
                v, o, tf, density=0.05 * (1.0 + 1e-6 * i), width=W,
                height=W, mesh=mesh, n_planes=n, backend="pallas",
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)

    @jax.jit
    def d_fwdbwd(v, tf, o):
        def loss(v, tf, i):
            img = distributed_sweep_render(
                v, o, tf, density=0.05 * (1.0 + 1e-6 * i), width=W,
                height=W, mesh=mesh, n_planes=n, backend="pallas",
                plane_chunk=4, wrt=("volume", "lut"),
            )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gv, gt) = jax.value_and_grad(loss, argnums=(0, 1))(v, tf, i)
            return acc + l + jnp.sum(gt) + gv[0, 0, 0]
        return jax.lax.fori_loop(0, K, it, 0.0)

    dt_un, _ = time_amortized(un_fwd, vol, tf, origin, iters=K)
    dt_ess, _ = time_amortized(
        lambda v, t, o: un_fwd_ess(v, t, o, ess_stats), vol, tf, origin,
        iters=K,
    )
    dt_d, _ = time_amortized(d_fwd, vs, tf, origin, iters=K)
    dt_db, _ = time_amortized(d_fwdbwd, vs, tf, origin, iters=K)
    return {
        "unsharded_fwd_ms": dt_un * 1e3,
        "unsharded_fwd_ess_ms": dt_ess * 1e3,
        "dist_fwd_ms": dt_d * 1e3,
        "dist_overhead_ratio": dt_d / dt_un,
        "dist_fwdbwd_ms": dt_db * 1e3,
        "dist_fwdbwd_mrays": W * W / dt_db / 1e6,
    }


if __name__ == "__main__":
    main()
