#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: Mrays/s/chip forward+backward at 512^3 volume, 1024^2 image
(BASELINE.json north-star), measured on the slice-sweep MXU renderer with
gradients w.r.t. the volume and the transfer-function LUT.

``vs_baseline`` compares our *forward* 512^2 throughput (MTexels/s, the
reference's own benchmark metric, volumeRender.cpp:1066-1067) against the
reference's published 60 fps at 512^2 => 15.73 MTexels/s on a Quadro K5000.

Timings amortize K on-device iterations inside one jit to exclude host-relay
latency; completion is forced by a scalar readback.
"""

from __future__ import annotations

import argparse
import json
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
    pallas_slice_render_diff,
)

REFERENCE_MTEXELS_PER_S = 60.0 * 512 * 512 / 1e6  # 15.73, presentation.pdf


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


def time_amortized(fn, *args, iters: int = 1) -> float:
    """Seconds per call; fn must return a scalar (readback forces sync)."""
    float(fn(*args))  # warmup + compile
    t0 = time.perf_counter()
    s = float(fn(*args))
    dt = time.perf_counter() - t0
    return dt / iters, s


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
    args = p.parse_args()

    n, W, K = args.size, args.image, args.iters
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    vol = jnp.asarray(blob_volume(n))
    tf = jnp.asarray(default_transfer_function())
    origin = jnp.asarray([0.0, 0.0, 4.0], dtype=jnp.float32)

    # --- forward, the reference's own benchmark geometry: 512^2 image over an
    # Isabel-shaped (50x50x10) decoded stats volume, 200 sampling planes
    # (~ the reference's effective step count under early termination) ---
    W0 = 512
    rng = np.random.default_rng(0)
    isabel = jnp.asarray(rng.random((10, 50, 50), dtype=np.float32))

    use_pallas = pallas_supported((10, 50, 50), W0, W0, 200)

    @jax.jit
    def fwd_isabel(v, tf, o):
        def it(i, acc):
            vi = v * (1.0 + 1e-6 * i)
            if use_pallas:
                img = pallas_slice_render(
                    vi, o, tf, width=W0, height=W0, n_planes=200
                )
            else:
                img = slice_render_image(vi, o, W0, W0, tf, n_planes=200)
            return acc + jnp.sum(img)

        return jax.lax.fori_loop(0, 4 * K, it, 0.0)

    dt_fwd, _ = time_amortized(fwd_isabel, isabel, tf, origin, iters=4 * K)
    fwd_mtexels = W0 * W0 / dt_fwd / 1e6
    print(f"forward 512^2 Isabel-shaped (50x50x10): {dt_fwd * 1e3:.2f} ms -> "
          f"{fwd_mtexels:.1f} MTexels/s", file=sys.stderr)

    # --- forward at the headline volume ---
    use_pallas_big = pallas_supported((n, n, n), W0, W0, n)

    @jax.jit
    def fwd_many(v, tf, o):
        def it(i, acc):
            vi = v * (1.0 + 1e-6 * i)
            if use_pallas_big:
                img = pallas_slice_render(vi, o, tf, width=W0, height=W0, n_planes=n)
            else:
                img = slice_render_image(vi, o, W0, W0, tf, n_planes=n)
            return acc + jnp.sum(img)

        return jax.lax.fori_loop(0, K, it, 0.0)

    use_pallas_diff = (
        jax.default_backend() == "tpu"
        and pallas_diff_supported((n, n, n), W, W, n)
    )
    dt_fwd_big, _ = time_amortized(fwd_many, vol, tf, origin, iters=K)
    print(f"forward 512^2 over {n}^3: {dt_fwd_big * 1e3:.2f} ms -> "
          f"{W0 * W0 / dt_fwd_big / 1e6:.1f} MTexels/s", file=sys.stderr)

    # --- forward+backward, headline config: fused Pallas analytic VJP when
    # supported (three VMEM-resident sweeps; 104 ms vs 269 ms XLA at 512^3),
    # else the XLA analytic VJP (plane_chunk=1 — XLA fully fuses the per-plane
    # body, while chunked (C, H, W, 4) intermediates round-trip HBM) ---
    @jax.jit
    def fwdbwd_many(v, tf, o):
        def loss(v, tf, i):
            if use_pallas_diff:
                # wrt mirrors value_and_grad(argnums=(0, 1)): volume + LUT
                # cotangents only (XLA autodiff would prune the rest too)
                img = pallas_slice_render_diff(
                    v * (1.0 + 1e-6 * i), o, tf, width=W, height=W,
                    n_planes=n, wrt=("volume", "lut"),
                )
            else:
                img = slice_render_image(
                    v * (1.0 + 1e-6 * i), o, W, W, tf, n_planes=n, plane_chunk=1
                )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gv, gt) = jax.value_and_grad(loss, argnums=(0, 1))(v, tf, i)
            return acc + l + jnp.sum(gt) + gv[0, 0, 0]

        return jax.lax.fori_loop(0, K, it, 0.0)

    dt_fb, _ = time_amortized(fwdbwd_many, vol, tf, origin, iters=K)
    fb_mrays = W * W / dt_fb / 1e6
    print(f"fwd+bwd {W}^2 over {n}^3: {dt_fb * 1e3:.2f} ms -> "
          f"{fb_mrays:.1f} Mrays/s", file=sys.stderr)

    print(json.dumps({
        "metric": f"Mrays/s/chip fwd+bwd {n}^3 vol {W}^2 img (slice-sweep)",
        "value": round(fb_mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(fwd_mtexels / REFERENCE_MTEXELS_PER_S, 3),
        "forward_512_mtexels_per_s": round(fwd_mtexels, 2),
        "reference_mtexels_per_s": REFERENCE_MTEXELS_PER_S,
    }))


if __name__ == "__main__":
    main()
