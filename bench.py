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

    # --- distribution decode INSIDE the timed fwd+bwd graph (BASELINE
    # configs 3/4; the reference decodes during marching only for query 7,
    # volumeRender_kernel.cu:722-872 precomputes the rest — here the decode
    # is differentiable and fused into the render step) ---
    nd, Wd = min(n, 256), min(W, 512)
    gauss_mrays = decode_config_gaussian(nd, Wd, K, tf, origin)
    print(f"fwd+bwd Gaussian-decode {Wd}^2 over {nd}^3: "
          f"{gauss_mrays:.1f} Mrays/s", file=sys.stderr)
    hist_mrays = decode_config_hist16(nd, Wd, K, tf, origin)
    print(f"fwd+bwd 16-bin-histogram-decode {Wd}^2 over {nd}^3: "
          f"{hist_mrays:.1f} Mrays/s", file=sys.stderr)

    # --- distributed-vs-unsharded per-chip overhead (the scaling proxy
    # measurable on one chip: real multi-chip efficiency = 1 /
    # (overhead_ratio + true comm time, which a 1-device mesh undercounts)) ---
    dist = dist_overhead(n, W, K, vol, tf, origin, use_pallas_diff)
    if dist is not None:
        print(
            f"distributed (1-chip mesh) fwd {dist['dist_fwd_ms']:.2f} ms vs "
            f"unsharded {dist['unsharded_fwd_ms']:.2f} ms -> overhead ratio "
            f"{dist['dist_overhead_ratio']:.3f}; dist fwd+bwd "
            f"{dist['dist_fwdbwd_ms']:.2f} ms", file=sys.stderr)

    out = {
        "metric": f"Mrays/s/chip fwd+bwd {n}^3 vol {W}^2 img (slice-sweep)",
        "value": round(fb_mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(fwd_mtexels / REFERENCE_MTEXELS_PER_S, 3),
        "forward_512_mtexels_per_s": round(fwd_mtexels, 2),
        "reference_mtexels_per_s": REFERENCE_MTEXELS_PER_S,
        "gaussian_decode_fwdbwd_mrays": round(gauss_mrays, 2),
        "hist16_decode_fwdbwd_mrays": round(hist_mrays, 2),
    }
    if dist is not None:
        out.update({k: round(v, 3) for k, v in dist.items()})
    print(json.dumps(out))


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
            vol = flex_block_stats(hist * (1.0 + 1e-6 * i))[..., 0] / 255.0
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


def dist_overhead(n, W, K, vol, tf, origin, use_pallas_diff):
    """Distributed sweep on a 1-device mesh vs the unsharded kernel: the
    per-chip overhead of the full distribution machinery (halo exchange,
    static-tap pre-blend, two-pass exact ET, sort-last compositing).
    TPU-only (the fused kernel needs real hardware)."""
    if jax.default_backend() != "tpu" or not use_pallas_diff:
        return None
    from vrdd_tpu.parallel.mesh import make_mesh
    from vrdd_tpu.parallel.sweep import (
        distributed_sweep_render,
        shard_scalar_volume,
    )

    mesh = make_mesh(1, 1)
    vs = shard_scalar_volume(vol, mesh)

    @jax.jit
    def un_fwd(v, tf, o):
        def it(i, acc):
            img = pallas_slice_render(
                v * (1.0 + 1e-6 * i), o, tf, width=W, height=W, n_planes=n
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)

    @jax.jit
    def d_fwd(v, tf, o):
        def it(i, acc):
            img = distributed_sweep_render(
                v * (1.0 + 1e-6 * i), o, tf, width=W, height=W,
                mesh=mesh, n_planes=n, backend="pallas",
            )
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)

    @jax.jit
    def d_fwdbwd(v, tf, o):
        def loss(v, tf, i):
            img = distributed_sweep_render(
                v * (1.0 + 1e-6 * i), o, tf, width=W, height=W,
                mesh=mesh, n_planes=n, backend="pallas", plane_chunk=4,
                wrt=("volume", "lut"),
            )
            return jnp.mean((img - 0.25) ** 2)

        def it(i, acc):
            l, (gv, gt) = jax.value_and_grad(loss, argnums=(0, 1))(v, tf, i)
            return acc + l + jnp.sum(gt) + gv[0, 0, 0]
        return jax.lax.fori_loop(0, K, it, 0.0)

    dt_un, _ = time_amortized(un_fwd, vol, tf, origin, iters=K)
    dt_d, _ = time_amortized(d_fwd, vs, tf, origin, iters=K)
    dt_db, _ = time_amortized(d_fwdbwd, vs, tf, origin, iters=K)
    return {
        "unsharded_fwd_ms": dt_un * 1e3,
        "dist_fwd_ms": dt_d * 1e3,
        "dist_overhead_ratio": dt_d / dt_un,
        "dist_fwdbwd_ms": dt_db * 1e3,
        "dist_fwdbwd_mrays": W * W / dt_db / 1e6,
    }


if __name__ == "__main__":
    main()
