"""Pod linear-scaling harness: rays/s at 1 device vs N devices.

The reference renders on exactly one GPU (volumeRender.cpp:1107-1140
chooses a single CUDA device); scaling beyond a chip is this framework's
extension, and BASELINE.md sets the target: >= 80% linear efficiency at
2+ hosts. Real multi-chip hardware is not attached in the build
environment, so this harness has two jobs:

1. Be READY: ``measure_scaling(devices)`` runs the full distributed sweep
   (volume bricked over z with halo exchange, pixels sharded over rays,
   sort-last compositing) on a 1-device mesh and an all-device mesh over
   the SAME global problem and reports strong-scaling efficiency
   ``t_1 / (N * t_N)`` — runnable unmodified the day a pod is attached
   (``python bench.py --sections scaling``).
2. Be TESTED: tests/test_scaling.py pins it functionally on the 8-device
   virtual CPU mesh (efficiency is meaningless there — virtual devices
   share one host's cores — but shapes, sharding, and the efficiency
   arithmetic are exercised end to end).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _factor_mesh(n: int) -> tuple:
    """(bricks, rays) for n devices: prefer splitting both axes (exercises
    halo exchange AND row sharding), bricks <= rays."""
    best = (1, n)
    b = 1
    while b * b <= n:
        if n % b == 0:
            best = (b, n // b)
        b += 1
    return best


def measure_scaling(
    devices: Optional[Sequence] = None,
    *,
    size: int = 0,
    image: int = 0,
    n_planes: int = 0,
    iters: int = 2,
    backend: str = "auto",
) -> dict:
    """Strong-scaling efficiency of the distributed sweep.

    Renders the same ``size^3 -> image^2`` problem on a 1-device mesh and
    on a mesh over all ``devices``; efficiency = ``t_1 / (N * t_N)``
    (1.0 = perfectly linear). Defaults: the headline shape on TPU
    (512^3 -> 1024^2), a small shape elsewhere (virtual CPU meshes).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n_dev = len(devices)
    on_tpu = devices[0].platform == "tpu"
    if size <= 0:
        size = 512 if on_tpu else 32
    if image <= 0:
        image = 1024 if on_tpu else 128
    if backend == "auto":
        backend = "pallas" if on_tpu else "xla"
    # round the problem up to the mesh's divisibility contract so the
    # harness runs on ANY device count (12 devices -> bricks=3 x rays=4
    # would otherwise hit the sweep's nz % bricks / height % rays asserts)
    bricks, rays = _factor_mesh(n_dev)
    size += -size % bricks
    row_mult = rays * (8 if backend == "pallas" else 1)  # STRIP per shard
    image += -image % max(row_mult, 128 if backend == "pallas" else 1)
    if n_planes <= 0:
        n_planes = size
    n_planes += -n_planes % bricks

    from vrdd_tpu.parallel.mesh import make_mesh
    from vrdd_tpu.parallel.sweep import (
        distributed_sweep_render,
        shard_scalar_volume,
    )

    rng = np.random.default_rng(0)
    vol_host = rng.random((size, size, size), dtype=np.float32)
    from vrdd_tpu.core.transfer import default_transfer_function

    tf = jnp.asarray(default_transfer_function())
    origin = jnp.asarray([0.0, 0.0, 4.0], dtype=jnp.float32)

    def timed(mesh):
        vs = shard_scalar_volume(jnp.asarray(vol_host), mesh)

        @jax.jit
        def fwd(v, lut, o):
            def it(i, acc):
                img = distributed_sweep_render(
                    v * (1.0 + 1e-6 * i), o, lut, width=image, height=image,
                    mesh=mesh, n_planes=n_planes, backend=backend,
                )
                return acc + jnp.sum(img)
            return jax.lax.fori_loop(0, iters, it, 0.0)

        float(fwd(vs, tf, origin))  # compile + warm
        t0 = time.perf_counter()
        float(fwd(vs, tf, origin))
        return (time.perf_counter() - t0) / iters

    def timed_step(mesh):
        # the TRAINING step (the claim the north star actually makes:
        # parameter gradients all-reduced overlapped with the backward —
        # BASELINE.json): full distributed sweep-fit step, volume + LUT
        # learned, optimizer update included (parallel/train.py
        # make_sweep_fit_step). Steps are dispatched back to back and
        # synced once, so host-relay latency amortizes like the fori_loop.
        from vrdd_tpu.parallel.train import (
            make_sweep_fit_step, shard_target_image,
        )

        vs = shard_scalar_volume(jnp.asarray(vol_host), mesh)
        init_fn, step_fn = make_sweep_fit_step(
            mesh, image, image, learn_volume=True, n_planes=n_planes,
            backend=backend,
        )
        params, opt_state = init_fn(tf, volume=vs)
        target = shard_target_image(
            jnp.full((image, image, 4), 0.25, jnp.float32), mesh
        )
        params, opt_state, loss = step_fn(
            params, opt_state, vs, origin, target
        )  # compile #1 (init-state params)
        # compile #2: the first update changes the params' committed
        # shardings, retracing step_fn — warm THAT executable too or the
        # timed loop's first step pays a full compile (observed 22 s at
        # 512^3, turning a 48 ms step into a 5.7 s "average")
        params, opt_state, loss = step_fn(
            params, opt_state, vs, origin, target
        )
        float(loss)  # warm sync
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step_fn(
                params, opt_state, vs, origin, target
            )
        float(loss)
        return (time.perf_counter() - t0) / iters

    t1 = timed(make_mesh(1, 1, devices=devices[:1]))
    t1_fb = timed_step(make_mesh(1, 1, devices=devices[:1]))
    out = {
        "scaling_n_devices": n_dev,
        "scaling_shape": f"{size}^3 -> {image}^2",
        "scaling_t1_ms": round(t1 * 1e3, 3),
        "scaling_rays_per_s_1dev": round(image * image / t1, 0),
        "scaling_fwdbwd_t1_ms": round(t1_fb * 1e3, 3),
    }
    if n_dev == 1:
        # single chip: nothing to scale over — report the harness as armed
        out["scaling_efficiency"] = None
        out["scaling_fwdbwd_efficiency"] = None
        out["scaling_note"] = (
            "1 device attached; harness ready (>=80% linear target, "
            "BASELINE.md; forward AND training step) — run on a pod to "
            "measure"
        )
        return out
    tn = timed(make_mesh(bricks, rays, devices=devices))
    tn_fb = timed_step(make_mesh(bricks, rays, devices=devices))
    out.update(
        scaling_mesh=f"bricks={bricks} x rays={rays}",
        scaling_tN_ms=round(tn * 1e3, 3),
        scaling_rays_per_s_Ndev=round(image * image / tn, 0),
        scaling_efficiency=round(t1 / (n_dev * tn), 4),
        scaling_fwdbwd_tN_ms=round(tn_fb * 1e3, 3),
        scaling_fwdbwd_efficiency=round(t1_fb / (n_dev * tn_fb), 4),
    )
    return out
