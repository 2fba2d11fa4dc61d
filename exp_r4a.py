"""Round-4 batched TPU experiments (run: python - < exp_r4a.py).

A: viewer fps matrix — {unrot, rot} x {pipelined, serial} x {rgb, rgba} x
   {ess on/off}
B: rotated-frame decomposition (host geometry vs dispatch vs readback)
C: forward plane_chunk sweep at 512^3 -> 1024^2 (roofline reconcile)
D: ESS on the dense 512^3 blob forward (headline-path decision)
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from vrdd_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

def note(msg):
    print(msg, file=sys.stderr, flush=True)

from vrdd_tpu.io.synthetic import random_histogram_volume
from vrdd_tpu.models.pipeline import RenderPipeline
from vrdd_tpu.models.volumes import RawHistogramVolume
from vrdd_tpu.viewer import ViewerServer

hist = random_histogram_volume((10, 50, 50), n_bins=32, seed=0)
pipe = RenderPipeline(raw=RawHistogramVolume(jnp.asarray(hist)))

def fps_loop(srv, params_fn, n=24):
    srv.render_frame(params_fn(0))  # compile/warm
    srv.render_frame(params_fn(1))
    t0 = time.perf_counter()
    for i in range(n):
        srv.render_frame(params_fn(2 + i))
    return n / (time.perf_counter() - t0)

# ---- A: fps matrix ----
for ess in (True, False):
    pipe.empty_space_skip = ess
    for pipelined in (True, False):
        srv = ViewerServer(pipe, width=512, height=512, port=0,
                           pipelined=pipelined)
        try:
            for fmt in ("rgb", "rgba"):
                fq = {} if fmt == "rgba" else {"fmt": "rgb"}
                f_un = fps_loop(
                    srv, lambda i: {"density": 0.05 + 1e-7 * i, **fq})
                f_rot = fps_loop(
                    srv, lambda i: {"rx": 10.0 + 0.05 * i, "ry": 5.0, **fq})
                note(f"A ess={int(ess)} pipe={int(pipelined)} fmt={fmt}: "
                     f"unrot {f_un:.1f} fps, rot {f_rot:.1f} fps")
        finally:
            srv.httpd.server_close()

# ---- B: rotated-frame decomposition ----
pipe.empty_space_skip = False
from vrdd_tpu.core.geometry import inv_view_from_rotation_translation
from vrdd_tpu.utils.config import RenderConfig, CameraConfig

cfg = RenderConfig(camera=CameraConfig(width=512, height=512))
iv = inv_view_from_rotation_translation(10.0, 5.0, (0.0, 0.0, -4.0))
img = pipe.render(iv, cfg, "auto", as_uint8=True, channels=3)
np.asarray(img)  # compile+warm
# host-side cost (geometry + python) alone: dispatch without readback
t0 = time.perf_counter()
for i in range(20):
    img = pipe.render(
        inv_view_from_rotation_translation(10.0 + 0.05 * i, 5.0,
                                           (0.0, 0.0, -4.0)),
        cfg, "auto", as_uint8=True, channels=3)
t_disp = (time.perf_counter() - t0) / 20
jax.block_until_ready(img)
# dispatch + device compute (no host readback)
t0 = time.perf_counter()
for i in range(20):
    img = pipe.render(
        inv_view_from_rotation_translation(12.0 + 0.05 * i, 5.0,
                                           (0.0, 0.0, -4.0)),
        cfg, "auto", as_uint8=True, channels=3)
    jax.block_until_ready(img)
t_block = (time.perf_counter() - t0) / 20
# + readback
t0 = time.perf_counter()
for i in range(20):
    img = pipe.render(
        inv_view_from_rotation_translation(14.0 + 0.05 * i, 5.0,
                                           (0.0, 0.0, -4.0)),
        cfg, "auto", as_uint8=True, channels=3)
    np.asarray(img)
t_read = (time.perf_counter() - t0) / 20
note(f"B rotated frame: dispatch-only {t_disp*1e3:.1f} ms, "
     f"+device-complete {t_block*1e3:.1f} ms, +readback {t_read*1e3:.1f} ms")

# unrotated for comparison
cfg0 = RenderConfig(camera=CameraConfig(width=512, height=512))
img = pipe.render(None, cfg0, "auto", as_uint8=True, channels=3)
np.asarray(img)
t0 = time.perf_counter()
for i in range(20):
    img = pipe.render(None, dataclass_replace(cfg0, i) if False else cfg0,
                      "auto", as_uint8=True, channels=3)
    np.asarray(img)
t_read0 = (time.perf_counter() - t0) / 20
note(f"B unrotated frame serialized: {t_read0*1e3:.1f} ms")

# ---- C: forward plane_chunk sweep 512^3 -> 1024^2 ----
from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.pallas.slice_kernel import pallas_slice_render, precompute_ess_stats
from bench import blob_volume

n, W = 512, 1024
vol = jnp.asarray(blob_volume(n))
tf = jnp.asarray(default_transfer_function())
origin = jnp.asarray([0.0, 0.0, 4.0], dtype=jnp.float32)
K = 4

def time_fwd(pchunk, ess=False, stats=None):
    @jax.jit
    def f(v, lut, o):
        def it(i, acc):
            img = pallas_slice_render(
                v * (1.0 + 1e-6 * i), o, lut, width=W, height=W,
                n_planes=n, plane_chunk=pchunk, empty_space_skip=ess,
                ess_stats=stats)
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)
    float(f(vol, tf, origin))
    t0 = time.perf_counter(); float(f(vol, tf, origin))
    return (time.perf_counter() - t0) / K

for pc in (4, 8, 16):
    note(f"C fwd 512^3->1024^2 plane_chunk={pc}: {time_fwd(pc)*1e3:.2f} ms")

# ---- D: ESS on the dense blob (default TF) ----
stats = jax.block_until_ready(precompute_ess_stats(vol, n_planes=n))
note(f"D fwd ESS(cached) dense blob: {time_fwd(8, True, stats)*1e3:.2f} ms")
note("done")
