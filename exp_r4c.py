"""Round-4 batch C: viewer fps with 2-deep async pipeline + in-kernel
decode perf (run: python - < exp_r4c.py)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from vrdd_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

def note(msg):
    print(msg, file=sys.stderr, flush=True)

# ---- E2: viewer fps, new pipeline ----
from vrdd_tpu.io.synthetic import random_histogram_volume
from vrdd_tpu.models.pipeline import RenderPipeline
from vrdd_tpu.models.volumes import RawHistogramVolume
from vrdd_tpu.viewer import ViewerServer

hist = random_histogram_volume((10, 50, 50), n_bins=32, seed=0)
pipe = RenderPipeline(raw=RawHistogramVolume(jnp.asarray(hist)))

def fps_loop(srv, params_fn, n=32):
    srv.render_frame(params_fn(0))
    srv.render_frame(params_fn(1))
    srv.render_frame(params_fn(2))
    t0 = time.perf_counter()
    for i in range(n):
        srv.render_frame(params_fn(3 + i))
    return n / (time.perf_counter() - t0)

srv = ViewerServer(pipe, width=512, height=512, port=0)
try:
    f_un = fps_loop(srv, lambda i: {"density": 0.05 + 1e-7 * i, "fmt": "rgb"})
    f_rot = fps_loop(srv, lambda i: {"rx": 10.0 + 0.05 * i, "ry": 5.0,
                                     "fmt": "rgb"})
    note(f"E2 viewer 2-deep async rgb ess=on: unrot {f_un:.1f} fps, "
         f"rot {f_rot:.1f} fps")
finally:
    srv.httpd.server_close()

# ---- G: in-kernel decode ----
from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.ops.histogram import flex_block_stats
from vrdd_tpu.pallas.slice_kernel import pallas_hist_render
from vrdd_tpu.pallas.slice_vjp import (
    pallas_hist_render_diff, pallas_slice_render_diff,
)

n, Wd, B, K = 256, 512, 16, 4
key = jax.random.PRNGKey(0)
logits = jax.random.normal(key, (n, n, n, B), dtype=jnp.float32)
hist_lm = jax.nn.softmax(2.0 * logits, axis=-1)
hist_bm = jax.block_until_ready(jnp.transpose(hist_lm, (0, 3, 1, 2)))
w = jnp.asarray((np.arange(B) + 0.5) / B, jnp.float32)
tf = jnp.asarray(default_transfer_function())
origin = jnp.asarray([0.0, 0.0, 4.0], jnp.float32)

img_k = pallas_hist_render(hist_bm, w, origin, tf, width=Wd, height=Wd)
dec = flex_block_stats(hist_lm, channels=(0,))[..., 0] / 255.0
img_m = pallas_slice_render_diff(dec, origin, tf, width=Wd, height=Wd,
                                 n_planes=n, wrt=("volume",))
err = float(jnp.max(jnp.abs(img_k - img_m)))
note(f"G hw parity in-kernel vs materialized: max|err| = {err:.2e}")

def timed(f, *a):
    float(f(*a))
    t0 = time.perf_counter(); float(f(*a))
    return (time.perf_counter() - t0) / K

@jax.jit
def fwd_kernel_decode(h, lut, o):
    def it(i, acc):
        img = pallas_hist_render(h * (1.0 + 1e-6 * i), w, o, lut,
                                 width=Wd, height=Wd)
        return acc + jnp.sum(img)
    return jax.lax.fori_loop(0, K, it, 0.0)

dt = timed(fwd_kernel_decode, hist_bm, tf, origin)
note(f"G fwd in-kernel-decode: {dt*1e3:.2f} ms -> {Wd*Wd/dt/1e6:.1f} Mrays/s")

@jax.jit
def fwdbwd_kernel_decode(h, lut, o):
    def loss(h, lut, i):
        img = pallas_hist_render_diff(
            h * (1.0 + 1e-6 * i), w, o, lut, width=Wd, height=Wd,
            wrt=("hist", "lut"))
        return jnp.mean((img - 0.25) ** 2)
    def it(i, acc):
        l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(h, lut, i)
        return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0]
    return jax.lax.fori_loop(0, K, it, 0.0)

dt = timed(fwdbwd_kernel_decode, hist_bm, tf, origin)
note(f"G fwd+bwd in-kernel-decode: {dt*1e3:.2f} ms -> "
     f"{Wd*Wd/dt/1e6:.1f} Mrays/s")

@jax.jit
def fwdbwd_materialized(h, lut, o):
    def loss(h, lut, i):
        vol = flex_block_stats(
            h * (1.0 + 1e-6 * i), channels=(0,))[..., 0] / 255.0
        img = pallas_slice_render_diff(vol, o, lut, width=Wd, height=Wd,
                                       n_planes=n, wrt=("volume", "lut"))
        return jnp.mean((img - 0.25) ** 2)
    def it(i, acc):
        l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(h, lut, i)
        return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0]
    return jax.lax.fori_loop(0, K, it, 0.0)

dt = timed(fwdbwd_materialized, hist_lm, tf, origin)
note(f"G fwd+bwd materialized (same-day): {dt*1e3:.2f} ms -> "
     f"{Wd*Wd/dt/1e6:.1f} Mrays/s")

for name, fn, arg in (("in-kernel", fwdbwd_kernel_decode, hist_bm),
                      ("materialized", fwdbwd_materialized, hist_lm)):
    try:
        m = fn.lower(arg, tf, origin).compile().memory_analysis()
        note(f"G {name} temp bytes: {m.temp_size_in_bytes/1e6:.1f} MB "
             f"(args {m.argument_size_in_bytes/1e6:.0f} MB)")
    except Exception as e:
        note(f"G {name} memory_analysis unavailable: {e}")
note("done")
