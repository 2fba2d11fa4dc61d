"""Batch D: in-kernel decode perf with amortized chunks."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from vrdd_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
def note(m): print(m, file=sys.stderr, flush=True)

from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.ops.histogram import flex_block_stats
from vrdd_tpu.pallas.slice_kernel import pallas_hist_render, _fit_plane_chunk
from vrdd_tpu.pallas.slice_vjp import (
    pallas_hist_render_diff, pallas_slice_render_diff)

n, Wd, B, K = 256, 512, 16, 4
key = jax.random.PRNGKey(0)
hist_lm = jax.nn.softmax(2.0 * jax.random.normal(key, (n, n, n, B)), axis=-1)
hist_bm = jax.block_until_ready(jnp.transpose(hist_lm, (0, 3, 1, 2)))
w = jnp.asarray((np.arange(B) + 0.5) / B, jnp.float32)
tf = jnp.asarray(default_transfer_function())
origin = jnp.asarray([0.0, 0.0, 4.0], jnp.float32)
note(f"fit_plane_chunk(8, bins=16) -> {_fit_plane_chunk(8, n, n, n, Wd, bins=B)}")

def timed(f, *a):
    float(f(*a)); t0 = time.perf_counter(); float(f(*a))
    return (time.perf_counter() - t0) / K

for pc in (2, 4):
    @jax.jit
    def fwd(h, lut, o, pc=pc):
        def it(i, acc):
            img = pallas_hist_render(h * (1.0 + 1e-6 * i), w, o, lut,
                                     width=Wd, height=Wd, plane_chunk=pc)
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)
    dt = timed(fwd, hist_bm, tf, origin)
    note(f"fwd in-kernel pc={pc}: {dt*1e3:.2f} ms -> {Wd*Wd/dt/1e6:.1f} Mrays/s")

for pc in (2, 4):
    @jax.jit
    def fb(h, lut, o, pc=pc):
        def loss(h, lut, i):
            img = pallas_hist_render_diff(
                h * (1.0 + 1e-6 * i), w, o, lut, width=Wd, height=Wd,
                wrt=("hist", "lut"), plane_chunk=pc)
            return jnp.mean((img - 0.25) ** 2)
        def it(i, acc):
            l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(h, lut, i)
            return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0]
        return jax.lax.fori_loop(0, K, it, 0.0)
    dt = timed(fb, hist_bm, tf, origin)
    note(f"fwd+bwd in-kernel pc={pc}: {dt*1e3:.2f} ms -> {Wd*Wd/dt/1e6:.1f} Mrays/s")

# also confirm hardware parity again with amortized chunks
img_k = pallas_hist_render(hist_bm, w, origin, tf, width=Wd, height=Wd)
dec = flex_block_stats(hist_lm, channels=(0,))[..., 0] / 255.0
img_m = pallas_slice_render_diff(dec, origin, tf, width=Wd, height=Wd,
                                 n_planes=n, wrt=("volume",))
dec32 = jnp.einsum("zbyx,b->zyx", hist_bm, w,
                   precision=jax.lax.Precision.HIGHEST)
img_m32 = pallas_slice_render_diff(dec32, origin, tf, width=Wd, height=Wd,
                                   n_planes=n, wrt=("volume",))
note(f"parity vs flex_block_stats decode: {float(jnp.max(jnp.abs(img_k-img_m))):.2e}")
note(f"parity vs f32-exact decode:       {float(jnp.max(jnp.abs(img_k-img_m32))):.2e}")
note("done")
