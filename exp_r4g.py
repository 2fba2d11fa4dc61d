"""Batch G: fair comparison — perturb density (scalar), not the 1 GB hist."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from vrdd_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
def note(m): print(m, file=sys.stderr, flush=True)

from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.ops.histogram import flex_block_stats
from vrdd_tpu.pallas.slice_vjp import (
    pallas_hist_render_diff, pallas_slice_render_diff)

n, Wd, B, K = 256, 512, 16, 4
key = jax.random.PRNGKey(0)
hist_lm = jax.nn.softmax(2.0 * jax.random.normal(key, (n, n, n, B)), axis=-1)
hist_bm32 = jnp.transpose(hist_lm, (0, 3, 1, 2))
hist_bm16 = jax.block_until_ready(hist_bm32.astype(jnp.bfloat16))
hist_bm32 = jax.block_until_ready(hist_bm32)
hist_lm = jax.block_until_ready(hist_lm)
w = jnp.asarray((np.arange(B) + 0.5) / B, jnp.float32)
tf = jnp.asarray(default_transfer_function())
origin = jnp.asarray([0.0, 0.0, 4.0], jnp.float32)

def timed(f, *a):
    float(f(*a)); t0 = time.perf_counter(); float(f(*a))
    return (time.perf_counter() - t0) / K

@jax.jit
def fb_ik(h, lut, o):
    def loss(h, lut, i):
        img = pallas_hist_render_diff(
            h, w, o, lut, density=0.05 * (1.0 + 1e-6 * i),
            width=Wd, height=Wd, wrt=("hist", "lut"))
        return jnp.mean((img - 0.25) ** 2)
    def it(i, acc):
        l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(h, lut, i)
        return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, K, it, 0.0)

dt = timed(fb_ik, hist_bm32, tf, origin)
note(f"fwd+bwd in-kernel f32 (density-perturbed): {dt*1e3:.2f} ms -> {Wd*Wd/dt/1e6:.1f} Mrays/s")
dt = timed(fb_ik, hist_bm16, tf, origin)
note(f"fwd+bwd in-kernel bf16 (density-perturbed): {dt*1e3:.2f} ms -> {Wd*Wd/dt/1e6:.1f} Mrays/s")

@jax.jit
def fb_mat(h, lut, o):
    def loss(h, lut, i):
        vol = flex_block_stats(h, channels=(0,))[..., 0] / 255.0
        img = pallas_slice_render_diff(
            vol, o, lut, density=0.05 * (1.0 + 1e-6 * i),
            width=Wd, height=Wd, n_planes=n, wrt=("volume", "lut"))
        return jnp.mean((img - 0.25) ** 2)
    def it(i, acc):
        l, (gh, gt) = jax.value_and_grad(loss, argnums=(0, 1))(h, lut, i)
        return acc + l + jnp.sum(gt) + gh[0, 0, 0, 0]
    return jax.lax.fori_loop(0, K, it, 0.0)
dt = timed(fb_mat, hist_lm, tf, origin)
note(f"fwd+bwd materialized (density-perturbed): {dt*1e3:.2f} ms -> {Wd*Wd/dt/1e6:.1f} Mrays/s")
note("done")
