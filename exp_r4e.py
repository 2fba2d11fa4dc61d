"""Batch E: attribute the in-kernel hist fwd cost (bandwidth vs overhead)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from vrdd_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
def note(m): print(m, file=sys.stderr, flush=True)

from vrdd_tpu.core.transfer import default_transfer_function
from vrdd_tpu.pallas.slice_kernel import pallas_hist_render, pallas_slice_render

n, Wd, K = 256, 512, 4
key = jax.random.PRNGKey(0)
tf = jnp.asarray(default_transfer_function())
origin = jnp.asarray([0.0, 0.0, 4.0], jnp.float32)

def timed(f, *a):
    float(f(*a)); t0 = time.perf_counter(); float(f(*a))
    return (time.perf_counter() - t0) / K

# baseline: sweep on a pre-decoded scalar volume (no decode at all)
vol = jax.block_until_ready(jax.random.uniform(key, (n, n, n), jnp.float32))
@jax.jit
def fwd_scalar(v, lut, o):
    def it(i, acc):
        img = pallas_slice_render(v * (1.0 + 1e-6 * i), o, lut,
                                  width=Wd, height=Wd, n_planes=n)
        return acc + jnp.sum(img)
    return jax.lax.fori_loop(0, K, it, 0.0)
dt = timed(fwd_scalar, vol, tf, origin)
note(f"baseline scalar-volume fwd: {dt*1e3:.2f} ms")

for B in (1, 4, 16):
    hist_bm = jax.block_until_ready(
        jax.random.uniform(key, (n, B, n, n), jnp.float32))
    w = jnp.asarray(np.full(B, 1.0 / B, np.float32))
    @jax.jit
    def fwd(h, lut, o, w=w):
        def it(i, acc):
            img = pallas_hist_render(h * (1.0 + 1e-6 * i), w, o, lut,
                                     width=Wd, height=Wd)
            return acc + jnp.sum(img)
        return jax.lax.fori_loop(0, K, it, 0.0)
    dt = timed(fwd, hist_bm, tf, origin)
    gb = n * B * n * n * 4 / 1e9
    note(f"hist fwd B={B}: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s stream)")

# bf16 histogram stream: half the bytes
B = 16
hist16 = jax.block_until_ready(
    jax.random.uniform(key, (n, B, n, n), jnp.float32).astype(jnp.bfloat16))
w = jnp.asarray(np.full(B, 1.0 / B, np.float32))
@jax.jit
def fwd_bf16(h, lut, o):
    def it(i, acc):
        img = pallas_hist_render(h * (1 + 1e-6 * i) if False else h, w, o,
                                 lut, width=Wd, height=Wd)
        return acc + jnp.sum(img) + 1e-9 * i
    return jax.lax.fori_loop(0, K, it, 0.0)
try:
    dt = timed(fwd_bf16, hist16, tf, origin)
    gb = n * B * n * n * 2 / 1e9
    note(f"hist fwd B=16 bf16: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s stream)")
except Exception as e:
    note(f"bf16 stream failed: {type(e).__name__}: {str(e)[:200]}")
note("done")
