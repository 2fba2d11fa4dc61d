"""Real multi-process distributed rendering tests (CPU, TCP coordinator).

Parametrized over 2 AND 4 processes on the same 8-device (bricks=4,
rays=2) mesh: with 2 processes the bricks axis crosses one process
boundary, with 4 every brick row owns its own process and all three halo
``ppermute`` edges cross boundaries (asserted structurally inside the
worker). The halo exchange, the sort-last ``all_gather``, and the
gradient transposes all ride the inter-process transport; results and
gradients are compared against single-process single-device references.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("num_procs", [2, 4])
def test_multi_process_distributed_render(tmp_path, num_procs):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    out = str(tmp_path / "result.npz")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(num_procs), str(i), out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(num_procs)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outputs[i][-3000:]}"

    got = np.load(out)

    from vrdd_tpu.core.geometry import default_benchmark_inv_view
    from vrdd_tpu.core.transfer import default_transfer_function
    from vrdd_tpu.io.synthetic import gaussian_blob_volume
    from vrdd_tpu.march.scan import render_image
    from vrdd_tpu.march.slice import slice_render_image
    from vrdd_tpu.models.renderer import stats_sample_fn
    from vrdd_tpu.utils.config import MarchConfig

    march = MarchConfig(max_steps=50, tstep=0.05)

    # scan-marcher bricks path vs the single-device ray marcher
    vol = gaussian_blob_volume((8, 8, 8), seed=11)
    stats = np.stack([vol, vol * 0.5, 1.0 - vol], axis=-1).astype(np.float32)
    want = np.asarray(
        render_image(
            stats_sample_fn(jnp.asarray(stats), 0),
            jnp.asarray(default_benchmark_inv_view()),
            16, 16,
            jnp.asarray(default_transfer_function()),
            0.1, 1.0, 0.0, 1.0,
            march,
        )
    )
    np.testing.assert_allclose(got["scan"], want, rtol=1e-4, atol=1e-5)

    # distributed sweep + gradients vs the single-device slice sweep's VJP
    # (cross-process halo taps in the pre-blend, ghost-layer cotangent
    # scatter-back, and the mesh-wide LUT-gradient psum all in the loop)
    import jax

    tf = jnp.asarray(default_transfer_function())
    vol2 = jnp.asarray(gaussian_blob_volume((8, 16, 16), seed=7))
    origin = jnp.asarray([0.0, 0.0, 4.0], dtype=jnp.float32)

    def ref_loss(v, lut):
        out = slice_render_image(
            v, origin, 16, 16, lut, 0.3, 1.0, 0.0, 1.0, march, n_planes=16
        )
        return jnp.mean((out - 0.25) ** 2), out

    (loss_w, img_w), (gv_w, gl_w) = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True
    )(vol2, tf)

    np.testing.assert_allclose(got["sweep"], np.asarray(img_w),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(got["loss"]), float(loss_w),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got["g_vol"], np.asarray(gv_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got["g_lut"], np.asarray(gl_w),
                               rtol=1e-4, atol=1e-6)
