"""Real 2-process distributed rendering test (CPU, local TCP coordinator)."""

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


def test_two_process_distributed_render(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    out = str(tmp_path / "img.npy")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i), out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outputs[i][-3000:]}"

    got = np.load(out)

    # single-host reference
    from vrdd_tpu.core.geometry import default_benchmark_inv_view
    from vrdd_tpu.core.transfer import default_transfer_function
    from vrdd_tpu.io.synthetic import gaussian_blob_volume
    from vrdd_tpu.march.scan import render_image
    from vrdd_tpu.models.renderer import stats_sample_fn
    from vrdd_tpu.utils.config import MarchConfig

    vol = gaussian_blob_volume((8, 8, 8), seed=11)
    stats = np.stack([vol, vol * 0.5, 1.0 - vol], axis=-1).astype(np.float32)
    want = np.asarray(
        render_image(
            stats_sample_fn(jnp.asarray(stats), 0),
            jnp.asarray(default_benchmark_inv_view()),
            16, 16,
            jnp.asarray(default_transfer_function()),
            0.1, 1.0, 0.0, 1.0,
            MarchConfig(max_steps=50, tstep=0.05),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
