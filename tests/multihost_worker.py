"""Worker script for the real 2-process distributed render test.

Launched by tests/test_multihost.py with argv:
    multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npy>

Each process owns 2 virtual CPU devices; the global mesh is
(bricks=2, rays=2) across 4 devices spanning both processes. Process 0 writes
its computed full image (gathered across hosts) to <out.npy>.
"""

import os
import sys

coordinator, num_procs, proc_id, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vrdd_tpu.core.geometry import default_benchmark_inv_view  # noqa: E402
from vrdd_tpu.core.transfer import default_transfer_function  # noqa: E402
from vrdd_tpu.io.synthetic import gaussian_blob_volume  # noqa: E402
from vrdd_tpu.parallel.bricks import distributed_render_image  # noqa: E402
from vrdd_tpu.parallel import multihost  # noqa: E402
from vrdd_tpu.utils.config import MarchConfig  # noqa: E402

assert len(jax.devices()) == 4, jax.devices()
mesh = multihost.global_mesh(bricks=2, rays=2)

vol = gaussian_blob_volume((8, 8, 8), seed=11)
stats = np.stack([vol, vol * 0.5, 1.0 - vol], axis=-1).astype(np.float32)
stats_g = multihost.make_global(stats, mesh, multihost.stats_volume_spec())

march = MarchConfig(max_steps=50, tstep=0.05)
img = distributed_render_image(
    stats_g,
    jnp.asarray(default_benchmark_inv_view()),
    jnp.asarray(default_transfer_function()),
    jnp.float32(0.1), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0),
    width=16, height=16, channel=0, march=march, mesh=mesh,
)
full = multihost.gather_image(img)
if proc_id == 0:
    np.save(out_path, full)
print(f"proc {proc_id} done", flush=True)
