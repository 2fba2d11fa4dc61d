from vrdd_tpu.parallel.mesh import make_mesh  # noqa: F401
from vrdd_tpu.parallel.bricks import (  # noqa: F401
    distributed_render_image,
    shard_stats_volume,
)
from vrdd_tpu.parallel.train import make_tf_fit_step  # noqa: F401
