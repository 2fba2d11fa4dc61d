from vrdd_tpu.ops.histogram import (  # noqa: F401
    flex_block_stats,
    fractal_block_stats,
    histogram_entropy,
    raw_block_stats,
)
from vrdd_tpu.ops.fractal import fractal_decode, fractal_decode_batch  # noqa: F401
from vrdd_tpu.ops.gaussian import gaussian_stats  # noqa: F401
from vrdd_tpu.ops.sparse import densify_sparse_histograms  # noqa: F401
