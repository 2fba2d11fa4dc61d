from vrdd_tpu.io.synthetic import (  # noqa: F401
    block_histograms_from_scalar,
    gaussian_blob_volume,
    random_histogram_volume,
    synthetic_fractal_volume,
)
