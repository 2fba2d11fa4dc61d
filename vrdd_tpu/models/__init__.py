from vrdd_tpu.models.volumes import (  # noqa: F401
    FractalHistogramVolume,
    GaussianMomentVolume,
    RawHistogramVolume,
    ScalarVolume,
)
from vrdd_tpu.models.renderer import (  # noqa: F401
    DistributionRenderer,
    flex_sample_fn,
    interp_mean_sample_fn,
    scalar_sample_fn,
    stats_sample_fn,
)
