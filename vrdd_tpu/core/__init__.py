from vrdd_tpu.core.geometry import (  # noqa: F401
    camera_rays,
    default_benchmark_inv_view,
    intersect_box,
    inv_view_from_rotation_translation,
)
from vrdd_tpu.core.sampling import (  # noqa: F401
    sample_linear_1d,
    sample_nearest_3d,
    sample_trilinear_3d,
    sample_trilinear_3d_unnormalized,
)
from vrdd_tpu.core.transfer import (  # noqa: F401
    apply_transfer_function,
    default_transfer_function,
    grayscale_ramp,
)
from vrdd_tpu.core.image import rgba_to_uint8, pack_abgr  # noqa: F401
