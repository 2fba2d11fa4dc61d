from vrdd_tpu.march.scan import march_rays, render_image  # noqa: F401
from vrdd_tpu.march.shearwarp import shearwarp_render_image  # noqa: F401
from vrdd_tpu.march.slice import (  # noqa: F401
    slice_render_image,
    sweep_preblended_planes_xla,
    sweep_slope_space,
)
from vrdd_tpu.march.streaming import streaming_decode_render  # noqa: F401
