from vrdd_tpu.utils.config import (  # noqa: F401
    CameraConfig,
    MarchConfig,
    QueryMethod,
    RenderConfig,
    TransferFunctionConfig,
)
from vrdd_tpu.utils.timing import StageTimer  # noqa: F401
