from vrdd_tpu.pallas.slice_kernel import pallas_slice_render, pallas_supported  # noqa: F401
