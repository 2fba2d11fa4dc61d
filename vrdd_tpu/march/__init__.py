from vrdd_tpu.march.scan import march_rays, render_image  # noqa: F401
