"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding logic (mesh, halo exchange, psum) is tested on a virtual
8-device CPU mesh per SURVEY.md §4. Note: the environment's sitecustomize
registers the 'axon' TPU plugin and pins ``jax_platforms`` via config (not just
env), so we must override through ``jax.config`` after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


def pytest_addoption(parser):
    parser.addoption(
        "--regen-golden",
        action="store_true",
        default=False,
        help="regenerate golden-image fixtures (tests/golden/*.ppm)",
    )
