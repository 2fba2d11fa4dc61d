"""Profiling helpers (jax.profiler integration).

Replaces the reference's cudaEvent/StopWatch instrumentation with proper
device traces viewable in TensorBoard/Perfetto, plus the wall-clock
StageTimer (vrdd_tpu.utils.timing) for coarse stage accounting.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/vrdd_trace") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block.

    View with ``tensorboard --logdir <log_dir>`` or load the .json.gz into
    Perfetto. Annotate hot regions inside the block with
    :func:`jax.profiler.TraceAnnotation`.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate("decode"): ...``."""
    return jax.profiler.TraceAnnotation(name)


def enable_compilation_cache(path: str = "~/.cache/vrdd_tpu_xla") -> None:
    """Enable JAX's persistent on-disk compilation cache.

    On remote-attached TPUs, XLA compiles go through a network helper whose
    latency is highly variable (observed 1 s to ~8 min for near-identical
    small render graphs). The persistent cache makes every compile a
    once-per-machine cost. Called by the CLI and bench entry points; library
    users can call it explicitly.
    """
    import os

    # VRDD_XLA_CACHE_DIR overrides (e.g. point at an empty dir to measure
    # cold-cache behavior without invalidating the real cache)
    p = os.path.expanduser(os.environ.get("VRDD_XLA_CACHE_DIR", path))
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
