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
