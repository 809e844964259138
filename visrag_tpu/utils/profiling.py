"""Profiling: jax.profiler trace capture + analytic MFU.

The reference's tracing is codetiming wall-clocks + FlopsCounter MFU
(verl/utils/py_functional.py:123, flops_counter.py:56-133). Here the
device-side story is a real XLA trace: `trace(logdir)` captures a
TensorBoard-viewable profile (op-level timeline, HBM traffic, fusion
boundaries); Timers in utils.tracker cover host phases; utils.flops covers
analytic MFU.

Usage:
    with profiling.trace("/tmp/profile"):
        out = step_fn(...)
        jax.block_until_ready(out)   # fetch under the axon relay!
or set VISRAG_PROFILE_DIR=<dir> and call maybe_trace() around a hot region
(bench.py wires this for the headline benchmark).
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    import jax

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir,
                            create_perfetto_link=create_perfetto_link):
        yield


@contextlib.contextmanager
def maybe_trace(env: str = "VISRAG_PROFILE_DIR") -> Iterator[Optional[str]]:
    """Trace only when the env var names a directory; yields it (or None)."""
    logdir = os.environ.get(env)
    if not logdir:
        yield None
        return
    with trace(logdir):
        yield logdir


def annotate(name: str):
    """Named region for the trace timeline (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
