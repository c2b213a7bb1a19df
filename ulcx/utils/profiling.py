"""JAX profiler hooks (SURVEY.md §5: the rebuild's tracing facility).

The reference's only observability is the tools' 0.5 s progress line
(reference tools/ulcEncodeTool.c:122-149); here we add on-demand device
profiling: pass ``-profile:DIR`` to either CLI tool (or use the context
manager from library code) to capture a TensorBoard-loadable trace of
the encode/decode dispatches.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Wrap a region in jax.profiler.trace when trace_dir is set."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
