"""Parallel-prefix helpers for the codec's first-order recurrences.

The reference's transient detector is built from exponential-moving-
average smears over the block (reference
libulc/ulcEncoder_WindowControl.c:72-134): x[n] = r*x[n-1] + (1-r)*v[n].
A constant-coefficient first-order recurrence is associative, so on TPU
we evaluate it with ``lax.associative_scan`` (log-depth, fully
vectorized) instead of a sample loop.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def ema(v: jnp.ndarray, rate, init, axis: int = -1, reverse: bool = False):
    """Run x[n] = rate*x[n-1] + (1-rate)*v[n] along ``axis``.

    Returns the *post-update* envelope at every position (same shape as
    v). ``init`` is x[-1] and broadcasts against v with ``axis`` removed.
    """
    if axis < 0:
        axis += v.ndim
    r = jnp.asarray(rate, v.dtype)
    a = jnp.broadcast_to(r, v.shape)
    b = (1 - r) * v

    def combine(l, rgt):
        a1, b1 = l
        a2, b2 = rgt
        return a1 * a2, b1 * a2 + b2

    pa, pb = lax.associative_scan(combine, (a, b), axis=axis, reverse=reverse)
    init = jnp.asarray(init, v.dtype)
    if init.ndim:
        init = jnp.expand_dims(init, axis)
    return pb + pa * init
