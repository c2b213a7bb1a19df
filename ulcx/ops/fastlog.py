"""Replica of the reference's FastLog approximation.

The coefficient importance ordering — and therefore which coefficients
the rate control keeps — depends on the *exact* polynomial of the
reference's FastLog (reference libulc/ulcHelper.h:124-136), so we
reproduce it: decompose x into mantissa m in [1,2) and exponent t via
integer bit twiddling, then evaluate a fixed 4th-order polynomial in m
plus t*ln(2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def fast_log(x: jnp.ndarray) -> jnp.ndarray:
    """ln(x) approximation matching the reference (valid for x > 0, finite)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    bits = lax.bitcast_convert_type(x, jnp.uint32)
    ex = bits >> 23
    t = ex.astype(jnp.int32) - 127
    mbits = jnp.uint32(127 << 23) | (bits & jnp.uint32((1 << 23) - 1))
    m = lax.bitcast_convert_type(mbits, jnp.float32)
    # 4th-order polynomial, coefficients exactly as in the reference
    # (hex float literals converted to their f32 decimal values).
    p = jnp.float32(-0.056570851)
    p = jnp.float32(0.44717955) + p * m
    p = jnp.float32(-1.4699568) + p * m
    p = jnp.float32(2.8212026) + p * m
    p = jnp.float32(-1.7417939) + p * m
    return p + jnp.float32(0.6931471806) * t.astype(jnp.float32)
