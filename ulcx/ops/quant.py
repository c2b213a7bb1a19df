"""Companded (non-linear) coefficient quantization.

The codec quantizes x -> q with decode q*|q| (signed square), i.e. the
companding curve is sqrt. Optimal rounding is
``q = floor(0.5 + sqrt(v - 0.25))`` for v >= 0.5 else 0 (derived in
reference libulc/ulcHelper.h:50-91); vectorized here over arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def companded_quantize_unsigned(v: jnp.ndarray) -> jnp.ndarray:
    """Round v (>=0, pre-scaled by the quantizer) to its companded code."""
    v = jnp.asarray(v, jnp.float32)
    q = jnp.floor(jnp.float32(0.5) + jnp.sqrt(jnp.maximum(v - jnp.float32(0.25), 0.0)))
    return jnp.where(v >= 0.5, q, 0.0).astype(jnp.int32)


def companded_quantize(v: jnp.ndarray) -> jnp.ndarray:
    q = companded_quantize_unsigned(jnp.abs(v))
    return jnp.where(v < 0, -q, q)


def companded_quantize_coef(v: jnp.ndarray, limit: int) -> jnp.ndarray:
    """Signed quantize with magnitude clamped to ``limit`` (7 for coefs)."""
    q = jnp.minimum(companded_quantize_unsigned(jnp.abs(v)), limit)
    return jnp.where(v < 0, -q, q)


def expand_quantizer(qi: jnp.ndarray) -> jnp.ndarray:
    """qi (0..28, pre-bias) -> 2^-(5+qi) via the reference's exact
    integer formula ``((1<<26) >> qi) * 2^-31`` (reference
    ulcDecoder.c:96-98), including the qi > 26 -> 0 corner."""
    qi = jnp.asarray(qi, jnp.int32)
    m = jnp.where(qi < 27, (jnp.int32(1) << 26) >> jnp.clip(qi, 0, 26), 0)
    return m.astype(jnp.float32) * jnp.float32(2.0**-31)
