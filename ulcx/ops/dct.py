"""Type-IV DCT/DST on TPU.

The lapped transforms at the heart of the codec (MDCT/MDST forward,
IMDCT inverse; reference FormatSpecs.md:148-155) reduce, after
fold/unfold, to length-N DCT-IV / DST-IV:

    dct4(x)[k] = sum_n x[n] * cos(pi/N * (n+1/2) * (k+1/2))
    dst4(x)[k] = sum_n x[n] * sin(pi/N * (n+1/2) * (k+1/2))

Two backends:

- **matmul** — the transform as one batched [.., N] @ [N, N] product.
  On TPU this rides the MXU systolic array and is both the fastest and
  the most accurate option for the codec's common block sizes (<= 4k):
  one N=2048 basis matrix is 16 MiB of HBM, and XLA tiles it through
  VMEM across the whole batch of streams x channels.
- **fft** — O(N log N) via a single complex FFT of length 2N with
  pre/post twiddles; used for very large blocks (up to the reference's
  32768 limit) where an N^2 matrix would not be sensible.

Both are exact (float32) transforms; the choice is performance-only.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Basis matrices (host-side, cached; computed in float64 then cast).


@lru_cache(maxsize=32)
def _dct4_matrix(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    arg = np.pi / n * np.outer(k + 0.5, k + 0.5)
    return np.cos(arg).astype(np.float32)


@lru_cache(maxsize=32)
def _dst4_matrix(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    arg = np.pi / n * np.outer(k + 0.5, k + 0.5)
    return np.sin(arg).astype(np.float32)


@lru_cache(maxsize=32)
def _fft_twiddles(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(pre, post) twiddles for the 2N-FFT DCT-IV/DST-IV algorithm.

    c[k] = sum_n x[n] exp(-i pi (n+1/2)(k+1/2) / N)
         = post[k] * FFT_2N(pre * x, zero-padded)[k]
    with pre[n] = exp(-i pi n / (2N)), post[k] = exp(-i pi (k/2 + 1/4)/N).
    Then dct4 = Re(c), dst4 = -Im(c).
    """
    nn = np.arange(n, dtype=np.float64)
    pre = np.exp(-1j * np.pi * nn / (2.0 * n)).astype(np.complex64)
    post = np.exp(-1j * np.pi * (nn / 2.0 + 0.25) / n).astype(np.complex64)
    return pre, post


# ---------------------------------------------------------------------------
# Public transforms. All operate on the last axis; any leading batch dims.


# Transform matmul precision: HIGHEST = 6-pass bf16 (f32-equivalent),
# HIGH = 3-pass bf16 (~2^-21 relative error — far below the codec's
# 3-bit companded quantization). Env-tunable for A/B on hardware; CPU
# backends ignore precision flags entirely (tests unaffected).
import os as _os

_MM_PRECISION = {
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}[_os.environ.get("ULCX_TRANSFORM_PRECISION", "highest").lower()]


def dct4_matmul(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-1]
    m = jnp.asarray(_dct4_matrix(n))
    return jnp.matmul(x, m, precision=_MM_PRECISION)


def dst4_matmul(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-1]
    m = jnp.asarray(_dst4_matrix(n))
    return jnp.matmul(x, m, precision=_MM_PRECISION)


def _c4_fft(x: jnp.ndarray) -> jnp.ndarray:
    """Complex c[k] = dct4(x)[k] - i*dst4(x)[k] via a 2N FFT."""
    n = x.shape[-1]
    pre, post = _fft_twiddles(n)
    z = x.astype(jnp.complex64) * jnp.asarray(pre)
    z = jnp.concatenate([z, jnp.zeros_like(z)], axis=-1)
    f = jnp.fft.fft(z, axis=-1)[..., :n]
    return f * jnp.asarray(post)


def dct4_fft(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.real(_c4_fft(x))


def dst4_fft(x: jnp.ndarray) -> jnp.ndarray:
    return -jnp.imag(_c4_fft(x))


def dct4_dst4_fft(x_c: jnp.ndarray, x_s: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """dct4(x_c) and dst4(x_s) sharing one batched FFT."""
    c = _c4_fft(jnp.stack([x_c, x_s], axis=0))
    return jnp.real(c[0]), -jnp.imag(c[1])


def dct4(x: jnp.ndarray, backend: str = "matmul") -> jnp.ndarray:
    return dct4_matmul(x) if backend == "matmul" else dct4_fft(x)


def dst4(x: jnp.ndarray, backend: str = "matmul") -> jnp.ndarray:
    return dst4_matmul(x) if backend == "matmul" else dst4_fft(x)
