"""Unit tests for the core numeric ops (DCT-IV/DST-IV, FastLog, quantizers)."""

import numpy as np
import jax.numpy as jnp

from ulcx.ops import dct4, dst4, fast_log
from ulcx.ops.dct import (
    dct4_fact,
    dct4_fft,
    dct4_matmul,
    dst4_fact,
    dst4_fft,
    dst4_matmul,
)
from ulcx.ops.quant import (
    companded_quantize,
    companded_quantize_coef,
    companded_quantize_unsigned,
    expand_quantizer,
)


def direct_dct4(x):
    n = x.shape[-1]
    k = np.arange(n)
    m = np.cos(np.pi / n * np.outer(k + 0.5, k + 0.5))
    return x @ m


def direct_dst4(x):
    n = x.shape[-1]
    k = np.arange(n)
    m = np.sin(np.pi / n * np.outer(k + 0.5, k + 0.5))
    return x @ m


def test_dct4_backends_match_direct(rng):
    for n in (16, 64, 256, 512):
        x = rng.standard_normal((3, n))
        ref = direct_dct4(x)
        got_mm = np.asarray(dct4_matmul(jnp.asarray(x, jnp.float32)))
        got_fft = np.asarray(dct4_fft(jnp.asarray(x, jnp.float32)))
        got_fac = np.asarray(dct4_fact(jnp.asarray(x, jnp.float32)))
        scale = np.abs(ref).max()
        assert np.abs(got_mm - ref).max() / scale < 2e-5, n
        assert np.abs(got_fft - ref).max() / scale < 2e-5, n
        assert np.abs(got_fac - ref).max() / scale < 2e-5, n


def test_dst4_backends_match_direct(rng):
    for n in (16, 256):
        x = rng.standard_normal((2, n))
        ref = direct_dst4(x)
        got_mm = np.asarray(dst4_matmul(jnp.asarray(x, jnp.float32)))
        got_fft = np.asarray(dst4_fft(jnp.asarray(x, jnp.float32)))
        got_fac = np.asarray(dst4_fact(jnp.asarray(x, jnp.float32)))
        scale = np.abs(ref).max()
        assert np.abs(got_mm - ref).max() / scale < 2e-5, n
        assert np.abs(got_fft - ref).max() / scale < 2e-5, n
        assert np.abs(got_fac - ref).max() / scale < 2e-5, n


def test_dct4_dst4_pair_fused(rng):
    """The stacked pair core matches the separate fact transforms."""
    from ulcx.ops.dct import dct4_dst4

    xc = rng.standard_normal((2, 512)).astype(np.float32)
    xs = rng.standard_normal((2, 512)).astype(np.float32)
    for be in ("matmul", "fft", "fact"):
        c, s = dct4_dst4(jnp.asarray(xc), jnp.asarray(xs), be)
        rc = direct_dct4(xc)
        rs = direct_dst4(xs)
        assert np.abs(np.asarray(c) - rc).max() / np.abs(rc).max() < 2e-5, be
        assert np.abs(np.asarray(s) - rs).max() / np.abs(rs).max() < 2e-5, be


def test_dct4_fact_large_n(rng):
    """Factorized backend at the sizes it actually serves in "auto"
    mode (above matmul_max_n): relative error well below the codec's
    3-bit companded quantization."""
    for n in (4096, 8192):
        x = rng.standard_normal((2, n)).astype(np.float32)
        ref = np.asarray(dct4_matmul(jnp.asarray(x)))
        got = np.asarray(dct4_fact(jnp.asarray(x)))
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 2e-5, n
        refs = np.asarray(dst4_matmul(jnp.asarray(x)))
        gots = np.asarray(dst4_fact(jnp.asarray(x)))
        assert np.abs(gots - refs).max() / np.abs(refs).max() < 2e-5, n


def numpy_fastlog(x):
    """Direct transliteration of reference libulc/ulcHelper.h:128-136."""
    x = np.float32(x)
    bx = x.view(np.uint32)
    ex = bx >> 23
    t = ex.astype(np.int32) - 127
    bx = np.uint32(127 << 23) | (bx & np.uint32((1 << 23) - 1))
    m = bx.view(np.float32)
    p = np.float32(-1.7417939) + (
        np.float32(2.8212026)
        + (np.float32(-1.4699568) + (np.float32(0.44717955) - np.float32(0.056570851) * m) * m) * m
    ) * m
    return p + np.float32(0.6931471806) * t.astype(np.float32)


def test_fastlog_matches_reference_math(rng):
    x = np.concatenate(
        [
            np.float32(10.0) ** rng.uniform(-30, 30, 2000).astype(np.float32),
            np.float32([1.2e-38, 1.0, 2.0, 0.5, 4 / np.pi]),  # smallest normal+
        ]
    ).astype(np.float32)
    got = np.asarray(fast_log(jnp.asarray(x)))
    want = numpy_fastlog(x)
    # identical bit-twiddling; only FMA contraction differences possible
    assert np.abs(got - want).max() < 1e-5
    # and it should approximate ln reasonably
    assert np.abs(got - np.log(x.astype(np.float64))).max() < 2e-3


def test_companded_quantize():
    v = jnp.asarray([0.0, 0.2, 0.49, 0.5, 1.0, 2.0, 6.0, 6.3, 50.0], jnp.float32)
    got = np.asarray(companded_quantize_unsigned(v))
    # brute-force optimum: argmin over q of |q^2 - v|
    for vi, qi in zip(np.asarray(v), got):
        if vi < 0.5:
            assert qi == 0
        else:
            best = min(range(0, 20), key=lambda q: abs(q * q - vi))
            assert qi in (best, best + 1) and abs(qi * qi - vi) <= abs(best * best - vi) + 1e-4

    sv = jnp.asarray([-2.0, 2.0, -0.2], jnp.float32)
    assert np.asarray(companded_quantize(sv)).tolist() == [-1, 1, 0]
    big = jnp.asarray([100.0, -100.0], jnp.float32)
    assert np.asarray(companded_quantize_coef(big, 7)).tolist() == [7, -7]


def test_expand_quantizer():
    qi = jnp.arange(27)
    got = np.asarray(expand_quantizer(qi))
    want = 2.0 ** -(5.0 + np.arange(27))
    assert np.allclose(got, want, rtol=0, atol=0)


def test_ema_matmul_chunked_matches_sequential(rng):
    """Chunked two-stage EMA (scanutil.ema_matmul_chunked) is the exact
    recurrence x[n] = r*x[n-1] + (1-r)*v[n] split at chunk boundaries;
    it must match a sequential loop and the associative-scan form to
    f32 association tolerance (it replaces them for block_size > 2048
    in window_control._transient_filtering)."""
    import jax.numpy as jnp

    from ulcx.ops.scanutil import ema, ema_matmul_chunked

    def seq(v, r, init, reverse):
        v = v[..., ::-1] if reverse else v
        out = np.zeros_like(v)
        x = init.astype(np.float64).copy()
        for m in range(v.shape[-1]):
            x = r * x + (1 - r) * v[..., m]
            out[..., m] = x
        return out[..., ::-1] if reverse else out

    for n, chunk in [(4096, 1024), (8192, 2048)]:
        v = (rng.standard_normal((2, n)) ** 2).astype(np.float32)
        init = rng.uniform(0.0, 2.0, (2,)).astype(np.float32)
        for rate in [float(np.exp(-115.0 / 44100.0)), 0.999, 0.5]:
            for reverse in [False, True]:
                want = seq(v, rate, init, reverse)
                got = np.asarray(
                    ema_matmul_chunked(
                        jnp.asarray(v), rate, jnp.asarray(init),
                        reverse=reverse, chunk=chunk,
                    )
                )
                scan = np.asarray(
                    ema(jnp.asarray(v), rate, jnp.asarray(init), reverse=reverse)
                )
                scale = np.abs(want).max()
                assert np.abs(got - want).max() / scale < 3e-5, (n, rate, reverse)
                assert np.abs(got - scan).max() / scale < 3e-5, (n, rate, reverse)


def test_monotone_i32_matches_argsort_order():
    """monotone_i32 (ops/keys.py) must order EXACTLY like jax's float
    comparator: ±0.0 tied, all NaN payloads/signs collapsed to one key
    sorted last under the descending convention (kernel keep tests and
    the sorted-threshold fetch both assume this). This pins the jax
    argsort NaN-canonicalization behavior version-independently: if a
    jax upgrade changes NaN sort placement, this test fails before the
    kernel/scan bitstream parity can silently diverge."""
    from jax import lax

    from ulcx.ops.keys import monotone_i32

    rng = np.random.default_rng(13)
    flat = rng.standard_normal((8, 64)).astype(np.float32)
    flat[flat < -1.2] = -np.inf
    flat[np.abs(flat) < 0.05] = 0.0
    flat[0, :8] = flat[0, 8:16]  # exact duplicates
    flat[1, 0] = -0.0
    flat[1, 1] = 0.0
    flat[2, 3] = np.nan
    flat[2, 9] = -np.nan
    flat[3, :8] = np.frombuffer(
        np.uint32(0x7FC00001).tobytes(), dtype=np.float32
    )[0]
    flat[4, 60:] = np.frombuffer(
        np.uint32(0xFFC00001).tobytes(), dtype=np.float32
    )[0]
    flat[5, 0] = np.inf
    flat[5, 1] = np.nan
    flat[5, 2] = -np.inf

    fj = jnp.asarray(flat)
    key = monotone_i32(fj)
    # stable descending order via the key == argsort(-flat)
    iota = jnp.broadcast_to(jnp.arange(64), key.shape)
    _, order_k = lax.sort((~key, iota), dimension=1, num_keys=1)
    order_f = jnp.argsort(-fj, axis=-1)
    np.testing.assert_array_equal(np.asarray(order_k), np.asarray(order_f))
