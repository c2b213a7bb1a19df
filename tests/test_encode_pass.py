"""Vectorized encode pass vs the sequential Python oracle, byte-exact."""

import numpy as np
import jax
import jax.numpy as jnp

import pyref
from ulcx.analysis.block import AnalyzedBlock
from ulcx.bitstream.encode import (
    encode_pass_materialize,
    encode_pass_size,
    prepare_block,
)
from ulcx.utils.config import CodecConfig

N = 256
C = 2
CFG = CodecConfig(rate_hz=44100, n_chan=C, block_size=N)


def synth_block(rng, wc, sparsity=0.5, scale=1.0):
    p = C * N
    coef = rng.laplace(size=p).astype(np.float32) * scale
    env = np.exp(-np.linspace(0, 6, N)).astype(np.float32)
    coef *= np.tile(env, C)
    coef[rng.random(p) < sparsity] *= 1e-4
    coef[rng.random(p) < 0.05] = 0.0
    # importance in f32 so the rank the oracle consumes and the keys
    # the kernel thresholds on agree bit-for-bit (ties included)
    imp = np.where(coef != 0, np.log(np.abs(coef) + 1e-30), -np.inf)
    imp = (imp + rng.normal(0, 1.0, p)).astype(np.float32)
    imp[rng.random(p) < 0.02] = 0.0  # exact ties incl. ±0.0
    imp[rng.random(p) < 0.01] = -0.0
    order = np.argsort(-imp.astype(np.float64), kind="stable")
    rank = np.empty(p, np.int64)
    rank[order] = np.arange(p)

    y = rng.uniform(-12, -3, p // 2).astype(np.float32)
    w = np.exp(0.5 * y).astype(np.float32)
    noise = np.empty(p, np.float32)
    noise[0::2] = w
    noise[1::2] = w * (y + np.float32(np.log(2.0)))

    return AnalyzedBlock(
        window_ctrl=jnp.int32(wc),
        mdct=jnp.asarray(coef.reshape(C, N)),
        noise=jnp.asarray(noise.reshape(C, N)),
        importance=jnp.asarray(imp.reshape(C, N)),
        complexity=jnp.float32(0.5),
        n_nz=jnp.int32(int((coef != 0).sum())),
    ), coef, noise, rank


SIZE_F = jax.jit(lambda bd, k: encode_pass_size(bd, k, "segment"))
MAT_F = jax.jit(lambda bd, k: encode_pass_materialize(bd, k, 2 * C * N, "segment"))
SIZE_G = jax.jit(lambda bd, k: encode_pass_size(bd, k, "gap"))
MAT_G = jax.jit(lambda bd, k: encode_pass_materialize(bd, k, 2 * C * N, "gap"))


def _compare(rng, wc, n_outs, sparsity=0.5, scale=1.0, window="segment"):
    blk, coef, noise, rank = synth_block(rng, wc, sparsity, scale)
    bd = prepare_block(blk, CFG)
    for k in n_outs:
        want_bits, want_bytes = pyref.encode_pass(
            coef, noise, rank, k, wc, N, C, noise_window=window
        )
        size_f, mat_f = (SIZE_F, MAT_F) if window == "segment" else (SIZE_G, MAT_G)
        got_bits = int(size_f(bd, jnp.int32(k)))
        assert got_bits == want_bits, (wc, k, got_bits, want_bits)
        got_bits2, got_by = mat_f(bd, jnp.int32(k))
        got_by = bytes(np.asarray(got_by)[: len(want_bytes)].tobytes())
        assert int(got_bits2) == want_bits
        # the stream must parse cleanly in the decoder mirror
        dec = pyref.decode_block(want_bytes, wc, N, C, pyref.Xorshift())
        assert dec is not None, (wc, k)
        assert (dec[2] + 7) & ~7 == want_bits
        if got_by != want_bytes:
            # Sequential f32 sums vs prefix-sum differences can flip a
            # noise amplitude/decay nybble by one step; accept iff the
            # decoded streams agree within one companded quantizer step.
            dec2 = pyref.decode_block(got_by, wc, N, C, pyref.Xorshift())
            assert dec2 is not None, (wc, k)
            a, b = dec[0], dec2[0]
            exact = a == b
            frac_diff = 1.0 - exact.mean()
            assert frac_diff < 0.30, (wc, k, frac_diff)
            da, db = np.abs(a[~exact]), np.abs(b[~exact])
            ratio = np.maximum(da, db) / np.maximum(np.minimum(da, db), 1e-12)
            assert (np.abs(a[~exact] - b[~exact]) < 1e-7).all() or ratio.max() < 4.5, (
                wc,
                k,
                float(ratio.max()),
            )


def test_full_block_sizes(rng):
    _compare(rng, 0x10, [0, 1, 7, 40, 130, 300, 512])


def test_full_block_sizes_gap_window(rng):
    # the C-exact noise-analysis window path
    _compare(rng, 0x10, [7, 130, 300], window="gap")


def test_decimated_patterns(rng):
    for wc in (0x28, 0x3A, 0x59, 0x8B, 0xFB, 0x6C):
        _compare(rng, wc, [25, 200, 512])


def test_sparse_and_dense(rng):
    _compare(rng, 0x10, [64, 256], sparsity=0.95)
    _compare(rng, 0x10, [64, 256], sparsity=0.05)
    _compare(rng, 0x10, [128], scale=1e-6)  # exercises q=31 / collapse paths
    _compare(rng, 0x10, [128], scale=30.0)  # exercises q=5 clamp


def test_all_zero_block(rng):
    blk, coef, noise, rank = synth_block(rng, 0x10)
    coef[:] = 0
    blk = blk._replace(mdct=jnp.zeros((C, N), jnp.float32))
    bd = prepare_block(blk, CFG)
    want_bits, want_bytes = pyref.encode_pass(
        coef, noise, rank, 100, 0x10, N, C, noise_window="segment"
    )
    got = int(SIZE_F(bd, jnp.int32(100)))
    assert got == want_bits
