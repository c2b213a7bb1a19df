"""Whole-block transform round trip under window switching.

Streams random audio through block_mdct_mdst -> block_imdct with random
window-control sequences and checks perfect reconstruction at the
codec's one-block transform delay (no quantization involved).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.codec.transform import (
    block_imdct,
    block_mdct_mdst,
    first_overlap,
    last_subblock_size,
)
from ulcx.utils.config import CodecConfig

N = 256
CFG = CodecConfig(rate_hz=44100, n_chan=1, block_size=N)


@functools.partial(jax.jit, static_argnums=())
def _enc_block(samples, wc, prev_ss, nxt):
    mdct, _ = block_mdct_mdst(samples, wc, prev_ss, nxt, CFG)
    return mdct


@functools.partial(jax.jit, static_argnums=())
def _dec_block(coefs, wc, lap, prev_ss):
    return block_imdct(coefs, wc, lap, prev_ss, CFG)


def _stream_roundtrip(wcs, rng):
    nblk = len(wcs) - 1
    x = rng.standard_normal((nblk + 1, 1, N)).astype(np.float32)
    x[0] = 0.0  # stream starts from silence like the codec's state init

    # encode: call t codes block x[t-1] from [x[t-1], x[t]]
    coefs = []
    prev_ss = jnp.int32(N)
    for t in range(nblk):
        samples = jnp.concatenate(
            [jnp.asarray(x[t]), jnp.asarray(x[t + 1])], axis=-1
        )
        # careful: at call t we hold [x[t], x[t+1]] and code x[t] with wc[t]
        nxt = first_overlap(jnp.int32(wcs[t + 1]), N)
        coefs.append(_enc_block(samples, jnp.int32(wcs[t]), prev_ss, nxt))
        prev_ss = last_subblock_size(jnp.int32(wcs[t]), N)

    # decode
    lap = jnp.zeros((1, N // 2), jnp.float32)
    prev_ss = jnp.int32(0)
    outs = []
    for t in range(nblk):
        out, lap, prev_ss = _dec_block(coefs[t], jnp.int32(wcs[t]), lap, prev_ss)
        outs.append(np.asarray(out))

    got = np.concatenate(outs, axis=-1)[0]
    want = x[:nblk, 0].reshape(-1)
    # first decoded block has no history: skip it
    err = np.abs(got[N:] - want[N:]).max()
    assert err < 1e-4, (wcs, err)


def test_roundtrip_full_overlap(rng):
    _stream_roundtrip([0x10] * 8, rng)


def test_roundtrip_overlap_scaling(rng):
    _stream_roundtrip([0x10, 0x13, 0x10, 0x17, 0x11, 0x10, 0x10], rng)


def test_roundtrip_decimated(rng):
    # patterns: N/2 pair, N/4 positions, N/8 positions
    wcs = [0x10, 0x28, 0x10, 0x59, 0x10, 0x8A, 0xFB, 0x10, 0x10]
    _stream_roundtrip(wcs, rng)


def test_roundtrip_random(rng):
    for trial in range(4):
        wcs = []
        for _ in range(10):
            pat = rng.integers(1, 16)
            scale = rng.integers(0, 4)
            wc = (int(pat) << 4) | (0x8 if pat != 1 else 0) | int(scale)
            wcs.append(wc)
        _stream_roundtrip(wcs, rng)
