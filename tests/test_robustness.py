"""Corrupt-stream handling (the reference's only runtime failure mode:
run overflow -> ULC_DecodeBlock returns 0; reference ulcDecoder.c:127)."""

import numpy as np
import jax
import jax.numpy as jnp

import pyref
from ulcx.codec.decoder import DecoderCarry, decode_block
from ulcx.utils.config import CodecConfig

N = 256
C = 2
CFG = CodecConfig(rate_hz=44100, n_chan=C, block_size=N)


def test_corrupt_stream_flags(rng):
    # a zeros-run that overflows the segment: header 0x10, quantizer 0,
    # then long-run 1h,Fh,Fh (288 zeros > 256 remaining)
    ny = [0x0, 0x0, 0x1, 0xF, 0xF]
    by = bytearray((len(ny) + 1) // 2)
    for i, x in enumerate(ny):
        by[i // 2] |= (x & 0xF) << (4 * (i % 2))
    window = np.zeros(512, np.uint8)
    window[: len(by)] = np.frombuffer(bytes(by), np.uint8)

    # oracle agrees it's corrupt
    assert pyref.decode_block(bytes(window.tobytes()), 0, N, C, pyref.Xorshift()) is None

    pcm, carry, bits, corrupt = jax.jit(
        lambda w, c: decode_block(w, c, CFG)
    )(jnp.asarray(window), DecoderCarry.init(CFG))
    assert bool(corrupt)


def test_truncated_stream_flags(rng):
    # all-0xFF garbage parses as endless quantizer changes and never
    # completes -> flagged corrupt (the scan runs out of nybbles)
    window = np.full(64, 0xEE, np.uint8)
    pcm, carry, bits, corrupt = jax.jit(
        lambda w, c: decode_block(w, c, CFG)
    )(jnp.asarray(window), DecoderCarry.init(CFG))
    assert bool(corrupt)
