"""Kernel-backed decoder vs the scan decoder (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.codec.decoder import decode_stream, decode_stream_batched
from ulcx.codec.encoder import encode_stream_batched, max_block_bytes
from ulcx.utils.config import CodecConfig

N = 256
C = 2
B = 8
T = 4
CFG = CodecConfig(rate_hz=44100, n_chan=C, block_size=N)


def test_fast_decode_matches_scan_decoder(rng):
    x = rng.standard_normal((B, T, C, N)).astype(np.float32) * 0.3
    x[:, 2, :, 40] += 1.0  # transients
    out, _ = jax.jit(
        lambda b: encode_stream_batched(b, CFG, "cbr", rate_kbps=160.0)
    )(jnp.asarray(x))
    sizes = np.asarray(out.size_bits)
    datas = np.asarray(out.data)
    win = max_block_bytes(CFG)
    streams = np.zeros((B, T * win + win + 64), np.uint8)
    for i in range(B):
        offs = 0
        for j in range(T):
            nb = int(sizes[i, j]) // 8
            streams[i, offs : offs + nb] = datas[i, j, :nb]
            offs += nb
    sj = jnp.asarray(streams)

    pcm_f, bits_f, cor_f = jax.jit(
        lambda s: decode_stream_batched(s, T, win, CFG, interpret=True)
    )(sj)
    assert not np.asarray(cor_f).any()

    for i in range(B):
        pcm_s, bits_s, cor_s, _ = jax.jit(
            lambda s: decode_stream(s, T, win, CFG)
        )(sj[i])
        assert not np.asarray(cor_s).any()
        assert (np.asarray(bits_f[i]) == np.asarray(bits_s)).all(), i
        d = np.abs(np.asarray(pcm_f[i]) - np.asarray(pcm_s)).max()
        assert d < 2e-5, (i, d)
