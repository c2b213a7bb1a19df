"""decode_stream_pipelined vs decode_stream: the batched single-stream
decoder (FSM-only scan + RNG jump-ahead + double-IMDCT lap chain) must
match the per-block scan decoder — bits and RNG integer state exactly,
PCM at float level (batched IMDCT accumulation differs by shape)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ulcx.codec.decoder import (
    DecoderCarry,
    decode_stream,
    decode_stream_pipelined,
)
from ulcx.codec.encoder import encode_stream, max_block_bytes
from ulcx.utils.config import CodecConfig

N = 256
CFG = CodecConfig(rate_hz=44100, n_chan=2, block_size=N)
T = 10


def _stream(rng):
    """Encode a transient-y signal at a low rate so the stream carries
    noise-fill + HF-ext records (RNG draws) and window switching."""
    tt = np.arange(T * N) / 44100.0
    x = 0.3 * np.sin(2 * np.pi * 800 * tt) + 0.03 * rng.standard_normal(T * N)
    x[3 * N : 3 * N + 80] += 0.8 * rng.standard_normal(80)
    x[7 * N : 7 * N + 40] += 0.7 * rng.standard_normal(40)
    blocks = np.stack([x, 0.7 * x]).reshape(2, T, N).transpose(1, 0, 2)
    out, _ = jax.jit(lambda b: encode_stream(b, CFG, "cbr", rate_kbps=48.0))(
        jnp.asarray(blocks.astype(np.float32))
    )
    sizes = np.asarray(out.size_bits)
    datas = np.asarray(out.data)
    raw = b"".join(datas[i, : sizes[i] // 8].tobytes() for i in range(T))
    pad = np.zeros(max_block_bytes(CFG) + 8, np.uint8)
    return jnp.asarray(np.concatenate([np.frombuffer(raw, np.uint8), pad]))


def test_pipelined_matches_scan(rng):
    sj = _stream(rng)
    win = max_block_bytes(CFG)

    pcm_s, bits_s, cor_s, (off_s, carry_s) = jax.jit(
        lambda s: decode_stream(s, T, win, CFG)
    )(sj)
    pcm_p, bits_p, cor_p, (off_p, carry_p) = jax.jit(
        lambda s: decode_stream_pipelined(s, T, win, CFG, interpret=True)
    )(sj)

    np.testing.assert_array_equal(np.asarray(bits_p), np.asarray(bits_s))
    np.testing.assert_array_equal(np.asarray(cor_p), np.asarray(cor_s))
    assert not np.asarray(cor_p).any()
    assert int(off_p) == int(off_s)
    # RNG jump-ahead must land on the exact sequential state
    assert int(np.asarray(carry_p.rng)) == int(np.asarray(carry_s.rng))
    assert int(carry_p.prev_last_ss) == int(carry_s.prev_last_ss)
    ref = np.asarray(pcm_s, np.float64)
    err = np.asarray(pcm_p, np.float64) - ref
    rel = np.sqrt(err.var() / max(ref.var(), 1e-30))
    assert rel < 1e-5, rel
    np.testing.assert_allclose(
        np.asarray(carry_p.lap), np.asarray(carry_s.lap), atol=1e-5
    )


def test_pipelined_chunked_continuation(rng):
    """Carry (offset, lap, prev_ss, rng) across two pipelined calls ==
    one call; draws in chunk 1 must seed chunk 2 exactly."""
    sj = _stream(rng)
    win = max_block_bytes(CFG)

    pcm_all, bits_all, _, _ = jax.jit(
        lambda s: decode_stream_pipelined(s, T, win, CFG, interpret=True)
    )(sj)
    f = jax.jit(
        lambda s, o, c: decode_stream_pipelined(
            s, T // 2, win, CFG, offset=o, carry=c, interpret=True
        )
    )
    pcm_a, bits_a, _, (off, carry) = f(sj, jnp.int32(0), DecoderCarry.init(CFG))
    pcm_b, bits_b, _, _ = f(sj, off, carry)

    np.testing.assert_array_equal(
        np.concatenate([np.asarray(bits_a), np.asarray(bits_b)]),
        np.asarray(bits_all),
    )
    got = np.concatenate([np.asarray(pcm_a), np.asarray(pcm_b)])
    np.testing.assert_allclose(got, np.asarray(pcm_all), atol=1e-5)


def test_pipelined_corrupt_flagging(rng):
    """Garbage bytes mid-stream: pipelined flags corrupt where the scan
    decoder does (first corrupt block; later blocks are don't-care —
    the tools abort at the first corrupt block)."""
    sj = np.asarray(_stream(rng)).copy()
    sj[20:40] = 0xFF  # clobber inside block 0/1
    sj = jnp.asarray(sj)
    win = max_block_bytes(CFG)
    _, _, cor_s, _ = jax.jit(lambda s: decode_stream(s, T, win, CFG))(sj)
    _, _, cor_p, _ = jax.jit(
        lambda s: decode_stream_pipelined(s, T, win, CFG, interpret=True)
    )(sj)
    cs, cp = np.asarray(cor_s), np.asarray(cor_p)
    first = cs.argmax() if cs.any() else T
    np.testing.assert_array_equal(cp[: first + 1], cs[: first + 1])


@pytest.mark.parametrize("delta", [1, 2, 3])
def test_pipelined_unaligned_window(rng, delta):
    """window_bytes % 4 != 0 must work: the word-slab slice rounds up
    so the worst-case phase slice byt[3:3+window_bytes] stays in
    bounds (ADVICE r4: the old n_words clamped the slice short for
    window_bytes % 4 in {2, 3} and failed at trace time)."""
    sj = _stream(rng)
    win = max_block_bytes(CFG)

    pcm_s, bits_s, cor_s, _ = jax.jit(
        lambda s: decode_stream(s, T, win, CFG)
    )(sj)
    pcm_p, bits_p, cor_p, _ = jax.jit(
        lambda s: decode_stream_pipelined(
            s, T, win + delta, CFG, interpret=True
        )
    )(sj)
    np.testing.assert_array_equal(np.asarray(bits_p), np.asarray(bits_s))
    assert not np.asarray(cor_p).any()
    ref = np.asarray(pcm_s, np.float64)
    err = np.asarray(pcm_p, np.float64) - ref
    assert np.sqrt(err.var() / max(ref.var(), 1e-30)) < 1e-5
