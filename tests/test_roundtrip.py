"""End-to-end encode -> decode round trip at the stream level."""

import numpy as np
import jax
import jax.numpy as jnp

import pyref
from ulcx.codec.decoder import DecoderCarry, decode_block, decode_stream, inverse_ms
from ulcx.codec.encoder import encode_stream, max_block_bytes
from ulcx.codec.transform import block_imdct
from ulcx.utils.config import CodecConfig

N = 256
C = 2
CFG = CodecConfig(rate_hz=44100, n_chan=C, block_size=N)
T = 8


def make_input(rng):
    t = np.arange(T * N) / 44100.0
    left = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(T * N)
    right = 0.4 * np.sin(2 * np.pi * 554 * t) + 0.02 * rng.standard_normal(T * N)
    left[3 * N + 37] += 0.8  # transient
    x = np.stack([left, right]).astype(np.float32)  # [C, T*N]
    return x


def _encode(x, mode, **kw):
    blocks = jnp.asarray(x.reshape(C, T, N).transpose(1, 0, 2))
    f = jax.jit(lambda b: encode_stream(b, CFG, mode, **kw))
    out, _ = f(blocks)
    sizes = np.asarray(out.size_bits)
    datas = np.asarray(out.data)
    stream = b"".join(
        datas[i, : sizes[i] // 8].tobytes() for i in range(T)
    )
    return out, sizes, stream


def test_vbr_roundtrip_vs_pyref_and_snr(rng):
    x = make_input(rng)
    out, sizes, stream = _encode(x, "vbr", quality=90.0)
    assert (sizes % 8 == 0).all() and (sizes > 0).all()

    # --- decode with the python oracle, then with the jax decoder
    rng_ref = pyref.Xorshift()
    offset = 0
    ref_coefs = []
    ref_bits = []
    for i in range(T):
        dec = pyref.decode_block(stream[offset:], 0, N, C, rng_ref)
        assert dec is not None, i
        coefs, wc, bits = dec
        ref_coefs.append(coefs)
        ref_bits.append(bits)
        offset += (bits + 7) // 8
        assert (bits + 7) // 8 == sizes[i] // 8, (i, bits, sizes[i])

    pad = np.zeros(max_block_bytes(CFG) + 8, np.uint8)
    sj = jnp.asarray(np.concatenate([np.frombuffer(stream, np.uint8), pad]))
    dec_f = jax.jit(
        lambda s: decode_stream(s, T, max_block_bytes(CFG), CFG)
    )
    pcm, bits_j, corrupt, _ = dec_f(sj)
    assert not np.asarray(corrupt).any()
    assert [int(b) for b in np.asarray(bits_j)] == ref_bits

    # jax-decoded PCM must equal pyref coefs pushed through the same IMDCT
    carry_lap = jnp.zeros((C, N // 2), jnp.float32)
    prev_ss = jnp.int32(0)
    imdct_f = jax.jit(lambda cf, wc, lap, ss: block_imdct(cf, wc, lap, ss, CFG))
    for i in range(T):
        # recover wc from stream
        b0 = stream if i == 0 else None
        # reparse wc from the oracle decode
        coefs = jnp.asarray(ref_coefs[i])
        wc = pyref.decode_block(
            stream[sum((rb + 7) // 8 for rb in ref_bits[:i]) :], 0, N, C, pyref.Xorshift()
        )[1]
        want_pcm, carry_lap, prev_ss = imdct_f(coefs, jnp.int32(wc), carry_lap, prev_ss)
        want_pcm = np.asarray(inverse_ms(want_pcm))
        got = np.asarray(pcm[i])
        err = np.abs(got - want_pcm).max()
        assert err < 1e-5, (i, err)

    # --- fidelity: decoded block t reconstructs input block t-1
    got_flat = np.asarray(pcm).transpose(1, 0, 2).reshape(C, T * N)
    want = x[:, : (T - 1) * N]
    got_al = got_flat[:, N:]
    seg = slice(2 * N, (T - 2) * N)  # skip warmup/tail
    err = got_al[:, seg] - want[:, seg]
    snr = 10 * np.log10((want[:, seg] ** 2).mean() / max((err**2).mean(), 1e-12))
    assert snr > 15.0, snr


def test_cbr_respects_budget(rng):
    x = make_input(rng)
    out, sizes, stream = _encode(x, "cbr", rate_kbps=128.0)
    budget = int(N * 128.0 * 1000.0 / 44100.0)
    assert (sizes <= budget).all(), (sizes, budget)
    # and sizes should be reasonably close to budget for tonal content
    assert sizes[2:].mean() > 0.5 * budget
