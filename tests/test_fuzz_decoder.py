"""Decoder fuzz: random + mutated nybble windows across all 16 window
patterns.

The syntax FSM is the codec's whole runtime failure surface (the
reference's only failure contract is run-overflow -> corrupt,
ulcDecoder.c:127,138,154,228-231; README known-issues notes the format
has no resync). For >=1000 seeded garbage windows this asserts:

  (a) corrupt-flag agreement with the pyref FSM mirror,
  (b) coefficient bit-equality with pyref on every clean window,
  (c) scan-path vs kernel-path agreement on the same garbage
      (flags everywhere; coefs + bits on clean windows),
  (d) no NaN/Inf in decoded PCM, corrupt or not.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import pyref
from ulcx.bitstream.decode import decode_block_tokens, expand_records
from ulcx.bitstream.fast_decode import decode_block_fast
from ulcx.codec.decoder import DecoderCarry, bytes_to_nybbles, decode_block
from ulcx.utils.config import CodecConfig

N = 256
C = 2
W = 160  # window bytes: > a real 160kbps block at bs256 (~116 B)
CFG = CodecConfig(rate_hz=44100, n_chan=C, block_size=N)


class _LimitedReader(pyref.NybbleReader):
    """Reader capped at the token window both JAX paths see: with a
    1-nybble header the last nybble of the window is outside the [hdr,
    hdr + 2W - 2) token slice, so pyref must not read it either."""

    def __init__(self, data, limit):
        super().__init__(data)
        self.limit = limit

    def read(self):
        if self.pos >= self.limit:
            raise IndexError("token window exhausted")
        return super().read()


def _pyref_decode(window: np.ndarray):
    """(corrupt, coefs-or-None, bits) under the reference FSM mirror."""
    hdr = 1 if (window[0] & 0x08) == 0 else 2
    rd = _LimitedReader(bytes(window.tobytes()), hdr + (2 * W - 2))
    try:
        res = pyref.decode_block(rd.data, 0, N, C, pyref.Xorshift())
    except IndexError:
        return True, None, 0
    # decode_block builds its own reader; replay through the limited
    # one to honor the token cap exactly.
    rd2 = _LimitedReader(bytes(window.tobytes()), hdr + (2 * W - 2))
    try:
        wc = rd2.read()
        if wc & 0x8:
            wc |= rd2.read() << 4
        else:
            wc |= 1 << 4
        from ulcx.ops.patterns import (
            pattern_subblock_offsets,
            pattern_subblock_sizes,
        )

        offs = pattern_subblock_offsets(wc >> 4, N)
        szs = pattern_subblock_sizes(wc >> 4, N)
        out = np.zeros((C, N), np.float32)
        rng = pyref.Xorshift()
        for c in range(C):
            for off, ss in zip(offs, szs):
                if not pyref._decode_segment(rd2, out[c], off, ss, rng):
                    return True, None, rd2.bits
        return False, out, rd2.bits
    except IndexError:
        return True, None, 0


def _make_windows(rng):
    windows = []
    # 16 decim patterns x 8 scales x 4 reps of pure random garbage
    for decim in range(16):
        for scale in range(8):
            for _ in range(4):
                w = rng.integers(0, 256, W).astype(np.uint8)
                if decim == 1:
                    w[0] = (w[0] & 0xF0) | (scale & 0x7)
                else:
                    w[0] = (w[0] & 0xF0) | 0x8 | (scale & 0x7)
                    w[1] = (w[1] & 0xF0) | decim
                windows.append(w)
    # mutated valid blocks: encode real content, flip 1..4 nybbles
    from ulcx.codec.encoder import encode_stream_batched

    x = rng.standard_normal((8, 4, C, N)).astype(np.float32) * 0.3
    x[:, 2, :, 40] += 1.0
    out, _ = jax.jit(
        lambda b: encode_stream_batched(b, CFG, "cbr", rate_kbps=160.0)
    )(jnp.asarray(x))
    datas = np.asarray(out.data)
    sizes = np.asarray(out.size_bits)
    for i in range(8):
        for j in range(4):
            nb = min(int(sizes[i, j]) // 8, W)
            base = np.zeros(W, np.uint8)
            base[:nb] = datas[i, j, :nb]
            for _ in range(16):
                w = base.copy()
                for _ in range(int(rng.integers(1, 5))):
                    p = int(rng.integers(0, 2 * W))
                    v = int(rng.integers(0, 16))
                    if p % 2 == 0:
                        w[p // 2] = (w[p // 2] & 0xF0) | v
                    else:
                        w[p // 2] = (w[p // 2] & 0x0F) | (v << 4)
                windows.append(w)
    return np.stack(windows)  # [1024, W]


def _scan_decode_coefs(window):
    """decode_block's internals, stopping before the IMDCT (pyref's
    coef domain)."""
    nyb = bytes_to_nybbles(window)
    wc0 = nyb[0]
    has2 = (wc0 & 0x8) != 0
    wc = jnp.where(has2, wc0 | (nyb[1] << 4), wc0 | (1 << 4)).astype(jnp.int32)
    hdr = jnp.where(has2, 2, 1).astype(jnp.int32)
    tokens = lax.dynamic_slice(nyb, (hdr,), (nyb.shape[0] - 2,))
    records, consumed, corrupt = decode_block_tokens(tokens, wc, CFG)
    flat, _ = expand_records(records, jnp.uint32(1234567), N * C)
    return flat.reshape(C, N), 4 * (hdr + consumed), corrupt


def test_fuzz_decoder_vs_pyref_and_kernel(rng):
    windows = _make_windows(rng)
    m = windows.shape[0]
    assert m >= 1000
    wj = jnp.asarray(windows)

    coefs_s, bits_s, cor_s = jax.jit(jax.vmap(_scan_decode_coefs))(wj)
    coefs_s, bits_s, cor_s = map(np.asarray, (coefs_s, bits_s, cor_s))

    coefs_k, _, bits_k, cor_k, _ = jax.jit(
        lambda w: decode_block_fast(
            w, jnp.full(m, 1234567, jnp.uint32), CFG, interpret=True
        )
    )(wj)
    coefs_k, bits_k, cor_k = map(np.asarray, (coefs_k, bits_k, cor_k))

    # (d) full decode (incl. IMDCT) stays finite on garbage
    pcm, _, _, cor_p = jax.jit(
        jax.vmap(lambda w: decode_block(w, DecoderCarry.init(CFG), CFG))
    )(wj)
    pcm = np.asarray(pcm)
    assert np.isfinite(pcm).all()

    n_clean = 0
    for i in range(m):
        ref_cor, ref_coefs, ref_bits = _pyref_decode(windows[i])
        # (a) corrupt-flag agreement with the oracle
        assert bool(cor_s[i]) == ref_cor, (i, bool(cor_s[i]), ref_cor)
        # (c) scan vs kernel flag agreement on the same garbage
        assert bool(cor_k[i]) == bool(cor_s[i]), i
        if ref_cor:
            continue
        n_clean += 1
        # (b) bit-exact coefficients + consumed bits vs the oracle
        assert int(bits_s[i]) == ref_bits, (i, int(bits_s[i]), ref_bits)
        np.testing.assert_array_equal(coefs_s[i], ref_coefs, err_msg=str(i))
        # (c) kernel path equality on clean windows
        assert int(bits_k[i]) == int(bits_s[i]), i
        np.testing.assert_array_equal(coefs_k[i], coefs_s[i], err_msg=str(i))

    # the mutated-valid group must contribute decodable windows or the
    # fuzz isn't reaching deep FSM states
    assert n_clean >= 8, n_clean
