"""Checkpoint/resume: stopping and restarting mid-stream is lossless."""

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.analysis.block import EncoderCarry
from ulcx.codec.decoder import DecoderCarry, decode_stream
from ulcx.codec.encoder import encode_stream, max_block_bytes
from ulcx.utils.checkpoint import load_carry, save_carry
from ulcx.utils.config import CodecConfig

N = 256
CFG = CodecConfig(rate_hz=44100, n_chan=2, block_size=N)


def test_encoder_checkpoint_resume(tmp_path, rng):
    x = rng.standard_normal((6, 2, N)).astype(np.float32) * 0.3
    blocks = jnp.asarray(x)
    f = jax.jit(lambda b, c: encode_stream(b, CFG, "vbr", carry=c, quality=70.0))

    # straight-through
    out_all, _ = f(blocks, EncoderCarry.init(CFG))

    # stop after 3 blocks, checkpoint, resume (fresh process simulated
    # by reconstructing from disk)
    out_a, carry_mid = f(blocks[:3], EncoderCarry.init(CFG))
    save_carry(str(tmp_path / "enc.npz"), carry_mid)
    carry_loaded = load_carry(str(tmp_path / "enc.npz"), EncoderCarry.init(CFG))
    out_b, _ = f(blocks[3:], carry_loaded)

    sa = np.concatenate([np.asarray(out_a.size_bits), np.asarray(out_b.size_bits)])
    assert (sa == np.asarray(out_all.size_bits)).all()
    da = np.concatenate([np.asarray(out_a.data), np.asarray(out_b.data)])
    assert (da == np.asarray(out_all.data)).all()


def test_decoder_checkpoint_resume(tmp_path, rng):
    x = rng.standard_normal((6, 2, N)).astype(np.float32) * 0.3
    out, _ = jax.jit(lambda b: encode_stream(b, CFG, "vbr", quality=70.0))(
        jnp.asarray(x)
    )
    sizes = np.asarray(out.size_bits)
    datas = np.asarray(out.data)
    stream = b"".join(datas[i, : sizes[i] // 8].tobytes() for i in range(6))
    pad = np.zeros(max_block_bytes(CFG) + 8, np.uint8)
    sj = jnp.asarray(np.concatenate([np.frombuffer(stream, np.uint8), pad]))
    win = max_block_bytes(CFG)

    pcm_all, _, cor, _ = jax.jit(lambda s: decode_stream(s, 6, win, CFG))(sj)
    assert not np.asarray(cor).any()

    f3 = jax.jit(lambda s, o, c: decode_stream(s, 3, win, CFG, offset=o, carry=c))
    pcm_a, _, _, (off, carry_mid) = f3(sj, jnp.int32(0), DecoderCarry.init(CFG))
    save_carry(str(tmp_path / "dec.npz"), carry_mid)
    carry_loaded = load_carry(str(tmp_path / "dec.npz"), DecoderCarry.init(CFG))
    pcm_b, _, _, _ = f3(sj, off, carry_loaded)

    got = np.concatenate([np.asarray(pcm_a), np.asarray(pcm_b)])
    assert np.abs(got - np.asarray(pcm_all)).max() == 0.0


def test_treedef_mismatch_rejected(tmp_path):
    """Loading a carry with the wrong pytree structure raises instead
    of silently reinterpreting leaves."""
    import pytest
    from ulcx.analysis.block import EncoderCarry
    from ulcx.codec.decoder import DecoderCarry
    from ulcx.utils.checkpoint import load_carry, save_carry
    from ulcx.utils.config import CodecConfig

    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=256)
    p = str(tmp_path / "c.npz")
    save_carry(p, EncoderCarry.init(cfg))
    with pytest.raises(ValueError, match="structure mismatch"):
        load_carry(p, DecoderCarry.init(cfg))
    # matching structure loads fine
    load_carry(p, EncoderCarry.init(cfg))
