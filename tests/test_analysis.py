"""Smoke + behavior tests for the encoder analysis pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.analysis.block import EncoderCarry, analyze_block, ms_transform
from ulcx.utils.config import CodecConfig

CFG = CodecConfig(rate_hz=44100, n_chan=2, block_size=256)


def test_ms_transform():
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4))
    y = np.asarray(ms_transform(x))
    a, b = np.arange(4), np.arange(4, 8)
    assert np.allclose(y[0], (a + b) / 2)
    assert np.allclose(y[1], (a - b) / 2)
    # odd channel count: last untouched
    x3 = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    y3 = np.asarray(ms_transform(x3))
    assert np.allclose(y3[2], np.arange(8, 12))


def test_analyze_block_shapes_and_ranks(rng):
    step = jax.jit(lambda c, b: analyze_block(c, b, CFG))
    carry = EncoderCarry.init(CFG)
    n = CFG.block_size
    for t in range(4):
        blk = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32) * 0.3)
        carry, out = step(carry, blk)
    assert out.mdct.shape == (2, n)
    assert out.noise.shape == (2, n)
    # importance must define a total keep order: stable argsort of it
    # yields a full permutation (rank materialization moved downstream —
    # prepare_block for the scan path, sorted thresholds for kernels)
    imp = np.asarray(out.importance).reshape(-1)
    assert imp.shape == (2 * n,)
    assert not np.isnan(imp).any()
    order = np.argsort(-imp, kind="stable")
    assert sorted(order.tolist()) == list(range(2 * n))
    assert 0.0 <= float(out.complexity) <= 1.0
    wc = int(out.window_ctrl)
    assert 1 <= (wc >> 4) <= 15
    assert np.isfinite(np.asarray(out.mdct)).all()


def test_window_control_reacts_to_transients(rng):
    step = jax.jit(lambda c, b: analyze_block(c, b, CFG))
    n = CFG.block_size
    # steady tone -> full overlap, no decimation
    carry = EncoderCarry.init(CFG)
    t = np.arange(n, dtype=np.float32)
    wcs = []
    for k in range(6):
        tone = 0.5 * np.sin(2 * np.pi * 440 * (t + k * n) / 44100)
        blk = jnp.asarray(np.stack([tone, tone]))
        carry, out = step(carry, blk)
        wcs.append(int(out.window_ctrl))
    assert wcs[-1] == 0x10, wcs

    # hard click in the middle of a silent stream -> some window reaction
    carry = EncoderCarry.init(CFG)
    reacted = False
    for k in range(6):
        blk = np.zeros((2, n), np.float32)
        if k == 3:
            blk[:, n // 2] = 1.0
        carry, out = step(carry, jnp.asarray(blk))
        wc = int(out.window_ctrl)
        if wc != 0x10:
            reacted = True
    assert reacted
