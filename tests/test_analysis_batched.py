"""Batched analysis pipeline must match the per-stream switch pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.analysis.block import EncoderCarry, analyze_block
from ulcx.analysis.batched import analyze_block_batched
from ulcx.codec.encoder import init_carry_batched
from ulcx.utils.config import CodecConfig

N = 256
B = 6
CFG = CodecConfig(rate_hz=44100, n_chan=2, block_size=N)


def test_batched_analysis_matches_per_stream(rng):
    f_ref = jax.jit(jax.vmap(lambda c, x: analyze_block(c, x, CFG)))
    f_bat = jax.jit(lambda c, x: analyze_block_batched(c, x, CFG))

    carry_r = init_carry_batched(CFG, B)
    carry_b = init_carry_batched(CFG, B)
    for step in range(4):
        x = rng.standard_normal((B, 2, N)).astype(np.float32) * 0.3
        if step == 2:
            x[:, :, 30] += 1.0  # force transients / decimated patterns
        xj = jnp.asarray(x)
        carry_r, out_r = f_ref(carry_r, xj)
        carry_b, out_b = f_bat(carry_b, xj)

        assert (np.asarray(out_b.window_ctrl) == np.asarray(out_r.window_ctrl)).all()
        assert (np.asarray(out_b.n_nz) == np.asarray(out_r.n_nz)).all()
        mr, mb = np.asarray(out_r.mdct), np.asarray(out_b.mdct)
        sc = np.abs(mr).max() + 1e-9
        assert np.abs(mb - mr).max() / sc < 3e-5
        nr, nb = np.asarray(out_r.noise), np.asarray(out_b.noise)
        assert np.abs(nb - nr).max() <= 1e-4 * (np.abs(nr).max() + 1)
        assert np.allclose(
            np.asarray(out_b.complexity), np.asarray(out_r.complexity), atol=1e-5
        )
        # importances (the keep-order keys) can differ by ~1 ulp where
        # the transform paths differ; the derived rank order must agree
        # almost everywhere
        ir = np.asarray(out_r.importance).reshape(out_r.mdct.shape[0], -1)
        ib = np.asarray(out_b.importance).reshape(ir.shape)
        rr = np.argsort(np.argsort(-ir, axis=-1, kind="stable"), axis=-1)
        rb = np.argsort(np.argsort(-ib, axis=-1, kind="stable"), axis=-1)
        frac = (rr != rb).mean()
        assert frac < 0.05, frac
