"""Batch-native transforms must match the per-stream switch versions."""

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.codec.transform import block_imdct, block_mdct_mdst, first_overlap
from ulcx.codec.transform_batched import (
    block_imdct_batched,
    block_mdct_mdst_batched,
)
from ulcx.utils.config import CodecConfig

N = 256
CFG = CodecConfig(rate_hz=44100, n_chan=2, block_size=N)
B = 16


def _wcs(rng):
    pats = rng.integers(1, 16, B)
    scales = rng.integers(0, 3, B)
    return np.array(
        [
            (int(p) << 4) | (0x8 if p != 1 else 0) | int(s)
            for p, s in zip(pats, scales)
        ],
        np.int32,
    )


def test_forward_batched_matches_switch(rng):
    samples = jnp.asarray(rng.standard_normal((B, 2, 2 * N)).astype(np.float32))
    wcs = jnp.asarray(_wcs(rng))
    prev_ss = jnp.asarray(rng.choice([N, N // 2, N // 4, N // 8], B).astype(np.int32))
    nxt = first_overlap(jnp.asarray(_wcs(rng)), N)

    f_ref = jax.jit(
        jax.vmap(lambda s, w, p, nx: block_mdct_mdst(s, w, p, nx, CFG))
    )
    f_bat = jax.jit(
        lambda s, w, p, nx: block_mdct_mdst_batched(s, w, p, nx, CFG)
    )
    mc_r, ms_r = f_ref(samples, wcs, prev_ss, nxt)
    mc_b, ms_b = f_bat(samples, wcs, prev_ss, nxt)
    scale = np.abs(np.asarray(mc_r)).max() + 1e-9
    assert np.abs(np.asarray(mc_b) - np.asarray(mc_r)).max() / scale < 2e-5
    assert np.abs(np.abs(np.asarray(ms_b)) - np.abs(np.asarray(ms_r))).max() / scale < 2e-5


def test_inverse_batched_matches_switch(rng):
    coefs = jnp.asarray(rng.standard_normal((B, 2, N)).astype(np.float32))
    wcs = jnp.asarray(_wcs(rng))
    lap = jnp.asarray(rng.standard_normal((B, 2, N // 2)).astype(np.float32))
    prev_ss = jnp.asarray(rng.choice([N, N // 2, N // 4, N // 8], B).astype(np.int32))

    f_ref = jax.jit(jax.vmap(lambda c, w, l, p: block_imdct(c, w, l, p, CFG)))
    f_bat = jax.jit(lambda c, w, l, p: block_imdct_batched(c, w, l, p, CFG))
    pcm_r, lap_r, ss_r = f_ref(coefs, wcs, lap, prev_ss)
    pcm_b, lap_b, ss_b = f_bat(coefs, wcs, lap, prev_ss)
    assert (np.asarray(ss_b) == np.asarray(ss_r)).all()
    scale = np.abs(np.asarray(pcm_r)).max() + 1e-9
    assert np.abs(np.asarray(pcm_b) - np.asarray(pcm_r)).max() / scale < 2e-5
    assert np.abs(np.asarray(lap_b) - np.asarray(lap_r)).max() / scale < 2e-5
