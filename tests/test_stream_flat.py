"""Flat whole-chunk encode (scan only over window control) must equal
the per-block path exactly — same analysis, same bitstream passes, just
T folded into the batch (ulcx/analysis/batched.py:analyze_stream_batched).

The comparison runs the kernel path (what production flat mode uses);
interpret mode is slow per op, so T is kept small."""

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.codec.encoder import (
    encode_block_batched,
    encode_stream_batched,
    init_carry_batched,
)
from ulcx.utils.config import CodecConfig


def _compare(rng, t, use_pallas, mode="flat"):
    # mono: every flat-vs-per-block decision (window control carry,
    # ranks, kernel rate search) is channel-count-independent, and the
    # stereo M/S kernel path is byte-equality-tested in
    # test_pallas_encode/test_encode_pass — interpret-mode kernels
    # dominate suite wall time, so don't pay for 2 channels here
    b, n, c = 8, 256, 1
    blocks = jnp.asarray(
        (rng.standard_normal((b, t, c, n)) * 0.3).astype(np.float32)
    )
    # a transient to vary window patterns across blocks
    blocks = blocks.at[:4, 1, :, 100:140].add(0.6)
    cfg = CodecConfig(
        rate_hz=44100, n_chan=c, block_size=n, use_pallas=use_pallas,
        flat_stream=(mode == "flat"),
        fold_bitstream=(t if mode == "fold" else 1),
    )

    # jit both paths: run eagerly, every primitive (incl. each
    # interpret-mode pallas step) compiles its own tiny executable —
    # measured ~2900 compiles / 110 s for this test; jitted it's a few
    flat_fn = jax.jit(
        lambda x: encode_stream_batched(x, cfg, "cbr", rate_kbps=128.0)
    )
    out_flat, carry_flat = flat_fn(blocks)

    # reference cfg without the stream-pipeline knobs: per-block
    # semantics are identical, and blk_fn's jit cache is then shared
    # between the flat and fold tests (one reference compile)
    cfg_ref = CodecConfig(
        rate_hz=44100, n_chan=c, block_size=n, use_pallas=use_pallas
    )
    blk_fn = jax.jit(
        lambda ca, x: encode_block_batched(ca, x, cfg_ref, "cbr", rate_kbps=128.0)
    )
    carry = init_carry_batched(cfg_ref, b)
    outs = []
    for j in range(t):
        carry, enc = blk_fn(carry, blocks[:, j])
        outs.append(enc)

    sizes_f = np.asarray(out_flat.size_bits)
    sizes_p = np.stack([np.asarray(o.size_bits) for o in outs], 1)
    assert np.array_equal(sizes_f, sizes_p)
    wc_f = np.asarray(out_flat.window_ctrl)
    wc_p = np.stack([np.asarray(o.window_ctrl) for o in outs], 1)
    assert np.array_equal(wc_f, wc_p)
    data_f = np.asarray(out_flat.data)
    for j, o in enumerate(outs):
        dp = np.asarray(o.data)
        for i in range(b):
            nb = int(sizes_p[i, j]) // 8
            assert data_f[i, j, :nb].tobytes() == dp[i, :nb].tobytes(), (i, j)
    # float filter state may differ by matmul-layout rounding (~1e-7);
    # every decision derived from it above matched exactly
    for a, bb in zip(
        jax.tree_util.tree_leaves(carry_flat), jax.tree_util.tree_leaves(carry)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(bb, np.float64),
            rtol=1e-5, atol=1e-6,
        )


def test_flat_stream_equals_per_block_kernel_path(rng):
    # the scan-path variant of this comparison was measured MORE
    # expensive than interpret-mode kernels (vmapped per-stream scan
    # compiles); the kernel path is also what production flat mode runs
    _compare(rng, t=2, use_pallas="on")


def test_fold_bitstream_equals_per_block(rng):
    """fold_bitstream chunks the bitstream stages over T while analysis
    stays a per-block scan — bytes must match the per-block path
    (same comparison harness as flat mode; fold = t folds everything
    into one bitstream chunk)."""
    _compare(rng, t=2, use_pallas="on", mode="fold")


def test_fold_bitstream_user_setting_honored(rng):
    """A caller-set fold (e.g. to bound kernel state-plane memory on
    long chunks) must survive encode_stream: only the DEFAULT fold=1
    is auto-folded to T (ADVICE r4: the old code overrode any value).
    Bytes are chunk-invariant, so honoring fold=t//2 must still match
    the whole-chunk encode byte-for-byte."""
    import dataclasses

    from ulcx.codec.encoder import encode_stream

    t, n = 4, 256
    cfg = CodecConfig(rate_hz=44100, n_chan=1, block_size=n)
    rng_np = np.random.default_rng(77)
    blocks = np.asarray(
        0.25 * rng_np.standard_normal((t, cfg.n_chan, n)), np.float32
    )
    bj = jnp.asarray(blocks)
    out_full, _ = jax.jit(
        lambda b: encode_stream(b, cfg, "vbr", quality=40.0)
    )(bj)
    cfg2 = dataclasses.replace(cfg, fold_bitstream=2)
    out_f2, _ = jax.jit(
        lambda b: encode_stream(b, cfg2, "vbr", quality=40.0)
    )(bj)
    np.testing.assert_array_equal(
        np.asarray(out_f2.size_bits), np.asarray(out_full.size_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(out_f2.data), np.asarray(out_full.data)
    )
