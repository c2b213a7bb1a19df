"""Stage bisection for the FLAT (T-folded) encode pipeline.

Stages: wc (scan part only), fa (analyze_stream_batched), fprep,
fsizes (one kernel round + tail), ffull (encode_stream_batched).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from ulcx.analysis.batched import analyze_stream_batched
    from ulcx.bitstream.fast_encode import prepare_fast, total_sizes
    from ulcx.codec.encoder import encode_stream_batched, init_carry_batched
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "8"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))
    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=n, flat_stream=True)

    rng = np.random.default_rng(7)
    tt = np.arange(t * n) / 44100.0
    base = (
        0.35 * np.sin(2 * np.pi * 440 * tt)
        + 0.1 * np.sin(2 * np.pi * 1870 * tt)
        + 0.02 * rng.standard_normal(t * n)
    ).astype(np.float32)
    blocks = np.broadcast_to(
        base.reshape(1, t, 1, n), (b, t, 2, n)
    ) * rng.uniform(0.5, 1.0, (b, 1, 1, 1)).astype(np.float32)
    blocks = jnp.asarray(np.ascontiguousarray(blocks))

    def fn_wc(x):
        from ulcx.analysis.block import ms_transform
        from ulcx.analysis.window_control import get_window_ctrl

        carry = init_carry_batched(cfg, b)
        new_ms = jax.vmap(jax.vmap(ms_transform))(x)
        prevs = jnp.concatenate(
            [carry.sample_prev[:, None], new_ms[:, :-1]], axis=1
        )
        pairs = jnp.concatenate([prevs, new_ms], axis=-1)

        def wc_step(tstate, s_t):
            next_wc, tstate = jax.vmap(
                lambda s, st: get_window_ctrl(s, st, cfg)
            )(s_t, tstate)
            return tstate, next_wc

        tstate, next_wcs = jax.lax.scan(
            wc_step, carry.transient, pairs.transpose(1, 0, 2, 3)
        )
        return (jnp.sum(next_wcs),)

    def fn_fa(x):
        carry = init_carry_batched(cfg, b)
        carry, ab = analyze_stream_batched(carry, x, cfg)
        return (jnp.sum(ab.mdct), jnp.sum(ab.importance), jnp.sum(ab.n_nz))

    def fn_fprep(x):
        carry = init_carry_batched(cfg, b)
        carry, ab = analyze_stream_batched(carry, x, cfg)
        fb = prepare_fast(ab, cfg)
        return (
            jnp.sum(fb.coef),
            jnp.sum(fb.aux),
            jnp.sum(fb.amp_noise),
            jnp.sum(fb.amp_lin),
        )

    def fn_fsizes(x):
        carry = init_carry_batched(cfg, b)
        carry, ab = analyze_stream_batched(carry, x, cfg)
        fb = prepare_fast(ab, cfg)
        bf = b * t
        cands = jnp.broadcast_to(
            (jnp.arange(1, 17, dtype=jnp.int32) * (n // 8))[None, :], (bf, 16)
        )
        return (jnp.sum(total_sizes(fb, cands, cfg)),)

    def fn_ffull(x):
        out, carry = encode_stream_batched(x, cfg, "cbr", rate_kbps=128.0)
        return (jnp.sum(out.size_bits), jnp.sum(out.data[:, :, :64].astype(jnp.int32)))

    fns = {"wc": fn_wc, "fa": fn_fa, "fprep": fn_fprep,
           "fsizes": fn_fsizes, "ffull": fn_ffull}
    want = sys.argv[1:] or list(fns)
    audio = b * t * n / 44100.0
    results = {}
    for name in want:
        g = jax.jit(fns[name])
        t0 = time.perf_counter()
        out = g(blocks)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = g(blocks)
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(leaf)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        print(
            f"{name:7s} {best*1000:8.1f} ms  ({audio/best:7.1f}x rt)"
            f"  [compile {compile_s:.0f}s]",
            flush=True,
        )
    names = [k for k in fns if k in results]
    for a, bnm in zip(names, names[1:]):
        print(f"delta {a}->{bnm}: {(results[bnm]-results[a])*1000:8.1f} ms")


if __name__ == "__main__":
    main()
