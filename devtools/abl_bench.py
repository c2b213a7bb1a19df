"""Analysis ablation: cost of psy / noise / transform sub-stages by
feature-flag differencing (DCE-proof: each variant is the REAL analysis
pipeline with a feature disabled via CodecConfig, not a stubbed stage).

Variants: full, nopsy, nonoise, neither, fft (FFT transform backend).
Usage: python devtools/abl_bench.py [variant ...]
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
    from jax import lax

    from ulcx.analysis.batched import analyze_block_batched
    from ulcx.codec.encoder import init_carry_batched
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "8"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))

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

    variants = {
        "full": {},
        "nopsy": {"use_psychoacoustics": False},
        "nonoise": {"use_noise_coding": False},
        "neither": {"use_psychoacoustics": False, "use_noise_coding": False},
        "fft": {"transform_backend": "fft"},
    }
    want = sys.argv[1:] or list(variants)
    audio = b * t * n / 44100.0
    for name in want:
        cfg = CodecConfig(
            rate_hz=44100, n_chan=2, block_size=n, **variants[name]
        )

        def step(c, blk_t):
            c, ab = analyze_block_batched(c, blk_t, cfg)
            return c, (
                jnp.sum(ab.mdct),
                jnp.sum(ab.noise),
                jnp.sum(ab.importance),
                jnp.sum(ab.n_nz),
            )

        def fn(x):
            carry = init_carry_batched(cfg, b)
            carry, out = lax.scan(step, carry, x.transpose(1, 0, 2, 3))
            return out

        jf = jax.jit(fn)
        t0 = time.perf_counter()
        out = jf(blocks)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(blocks)
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(leaf)
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name:8s} {best*1000:8.1f} ms  ({audio/best:7.1f}x rt)"
            f"  [compile {compile_s:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
