"""Full-bench stage bisection for the batched CBR encode pipeline.

Each variant jits the SAME scan-over-T structure as bench.py but stops
the per-block work at a given stage, so stage cost = delta between
consecutive variants. Micro-timings are useless through the tunnel
(~15-35 ms dispatch floor); this is the proven methodology (NOTES.md).

Usage: python devtools/stage_bench.py [stage ...]
Stages: analysis prepare sizes1 search full
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
    from ulcx.bitstream.fast_encode import (
        cand_count,
        prepare_fast,
        rate_search_fast,
        search_materialize_fast,
        total_sizes,
    )
    from ulcx.codec.encoder import init_carry_batched, max_block_bytes
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "8"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))
    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=n)

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

    budget = jnp.full((b,), int(n * 128.0 * 1000.0 / 44100.0), jnp.int32)
    mb = max_block_bytes(cfg)

    def scan_over(step):
        def fn(x):
            carry = init_carry_batched(cfg, b)
            carry, out = lax.scan(step, carry, x.transpose(1, 0, 2, 3))
            return out

        return jax.jit(fn)

    def step_analysis(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        return c, (jnp.sum(ab.mdct), jnp.sum(ab.importance), jnp.sum(ab.n_nz))

    def step_prepare(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        fb = prepare_fast(ab, cfg)
        return c, (
            jnp.sum(fb.coef),
            jnp.sum(fb.aux),
            jnp.sum(fb.amp_noise),
            jnp.sum(fb.amp_lin),
            jnp.sum(fb.hf_meta),
        )

    def step_sizes1(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        fb = prepare_fast(ab, cfg)
        k = cand_count(b, 2 * n)
        cands = jnp.broadcast_to(
            (jnp.arange(1, k + 1, dtype=jnp.int32) * (2 * n // k))[None, :],
            (b, k),
        )
        sizes = total_sizes(fb, cands, cfg)
        return c, (jnp.sum(sizes),)

    def step_search(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        fb = prepare_fast(ab, cfg)
        n_out = rate_search_fast(fb, ab.n_nz, budget, cfg)
        return c, (jnp.sum(n_out),)

    def step_full(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        fb = prepare_fast(ab, cfg)
        n_out, size, data = search_materialize_fast(
            fb, ab.n_nz, budget, cfg, mb
        )
        return c, (jnp.sum(size), jnp.sum(data[:, :64].astype(jnp.int32)))

    steps = {
        "analysis": step_analysis,
        "prepare": step_prepare,
        "sizes1": step_sizes1,
        "search": step_search,
        "full": step_full,
    }
    want = sys.argv[1:] or list(steps)
    audio = b * t * n / 44100.0
    results = {}
    for name in want:
        fn = scan_over(steps[name])
        t0 = time.perf_counter()
        out = fn(blocks)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(blocks)
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(leaf)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        print(
            f"{name:10s} {best*1000:8.1f} ms  ({audio/best:7.1f}x rt)"
            f"  [compile {compile_s:.0f}s]",
            flush=True,
        )
    names = [k for k in steps if k in results]
    for a, bnm in zip(names, names[1:]):
        print(f"delta {a}->{bnm}: {(results[bnm]-results[a])*1000:8.1f} ms")


if __name__ == "__main__":
    main()
