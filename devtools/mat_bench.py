"""Bisect the materialize/assemble block (same full-bench methodology).

Variants (all: analysis + prepare + one uniform-nout materialize round):
  matk  — materialize kernel only (sum of nyb words)
  tail  — + tail_info
  asm   — + _assemble (= materialize_fast)
  smat  — full search_materialize_fast (2 rounds + fused final round
          with 16-way sel) for comparison
  s3mat — 3-round rate_search_fast + uniform materialize_fast
          (sel-free alternative to smat)
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
    from ulcx.bitstream import pallas_encode as pe
    from ulcx.bitstream.fast_encode import (
        _assemble,
        kernel_sizes,
        materialize_fast,
        prepare_fast,
        rate_search_fast,
        search_materialize_fast,
        tail_info,
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

    def prep(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        fb = prepare_fast(ab, cfg)
        n_out = ab.n_nz // 4
        return c, fb, n_out

    def step_matk(c, blk_t):
        c, fb, n_out = prep(c, blk_t)
        nout16 = jnp.broadcast_to(n_out[:, None], (b, pe.N_CAND))
        bits, slotpq, slotlc, nyb = kernel_sizes(fb, nout16, cfg, True)
        return c, (jnp.sum(bits), jnp.sum(nyb[:, 0]), jnp.sum(slotpq))

    def step_tail(c, blk_t):
        c, fb, n_out = prep(c, blk_t)
        nout16 = jnp.broadcast_to(n_out[:, None], (b, pe.N_CAND))
        bits, slotpq, slotlc, nyb = kernel_sizes(fb, nout16, cfg, True)
        tt_, t_pos, t_nyb, t_val = tail_info(fb, slotpq, slotlc, cfg)
        return c, (jnp.sum(bits), jnp.sum(nyb[:, 0]), jnp.sum(t_nyb))

    def step_asm(c, blk_t):
        c, fb, n_out = prep(c, blk_t)
        size, by = materialize_fast(fb, n_out, cfg, mb)
        return c, (jnp.sum(size), jnp.sum(by[:, :64].astype(jnp.int32)))

    def step_smat(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        fb = prepare_fast(ab, cfg)
        n_out, size, by = search_materialize_fast(fb, ab.n_nz, budget, cfg, mb)
        return c, (jnp.sum(size), jnp.sum(by[:, :64].astype(jnp.int32)))

    def step_s3mat(c, blk_t):
        c, ab = analyze_block_batched(c, blk_t, cfg)
        fb = prepare_fast(ab, cfg)
        n_out = rate_search_fast(fb, ab.n_nz, budget, cfg)
        size, by = materialize_fast(fb, n_out, cfg, mb)
        return c, (jnp.sum(size), jnp.sum(by[:, :64].astype(jnp.int32)))

    def _assemble_var(fb, packed, t_pos, t_nyb, t_valid, max_bytes, skip):
        """Copy of _assemble with pieces stubbed for bisection."""
        bb, p_tot = fb.coef.shape
        bidx = jnp.arange(bb)[:, None]
        packed = packed.at[bidx, jnp.clip(t_pos, 0, p_tot - 1)].max(
            jnp.where(t_valid, t_nyb, 0), mode="drop"
        )
        counts = (packed >> 28) & 0xF
        total_nyb = fb.n_header + jnp.sum(counts, axis=-1)
        size_bits = (4 * total_nyb + 7) & ~7
        max_nyb = 2 * max_bytes
        n_words = max_nyb // 8
        offs = fb.n_header[:, None] + jnp.concatenate(
            [jnp.zeros((bb, 1), jnp.int32), jnp.cumsum(counts, axis=-1)[:, :-1]],
            axis=-1,
        )
        field = packed & 0x0FFFFFFF
        word = offs >> 3
        shift = (offs & 7) * 4
        lo = (field << shift).astype(jnp.int32)
        hi = jnp.where(shift == 0, 0, (field >> (32 - shift))).astype(jnp.int32)
        has = counts > 0
        words = jnp.zeros((bb, n_words), jnp.int32)
        if skip == "scatter":
            # keep lo/hi alive without the word scatters
            words = words.at[:, 0].add(jnp.sum(lo + hi + word, axis=-1))
        else:
            words = words.at[bidx, jnp.where(has, word, n_words)].add(
                jnp.where(has, lo, 0), mode="drop"
            )
            words = words.at[bidx, jnp.where(has, word + 1, n_words)].add(
                jnp.where(has, hi, 0), mode="drop"
            )
        if skip == "bytes":
            return size_bits, words
        sh = jnp.arange(4) * 8
        by = ((words[:, :, None] >> sh[None, None, :]) & 0xFF).astype(jnp.uint8)
        return size_bits, by.reshape(bb, 4 * n_words)

    def make_asm_skip(skip):
        def step(c, blk_t):
            c, fb, n_out = prep(c, blk_t)
            nout16 = jnp.broadcast_to(n_out[:, None], (b, pe.N_CAND))
            bits, slotpq, slotlc, nyb = kernel_sizes(fb, nout16, cfg, True)
            _tt, t_pos, t_nyb, t_val = tail_info(fb, slotpq, slotlc, cfg)
            size, by = _assemble_var(
                fb, nyb[:, 0], t_pos[:, 0], t_nyb[:, 0], t_val[:, 0], mb, skip
            )
            return c, (jnp.sum(size), jnp.sum(by[:, :64].astype(jnp.int32)))

        return step

    steps = {
        "matk": step_matk,
        "tail": step_tail,
        "asm": step_asm,
        "asmnosc": make_asm_skip("scatter"),
        "asmnoby": make_asm_skip("bytes"),
        "smat": step_smat,
        "s3mat": step_s3mat,
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
            f"{name:6s} {best*1000:8.1f} ms  ({audio/best:7.1f}x rt)"
            f"  [compile {compile_s:.0f}s]",
            flush=True,
        )
    names = [k for k in steps if k in results]
    for a, bnm in zip(names, names[1:]):
        print(f"delta {a}->{bnm}: {(results[bnm]-results[a])*1000:8.1f} ms")


if __name__ == "__main__":
    main()
