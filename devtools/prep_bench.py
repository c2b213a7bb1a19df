"""Bisect inside prepare_fast (full-bench methodology).

Variants cut the line-domain prepare pass at successive points:
  cs    — 5-way cumsum block only
  seg   — + segment-end one-hot matmul values
  amp   — + noise-amplitude window (shifted slices + exp)
  hf    — + HF least-squares fit quantities
  aux   — + segdelta/is_start matmuls + aux assembly (= full prepare)
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
    from ulcx.bitstream.fast_encode import _prep_tables, _cq_unsigned
    from ulcx.codec.encoder import init_carry_batched
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

    c = cfg.n_chan
    p_tot = n * c
    nl = p_tot // 2
    n_grid = 8 * c
    grid_step = (n // 8) // 2
    segdelta_t, isstart_t, endline_t, sel_t = _prep_tables(n, c)
    hi = jax.lax.Precision.HIGHEST

    def upto(stage):
        def step(carry, blk_t):
            carry, blk = analyze_block_batched(carry, blk_t, cfg)
            pat = blk.window_ctrl >> 4
            oh = (pat[:, None] == jnp.arange(16)).astype(jnp.float32)
            noise = blk.noise.reshape(b, p_tot)
            w = noise[:, 0::2]
            wy = noise[:, 1::2]
            g = jnp.arange(nl, dtype=jnp.float32)
            stacked = jnp.stack([w, wy, w * g, w * g * g, wy * g], axis=1)
            cs = jnp.concatenate(
                [jnp.zeros((b, 5, 1), jnp.float32), jnp.cumsum(stacked, axis=-1)],
                axis=-1,
            )
            if stage == "cs":
                return carry, (jnp.sum(cs[:, :, -1]),)
            gv = cs[:, :, grid_step::grid_step][:, :, :n_grid]
            y = (oh[:, None, :, None] * gv[:, :, None, :]).reshape(
                b, 5, 16 * n_grid
            )
            seg_vals = jnp.matmul(y, jnp.asarray(sel_t), precision=hi)
            end_line = jnp.matmul(oh, jnp.asarray(endline_t), precision=hi)
            if stage == "seg":
                return carry, (jnp.sum(seg_vals), jnp.sum(end_line))
            cw_a, cwy_a = cs[:, 0, :nl], cs[:, 1, :nl]
            cw_end, cwy_end = seg_vals[:, 0], seg_vals[:, 1]
            in_window = (g + 264.0) < end_line
            take = max(0, nl + 1 - 264)

            def shifted(j):
                return jnp.concatenate(
                    [cs[:, j, 264:], jnp.broadcast_to(cs[:, j, -1:], (b, nl - take))],
                    axis=-1,
                )

            s_w = jnp.where(in_window, shifted(0), cw_end) - cw_a
            s_wy = jnp.where(in_window, shifted(1), cwy_end) - cwy_a
            amp = jnp.exp(s_wy / jnp.where(s_w > 0, s_w, 1.0))
            amp_noise_l = jnp.where(s_wy != 0.0, amp, 0.0)
            if stage == "amp":
                return carry, (jnp.sum(amp_noise_l),)
            af = g
            sw = cw_end - cw_a
            swy = cwy_end - cwy_a
            swg = seg_vals[:, 2] - cs[:, 2, :nl]
            swg2 = seg_vals[:, 3] - cs[:, 3, :nl]
            swyg = seg_vals[:, 4] - cs[:, 4, :nl]
            sx = 2.0 * (swg - af * sw)
            sx2 = 4.0 * (swg2 - 2.0 * af * swg + af * af * sw)
            sxy = 2.0 * (swyg - af * swy)
            det = sw * sx2 - sx * sx
            solvable = det != 0.0
            det_s = jnp.where(solvable, det, 1.0)
            amp_log = (sx2 * swy - sx * sxy) / det_s
            dec_log = (sw * sxy - sx * swy) / det_s
            amp_lin_l = jnp.exp(amp_log)
            dec_lin = jnp.where(dec_log < 0, jnp.exp(dec_log), 1.0)
            dec_raw = _cq_unsigned((dec_lin - 1.0) * np.float32(-(2.0**19)))
            hf_ok_l = solvable & (dec_raw > 0)
            dec_q_l = jnp.minimum(dec_raw, 255)
            if stage == "hf":
                return carry, (
                    jnp.sum(amp_lin_l),
                    jnp.sum(dec_q_l),
                    jnp.sum(hf_ok_l),
                    jnp.sum(amp_noise_l),
                )
            segdelta = jnp.matmul(
                oh, jnp.asarray(segdelta_t), precision=hi
            ).astype(jnp.int32)
            is_seg_start = jnp.matmul(
                oh, jnp.asarray(isstart_t), precision=hi
            ).astype(jnp.int32)
            from ulcx.ops.keys import monotone_i32

            key = monotone_i32(blk.importance.reshape(b, p_tot))
            aux = key ^ (segdelta | (is_seg_start << 16))
            amp_noise = jnp.repeat(amp_noise_l, 2, axis=-1)
            hf_meta = dec_q_l | (hf_ok_l.astype(jnp.int32) << 8)
            return carry, (
                jnp.sum(aux),
                jnp.sum(amp_noise),
                jnp.sum(hf_meta),
                jnp.sum(amp_lin_l),
            )

        return step

    def scan_over(step):
        def fn(x):
            carry = init_carry_batched(cfg, b)
            carry, out = lax.scan(step, carry, x.transpose(1, 0, 2, 3))
            return out

        return jax.jit(fn)

    stages = ["cs", "seg", "amp", "hf", "aux"]
    want = sys.argv[1:] or stages
    audio = b * t * n / 44100.0
    results = {}
    for name in want:
        fn = scan_over(upto(name))
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
            f"{name:4s} {best*1000:8.1f} ms  ({audio/best:7.1f}x rt)"
            f"  [compile {compile_s:.0f}s]",
            flush=True,
        )
    names = [k for k in stages if k in results]
    for a, bnm in zip(names, names[1:]):
        print(f"delta {a}->{bnm}: {(results[bnm]-results[a])*1000:8.1f} ms")


if __name__ == "__main__":
    main()
