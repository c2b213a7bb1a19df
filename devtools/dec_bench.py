"""Stage bisection for the batched decode pipeline (full-bench A/B).

Variants run the scan-over-blocks structure of decode_stream_batched
with the per-block work cut at successive stages:
  win   — window slices only
  fsm   — + FSM kernel
  exp   — + record expansion (scatters + ffills)
  rngk  — + RNG kernel + coefficient assembly
  imdct — + batched IMDCT + M/S (= full decode)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ulcx.bitstream import pallas_decode as pd
    from ulcx.bitstream.fast_decode import _ffill, _from_lanes, _to_lanes
    from ulcx.bitstream.decode import REC_COEF, REC_NOISE, REC_TAIL
    from ulcx.codec.decoder import inverse_ms
    from ulcx.codec.transform_batched import block_imdct_batched
    from ulcx.parallel.mesh import batch_encode
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "8"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))
    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=n)
    c = cfg.n_chan
    p_tot = n * c

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_corpus

    cache = f"/tmp/dec_bench_streams_{b}_{t}_{n}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        streams_np, win = z["streams"], int(z["win"])
    else:
        blocks = jnp.asarray(make_corpus(b, t, n))
        out, _ = jax.jit(lambda x: batch_encode(x, cfg, "cbr", rate_kbps=128.0))(
            blocks
        )
        sizes = np.asarray(out.size_bits)
        datas = np.asarray(out.data)
        win = -(-int(sizes.max() // 8) // 64) * 64 + 64
        streams_np = np.zeros((b, t * win + win + 64), np.uint8)
        for i in range(b):
            offs = 0
            for j in range(t):
                nb = int(sizes[i, j]) // 8
                streams_np[i, offs : offs + nb] = datas[i, j, :nb]
                offs += nb
        np.savez(cache, streams=streams_np, win=win)
    streams = jnp.asarray(streams_np)

    def make_real(stage):
        """Variants over the REAL decode_block_fast / stream path."""
        from ulcx.bitstream.fast_decode import decode_block_fast
        from ulcx.codec.decoder import decode_stream_batched

        if stage == "full":
            def fn(_):
                pcm, bits, corrupt = decode_stream_batched(streams, t, win, cfg)
                return (jnp.sum(pcm), jnp.sum(bits))

            return jax.jit(fn)

        def step(state, _):
            offset, rng = state
            windows = jax.vmap(
                lambda s, o: lax.dynamic_slice(s, (o,), (win,))
            )(streams, offset)
            coefs, wc, bits, corrupt, rng = decode_block_fast(
                windows, rng, cfg, False
            )
            offset = offset + (bits + 7) // 8
            return (offset, rng), (jnp.sum(coefs), jnp.sum(bits))

        def fn(_):
            init = (jnp.zeros(b, jnp.int32), jnp.full(b, 1234567, jnp.uint32))
            _, outs = lax.scan(step, init, None, length=t)
            return outs

        return jax.jit(fn)

    def make(stage):
        if stage in ("blkfast", "full"):
            return make_real(stage)
        def step(state, _):
            offset, lap, prev_ss, rng = state
            windows = jax.vmap(
                lambda s, o: lax.dynamic_slice(s, (o,), (win,))
            )(streams, offset)
            if stage == "win":
                # fake advance to keep the loop honest
                adv = (windows[:, 0].astype(jnp.int32) & 0) + 600
                return (offset + adv, lap, prev_ss, rng), (
                    jnp.sum(windows.astype(jnp.int32)),
                )

            lo = (windows & 0xF).astype(jnp.int32)
            hi = (windows >> 4).astype(jnp.int32)
            nyb = jnp.stack([lo, hi], axis=-1).reshape(b, 2 * win)
            wc0 = nyb[:, 0]
            has2 = (wc0 & 0x8) != 0
            wc = jnp.where(has2, wc0 | (nyb[:, 1] << 4), wc0 | (1 << 4)).astype(
                jnp.int32
            )
            hdr = jnp.where(has2, 2, 1).astype(jnp.int32)
            t_len = 2 * win - 2
            tokens = jnp.where(
                has2[:, None], nyb[:, 2 : t_len + 2], nyb[:, 1 : t_len + 1]
            )
            tok_l, g, pad = _to_lanes(tokens, b)
            wc_l = wc.reshape(g, pd.LANES)
            rec, code, consumed, corrupt = jax.vmap(
                lambda w_, tk: pd.fsm_kernel_call(w_, tk, p_tot, n, False)
            )(wc_l, tok_l)
            rec = _from_lanes(rec, b)
            code = _from_lanes(code, b)
            consumed = consumed.reshape(-1)[:b]
            corrupt = corrupt.reshape(-1)[:b]
            bits = 4 * (hdr + consumed)
            offset = offset + (bits + 7) // 8
            if stage == "fsm":
                return (offset, lap, prev_ss, rng), (
                    jnp.sum(rec) + jnp.sum(lvl) + jnp.sum(corrupt),
                )

            rtype = (rec >> 26) & 0x7
            start = rec & 0x1FFF
            emit = rtype != 0
            bidx = jnp.arange(b)[:, None]
            tgt = jnp.where(emit, start, p_tot)

            def scat(vals, dtype):
                return jnp.zeros((b, p_tot), dtype).at[bidx, tgt].set(
                    jnp.where(emit, vals, 0).astype(dtype), mode="drop"
                )

            type_s = scat(rtype, jnp.int32)
            lvl_s = scat(lvl, jnp.float32)
            dcy_s = scat(dcy, jnp.float32)
            mark = jnp.zeros((b, p_tot), jnp.bool_).at[bidx, tgt].set(
                emit, mode="drop"
            )
            pos = jnp.arange(p_tot)[None, :]
            type_p = _ffill(type_s, mark, 0)
            lvl_p = _ffill(lvl_s, mark, 0.0)
            dcy_p = _ffill(dcy_s, mark, 0.0)
            start_p = _ffill(jnp.broadcast_to(pos, (b, p_tot)), mark, 0)
            if stage == "exp":
                return (offset, lap, prev_ss, rng), (
                    jnp.sum(type_p) + jnp.sum(lvl_p) + jnp.sum(start_p),
                )

            k = (pos - start_p).astype(jnp.float32)
            is_draw = (type_p == REC_NOISE) | (type_p == REC_TAIL)
            flags = is_draw.astype(jnp.int32) | (mark.astype(jnp.int32) << 1)
            flags_l, g2, pad2 = _to_lanes(flags, b)
            seed_l = rng.reshape(g2, pd.LANES)
            sign, new_seed = jax.vmap(
                lambda fl, sd: pd.rng_kernel_call(fl, sd, p_tot, False)
            )(flags_l, seed_l)
            sign = _from_lanes(sign, b)
            rng = new_seed.reshape(-1)[:b]
            mag = jnp.where(
                type_p == REC_TAIL,
                lvl_p * jnp.exp(k * jnp.log(jnp.maximum(dcy_p, 1e-30))),
                lvl_p,
            )
            coefs = jnp.where(
                type_p == REC_COEF, lvl_p, jnp.where(is_draw, mag * sign, 0.0)
            )
            coefs = jnp.where(corrupt[:, None] == 1, 0.0, coefs).reshape(b, c, n)
            if stage == "rngk":
                return (offset, lap, prev_ss, rng), (jnp.sum(coefs),)

            pcm, lap, prev_ss = block_imdct_batched(coefs, wc, lap, prev_ss, cfg)
            pcm = inverse_ms(pcm)
            return (offset, lap, prev_ss, rng), (jnp.sum(pcm),)

        def fn(_):
            init = (
                jnp.zeros(b, jnp.int32),
                jnp.zeros((b, c, n // 2), jnp.float32),
                jnp.zeros(b, jnp.int32),
                jnp.full(b, 1234567, jnp.uint32),
            )
            _, outs = lax.scan(step, init, None, length=t)
            return outs

        return jax.jit(fn)

    audio = b * t * n / 44100.0
    stages = ["win", "fsm", "exp", "rngk", "imdct"]
    want = sys.argv[1:] or stages
    results = {}
    for name in want:
        g = make(name)
        t0 = time.perf_counter()
        o = g(0)
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = g(0)
            for leaf in jax.tree_util.tree_leaves(o):
                np.asarray(leaf)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        print(
            f"{name:6s} {best*1000:8.1f} ms  ({audio/best:7.1f}x rt)"
            f"  [compile {compile_s:.0f}s]",
            flush=True,
        )
    names = [k for k in stages if k in results]
    for a, bnm in zip(names, names[1:]):
        print(f"delta {a}->{bnm}: {(results[bnm]-results[a])*1000:8.1f} ms")


if __name__ == "__main__":
    main()
