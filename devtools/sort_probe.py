"""Probe: lax.sort along the last dim ([B, P], streams in rows) vs
along a middle dim ([G, P, 128], streams in lanes — the v3 kernel
layout).

If the lane-layout sort is not slower, the assemble/rank sorts can run
in kernel layout and the [G,P,128]<->[B,P] transposes around them
disappear (the bs4096 device trace shows those copies at ~23 ms/rep).

Each variant runs R iterations inside ONE jit (data varied per step so
nothing is hoisted), fetching only a digest: the ~15-35 ms per-call
dispatch/fetch floor through the tunnel would otherwise swamp the
measurement.

Usage: python devtools/sort_probe.py [P] [R]
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

    p = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    b, g = 512, 4

    rng = np.random.default_rng(3)
    kf_b = jnp.asarray(rng.standard_normal((b, p)).astype(np.float32))
    ki_b = jnp.asarray(rng.integers(0, 1 << 30, (b, p)).astype(np.int32))
    vi_b = jnp.asarray(rng.integers(0, 1 << 30, (b, p)).astype(np.int32))
    kf_l = kf_b.reshape(g, 128, p).transpose(0, 2, 1)
    ki_l = ki_b.reshape(g, 128, p).transpose(0, 2, 1)
    vi_l = vi_b.reshape(g, 128, p).transpose(0, 2, 1)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        d = f(*args)
        np.asarray(d)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:36s} {1e3 * best / r:8.2f} ms/iter")

    def loop(body, *arrs):
        def fn(*a):
            def step(i, c):
                outs = body(i, *c)
                return tuple(o.astype(x.dtype) for o, x in zip(outs, a))
            out = lax.fori_loop(0, r, step, a)
            return sum(jnp.sum(o[..., :1].astype(jnp.float32)) for o in out)
        return fn

    # rank-style: f32 key + s32 payload
    timed(
        f"[{b},{p}] f32+s32 last dim",
        loop(lambda i, k, v: lax.sort((k + i, v), dimension=1, num_keys=1), kf_b, vi_b),
        kf_b, vi_b,
    )
    timed(
        f"[{g},{p},128] f32+s32 axis 1",
        loop(lambda i, k, v: lax.sort((k + i, v), dimension=1, num_keys=1), kf_l, vi_l),
        kf_l, vi_l,
    )
    # assemble-style: s32 key + s32 payload
    timed(
        f"[{b},{p}] s32+s32 last dim",
        loop(lambda i, k, v: lax.sort((k + i, v), dimension=1, num_keys=1), ki_b, vi_b),
        ki_b, vi_b,
    )
    timed(
        f"[{g},{p},128] s32+s32 axis 1",
        loop(lambda i, k, v: lax.sort((k + i, v), dimension=1, num_keys=1), ki_l, vi_l),
        ki_l, vi_l,
    )
    # single-operand s32
    timed(
        f"[{b},{p}] s32 last dim",
        loop(lambda i, k: (lax.sort(k + i, dimension=1),), ki_b),
        ki_b,
    )
    timed(
        f"[{g},{p},128] s32 axis 1",
        loop(lambda i, k: (lax.sort(k + i, dimension=1),), ki_l),
        ki_l,
    )


if __name__ == "__main__":
    main()
