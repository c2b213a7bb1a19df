"""Compile-time vs runtime A/B for ULCX_KERNEL_UNROLL (full|N|1).

The v3 kernel chunk walks trace CHUNK x body ops under full unroll —
the dominant share of bench.py's ~minutes-long non-cacheable Mosaic
compile. _chunk_loop's structural partial unroll (outer fori over
CHUNK//N) shrinks the program; this measures both sides of the trade
on the real pipeline (one process per unroll value — the constant is
read at module import).

Usage: ULCX_KERNEL_UNROLL=16 python devtools/unroll_bench.py
Prints: compile seconds (time to first digest) + best rep ms + x-rt.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sys.path.insert(0, ROOT)
    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from ulcx.parallel.mesh import batch_encode
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "8"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))
    u = os.environ.get("ULCX_KERNEL_UNROLL", "full")

    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=n)
    blocks = jnp.asarray(make_corpus(b, t, n))
    audio_seconds = b * t * n / 44100.0

    def step(x):
        out, stats = batch_encode(x, cfg, "cbr", rate_kbps=128.0)
        digest = jnp.sum(out.data.astype(jnp.int32), axis=(1, 2)) + out.size_bits.sum()
        return digest

    fn = jax.jit(step)
    t0 = time.perf_counter()
    np.asarray(fn(blocks))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(blocks))
        best = min(best, time.perf_counter() - t0)
    print(
        f"unroll={u}: compile {compile_s:.1f}s  rep {1e3 * best:.1f}ms  "
        f"{audio_seconds / best:.1f}x rt (B={b} T={t} bs={n})",
        flush=True,
    )


if __name__ == "__main__":
    main()
