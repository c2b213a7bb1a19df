"""Isolated warm-timing A/B: in-VMEM sort kernels vs the XLA sorts
they replace, at the production bs4096 shapes.

The end-to-end bs4096 A/B (2026-08-19) measured ULCX_SORTK=1 at
1711.5x vs 1899.7x default — a 10% REGRESSION despite the trace
attributing ~26% of device time to the three sorts. This harness times
each primitive in isolation (warm, digest-fetched) to localize which
kernel loses and by how much.

Usage: python devtools/sortk_bench.py [B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _time(fn, *args, reps=5):
    import jax.numpy as jnp

    out = fn(*args)
    np.asarray(out.sum() if hasattr(out, "sum") else out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sys.path.insert(0, ROOT)
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from jax import lax

    from ulcx.ops.sortk import sort_kv_lanes

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(3)

    @jax.jit
    def kv_xla(key, val):
        return lax.sort((key, val), dimension=1, num_keys=1)[1]

    for p in (4096, 8192):
        g, lan = max(1, b // 128), 128
        key = rng.integers(0, p // 2, (g, p, lan)).astype(np.int32)
        key[key > p // 3] = 2**30
        val = rng.integers(0, 2**20, (g, p, lan)).astype(np.int32)
        kj, vj = jnp.asarray(key), jnp.asarray(val)
        t_k = _time(lambda a, c: sort_kv_lanes(a, c, interpret=False), kj, vj)
        t_x = _time(kv_xla, kj, vj)
        print(
            f"kv-sort [G={g}, P={p}, L={lan}]: kernel {t_k*1e3:7.2f} ms  "
            f"xla {t_x*1e3:7.2f} ms  ratio {t_k/t_x:.2f}x", flush=True,
        )


if __name__ == "__main__":
    main()
