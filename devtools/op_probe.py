"""Amortized op-cost probes (20 reps inside one jit via scan — the
only way to see per-op cost through the tunnel's ~15-35ms dispatch
floor). Usage: python devtools/op_probe.py [probe ...]
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

    b = int(os.environ.get("ULCX_PROBE_B", "512"))
    p = 4096
    reps = 20
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, p)).astype(np.float32))

    def rank2(v):
        order = jnp.argsort(-v, axis=-1)
        return jnp.argsort(order, axis=-1).astype(jnp.int32)

    def probe_rank(v):
        def step(c, _):
            r = rank2(v + c)
            return c + 1.0, jnp.sum(r)
        _, out = lax.scan(step, jnp.float32(0), None, length=reps)
        return out

    def probe_sort1(v):
        def step(c, _):
            s = lax.sort(v + c, dimension=-1)
            return c + 1.0, jnp.sum(s)
        _, out = lax.scan(step, jnp.float32(0), None, length=reps)
        return out

    def probe_log(v):
        from ulcx.ops.fastlog import fast_log
        def step(c, _):
            r = fast_log(jnp.abs(v + c) + 1e-9)
            return c + 1.0, jnp.sum(r)
        _, out = lax.scan(step, jnp.float32(0), None, length=reps)
        return out

    def probe_cumsum(v):
        def step(c, _):
            r = jnp.cumsum(v + c, axis=-1)
            return c + 1.0, jnp.sum(r)
        _, out = lax.scan(step, jnp.float32(0), None, length=reps)
        return out

    probes = {
        "rank2": probe_rank,
        "sort1": probe_sort1,
        "fastlog": probe_log,
        "cumsum": probe_cumsum,
    }
    want = sys.argv[1:] or list(probes)
    for name in want:
        fn = jax.jit(probes[name])
        np.asarray(fn(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:8s} {best/reps*1e3:7.2f} ms/op  ([{b},{p}] f32)", flush=True)


if __name__ == "__main__":
    main()
