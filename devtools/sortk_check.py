"""Hardware equality check for the in-VMEM sort kernels (ops/sortk.py).

The unit tests run the network interpret=True at P=64 (XLA:CPU compiles
the substage graph pathologically slowly at production P); this harness
closes the remaining gap by running the COMPILED Mosaic kernels on the
real chip at production shapes and asserting bit-equality against the
XLA fallback paths:

  - sort_kv_lanes [G, 4096, 128] and [G, 8192, 128] in the assemble
    lane layout (distinct small keys + massed sentinel ties);
  - sort_kv_lanes2 at the same shapes in the threshold-plane form
    (tie-heavy monotone_i32 keys incl. NaN/±0/±inf, position-iota
    vals), both outputs vs the stable 1-key lax.sort.

(The fused rank kernel this harness also covered through round 3 is
retired — devtools/sortk_bench.py measured it 1.15-1.24x slower than
the XLA sorts, and the threshold-keep redesign removed rank
materialization altogether.)

Usage: python devtools/sortk_check.py [B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tie_heavy(rng, b, p):
    flat = rng.standard_normal((b, p)).astype(np.float32)
    flat[flat < -1.2] = -np.inf
    flat[np.abs(flat) < 0.05] = 0.0
    flat[0, : p // 8] = flat[0, p // 8 : p // 4]
    flat[1, 0] = -0.0
    flat[1, 1] = 0.0
    flat[2, 3] = np.nan
    flat[2, 9] = -np.nan
    flat[3, :64] = np.frombuffer(
        np.uint32(0x7FC00001).tobytes(), dtype=np.float32
    )[0]
    flat[4, -64:] = np.frombuffer(
        np.uint32(0xFFC00001).tobytes(), dtype=np.float32
    )[0]
    return flat


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

    from ulcx.ops.sortk import monotone_i32, sort_kv_lanes, sort_kv_lanes2

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0xC0DEC)
    ok = True

    for p in (4096, 8192):
        g, lan = max(1, b // 128), 128
        key = rng.integers(0, p // 2, (g, p, lan)).astype(np.int32)
        key[key > p // 3] = 2**30
        val = rng.integers(0, 2**20, (g, p, lan)).astype(np.int32)
        kj, vj = jnp.asarray(key), jnp.asarray(val)
        t0 = time.perf_counter()
        got = np.asarray(sort_kv_lanes(kj, vj, interpret=False))
        t_kern = time.perf_counter() - t0
        ref = np.asarray(lax.sort((kj, vj), dimension=1, num_keys=2)[1])
        eq = np.array_equal(got, ref)
        ok &= eq
        print(
            f"sort_kv_lanes [G={g}, P={p}, L={lan}]: "
            f"{'EXACT' if eq else 'MISMATCH'} (first call {t_kern:.1f}s)"
        )

        # threshold-plane form: ~monotone importance key, position vals
        f = _tie_heavy(rng, g * lan, p)
        kl = np.asarray(
            jnp.asarray(~monotone_i32(jnp.asarray(f)))
        ).reshape(g, lan, p).transpose(0, 2, 1)
        vi = np.broadcast_to(
            np.arange(p, dtype=np.int32)[None, :, None], (g, p, lan)
        ).copy()
        kj2, vj2 = jnp.asarray(kl), jnp.asarray(vi)
        t0 = time.perf_counter()
        gk, gv = sort_kv_lanes2(kj2, vj2, interpret=False)
        gk, gv = np.asarray(gk), np.asarray(gv)
        t_kern = time.perf_counter() - t0
        rk, rv = lax.sort((kj2, vj2), dimension=1, num_keys=1)
        eq = np.array_equal(gk, np.asarray(rk)) and np.array_equal(
            gv, np.asarray(rv)
        )
        ok &= eq
        print(
            f"sort_kv_lanes2 [G={g}, P={p}, L={lan}]: "
            f"{'EXACT' if eq else 'MISMATCH'} (first call {t_kern:.1f}s)"
        )

    print("sortk_check:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
