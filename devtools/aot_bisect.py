"""Deviceless AOT compile-time bisection of the batched encode graph.

NOTES.md round-4 attribution established the hog is the shared XLA
analysis/prepare/assemble graph (not Mosaic, not trace size); this
harness cuts INSIDE that graph: each variant AOT-compiles the
production scan pipeline truncated after a named stage, so deltas
between consecutive variants attribute compile seconds to stages.

Usage: python devtools/aot_bisect.py [stage ...]   (default: all)
Stages: ana prep size mat full
Env: ULCX_COMPILE_EFFORT applies (the bench/throughput default is
unset = XLA default effort).
"""

from __future__ import annotations

import os
import sys
import time

os.environ["ULCX_FORCE_MOSAIC"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    from ulcx.utils.compileopts import jit_options
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "64"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    s = SingleDeviceSharding(topo.devices[0])
    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=n, use_pallas="on")

    from ulcx.analysis.batched import analyze_block_batched
    from ulcx.bitstream.fast_encode import (
        materialize_fast,
        prepare_fast,
        rate_search_fast,
        search_materialize_fast,
    )
    from ulcx.codec.encoder import init_carry_batched, max_block_bytes

    budget_i = int(n * 128.0 * 1000 / 44100)

    def stage_fn(stage):
        def fn(x):
            carry = init_carry_batched(cfg, b)

            def step(c, blk):
                c, ab = analyze_block_batched(c, blk, cfg)
                if stage == "ana":
                    return c, (ab.complexity, ab.n_nz)
                fb = prepare_fast(ab, cfg)
                if stage == "prep":
                    return c, (jnp.sum(fb.coef), jnp.sum(fb.aux))
                nnz = ab.n_nz.astype(jnp.int32)
                budget = jnp.full_like(nnz, budget_i)
                if stage == "size":
                    nsel = rate_search_fast(fb, nnz, budget, cfg, False)
                    return c, (jnp.sum(nsel),)
                if stage == "mat":
                    sz, by = materialize_fast(
                        fb, nnz, cfg, max_block_bytes(cfg), False
                    )
                    return c, (jnp.sum(sz), jnp.sum(by))
                _, sz, by = search_materialize_fast(
                    fb, nnz, budget, cfg, max_block_bytes(cfg), False
                )
                return c, (jnp.sum(sz), jnp.sum(by))

            _, outs = lax.scan(step, carry, x.transpose(1, 0, 2, 3))
            return outs

        return fn

    want = sys.argv[1:] or ["ana", "prep", "size", "mat", "full"]
    x = jax.ShapeDtypeStruct((b, t, 2, n), jnp.float32, sharding=s)
    for stage in want:
        t0 = time.perf_counter()
        lowered = jax.jit(
            stage_fn(stage), in_shardings=s, out_shardings=s
        ).lower(x)
        t1 = time.perf_counter()
        compiled = lowered.compile(compiler_options=jit_options())
        t2 = time.perf_counter()
        ma = compiled.memory_analysis()
        print(
            f"{stage:5s} B={b} T={t} bs={n}: lower {t1 - t0:.1f}s "
            f"compile {t2 - t1:.1f}s code "
            f"{ma.generated_code_size_in_bytes / 1e6:.1f}MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
