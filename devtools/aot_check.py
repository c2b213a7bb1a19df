"""Deviceless AOT compile of the production pipeline for TPU v5e.

libtpu is installed locally, so `jax.experimental.topologies` can build
a v5e TopologyDescription and `jax.jit(...).lower(...).compile()` runs
the FULL XLA:TPU pipeline — including Mosaic kernel compilation —
without any chip attached. This validates Mosaic acceptance of the
Pallas kernels (the failure mode that bit round 1's FSM carry) and
measures compile cost for compile-time levers (ULCX_KERNEL_UNROLL),
even while the TPU tunnel is down.

Usage:
  python devtools/aot_check.py encode [B T BS]   # default 512 64 2048
  python devtools/aot_check.py decode [B T BS]
Env: ULCX_KERNEL_UNROLL / ULCX_BENCH_FOLD as in bench.py.
"""

from __future__ import annotations

import os
import sys
import time

os.environ["ULCX_FORCE_MOSAIC"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # stay off the axon tunnel
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    from ulcx.utils.config import CodecConfig

    what = sys.argv[1] if len(sys.argv) > 1 else "encode"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    s = SingleDeviceSharding(topo.devices[0])
    cfg = CodecConfig(
        rate_hz=44100,
        n_chan=2,
        block_size=n,
        use_pallas="on",
        fold_bitstream=int(os.environ.get("ULCX_BENCH_FOLD", "1")),
    )

    t0 = time.perf_counter()
    if what == "encode":
        # the exact bench.py enc_step graph (scan-major outputs + digest)
        from ulcx.codec.encoder import encode_stream_batched

        # scan_major matches bench.py's headline graph (the [T,B]->[B,T]
        # relayout alone is ~25% of compile); ULCX_AOT_SCANMAJOR=0 for
        # the public-default layout
        sm = os.environ.get("ULCX_AOT_SCANMAJOR", "1") == "1"

        def fn(x):
            out, _ = encode_stream_batched(
                x, cfg, "cbr", scan_major=sm, rate_kbps=128.0
            )
            digest = (
                jnp.sum(out.data.astype(jnp.int32), axis=(0, 2))
                + out.size_bits.sum()
            )
            return out, digest

        x = jax.ShapeDtypeStruct((b, t, 2, n), jnp.float32, sharding=s)
        lowered = jax.jit(fn, in_shardings=s, out_shardings=s).lower(x)
    else:
        from ulcx.parallel.mesh import batch_decode

        win = 2 * cfg.n_chan * n
        fn = lambda ss: batch_decode(ss, t, win, cfg)
        x = jax.ShapeDtypeStruct((b, t * win + 64), jnp.uint8, sharding=s)
        lowered = jax.jit(fn, in_shardings=s, out_shardings=s).lower(x)
    t1 = time.perf_counter()
    from ulcx.utils.compileopts import jit_options

    opts = jit_options()  # ULCX_COMPILE_EFFORT passthrough
    compiled = lowered.compile(compiler_options=opts) if opts else lowered.compile()
    t2 = time.perf_counter()
    ma = compiled.memory_analysis()
    print(
        f"{what} B={b} T={t} bs={n} "
        f"unroll={os.environ.get('ULCX_KERNEL_UNROLL','full')} "
        f"fold={cfg.fold_bitstream}: "
        f"lower {t1 - t0:.1f}s compile {t2 - t1:.1f}s  "
        f"code {ma.generated_code_size_in_bytes/1e6:.1f}MB "
        f"temp {ma.temp_size_in_bytes/1e6:.1f}MB",
        flush=True,
    )


if __name__ == "__main__":
    main()
