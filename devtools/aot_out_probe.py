"""AOT probe: how much compile time the OUTPUT side of the bench graph
costs (scan-stacked full byte planes + the [T,B]->[B,T] swapaxes),
vs the same pipeline with in-scan digests (aot_bisect.py full = 131 s
while the true bench graph = 235-245 s — NOTES.md r4 baseline).

Variants:
  bench   — exactly bench.py's enc_step (full out + digest)
  noswap  — full outputs left in scan-major [T, B, ...] layout
  digest  — per-step digests only (bytes reduced in-scan)

Usage: python devtools/aot_out_probe.py [variant ...]
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

    from ulcx.codec.encoder import encode_block_batched, init_carry_batched
    from ulcx.codec.encoder import encode_stream_batched
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "64"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    s = SingleDeviceSharding(topo.devices[0])
    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=n, use_pallas="on")

    def bench_fn(x):
        out, _ = encode_stream_batched(x, cfg, "cbr", rate_kbps=128.0)
        digest = jnp.sum(out.data.astype(jnp.int32), axis=(1, 2)) + out.size_bits.sum()
        return out, digest

    def noswap_fn(x):
        carry = init_carry_batched(cfg, b)

        def step(c, blk):
            c, enc = encode_block_batched(c, blk, cfg, "cbr", rate_kbps=128.0)
            return c, enc

        _, out = lax.scan(step, carry, x.transpose(1, 0, 2, 3))
        digest = jnp.sum(out.data.astype(jnp.int32), axis=(0, 2)) + out.size_bits.sum()
        return out, digest

    def digest_fn(x):
        carry = init_carry_batched(cfg, b)

        def step(c, blk):
            c, enc = encode_block_batched(c, blk, cfg, "cbr", rate_kbps=128.0)
            return c, (jnp.sum(enc.data.astype(jnp.int32), axis=1), enc.size_bits)

        _, (dg, bits) = lax.scan(step, carry, x.transpose(1, 0, 2, 3))
        return dg.sum(axis=0) + bits.sum()

    fns = {"bench": bench_fn, "noswap": noswap_fn, "digest": digest_fn}
    x = jax.ShapeDtypeStruct((b, t, 2, n), jnp.float32, sharding=s)
    for name in (sys.argv[1:] or ["digest", "noswap", "bench"]):
        t0 = time.perf_counter()
        lowered = jax.jit(fns[name], in_shardings=s, out_shardings=s).lower(x)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        ma = compiled.memory_analysis()
        print(
            f"{name:7s} B={b} T={t} bs={n}: lower {t1 - t0:.1f}s "
            f"compile {t2 - t1:.1f}s code "
            f"{ma.generated_code_size_in_bytes / 1e6:.1f}MB "
            f"temp {ma.temp_size_in_bytes / 1e6:.1f}MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
