"""Benchmark: batched 44.1 kHz stereo CBR-128 encode throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is against the 2000x-realtime-per-chip target (BASELINE.md).

Env knobs: ULCX_BENCH_B (streams), ULCX_BENCH_T (blocks/stream),
ULCX_BENCH_MODE (cbr|vbr), ULCX_BENCH_BS (block size).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ulcx.parallel.mesh import batch_encode
    from ulcx.utils.config import CodecConfig

    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "8"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))
    mode = os.environ.get("ULCX_BENCH_MODE", "cbr")
    kw = {"rate_kbps": 128.0} if mode in ("cbr", "abr") else {"quality": 50.0}
    if mode == "abr":
        kw["avg_complexity"] = 0.5
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

    fn = jax.jit(lambda x: batch_encode(x, cfg, mode, **kw))
    out, stats = fn(blocks)
    np.asarray(out.size_bits)  # warmup/compile; full host materialization
    np.asarray(out.data[0, 0])

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, stats = fn(blocks)
        # block_until_ready is not sufficient through remote-execution
        # backends; materialize outputs to be honest about completion
        np.asarray(out.size_bits)
        np.asarray(out.data[0, 0])
        best = min(best, time.perf_counter() - t0)

    audio_seconds = b * t * n / 44100.0
    rtf = audio_seconds / best
    print(
        json.dumps(
            {
                "metric": "encode_realtime_factor_per_chip_stereo44k_cbr128",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 2000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
