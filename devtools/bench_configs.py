"""BASELINE.md benchmark-config sweep (beyond the headline bench.py
config): mono 96kbps CBR, VBR q50, ABR at block sizes 1024/2048/4096.

Writes one JSON line per config to stdout and the aggregate to
bench_configs.json at the repo root (committed as perf evidence).

Usage: python devtools/bench_configs.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    from bench import make_corpus
    from ulcx.parallel.mesh import batch_encode
    from ulcx.utils.config import CodecConfig

    # (name, n_chan, block_size, T, mode, kwargs). T scaled to keep
    # ~90s of audio per stream batch; B=512 throughout.
    configs = {
        "mono_cbr96_bs2048": (1, 2048, 64, "cbr", {"rate_kbps": 96.0}),
        "stereo_cbr128_bs2048": (2, 2048, 64, "cbr", {"rate_kbps": 128.0}),
        "stereo_vbr_q50_bs2048": (2, 2048, 64, "vbr", {"quality": 50.0}),
        "stereo_abr128_bs1024": (
            2, 1024, 128, "abr", {"rate_kbps": 128.0, "avg_complexity": 0.5},
        ),
        "stereo_abr128_bs2048": (
            2, 2048, 64, "abr", {"rate_kbps": 128.0, "avg_complexity": 0.5},
        ),
        # T=32: the audio-matched point. Measured T=64 on hardware at
        # 1860.6x vs 1899.7x at T=32 — T-scaling is saturated (slightly
        # reversed) at bs4096, unlike bs2048's 1587->1957 climb.
        "stereo_abr128_bs4096": (
            2, 4096, 32, "abr", {"rate_kbps": 128.0, "avg_complexity": 0.5},
        ),
    }
    want = sys.argv[1:] or list(configs)
    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    results = {}
    for name in want:
        c, n, t, mode, kw = configs[name]
        cfg = CodecConfig(
            rate_hz=44100,
            n_chan=c,
            block_size=n,
            transform_backend=os.environ.get("ULCX_BENCH_TBACKEND", "auto"),
            matmul_max_n=int(os.environ.get("ULCX_BENCH_MAXN", "2048")),
        )
        corpus = make_corpus(b, t, n)
        if c == 1:
            corpus = corpus[:, :, :1]
        blocks = jnp.asarray(corpus)
        audio_seconds = b * t * n / 44100.0

        def step(x):
            out, stats = batch_encode(x, cfg, mode, **kw)
            digest = (
                jnp.sum(out.data.astype(jnp.int32), axis=(1, 2))
                + out.size_bits.sum()
            )
            return out, digest

        fn = jax.jit(step)
        t0 = time.perf_counter()
        out, digest = fn(blocks)
        np.asarray(digest)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, digest = fn(blocks)
            np.asarray(digest)
            best = min(best, time.perf_counter() - t0)
        rtf = audio_seconds / best
        kbps = float(np.asarray(out.size_bits).astype(np.float64).mean()) * (
            44100.0 / n
        ) / 1000.0
        rec = {
            "metric": f"encode_rtf_{name}",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / 2000.0, 4),
            "avg_kbps": round(kbps, 2),
            "compile_s": round(compile_s, 1),
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)
        del blocks, out, digest, fn

    # A/B probe runs (non-default transform knobs) print only — the
    # committed aggregate records the default ("auto") configuration.
    if (
        os.environ.get("ULCX_BENCH_TBACKEND", "auto") != "auto"
        or os.environ.get("ULCX_BENCH_MAXN", "2048") != "2048"
    ):
        print("non-default transform knobs: skipping bench_configs.json write")
        return
    path = os.path.join(ROOT, "bench_configs.json")
    old = {}
    if os.path.exists(path):
        try:
            old = json.load(open(path))
        except Exception:
            pass
    old.update(results)
    json.dump(old, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
