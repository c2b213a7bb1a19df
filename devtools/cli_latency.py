"""Single-file CLI latency: cold and warm wall time for a 3-minute WAV
through the two tools (the reference's user contract is the file-based
CLI, ulcEncodeTool.c:122-149; batch throughput alone doesn't show what
one `ulcencodetool in.wav out.ulc 128` costs a user).

"Cold" = empty persistent jit cache (first-ever invocation on a
machine); "warm" = second invocation of the same process arguments
(cache hit, still a fresh Python process). Numbers land in NOTES.md.

Usage: python devtools/cli_latency.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_wav(path: str, seconds: float = 180.0):
    import numpy as np

    sys.path.insert(0, ROOT)
    from ulcx.io.wavio import WavWriter

    sr = 44100
    n = int(sr * seconds)
    t = np.arange(n, dtype=np.float64) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.15 * np.sin(2 * np.pi * 1870.0 * t + 0.3)
        + 0.02 * np.random.default_rng(5).standard_normal(n)
    )
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t)
    st = np.stack([x * am, 0.85 * x * am], axis=1).astype(np.float32)
    w = WavWriter(path, sr, 2, 16, 1)
    w.write_frames(st)
    w.close()


def _run(args, cache_dir, label):
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m"] + args, env=env, capture_output=True, text=True
    )
    dt = time.perf_counter() - t0
    ok = r.returncode == 0
    print(f"{label}: {dt:7.1f}s {'ok' if ok else 'FAILED'}", flush=True)
    if not ok:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        sys.exit(1)
    return dt


def main():
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ulcx_cli_latency"
    os.makedirs(wd, exist_ok=True)
    wav = os.path.join(wd, "in3min.wav")
    if not os.path.exists(wav):
        _make_wav(wav)
    cache = os.path.join(wd, "jit_cache")
    shutil.rmtree(cache, ignore_errors=True)
    os.makedirs(cache)

    ulc = os.path.join(wd, "out.ulc")
    dec = os.path.join(wd, "dec.wav")
    enc_args = ["ulcx.tools.encode_tool", wav, ulc, "128", "-blocksize:2048"]
    dec_args = ["ulcx.tools.decode_tool", ulc, dec]

    e_cold = _run(enc_args, cache, "encode cold")
    e_warm = _run(enc_args, cache, "encode warm")
    d_cold = _run(dec_args, cache, "decode cold")
    d_warm = _run(dec_args, cache, "decode warm")
    print(
        f"cli_latency (180s stereo wav): encode {e_cold:.1f}s cold / "
        f"{e_warm:.1f}s warm ({180/e_warm:.1f}x rt), decode "
        f"{d_cold:.1f}s cold / {d_warm:.1f}s warm ({180/d_warm:.1f}x rt)"
    )


if __name__ == "__main__":
    main()
