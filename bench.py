"""Benchmark: batched 44.1 kHz stereo CBR-128 encode + decode throughput per chip.

Prints one JSON line per metric (encode last — the headline number):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline for encode is against the 2000x-realtime-per-chip target
(BASELINE.md); decode has no published baseline (reference decode is
"GBA-cheap", tools/ulcDecodeTool.c:140-150 prints a realtime factor) so
its vs_baseline is also vs 2000x for symmetry.

The corpus is heterogeneous and transient-heavy (BASELINE.md benchmark
config list): per-stream random tone stacks + AM + noise floor, with
clicks/onsets injected in ~40% of streams so window switching exercises
varied decimation patterns.

Env knobs: ULCX_BENCH_B (streams), ULCX_BENCH_T (blocks/stream),
ULCX_BENCH_MODE (cbr|abr|vbr), ULCX_BENCH_BS (block size),
ULCX_BENCH_DECODE (0 to skip the decode metric),
ULCX_BENCH_TBACKEND (transform_backend: auto|matmul|fact|fft),
ULCX_BENCH_MAXN (matmul_max_n — the auto matmul/fact crossover).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def make_corpus(b: int, t: int, n: int, rate_hz: float = 44100.0) -> np.ndarray:
    """[B, T, 2, N] heterogeneous stereo test signals."""
    rng = np.random.default_rng(7)
    total = t * n
    tt = np.arange(total, dtype=np.float64) / rate_hz

    # per-stream tone stack: 3 tones, random freqs/amps/phases, stereo
    # decorrelation via per-channel phase offsets
    f = rng.uniform(60.0, 9000.0, (b, 3, 1, 1))
    a = rng.uniform(0.02, 0.3, (b, 3, 1, 1)) * (0.5 ** np.arange(3)[None, :, None, None])
    ph = rng.uniform(0, 2 * np.pi, (b, 3, 2, 1))
    x = np.sum(a * np.sin(2 * np.pi * f * tt[None, None, None, :] + ph), axis=1)

    # slow AM envelope (per stream) + low noise floor
    fm = rng.uniform(0.3, 4.0, (b, 1, 1))
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * fm * tt[None, None, :])
    x += 0.01 * rng.standard_normal((b, 2, total))

    # transient clicks/onsets in ~40% of streams: exponentially decaying
    # bursts at random positions (what drives window switching)
    n_trans = int(0.4 * b)
    idx = rng.choice(b, n_trans, replace=False)
    for i in idx:
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(0, total - n))
            dur = int(rng.integers(n // 16, n // 2))
            burst = rng.standard_normal(dur) * np.exp(
                -np.arange(dur) / (0.12 * dur)
            )
            x[i, :, pos : pos + dur] += 0.5 * burst[None, :]

    x = np.clip(x, -1.0, 1.0).astype(np.float32)
    return np.ascontiguousarray(x.reshape(b, 2, t, n).transpose(0, 2, 1, 3))


def make_corpus_realistic(b: int, t: int, n: int) -> np.ndarray:
    """[B, T, 2, N] realistic synthesized material: streams cycle
    through tests/material.py's speech/percussion/poly generators with
    per-stream seeds. Slower to synthesize than make_corpus (python
    resonator loops), so callers cache; intended for quality-oriented
    sweeps (ULCX_BENCH_MATERIAL=realistic), not the throughput bench."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import material

    kinds = list(material.GENERATORS)
    out = np.empty((b, t, 2, n), np.float32)
    for i in range(b):
        out[i] = material.blocks_of(kinds[i % len(kinds)], n, t, 2,
                                    seed_offset=7 * (i // len(kinds)))
    return out


def _probe_backend(timeout_s: float = 240.0) -> bool:
    """Bounded device-backend probe in a subprocess.

    A wedged TPU tunnel blocks ~25 min inside client creation (native
    code, uninterruptible by signals in-process) before failing; a
    killable child process turns that into a fast, explicit skip so the
    harness never sees a silent multi-minute hang with no output."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import os, jax\n"
                "p = os.environ.get('ULCX_PLATFORM')\n"
                "p and jax.config.update('jax_platforms', p)\n"
                "jax.devices()",
            ],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    T0 = time.perf_counter()
    if not _probe_backend():
        print(
            "bench skipped: device backend unreachable (TPU tunnel down?)",
            flush=True,
        )
        raise SystemExit(3)
    import jax

    plat = os.environ.get("ULCX_PLATFORM")
    if plat:  # same escape hatch as the CLI tools (CPU smoke runs)
        jax.config.update("jax_platforms", plat)

    # persistent jit cache: the encode+decode compiles take minutes
    # through the remote compile helper; cached reruns skip them
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from ulcx.parallel.mesh import batch_decode, batch_encode
    from ulcx.utils.config import CodecConfig

    # T=64 default: throughput is fetch-floor-limited at small T (each
    # dispatch+fetch through the tunnel costs ~15-35 ms regardless of
    # work); longer streams amortize it exactly like production corpus
    # encoding would. Sweep: 1587/1826/1957/2055x at T=8/16/32/64.
    b = int(os.environ.get("ULCX_BENCH_B", "512"))
    t = int(os.environ.get("ULCX_BENCH_T", "64"))
    n = int(os.environ.get("ULCX_BENCH_BS", "2048"))
    mode = os.environ.get("ULCX_BENCH_MODE", "cbr")
    do_decode = os.environ.get("ULCX_BENCH_DECODE", "1") != "0"
    kw = {"rate_kbps": 128.0} if mode in ("cbr", "abr") else {"quality": 50.0}
    if mode == "abr":
        kw["avg_complexity"] = 0.5
    cfg = CodecConfig(
        rate_hz=44100,
        n_chan=2,
        block_size=n,
        flat_stream=os.environ.get("ULCX_BENCH_FLAT", "0") == "1",
        fold_bitstream=int(os.environ.get("ULCX_BENCH_FOLD", "1")),
        transform_backend=os.environ.get("ULCX_BENCH_TBACKEND", "auto"),
        matmul_max_n=int(os.environ.get("ULCX_BENCH_MAXN", "2048")),
    )

    blocks = jnp.asarray(make_corpus(b, t, n))
    audio_seconds = b * t * n / 44100.0

    def enc_step(x):
        # scan_major: outputs stay in the scan-produced [T, B] layout —
        # the [T,B]->[B,T] relayout of the stacked byte planes is pure
        # output sugar costing ~25% of the graph's compile time
        # (devtools/aot_out_probe.py)
        out, stats = batch_encode(x, cfg, mode, scan_major=True, **kw)
        # tiny on-device digest of the FULL byte output: fetching it
        # forces the whole pipeline (bytes included) with ONE small
        # host round trip — each np.asarray through the tunnel costs
        # ~15-35 ms of pure dispatch/fetch floor, which at >1000x
        # realtime would dominate the measurement
        digest = jnp.sum(out.data.astype(jnp.int32), axis=(0, 2)) + out.size_bits.sum()
        return out, stats, digest

    from ulcx.utils.compileopts import jit_options

    fn = jax.jit(enc_step, compiler_options=jit_options())
    out, stats, digest = fn(blocks)
    np.asarray(digest)  # warmup/compile
    np.asarray(out.data[0, 0])  # prove bytes materialize

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, stats, digest = fn(blocks)
        np.asarray(digest)
        best = min(best, time.perf_counter() - t0)
    enc_rtf = audio_seconds / best

    # The encode headline is measured NOW; the decode phase below pays
    # its own multi-minute non-cacheable compile. If the harness kills
    # this process mid-decode, the headline must not be lost with it:
    # emit it from the signal/exit path too (idempotent — prints once).
    _emitted = []

    def emit_encode():
        if _emitted:
            return
        _emitted.append(1)
        print(
            json.dumps(
                {
                    "metric": "encode_realtime_factor_per_chip_stereo44k_cbr128",
                    "value": round(enc_rtf, 2),
                    "unit": "x_realtime",
                    "vs_baseline": round(enc_rtf / 2000.0, 4),
                }
            ),
            flush=True,
        )

    import atexit
    import signal

    atexit.register(emit_encode)

    def _on_term(signum, frame):  # pragma: no cover
        emit_encode()
        raise SystemExit(0)

    for _sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(_sig, _on_term)
        except Exception:
            pass

    def decode_metric():
        # assemble contiguous byte streams on the host (container framing
        # is host-side file I/O in the tools too), then time batch decode
        sizes = np.asarray(out.size_bits)  # [T, B] (scan_major)
        datas = np.asarray(out.data)
        # window = actual max block size, as the ULC2 container records
        # it (tools/ulc_Helper.h MaxBlockSize; the reference decode tool
        # sizes its stream buffer from the header, ulcDecodeTool.c:78-80)
        win = -(-int(sizes.max() // 8) // 64) * 64 + 64
        streams = np.zeros((b, t * win + win + 64), np.uint8)
        for i in range(b):
            offs = 0
            for j in range(t):
                nb = int(sizes[j, i]) // 8
                streams[i, offs : offs + nb] = datas[j, i, :nb]
                offs += nb
        streams = jnp.asarray(streams)

        def dec_step(s):
            pcm, bits, corrupt = batch_decode(s, t, win, cfg)
            digest = jnp.sum(pcm, axis=(1, 2, 3)) + bits.sum() + corrupt.sum()
            return pcm, bits, corrupt, digest

        dec = jax.jit(dec_step, compiler_options=jit_options())
        pcm, bits, corrupt, ddig = dec(streams)
        np.asarray(pcm[0, 0])
        assert not np.asarray(corrupt).any(), "decode flagged corrupt streams"
        best_d = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            pcm, bits, corrupt, ddig = dec(streams)
            np.asarray(ddig)
            best_d = min(best_d, time.perf_counter() - t0)
        dec_rtf = audio_seconds / best_d
        print(
            json.dumps(
                {
                    "metric": "decode_realtime_factor_per_chip_stereo44k_cbr128",
                    "value": round(dec_rtf, 2),
                    "unit": "x_realtime",
                    "vs_baseline": round(dec_rtf / 2000.0, 4),
                }
            )
        )

    if do_decode:
        # the decode metric must never cost the encode headline: skip
        # it when the encode phase already consumed most of the run
        # budget (compiles through the remote helper take minutes and
        # are not cacheable), and shield the encode line from any
        # decode-side failure
        # encode's non-cacheable Mosaic compile alone is ~520 s; 480
        # silently dropped the decode metric from round-3 runs. The
        # encode headline is kill-safe now (emit_encode above), so the
        # deadline only bounds politeness toward the harness timeout.
        deadline = float(os.environ.get("ULCX_BENCH_DECODE_DEADLINE", "700"))
        elapsed = time.perf_counter() - T0
        if elapsed > deadline:
            print(f"decode metric skipped: {elapsed:.0f}s elapsed > {deadline:.0f}s deadline", flush=True)
        else:
            try:
                decode_metric()
            except Exception as e:  # pragma: no cover
                print(f"decode metric skipped: {e}", flush=True)

    emit_encode()


if __name__ == "__main__":
    main()
