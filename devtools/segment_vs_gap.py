"""Quantify the segment-vs-gap noise-window deviation (PARITY.md §2).

Encodes varied material with the scan path under both
noise_run_window settings and reports the distribution of per-block
size deltas and the decoded-PCM divergence. CPU.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from test_oracle_quality import _material, _decode_ulcx
from ulcx.codec.encoder import encode_stream
from ulcx.utils.config import CodecConfig


def run(n, c, mode, t=6, seed=3, transients=True, **kw):
    blocks = _material(n, t, c, seed=seed, transients=transients)
    outs = {}
    for win in ("gap", "segment"):
        cfg = CodecConfig(
            rate_hz=44100, n_chan=c, block_size=n, noise_run_window=win
        )
        out, _ = encode_stream(jnp.asarray(blocks), cfg, mode, **kw)
        sizes = np.asarray(out.size_bits)
        pcm = _decode_ulcx(sizes, np.asarray(out.data), t, cfg)
        outs[win] = (sizes, pcm)
    sg, pg = outs["gap"]
    ss, ps = outs["segment"]
    deltas = (ss.astype(int) - sg.astype(int)).tolist()
    rel = abs(int(ss.sum()) - int(sg.sum())) / int(sg.sum())
    rms = float(np.sqrt(np.mean((ps.astype(np.float64) - pg) ** 2)))
    ref = blocks[:-1].astype(np.float64)

    def snr(p):
        e = p[1:] - ref
        return 10 * np.log10(np.sum(ref**2) / max(np.sum(e**2), 1e-30))

    return deltas, rel, rms, snr(pg), snr(ps)


CASES = [
    ("cbr st128 bs1024 trans", dict(n=1024, c=2, mode="cbr", rate_kbps=128.0)),
    ("cbr st128 bs1024 plain", dict(n=1024, c=2, mode="cbr", transients=False, rate_kbps=128.0)),
    ("cbr mono64 bs2048 trans", dict(n=2048, c=1, mode="cbr", t=4, rate_kbps=64.0)),
    ("vbr q40 st bs1024 trans", dict(n=1024, c=2, mode="vbr", quality=40.0)),
    ("cbr st96 bs1024 noisy", dict(n=1024, c=2, mode="cbr", seed=11, rate_kbps=96.0)),
]

all_deltas = []
for name, kw in CASES:
    deltas, rel, rms, s_g, s_s = run(**kw)
    all_deltas += [abs(d) for d in deltas]
    print(
        f"{name:26s} block-size deltas(bits) {deltas}  total {100*rel:.3f}%  "
        f"rms {rms:.2e}  snr gap/seg {s_g:.2f}/{s_s:.2f}",
        flush=True,
    )
print(
    f"\nabs per-block deltas: max {max(all_deltas)} bits, "
    f"mean {np.mean(all_deltas):.1f}, zero-fraction "
    f"{np.mean([d == 0 for d in all_deltas]):.2f}"
)
