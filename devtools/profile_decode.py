"""Device-trace one bench decode step and print the top ops by time.

Usage: python devtools/profile_decode.py [trace_dir]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ulcx_dtrace"
    import jax
    import jax.numpy as jnp
    from ulcx.parallel.mesh import batch_decode, batch_encode
    from ulcx.utils.config import CodecConfig
    from bench import make_corpus

    b, t, n = 512, 8, 2048
    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=n)
    blocks = jnp.asarray(make_corpus(b, t, n))
    enc = jax.jit(lambda x: batch_encode(x, cfg, "cbr", rate_kbps=128.0))
    o, _ = enc(blocks)
    sizes = np.asarray(o.size_bits)
    datas = np.asarray(o.data)
    win = -(-int(sizes.max() // 8) // 64) * 64 + 64
    streams = np.zeros((b, t * win + win + 64), np.uint8)
    for i in range(b):
        offs = 0
        for j in range(t):
            nb = int(sizes[i, j]) // 8
            streams[i, offs : offs + nb] = datas[i, j, :nb]
            offs += nb
    streams = jnp.asarray(streams)

    def dec_step(s):
        pcm, bits, corrupt = batch_decode(s, t, win, cfg)
        return jnp.sum(pcm, axis=(1, 2, 3)) + bits.sum()

    dec = jax.jit(dec_step)
    np.asarray(dec(streams))

    with jax.profiler.trace(out):
        for _ in range(2):
            np.asarray(dec(streams))

    paths = glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane produced")
        return
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(sorted(paths)[-1], "rb").read()
    )
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        total = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                total[ev.name] += ev.duration_ns
                count[ev.name] += 1
        print(f"== plane: {plane.name} (sum {sum(total.values())/1e6:.1f} ms)")
        for name, dur in sorted(total.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {dur/1e6:9.2f} ms  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
