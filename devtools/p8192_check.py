"""P=8192 kernel-path validation on hardware: stereo bs4096, B=128.

The v3 kernel path's packed fields hold exactly P=8192 (rank/segdelta
13 bits = 0..8191, ncp 14 bits); this checks byte-level agreement with
the scan path on real shapes — sizes for a candidate ladder and
materialized bytes for chosen counts — running the kernel on the
default (TPU) backend and the scan oracle on the CPU backend in the
same process.

Usage: python devtools/p8192_check.py
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ))
    from test_encode_pass import synth_block  # noqa: E402 (test helper reuse)
    from ulcx.analysis.block import AnalyzedBlock
    from ulcx.bitstream.encode import (
        encode_pass_materialize,
        encode_pass_size,
        prepare_block,
    )
    from ulcx.bitstream.fast_encode import (
        materialize_fast,
        prepare_fast,
        total_sizes,
    )
    from ulcx.utils.config import CodecConfig

    import test_encode_pass as tep

    n, c, b = 4096, 2, 128
    tep.N, tep.C = n, c  # synth_block reads module globals
    tep.CFG = CodecConfig(rate_hz=44100, n_chan=c, block_size=n)
    cfg = tep.CFG

    rng = np.random.default_rng(11)
    wcs = [int(w) for w in rng.choice([0x10, 0x28, 0x59, 0xFB, 0x3A, 0x6C], b)]
    blks, bds = [], []
    for wc in wcs:
        blk, _, _, _ = synth_block(rng, wc, sparsity=float(rng.uniform(0.2, 0.8)))
        blks.append(blk)
        bds.append(prepare_block(blk, cfg))
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blks)

    fb = jax.jit(lambda bt: prepare_fast(bt, cfg))(batched)
    nout = jnp.broadcast_to(
        (jnp.arange(8) * 512 + 64)[None, :], (b, 8)
    ).astype(jnp.int32)
    got = np.asarray(jax.jit(lambda f, nn: total_sizes(f, nn, cfg))(fb, nout))

    cpu = jax.local_devices(backend="cpu")[0]
    ok = 0
    with jax.default_device(cpu):
        size_scan = jax.jit(lambda bd, k: encode_pass_size(bd, k, "segment"))
        for i in range(0, b, 17):
            for j in range(0, 8, 3):
                want = int(size_scan(bds[i], nout[i, j]))
                assert got[i, j] == want, (i, j, wcs[i], got[i, j], want)
                ok += 1
    print(f"sizes: {ok} (stream, cand) points byte-equal")

    n_out = jnp.asarray(rng.integers(50, 2 * n - 1, b).astype(np.int32))
    sizes, bys = jax.jit(
        lambda f, nn: materialize_fast(f, nn, cfg, 2 * c * n)
    )(fb, n_out)
    sizes, bys = np.asarray(sizes), np.asarray(bys)
    ok = 0
    with jax.default_device(cpu):
        mat_scan = jax.jit(
            lambda bd, k: encode_pass_materialize(bd, k, 2 * c * n, "segment")
        )
        for i in range(0, b, 31):
            want_bits, want_by = mat_scan(bds[i], n_out[i])
            nb = int(want_bits) // 8
            assert int(sizes[i]) == int(want_bits), (i, wcs[i])
            assert bys[i, :nb].tobytes() == np.asarray(want_by)[:nb].tobytes(), i
            ok += 1
    print(f"materialize: {ok} streams byte-equal")
    print("P=8192 kernel path: OK")


if __name__ == "__main__":
    main()
