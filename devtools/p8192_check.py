"""Large-P kernel-path validation on hardware, B=128:
stereo bs4096 / P=8192 (default), mono bs8192 / P=8192 ("mono8192"),
stereo bs8192 / P=16384 ("stereo8192"), mono bs16384 / P=16384
("mono16384"), stereo bs16384 / P=32768 ("stereo16384"), mono bs32768 /
P=32768 ("mono32768" — the top of the reference envelope), and the
multichannel shapes "4ch4096" (n_chan=4 bs4096, P=16384), "8ch4096"
(n_chan=8 bs4096, P=32768 — the envelope top reached via channels, not
block size) and "5ch2048" (n_chan=5 bs2048, P=10240 — odd channel
count exercises the unpaired M/S tail channel).

The threshold-keep v3 kernel's packed fields hold the reference's full
BLOCK envelope P <= 32768 (segdelta 16-bit segment length, state ncp
16 bits; pallas_encode3 docstring); this checks byte-level agreement
with the scan path on real shapes — sizes for a candidate ladder and
materialized bytes for chosen counts — running the kernel on the
default (TPU) backend and the scan oracle on the CPU backend in the
same process (prepare-side metadata computed once on CPU and fed to
both, see below). The decode leg rides the production dispatcher,
whose kernel FSM covers the same full P <= 32768 envelope (15-bit
position carry, pallas_decode docstring).

Usage: python devtools/p8192_check.py [mono8192|stereo8192|mono16384|
                                       stereo16384|mono32768|4ch4096|
                                       8ch4096|5ch2048]
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
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "mono8192":
        n, c = 8192, 1
    elif mode == "stereo8192":
        n, c = 8192, 2
    elif mode == "mono16384":
        n, c = 16384, 1
    elif mode == "stereo16384":
        n, c = 16384, 2
    elif mode == "mono32768":
        n, c = 32768, 1
    elif mode == "4ch4096":
        n, c = 4096, 4
    elif mode == "8ch4096":
        n, c = 4096, 8
    elif mode == "5ch2048":
        n, c = 2048, 5
    # P=32768 at B=128 exceeds HBM (the batched analysis candidates
    # alone are ~13 GB of intermediates); the kernel path is still
    # exercised at full lane width because fast_encode pads B -> 128.
    if c * n > 16384:
        b = int(os.environ.get("ULCX_CHECK_B", "32"))
    tep.N, tep.C = n, c  # synth_block reads module globals
    tep.CFG = CodecConfig(rate_hz=44100, n_chan=c, block_size=n)
    cfg = tep.CFG

    rng = np.random.default_rng(11)
    wcs = [int(w) for w in rng.choice([0x10, 0x28, 0x59, 0xFB, 0x3A, 0x6C], b)]
    cpu = jax.local_devices(backend="cpu")[0]
    # Prepare-side metadata (noise amp / HF-ext LSQ fits use exp —
    # backend-dependent transcendentals) is computed ONCE on the CPU
    # and fed to BOTH paths: this check asserts the Mosaic kernel
    # walk + assemble agree with the scan emit bit-exactly given the
    # same per-position inputs. Cross-backend float identity of the
    # fits is NOT a contract (a boundary case flips a decay code by
    # 1 LSB ~1/128 streams); same-backend fit equality of the two
    # prepare paths is covered byte-exactly by the CPU test suite.
    blks, bds = [], []
    with jax.default_device(cpu):
        for wc in wcs:
            blk, _, _, _ = synth_block(
                rng, wc, sparsity=float(rng.uniform(0.2, 0.8))
            )
            blks.append(blk)
            bds.append(prepare_block(blk, cfg))
        batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blks)
        fb_cpu = jax.jit(lambda bt: prepare_fast(bt, cfg))(batched)
    fb = jax.device_put(fb_cpu, jax.devices()[0])
    nout = jnp.broadcast_to(
        (jnp.arange(8) * (c * n // 16) + 64)[None, :], (b, 8)
    ).astype(jnp.int32)
    got = np.asarray(jax.jit(lambda f, nn: total_sizes(f, nn, cfg))(fb, nout))

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
        for i in range(0, b, 7):
            want_bits, want_by = mat_scan(bds[i], n_out[i])
            nb = int(want_bits) // 8
            assert int(sizes[i]) == int(want_bits), (i, wcs[i])
            assert bys[i, :nb].tobytes() == np.asarray(want_by)[:nb].tobytes(), i
            ok += 1
    print(f"materialize: {ok} streams byte-equal")

    # decode leg: the production dispatcher (FSM kernel at P <= 32768,
    # the full envelope) vs the scan decoder on CPU, same streams
    from ulcx.codec.decoder import decode_stream
    from ulcx.parallel.mesh import batch_decode

    win = 2 * c * n
    streams = np.zeros((b, win + 64), np.uint8)
    for i in range(b):
        nb = int(sizes[i]) // 8
        streams[i, :nb] = bys[i, :nb]
    sj = jnp.asarray(streams)
    pcm_k, bits_k, cor_k = jax.jit(
        lambda s: batch_decode(s, 1, win, cfg)
    )(sj)
    pcm_k = np.asarray(pcm_k)
    assert not np.asarray(cor_k).any(), "kernel decode flagged corrupt"
    ok = 0
    with jax.default_device(cpu):
        dec_scan = jax.jit(lambda s: decode_stream(s, 1, win, cfg)[:3])
        for i in range(0, b, 31):
            pcm_s, bits_s, cor_s = dec_scan(sj[i])
            assert not bool(np.asarray(cor_s).any()), i
            assert int(bits_k[i, 0]) == int(np.asarray(bits_s)[0]), i
            ref = np.asarray(pcm_s, np.float64)
            err = pcm_k[i].astype(np.float64) - ref
            rel = np.sqrt(err.var() / max(ref.var(), 1e-30))
            print(
                f"  stream {i}: bits match; rel RMS {rel:.2e} "
                f"max|err| {np.abs(err).max():.2e} "
                f"max|ref| {np.abs(ref).max():.2e}"
            )
            # TPU matmul IMDCT vs CPU f32: float-level agreement only
            assert rel < 1e-4, (i, rel)
            ok += 1
    print(f"decode: {ok} streams match the scan decoder")
    print(f"P={c * n} kernel path ({mode or 'stereo4096'}, B={b}): OK")


if __name__ == "__main__":
    main()
