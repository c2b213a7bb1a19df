"""Probe the per-step stream-window word slice (TPU).

decode_stream_batched slices [B, n_words] windows at per-stream word
offsets from the packed stream [B, S/4]. The vmap'd dynamic_slice
lowers to a 512-iteration while loop (~1.1 ms/step in the round-4
trace). Candidates:
  vds   — jax.vmap(lax.dynamic_slice) (current)
  gat   — take_along_axis gather with [B, n_words] indices
  oh    — one-hot shift matmul: windows = sum_s stream[:, s] * onehot
          (s - off == w)  — exact small-int f32 matmul per offset class
Usage: python devtools/winslice_probe.py [variant ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, S_WORDS, N_WORDS, T = 512, 1889, 209, 8


def make_inputs():
    rng = np.random.default_rng(0)
    stream = rng.integers(-(2**31), 2**31, (B, S_WORDS), dtype=np.int64)
    offs = rng.integers(0, S_WORDS - N_WORDS, (B,), dtype=np.int64)
    return jnp.asarray(stream.astype(np.int32)), jnp.asarray(offs.astype(np.int32))


def v_vds(stream, offs):
    return jax.vmap(lambda s, o: lax.dynamic_slice(s, (o,), (N_WORDS,)))(
        stream, offs
    )


def v_gat(stream, offs):
    idx = offs[:, None] + jnp.arange(N_WORDS, dtype=jnp.int32)[None, :]
    return jnp.take_along_axis(stream, idx, axis=1)


def v_lgat(stream, offs):
    """One lax.gather of [1, N_WORDS] contiguous slices (row-granular),
    instead of vmap(dynamic_slice)'s 512-iteration while loop."""
    b = stream.shape[0]
    starts = jnp.stack(
        [jnp.arange(b, dtype=jnp.int32), offs.astype(jnp.int32)], axis=1
    )  # [B, 2] = (row, word offset)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    return lax.gather(
        stream, starts, dnums, slice_sizes=(1, N_WORDS),
        mode=lax.GatherScatterMode.CLIP,
    )


def main():
    stream, offs = make_inputs()
    variants = {"vds": v_vds, "gat": v_gat, "lgat": v_lgat}
    want = sys.argv[1:] or ["vds", "gat", "lgat"]

    ref = None
    for name in want:
        f = variants[name]

        def stepped(st, of):
            def body(carry, _):
                of2 = (of + (carry & 0x3)) % (S_WORDS - N_WORDS)
                w = f(st, of2)
                return carry + jnp.sum(w), None

            out, _ = lax.scan(body, jnp.int32(0), None, length=T)
            return out, f(st, of)

        g = jax.jit(stepped)
        t0 = time.perf_counter()
        s, w = g(stream, offs)
        np.asarray(s)
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s, w = g(stream, offs)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        w_np = np.asarray(w)
        if ref is None:
            ref = w_np
            ok = "ref"
        else:
            ok = "OK" if np.array_equal(ref, w_np) else "MISMATCH"
        print(
            f"{name:5s} {best*1000/T:7.2f} ms/step  [{ok}; compile {compile_s:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
