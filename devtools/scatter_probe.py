"""Probe alternative lowerings for the stream-pack step (TPU).

words[w] = sum_p lo[p]*[word[p]==w] + hi[p]*[word[p]==w-1], word
monotone per row. Candidates:
  scat  — two jnp .at[].add scatters (current _assemble form)
  sort  — build the nybble stream by one u32 sort: slot (p,k<7) gets
          key offs[p]*? packed with its nybble; valid targets are a
          permutation of [0,total) so sorted order IS the stream
  cmps  — words via wrapping-int compare-sums (forward-fill identity
          E[w] = sum_p lo[p]*[word[p]<=w]), w-axis processed whole
Each runs inside a jit'd lax.scan over T=8 steps on realistic shapes.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, P, T = 512, 4096, 8
N_WORDS = 2048


def make_inputs():
    rng = np.random.default_rng(0)
    cnt = rng.choice([0, 1, 2, 4, 7], size=(B, P), p=[0.55, 0.2, 0.15, 0.07, 0.03])
    offs = np.concatenate(
        [np.zeros((B, 1), np.int64), np.cumsum(cnt, -1)[:, :-1]], -1
    )
    assert offs.max() + 7 < 8 * N_WORDS  # targets stay in range, unclipped
    field = rng.integers(0, 1 << 28, (B, P), dtype=np.int64)
    # mask field nybbles beyond cnt (real packed words have them zero,
    # and the sort variant materializes exactly cnt nybbles)
    k = np.arange(7)
    keep = (k[None, None] < cnt[..., None]).astype(np.int64)
    nybs = ((field[..., None] >> (4 * k)) & 0xF) * keep
    field = np.sum(nybs << (4 * k), axis=-1)
    return (
        jnp.asarray(cnt.astype(np.int32)),
        jnp.asarray(offs.astype(np.int32)),
        jnp.asarray(field.astype(np.int32)),
    )


def v_scat(cnt, offs, field):
    bidx = jnp.arange(B)[:, None]
    word = offs >> 3
    shift = (offs & 7) * 4
    lo = (field << shift).astype(jnp.int32)
    hi = jnp.where(shift == 0, 0, (field >> (32 - shift))).astype(jnp.int32)
    has = cnt > 0
    words = jnp.zeros((B, N_WORDS), jnp.int32)
    words = words.at[bidx, jnp.where(has, word, N_WORDS)].add(
        jnp.where(has, lo, 0), mode="drop"
    )
    words = words.at[bidx, jnp.where(has, word + 1, N_WORDS)].add(
        jnp.where(has, hi, 0), mode="drop"
    )
    return words


def v_sort(cnt, offs, field):
    # slots (p, k<7): key = (q << 4) | nybble for k < cnt else BIG
    k = jnp.arange(7, dtype=jnp.int32)
    q = offs[:, :, None] + k  # [B, P, 7]
    nyb = (field[:, :, None] >> (4 * k)) & 0xF
    valid = k < cnt[:, :, None]
    key = jnp.where(valid, (q << 4) | nyb, jnp.int32(2**30))
    key = key.reshape(B, 7 * P)
    skey = lax.sort(key, dimension=-1)
    nyb_s = (skey & 0xF).astype(jnp.int32)[:, : 8 * N_WORDS]
    w = nyb_s.reshape(B, N_WORDS, 8)
    sh = (jnp.arange(8, dtype=jnp.int32) * 4)[None, None]
    return jnp.sum(w << sh, axis=-1).astype(jnp.int32)


def v_cmps(cnt, offs, field):
    word = offs >> 3
    shift = (offs & 7) * 4
    lo = (field << shift).astype(jnp.int32)
    hi = jnp.where(shift == 0, 0, (field >> (32 - shift))).astype(jnp.int32)
    has = cnt > 0
    lo = jnp.where(has, lo, 0)
    hi = jnp.where(has, hi, 0)
    wgrid = jnp.arange(N_WORDS, dtype=jnp.int32)
    # E[w] = sum_p v[p] * [word[p] <= w]; words from difference of fills
    def fill(v):
        le = word[:, None, :] <= wgrid[None, :, None]  # [B, W, P]
        return jnp.sum(jnp.where(le, v[:, None, :], 0), axis=-1)

    e_lo = fill(lo)
    e_hi = fill(hi)
    d_lo = e_lo - jnp.concatenate([jnp.zeros((B, 1), jnp.int32), e_lo[:, :-1]], 1)
    d_hi = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), e_hi[:, :-1]], 1) - \
        jnp.concatenate([jnp.zeros((B, 2), jnp.int32), e_hi[:, :-2]], 1)
    return d_lo + d_hi


def main():
    cnt, offs, field = make_inputs()
    variants = {"scat": v_scat, "sort": v_sort, "cmps": v_cmps}
    want = sys.argv[1:] or ["scat", "sort"]

    ref = None
    for name in want:
        f = variants[name]

        def stepped(c, o, fd):
            def body(carry, _):
                # vary the values per step so XLA can't hoist the body
                fd2 = fd ^ (carry & 0xF)
                w = f(c, o, fd2)
                return carry + jnp.sum(w), None

            out, _ = lax.scan(body, jnp.int32(0), None, length=T)
            return out, f(c, o, fd)

        g = jax.jit(stepped)
        t0 = time.perf_counter()
        s, w = g(cnt, offs, field)
        np.asarray(s)
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s, w = g(cnt, offs, field)
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
