"""Kernel-backed batched decoder path.

Pipeline per block (batch of streams):
  byte windows -> nybbles -> [FSM kernel] records -> gather-free record
  expansion (scatter at record starts + associative-scan forward fill)
  -> [RNG kernel] noise signs -> coefficients.

Used by ulcx.codec.decoder.decode_stream_batched when eligible (TPU or
forced); the scan path remains the bit-identical reference.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ulcx.bitstream import pallas_decode as pd
from ulcx.bitstream.decode import REC_COEF, REC_NOISE, REC_TAIL
from ulcx.utils.config import CodecConfig


def _ffill(values, flag, init):
    """Forward fill along the last axis: value at p = last flagged value
    at position <= p, else ``init`` (associative scan, no gathers)."""

    def combine(l, r):
        fl, vl = l
        fr, vr = r
        return fl | fr, jnp.where(fr, vr, vl)

    f, v = lax.associative_scan(
        combine, (flag, jnp.where(flag, values, 0)), axis=values.ndim - 1
    )
    return jnp.where(f, v, jnp.asarray(init, values.dtype))


def _to_lanes(x, b):
    """[B, T] -> [G, T, 128] (pad batch to a multiple of 128)."""
    g = -(-b // pd.LANES)
    pad = g * pd.LANES - b
    xp = jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
    ) if pad else x
    return xp.reshape(g, pd.LANES, -1).transpose(0, 2, 1), g, pad


def _from_lanes(x, b):
    """[G, T, 128] -> [B, T]."""
    y = x.transpose(0, 2, 1)
    return y.reshape(-1, x.shape[1])[:b]


def fsm_records(windows, cfg: CodecConfig, interpret=False):
    """FSM pass only: windows [B, W] uint8 at block starts ->
    (rec [B, R], code [B, R], wc [B], hdr [B], consumed [B],
    corrupt [B] i32)."""
    n = cfg.block_size
    p_tot = n * cfg.n_chan
    b, w_bytes = windows.shape

    lo = (windows & 0xF).astype(jnp.int32)
    hi = (windows >> 4).astype(jnp.int32)
    nyb = jnp.stack([lo, hi], axis=-1).reshape(b, 2 * w_bytes)

    wc0 = nyb[:, 0]
    has2 = (wc0 & 0x8) != 0
    wc = jnp.where(has2, wc0 | (nyb[:, 1] << 4), wc0 | (1 << 4)).astype(jnp.int32)
    hdr = jnp.where(has2, 2, 1).astype(jnp.int32)
    t_len = 2 * w_bytes - 2
    tokens = jnp.where(has2[:, None], nyb[:, 2 : t_len + 2], nyb[:, 1 : t_len + 1])

    tok_l, g, pad = _to_lanes(tokens, b)
    wc_l = jnp.concatenate([wc, jnp.full((pad,), 0x10, jnp.int32)]) if pad else wc
    wc_l = wc_l.reshape(g, pd.LANES)

    rec, code, consumed, corrupt = pd.fsm_kernel_call(
        wc_l, tok_l, p_tot, n, interpret
    )
    rec = _from_lanes(rec, b)
    code = _from_lanes(code, b)
    consumed = consumed.reshape(-1)[:b]
    corrupt = corrupt.reshape(-1)[:b]
    return rec, code, wc, hdr, consumed, corrupt


def _mm_place(emit, start, meta, p_tot: int):
    """Record placement as a factorized one-hot int8 matmul on the MXU.

    plane[b, hi*128 + lo] = sum_r onehot_hi(start) * meta * onehot_lo
    with meta split into four 7-bit parts so every operand fits int8
    and the s32 accumulation is exact integer arithmetic (each position
    receives at most ONE record — starts are strictly increasing).
    Probe (devtools/recscatter_probe.py, TPU): 1.7x faster than the
    .at[].set scatter at the bs2048 shape."""
    b, r = meta.shape
    nhi = p_tot // 128
    hi = jnp.where(emit, start >> 7, nhi)  # nhi = off-grid drop bucket
    lo = start & 127
    kk = jnp.arange(4, dtype=jnp.int32)
    parts = (meta[:, None, :] >> (7 * kk[None, :, None])) & 0x7F  # [B,4,R]
    hgrid = jnp.arange(nhi, dtype=jnp.int32)
    oh_hi = hi[:, None, :] == hgrid[None, :, None]  # [B,nhi,R]
    u = (oh_hi[:, None] * parts[:, :, None]).astype(jnp.int8)
    u = u.reshape(b, 4 * nhi, r)
    lgrid = jnp.arange(128, dtype=jnp.int32)
    v = ((lo[:, :, None] == lgrid[None, None, :]) & emit[:, :, None])
    v = v.astype(jnp.int8)  # [B,R,128]
    out = lax.dot_general(
        u, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).reshape(b, 4, nhi, 128)
    sh = (7 * kk)[None, :, None, None]
    return jnp.sum(out << sh, axis=1).reshape(b, p_tot)


def records_to_flags(rec, code, p_tot: int):
    """Expansion inputs: place records at their start positions — ONE
    packed word per record (flags + level/decay/quantizer codes).
    Round 2 used three scatters (meta + sparse f32 lvl/dcy); round 4
    replaced the remaining scatter with the _mm_place int8 matmul (the
    scatter was 62% of batched decode device time) and removed the
    draw-bit forward fill that used to follow (the RNG kernel latches
    it at record starts itself). ULCX_RECSCATTER=scatter restores the
    .at[].set form. Returns flags [B, p_tot] i32."""
    import os

    b = rec.shape[0]
    rtype = (rec >> 15) & 0x7
    start = rec & 0x7FFF
    emit = rtype != 0

    draw_rec = (rtype == REC_NOISE) | (rtype == REC_TAIL)
    meta = jnp.where(
        emit,
        1 | (draw_rec.astype(jnp.int32) << 1)
        | ((rtype == REC_COEF).astype(jnp.int32) << 2)
        | ((rtype == REC_TAIL).astype(jnp.int32) << 3)
        | (code << 4),
        0,
    )
    if p_tot % 128 == 0 and os.environ.get("ULCX_RECSCATTER", "mm") != "scatter":
        return _mm_place(emit, start, meta, p_tot)
    bidx = jnp.arange(b)[:, None]
    tgt = jnp.where(emit, start, p_tot)  # non-records -> drop slot
    zi = jnp.zeros((b, p_tot), jnp.int32)
    return zi.at[bidx, tgt].set(meta, mode="drop", unique_indices=True)


def draw_counts(flags):
    """Per-stream count of RNG-draw positions, matching the kernel's
    in-loop latch exactly (a draw record's region extends to the NEXT
    record start — or the plane end for the final record, which is how
    a corrupt/truncated stream behaves on both decode paths). One
    associative scan over the [B, P] plane; used only by the pipelined
    single-stream path (decode_stream_pipelined), where it runs ONCE
    for all blocks, never inside the per-block hot loop."""

    def combine(l, r):
        return jnp.where((r & 1) == 1, r, l)

    filled = lax.associative_scan(combine, flags, axis=flags.ndim - 1)
    return jnp.sum((filled >> 1) & 1, axis=flags.ndim - 1)


def expand_coefs(flags, rng_state, p_tot: int, interpret=False):
    """Fused RNG replay + record fill + coefficient assembly
    (pd.rng_expand_kernel_call). flags [B, p_tot] i32 from
    records_to_flags; rng_state [B] u32. The RNG state advances exactly
    once per draw position (the kernel latches the record's draw bit at
    each start), so new_rng equals the seed stepped draw_counts(flags)
    times. Returns (coefs [B, p_tot], new_rng)."""
    flags_l, g2, pad2 = _to_lanes(flags, flags.shape[0])
    seed_l = (
        jnp.concatenate([rng_state, jnp.full((pad2,), 1234567, jnp.uint32)])
        if pad2
        else rng_state
    ).reshape(g2, pd.LANES)

    coefs, new_seed = pd.rng_expand_kernel_call(flags_l, seed_l, p_tot, interpret)
    return _from_lanes(coefs, flags.shape[0]), new_seed.reshape(-1)[: flags.shape[0]]


def decode_block_fast(windows, rng_state, cfg: CodecConfig, interpret=False):
    """windows: [B, W] uint8 at block starts; rng_state [B] uint32.
    Returns (coefs [B, C, N], window_ctrl [B], bits [B], corrupt [B],
    new_rng [B])."""
    n, c = cfg.block_size, cfg.n_chan
    p_tot = n * c
    b = windows.shape[0]
    rec, code, wc, hdr, consumed, corrupt = fsm_records(windows, cfg, interpret)
    flags = records_to_flags(rec, code, p_tot)
    coefs, new_seed = expand_coefs(flags, rng_state, p_tot, interpret)
    coefs = jnp.where(corrupt[:, None] == 1, 0.0, coefs)
    bits = 4 * (hdr + consumed)
    return coefs.reshape(b, c, n), wc, bits, corrupt == 1, new_seed
