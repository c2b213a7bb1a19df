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


def _ffill_multi(flag, arrays):
    """Forward fill several arrays under one flag in a single
    associative scan (one scan = one set of log-rounds instead of one
    per array; per-fused-kernel fixed costs dominate on this backend)."""

    def combine(l, r):
        fl = l[0] | r[0]
        return (fl,) + tuple(
            jnp.where(r[0], rv, lv) for lv, rv in zip(l[1:], r[1:])
        )

    masked = tuple(jnp.where(flag, a, 0) for a in arrays)
    out = lax.associative_scan(
        combine, (flag,) + masked, axis=flag.ndim - 1
    )
    return out[0], out[1:]


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


def decode_block_fast(windows, rng_state, cfg: CodecConfig, interpret=False):
    """windows: [B, W] uint8 at block starts; rng_state [B] uint32.
    Returns (coefs [B, C, N], window_ctrl [B], bits [B], corrupt [B],
    new_rng [B])."""
    n, c = cfg.block_size, cfg.n_chan
    p_tot = n * c
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

    def one(wcg, tk):
        return pd.fsm_kernel_call(wcg, tk, p_tot, n, interpret)

    rec, lvl, dcy, consumed, corrupt = jax.vmap(one)(wc_l, tok_l)
    rec = _from_lanes(rec, b)
    lvl = _from_lanes(lvl, b)
    dcy = _from_lanes(dcy, b)
    consumed = consumed.reshape(-1)[:b]
    corrupt = corrupt.reshape(-1)[:b]

    # --- expansion: place records at their start positions, then one
    # fused forward fill. Record starts are unique, all payloads are
    # non-negative, and non-records carry zeros — so three scatter-max
    # ops with a zero background replace four masked scatter-sets
    # (meta packs type|start<<3; lvl/dcy ride as their own f32 bits) ---
    rtype = (rec >> 26) & 0x7
    start = rec & 0x1FFF
    emit = rtype != 0
    bidx = jnp.arange(b)[:, None]
    tgt = jnp.where(emit, start, p_tot)  # non-records -> drop slot

    meta = jnp.where(emit, rtype | (start << 3), 0)
    zi = jnp.zeros((b, p_tot), jnp.int32)
    zf = jnp.zeros((b, p_tot), jnp.float32)
    meta_s = zi.at[bidx, tgt].set(meta, mode="drop")
    lvl_s = zf.at[bidx, tgt].set(lvl, mode="drop")
    dcy_s = zf.at[bidx, tgt].set(dcy, mode="drop")
    mark = meta_s != 0

    pos = jnp.arange(p_tot)[None, :]
    _, (meta_p, lvl_p, dcy_p) = _ffill_multi(mark, (meta_s, lvl_s, dcy_s))
    type_p = meta_p & 0x7
    start_p = meta_p >> 3
    k = (pos - start_p).astype(jnp.float32)

    is_draw = (type_p == REC_NOISE) | (type_p == REC_TAIL)
    is_start = mark
    flags = is_draw.astype(jnp.int32) | (is_start.astype(jnp.int32) << 1)

    flags_l, g2, pad2 = _to_lanes(flags, b)
    seed_l = (
        jnp.concatenate([rng_state, jnp.full((pad2,), 1234567, jnp.uint32)])
        if pad2
        else rng_state
    ).reshape(g2, pd.LANES)

    def one_rng(fl, sd):
        return pd.rng_kernel_call(fl, sd, p_tot, interpret)

    sign, new_seed = jax.vmap(one_rng)(flags_l, seed_l)
    sign = _from_lanes(sign, b)
    new_seed = new_seed.reshape(-1)[:b]

    mag = jnp.where(
        type_p == REC_TAIL,
        lvl_p * jnp.exp(k * jnp.log(jnp.maximum(dcy_p, 1e-30))),
        lvl_p,
    )
    coefs = jnp.where(
        type_p == REC_COEF, lvl_p, jnp.where(is_draw, mag * sign, 0.0)
    )
    coefs = jnp.where(corrupt[:, None] == 1, 0.0, coefs)
    bits = 4 * (hdr + consumed)
    return coefs.reshape(b, c, n), wc, bits, corrupt == 1, new_seed
