"""Batch-native encoder analysis (no per-pattern control flow).

Production counterpart of ``ulcx.analysis.block``: identical math, but
psychoacoustics/noise spectra are computed for *every size class* over
the whole batch and selected per line/coefficient through the static
class maps — the same trick as ``ulcx.codec.transform_batched``. The
per-stream switch implementation remains the readable reference; tests
assert equality.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ulcx.analysis.block import AnalyzedBlock, EncoderCarry, _NEG_LOG4, _INV_LOG2E
from ulcx.analysis.psy import masking_curve, noise_log_spectrum
from ulcx.analysis.window_control import get_window_ctrl
from ulcx.codec.transform import first_overlap, last_subblock_size
from ulcx.codec.transform_batched import (
    block_mdct_mdst_batched,
    candidate_tables,
)
from ulcx.ops.fastlog import fast_log
from ulcx.utils.config import COEF_EPS, CodecConfig


def _psy_noise_batched(mdct, mdst, window_ctrl, cfg: CodecConfig):
    """Per-class psy/noise with per-line class selection.

    mdct/mdst: [B, C, N]. Returns (masking [B, N/2], noise [B, C, N],
    mask_map [B, N]).
    """
    n = cfg.block_size
    b, c, _ = mdct.shape
    t = candidate_tables(n)
    abs2 = mdct * mdct + mdst * mdst
    lines = abs2[..., 0::2] + abs2[..., 1::2]  # [B, C, N/2]
    lines_tot = jnp.sum(lines, axis=1)  # [B, N/2]

    mask_cls, noise_cls = [], []
    for cls in range(4):
        ss = n >> cls
        npos = 1 << cls
        m = ss // 2
        if cfg.use_psychoacoustics:
            lt = lines_tot.reshape(b, npos, m)
            mask_cls.append(masking_curve(lt, m, cfg.rate_hz).reshape(b, n // 2))
        if cfg.use_noise_coding:
            lc = lines.reshape(b, c, npos, m)
            noise_cls.append(
                noise_log_spectrum(lc, m, cfg.rate_hz).reshape(b, c, n)
            )

    pat = window_ctrl >> 4
    cls_line = jnp.asarray(t["cls_line"])[pat]  # [B, N/2]
    cls_coef = jnp.asarray(t["cls_coef"])[pat]  # [B, N]

    if cfg.use_psychoacoustics:
        # per-coefficient masking: within a class, coef k maps to line
        # k//2 of that class's layout — a 2x repeat, then a 4-way class
        # select as a where-chain (gathers are slow on TPU; 3 selects
        # beat a [B, N, 4] stack + take_along_axis)
        mask_coef = jnp.repeat(mask_cls[0], 2, axis=-1)
        for k in range(1, 4):
            mask_coef = jnp.where(
                cls_coef == k, jnp.repeat(mask_cls[k], 2, axis=-1), mask_coef
            )
    else:
        mask_coef = jnp.zeros((b, n), jnp.float32)
    if cfg.use_noise_coding:
        noise = noise_cls[0]
        for k in range(1, 4):
            noise = jnp.where(cls_coef[:, None, :] == k, noise_cls[k], noise)
    else:
        noise = jnp.zeros_like(mdct)

    return mask_coef, noise


def analyze_block_batched(carry: EncoderCarry, new_blocks: jnp.ndarray, cfg: CodecConfig):
    """Batched analyze: carry pytree with leading [B], new_blocks [B, C, N]."""
    from ulcx.analysis.block import ms_transform

    n = cfg.block_size
    b = new_blocks.shape[0]

    new_ms = jax.vmap(ms_transform)(new_blocks)
    samples = jnp.concatenate([carry.sample_prev, new_ms], axis=-1)  # [B, C, 2N]

    window_ctrl = carry.next_window_ctrl
    next_wc, tstate = jax.vmap(lambda s, st: get_window_ctrl(s, st, cfg))(
        samples, carry.transient
    )
    next_ov = first_overlap(next_wc, n)

    mdct, mdst = block_mdct_mdst_batched(
        samples, window_ctrl, carry.prev_last_ss, next_ov, cfg
    )
    mask_coef, noise = _psy_noise_batched(mdct, mdst, window_ctrl, cfg)

    re2 = mdct * mdct
    val_np = jnp.where(
        jnp.abs(mdct) < jnp.float32(0.5 * COEF_EPS), -jnp.inf, fast_log(re2)
    )
    if cfg.use_psychoacoustics:
        chan_pen = _NEG_LOG4 * (jnp.arange(cfg.n_chan) & 1).astype(jnp.float32)
        importance = 2.0 * val_np + mask_coef[:, None, :] + chan_pen[None, :, None]
    else:
        importance = val_np

    csum = jnp.sum(re2, axis=(1, 2))
    cw = jnp.sum(jnp.abs(mdct), axis=(1, 2))
    scale = _INV_LOG2E * np.float32(int(np.log2(n)))
    complexity = jnp.where(
        csum > 0,
        jnp.clip(
            jnp.log(jnp.maximum(cw * cw / jnp.maximum(csum, 1e-38), 1e-38)) / scale,
            0.0,
            1.0,
        ),
        0.0,
    ).astype(jnp.float32)

    n_nz = jnp.sum(
        jnp.abs(mdct) >= jnp.float32(0.5 * COEF_EPS), axis=(1, 2)
    ).astype(jnp.int32)

    flat = importance.reshape(b, -1)
    order = jnp.argsort(-flat, axis=-1)
    # inverse permutation by a second argsort (sorts beat scatters on TPU)
    rank = jnp.argsort(order, axis=-1)
    rank = rank.reshape(importance.shape).astype(jnp.int32)

    new_carry = EncoderCarry(
        sample_prev=new_ms,
        transient=tstate,
        next_window_ctrl=next_wc,
        prev_last_ss=last_subblock_size(window_ctrl, n),
    )
    return new_carry, AnalyzedBlock(
        window_ctrl=window_ctrl,
        mdct=mdct,
        noise=noise,
        rank=rank,
        complexity=complexity,
        n_nz=n_nz,
    )
