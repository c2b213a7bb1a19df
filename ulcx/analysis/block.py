"""Whole-block encoder analysis pipeline.

Port of reference libulc/ulcEncoder_BlockTransform.c:82-356 as a pure
function over a carried state pytree:

  new PCM block -> M/S -> window control (1-block lookahead) ->
  per-subblock MDCT+MDST -> importance indices (+ Bark masking) ->
  noise log-spectrum -> block complexity -> descending importance ranks

The heapsort of the reference (:20-77) becomes a double argsort (rank 0
= most important); rank < n_out_coef is what the bitstream pass keeps.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from ulcx.analysis.psy import masking_curve, noise_log_spectrum
from ulcx.analysis.window_control import TransientState, get_window_ctrl
from ulcx.codec.transform import block_mdct_mdst, first_overlap, last_subblock_size
from ulcx.ops.fastlog import fast_log
from ulcx.ops.patterns import (
    pattern_subblock_offsets,
    pattern_subblock_sizes,
)
from ulcx.utils.config import COEF_EPS, CodecConfig

_NEG_LOG4 = np.float32(-float.fromhex("0x1.62E430p0"))   # ln(0.25)
_INV_LOG2E = np.float32(float.fromhex("0x1.62E430p-1"))  # 1/log2(e) = ln 2


class EncoderCarry(NamedTuple):
    """State carried block-to-block (reference ULC_EncoderState_t fields)."""

    sample_prev: jnp.ndarray     # [C, N] previous M/S'd block
    transient: TransientState
    next_window_ctrl: jnp.ndarray  # scalar int32
    prev_last_ss: jnp.ndarray      # scalar int32

    @staticmethod
    def init(cfg: CodecConfig):
        return EncoderCarry(
            sample_prev=jnp.zeros((cfg.n_chan, cfg.block_size), jnp.float32),
            transient=TransientState.init(),
            next_window_ctrl=jnp.int32(0x10),
            prev_last_ss=jnp.int32(cfg.block_size),
        )


class AnalyzedBlock(NamedTuple):
    window_ctrl: jnp.ndarray   # scalar int32 (for this coded block)
    mdct: jnp.ndarray          # [C, N] normalized coefficients
    noise: jnp.ndarray         # [C, N] interleaved {w, w*y} noise pairs
    importance: jnp.ndarray    # [C, N] f32 masked importance (rank key)
    complexity: jnp.ndarray    # scalar f32
    n_nz: jnp.ndarray          # scalar int32 (codeable coefficient count)


def ms_transform(block: jnp.ndarray) -> jnp.ndarray:
    """Pairwise M/S on [C, N]: (a,b) -> ((a+b)/2, (a-b)/2); odd last
    channel untouched (reference ulcEncoder_BlockTransform.c:100-110)."""
    c = block.shape[-2]
    if c < 2:
        return block
    npair = c // 2
    pairs = block[: 2 * npair].reshape(npair, 2, -1)
    mid = (pairs[:, 0] + pairs[:, 1]) * 0.5
    side = (pairs[:, 0] - pairs[:, 1]) * 0.5
    out = jnp.stack([mid, side], axis=1).reshape(2 * npair, -1)
    if c > 2 * npair:
        out = jnp.concatenate([out, block[2 * npair :]], axis=0)
    return out


def _mask_index_map(pattern_idx: int, n: int) -> np.ndarray:
    """coef index -> masking line index (per-subblock halved lines)."""
    idx = np.zeros(n, np.int32)
    for off, ss in zip(
        pattern_subblock_offsets(pattern_idx, n), pattern_subblock_sizes(pattern_idx, n)
    ):
        idx[off : off + ss] = off // 2 + np.arange(ss) // 2
    return idx


def _psy_noise_switch(mdct, mdst, window_ctrl, cfg: CodecConfig):
    """Per-subblock psychoacoustics + noise spectra via pattern switch.

    Returns (masking [N/2] or None, noise_pairs [C, N] or zeros,
    mask_map [N] int32 gather indices).
    """
    n = cfg.block_size

    def make_branch(pattern_idx: int):
        sizes = pattern_subblock_sizes(pattern_idx, n)
        offsets = pattern_subblock_offsets(pattern_idx, n)

        def branch(args):
            re, im = args
            abs2 = re * re + im * im  # [C, N]
            mask_parts, noise_parts = [], []
            for off, ss in zip(offsets, sizes):
                sub = abs2[..., off : off + ss]
                lines = sub[..., 0::2] + sub[..., 1::2]  # [C, ss/2]
                if cfg.use_psychoacoustics:
                    tot = jnp.sum(lines, axis=-2)  # accumulate channels
                    mask_parts.append(masking_curve(tot, ss // 2, cfg.rate_hz))
                if cfg.use_noise_coding:
                    noise_parts.append(noise_log_spectrum(lines, ss // 2, cfg.rate_hz))
            masking = (
                jnp.concatenate(mask_parts, axis=-1)
                if cfg.use_psychoacoustics
                else jnp.zeros(n // 2, jnp.float32)
            )
            noise = (
                jnp.concatenate(noise_parts, axis=-1)
                if cfg.use_noise_coding
                else jnp.zeros_like(re)
            )
            mask_map = jnp.asarray(_mask_index_map(pattern_idx, n))
            return masking, noise, mask_map

        return branch

    return lax.switch(
        window_ctrl >> 4,
        [make_branch(i or 1) for i in range(16)],
        (mdct, mdst),
    )


def analyze_block(carry: EncoderCarry, new_block: jnp.ndarray, cfg: CodecConfig):
    """new_block: [C, N] deinterleaved PCM. Returns (new carry, AnalyzedBlock)."""
    n = cfg.block_size

    new_ms = ms_transform(new_block)
    samples = jnp.concatenate([carry.sample_prev, new_ms], axis=-1)  # [C, 2N]

    window_ctrl = carry.next_window_ctrl
    next_wc, tstate = get_window_ctrl(samples, carry.transient, cfg)
    next_ov = first_overlap(next_wc, n)

    mdct, mdst = block_mdct_mdst(samples, window_ctrl, carry.prev_last_ss, next_ov, cfg)

    masking, noise, mask_map = _psy_noise_switch(mdct, mdst, window_ctrl, cfg)

    # importance (reference :243-281, :326-346)
    re2 = mdct * mdct
    val_np = jnp.where(
        jnp.abs(mdct) < jnp.float32(0.5 * COEF_EPS), -jnp.inf, fast_log(re2)
    )
    if cfg.use_psychoacoustics:
        chan_pen = _NEG_LOG4 * (jnp.arange(cfg.n_chan) & 1).astype(jnp.float32)
        importance = 2.0 * val_np + masking[mask_map][None, :] + chan_pen[:, None]
    else:
        importance = val_np

    # block complexity (reference :309-325)
    csum = jnp.sum(re2)
    cw = jnp.sum(jnp.abs(mdct))
    scale = _INV_LOG2E * np.float32(int(np.log2(n)))
    complexity = jnp.where(
        csum > 0,
        jnp.clip(jnp.log(jnp.maximum(cw * cw / jnp.maximum(csum, 1e-38), 1e-38)) / scale, 0.0, 1.0),
        0.0,
    ).astype(jnp.float32)

    n_nz = jnp.sum(jnp.abs(mdct) >= jnp.float32(0.5 * COEF_EPS)).astype(jnp.int32)

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
        importance=importance.astype(jnp.float32),
        complexity=complexity,
        n_nz=n_nz,
    )
