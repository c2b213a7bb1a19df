"""Kernel-backed encode pass: batched rate search + materialization.

Glue around ``ulcx.bitstream.pallas_encode3``: packs per-position inputs
(segment geometry, noise decisions, monotone importance keys) into the
kernel's planes, prices the per-segment tail tokens inside the kernel
walks, runs the interp-seeded candidate ladder (_bracket_search), and
assembles final byte streams.

Active when the batch is a multiple of 8 streams and P <= 32768 (the
reference's full block envelope, ulcEncoder.c:21) on a TPU backend;
otherwise the scan path (ulcx.bitstream.encode) is used.
Batches that are not a multiple of the kernel's 128-lane width are
padded up (the kernel rounds are latency-bound on the serial P-walk,
so unused lanes cost nothing). Semantics: noise_run_window="segment"
(see CodecConfig).
"""

from __future__ import annotations

from functools import lru_cache

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ulcx.analysis.block import AnalyzedBlock
from ulcx.bitstream.tables import segment_tables
from ulcx.utils.config import CodecConfig


def _cq_unsigned(v):
    q = jnp.floor(jnp.float32(0.5) + jnp.sqrt(jnp.maximum(v - jnp.float32(0.25), 0.0)))
    return jnp.where(v >= 0.5, q, 0.0).astype(jnp.int32)


from typing import NamedTuple


class FastBlockData(NamedTuple):
    """Batched per-block kernel inputs ([B, ...]).

    HF-extension fit quantities are pairwise constant, so they are kept
    in the pseudo-DFT line domain [B, L] (L = P/2) and queried at
    position>>1 — half the traffic and half the gather source size."""

    coef: jnp.ndarray        # [B, P] f32
    aux: jnp.ndarray         # [B, P] i32: segdelta | seg_start << 16
    key: jnp.ndarray         # [B, P] i32 monotone importance key
    amp_noise: jnp.ndarray   # [B, L] f32 noise amplitude (line domain)
    amp_lin: jnp.ndarray     # [B, L] f32 HF-ext amplitude (line domain)
    hf_meta: jnp.ndarray     # [B, L] i32: dec_q | hf_ok << 8 (line domain)
    window_ctrl: jnp.ndarray # [B]
    header: jnp.ndarray      # [B, 2]
    n_header: jnp.ndarray    # [B]


@lru_cache(maxsize=32)
def _prep_tables(block_size: int, n_chan: int):
    """Static per-pattern tables for the line-domain prepare pass.

    Returns (segdelta [16, P] f32, is_start [16, P] f32,
    end_line [16, L] f32, sel [16*G, L] f32) where L = P/2 lines and
    G = 8*n_chan slots on the N/16-line grid. All values are small
    integers, exactly representable in f32, so per-stream selection
    becomes a one-hot-matmul (MXU) instead of a gather (slow on TPU).
    sel[k*G+g, l] = 1 iff pattern k's line l has its segment end at
    grid slot g — used to pick segment-end cumsum values.
    """
    n, c = block_size, n_chan
    p_tot = n * c
    nl = p_tot // 2
    n_grid = 8 * c
    grid_step = (n // 8) // 2
    starts, ends, _ = segment_tables(n, c)
    idxp = np.arange(p_tot)
    # segdelta is a segment LENGTH (bound by block_size): 16 bits holds
    # a full bs32768 block — field map in pallas_encode3's docstring
    segdelta = np.clip(ends - idxp, 0, 0xFFFF).astype(np.float32)
    is_start = (idxp == starts).astype(np.float32)
    end_line = (ends[:, 0::2] // 2).astype(np.int32)  # [16, L]
    end_slot = end_line // grid_step - 1  # [16, L] in [0, G)
    sel = np.zeros((16, n_grid, nl), np.float32)
    sel[
        np.arange(16)[:, None], end_slot, np.arange(nl)[None, :]
    ] = 1.0
    return (
        segdelta,
        is_start,
        end_line.astype(np.float32),
        sel.reshape(16 * n_grid, nl),
    )


def prepare_fast(blk: AnalyzedBlock, cfg: CodecConfig) -> FastBlockData:
    """Batched prep: blk fields have leading [B].

    Runs entirely in the pseudo-DFT *line* domain (L = P/2): every
    noise/HF quantity is constant within a coefficient pair (window
    ends are (n+(p&1)+1)>>1 = identical for both parities, segment
    bounds are even), so computing per line and expanding by a 2x
    repeat at the end halves the traffic. All per-pattern selection
    (segment ends, slot grid) is one-hot [B,16] matmuls against static
    tables — no gathers, no per-slot where-chains.
    """
    n, c = cfg.block_size, cfg.n_chan
    p_tot = n * c
    nl = p_tot // 2
    n_grid = 8 * c
    grid_step = (n // 8) // 2
    b = blk.mdct.shape[0]
    segdelta_t, isstart_t, endline_t, sel_t = _prep_tables(n, c)

    pat = blk.window_ctrl >> 4
    oh = (pat[:, None] == jnp.arange(16)).astype(jnp.float32)  # [B, 16]
    hi = jax.lax.Precision.HIGHEST

    coef = blk.mdct.reshape(b, p_tot)
    noise = blk.noise.reshape(b, p_tot)
    w = noise[:, 0::2]
    wy = noise[:, 1::2]
    g = jnp.arange(nl, dtype=jnp.float32)

    # 5 prefix sums in one shot: {w, w*y, w*g, w*g^2, w*y*g}.
    # Exclusive form kept LANE-ALIGNED ([B,5,L], not an L+1 concat —
    # the odd minor dimension forces relayout copies on every
    # downstream slice); the grand totals ride separately. All values
    # bit-identical to the L+1 form.
    stacked = jnp.stack([w, wy, w * g, w * g * g, wy * g], axis=1)
    incl = jnp.cumsum(stacked, axis=-1)  # [B, 5, L]
    cs = jnp.concatenate(
        [jnp.zeros((b, 5, 1), jnp.float32), incl[:, :, :-1]], axis=-1
    )  # [B, 5, L] exclusive
    tot = incl[:, :, -1:]  # [B, 5, 1]

    # segment-end cumsum values: grid slot values (strided slice; the
    # last grid boundary is the grand total) are selected per line via
    # sel (exactly one nonzero term per output, so the f32 matmul is
    # exact)
    gv = jnp.concatenate(
        [cs[:, :, grid_step :: grid_step][:, :, : n_grid - 1], tot], axis=-1
    )  # [B, 5, G]
    y = (oh[:, None, :, None] * gv[:, :, None, :]).reshape(b, 5, 16 * n_grid)
    seg_vals = jnp.matmul(y, jnp.asarray(sel_t), precision=hi)  # [B, 5, L]

    end_line = jnp.matmul(oh, jnp.asarray(endline_t), precision=hi)  # [B, L]
    cw_a, cwy_a = cs[:, 0], cs[:, 1]
    cw_end, cwy_end = seg_vals[:, 0], seg_vals[:, 1]

    # noise amplitude window = min(line + 264, segment end): resolved
    # on indices; the +264 branch is a static shifted slice
    in_window = (g + 264.0) < end_line

    take = max(0, nl - 264)  # lines where l+264 is an in-range index

    def shifted(j):
        return jnp.concatenate(
            [cs[:, j, 264:], jnp.broadcast_to(tot[:, j], (b, nl - take))],
            axis=-1,
        )

    s_w = jnp.where(in_window, shifted(0), cw_end) - cw_a
    s_wy = jnp.where(in_window, shifted(1), cwy_end) - cwy_a
    amp = jnp.exp(s_wy / jnp.where(s_w > 0, s_w, 1.0))
    # amp is candidate-independent; the (candidate-dependent) zone
    # quantizer is folded in inside the kernel: nq = cq(amp * 2^q_ev)
    amp_noise_l = jnp.where(s_wy != 0.0, amp, 0.0)

    # HF-extension least-squares (candidate independent; window = tail)
    af = g
    sw = cw_end - cw_a
    swy = cwy_end - cwy_a
    swg = seg_vals[:, 2] - cs[:, 2, :nl]
    swg2 = seg_vals[:, 3] - cs[:, 3, :nl]
    swyg = seg_vals[:, 4] - cs[:, 4, :nl]
    sx = 2.0 * (swg - af * sw)
    sx2 = 4.0 * (swg2 - 2.0 * af * swg + af * af * sw)
    sxy = 2.0 * (swyg - af * swy)
    det = sw * sx2 - sx * sx
    solvable = det != 0.0
    det_s = jnp.where(solvable, det, 1.0)
    amp_log = (sx2 * swy - sx * sxy) / det_s
    dec_log = (sw * sxy - sx * swy) / det_s
    amp_lin_l = jnp.exp(amp_log)
    dec_lin = jnp.where(dec_log < 0, jnp.exp(dec_log), 1.0)
    dec_raw = _cq_unsigned((dec_lin - 1.0) * np.float32(-(2.0**19)))
    hf_ok_l = solvable & (dec_raw > 0)
    dec_q_l = jnp.minimum(dec_raw, 255)

    # all amplitude/HF quantities stay in the line domain (see
    # FastBlockData); the v3 kernels read them at lp >> 1 and the
    # v1/v2 dispatch expands by a 2x repeat
    hf_meta = dec_q_l | (hf_ok_l.astype(jnp.int32) << 8)

    segdelta = jnp.matmul(oh, jnp.asarray(segdelta_t), precision=hi).astype(
        jnp.int32
    )
    is_seg_start = jnp.matmul(oh, jnp.asarray(isstart_t), precision=hi).astype(
        jnp.int32
    )
    aux = segdelta | (is_seg_start << 16)
    # monotone importance key: the kernels test keep-membership against
    # per-candidate (t, c) thresholds fetched from ONE sorted copy of
    # this key (pallas_encode3 module docstring) — no per-position rank
    # (and so no inverse-permutation sort) is ever materialized
    from ulcx.ops.keys import monotone_i32

    key = monotone_i32(blk.importance.reshape(b, p_tot))

    wc = blk.window_ctrl
    header = jnp.stack([wc & 0xF, (wc >> 4) & 0xF], axis=-1).astype(jnp.int32)
    n_header = jnp.where((wc & 0x8) != 0, 2, 1).astype(jnp.int32)

    return FastBlockData(
        coef, aux, key, amp_noise_l, amp_lin_l, hf_meta, wc, header, n_header
    )


def _pad_b(b: int) -> int:
    """Batch padded to the kernel's 128-lane width."""
    from ulcx.bitstream import pallas_encode3 as pe3

    return -(-b // pe3.LAN) * pe3.LAN


def _pad128(fb: FastBlockData) -> FastBlockData:
    """Zero-pad every per-stream array of fb to a 128-lane multiple.

    The kernel walks are latency-bound on the serial P-length chain
    (NOTES.md round-3 facts): vector ops over the [8, 128] lane tile
    cost the same whether 8 or 128 lanes hold real streams, so padding
    a small batch into the full v3 width is free — this is what
    retired the narrow v1/v2 lane layouts. Zero planes parse as
    rank 0 / segdelta 0 / no segment starts: the walks stay finite and
    the outputs are sliced off."""
    b = fb.coef.shape[0]
    bp = _pad_b(b)
    if bp == b:
        return fb
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((bp - b,) + x.shape[1:], x.dtype)], axis=0
    )
    return FastBlockData(*(pad(x) for x in fb))


def _pad_vec(x, b: int, fill=0):
    bp = _pad_b(b)
    if bp == b:
        return x
    return jnp.concatenate(
        [x, jnp.full((bp - b,) + x.shape[1:], fill, x.dtype)], axis=0
    )


def _to_lanes3(x, b):
    """[B, P] -> [G3, P, 1, 128]: stream = g*128 + lane. NO candidate
    replication — the kernel broadcasts over the sublane dim."""
    from ulcx.bitstream import pallas_encode3 as pe3

    g = b // pe3.N_STREAMS
    return x.reshape(g, pe3.LAN, -1).transpose(0, 2, 1)[:, :, None, :]


def _from_lanes3(x, b):
    """[G3, ..., 8, 128] -> [B, 8, ...]."""
    from ulcx.bitstream import pallas_encode3 as pe3

    g = b // pe3.N_STREAMS
    shp = x.shape[1:-2]
    y = x.reshape((g,) + shp + (pe3.SUBC, pe3.LAN))
    nd = len(shp)
    perm = (0, nd + 2, nd + 1) + tuple(range(1, nd + 1))
    y = y.transpose(perm)  # [G3, LAN, SUBC, ...]
    return y.reshape((b, pe3.N_CAND) + shp)


def _use_v3(b: int, p_tot: int) -> bool:
    """v3 is the only kernel layout (batches pad to its 128-lane
    width); P is always 128-aligned for pow2 block sizes >= 256, so
    this only rejects exotic configs."""
    return b % 8 == 0 and p_tot % 128 == 0


def cand_count(b: int, p_tot: int) -> int:
    """Rate-search candidates per round (the 8 v3 sublanes)."""
    from ulcx.bitstream import pallas_encode3 as pe3

    return pe3.N_CAND


class _V3Planes(NamedTuple):
    """Lane-transposed kernel input planes ([G, P(/2), 1, LAN] etc.).

    Built ONCE per encode (the [B, P] -> stream-in-lane transposes cost
    ~2 ms each on chip); every ladder round reuses them. skey/sidx are
    the (importance-key desc, position asc) sorted copies every round's
    per-candidate keep thresholds gather from — ONE 2-operand lane sort
    per encode replaces the per-position rank (argsort + inverse-
    permutation sort) of the retired rank scheme."""

    coef_l: jnp.ndarray
    thr_l: jnp.ndarray
    aux_l: jnp.ndarray
    key_l: jnp.ndarray
    skey: jnp.ndarray   # [G, P, LAN] keys, stable-descending per lane
    sidx: jnp.ndarray   # [G, P, LAN] their positions
    ampn_l: jnp.ndarray
    hfa_l: jnp.ndarray
    hfm_l: jnp.ndarray
    hdr_l: jnp.ndarray
    b: int
    p_tot: int


def _qmin_ge(m, thr_kind: str):
    """Smallest integer q in [0, 63] with m * 2**q >= threshold,
    exactly, from the f32 bit pattern (63 = never within q <= 31).

    Multiplying by 2**q only shifts the exponent (exact in f32 until
    overflow, and boundary cases are never denormal), so the kernel
    tests cq_unsigned(m * 2**q) >= {1, 2} and their kin collapse to
    integer compares q >= qmin(m):
      cq_unsigned(v) >= 1  <=>  v >= 0.5
      cq_unsigned(v) >= 2  <=>  v >= 2.5   (floor(0.5+sqrt(v-.25)) >= 2)
    With m = mant * 2**em (mant in [1, 2)):
      m >= 2.5 * 2**-q = 1.25*2**(1-q)  <=>  q >= (1 if mant>=1.25 else 2) - em
      m >= 0.5 * 2**-q = 2**(-1-q)      <=>  q >= -1 - em
      m >= 0.125 * 2**-q                <=>  q >= -3 - em
    Zeros/denormals get em <= -127 -> qmin clips to 63 ("never"),
    matching the true test (their product stays far below threshold)."""
    bits = lax.bitcast_convert_type(m.astype(jnp.float32), jnp.int32) & 0x7FFFFFFF
    em = ((bits >> 23) & 0xFF) - 127
    if thr_kind == "2.5":
        q = jnp.where((bits & 0x7FFFFF) >= 0x200000, 1 - em, 2 - em)
    elif thr_kind == "0.5":
        q = -1 - em
    elif thr_kind == "0.125":
        q = -3 - em
    else:  # pragma: no cover
        raise ValueError(thr_kind)
    return jnp.clip(jnp.where(bits == 0, 63, q), 0, 63)


def _thr_plane_l(coef_l, ampn_l, hfa_l, hfm_l):
    """Packed per-position threshold plane for the size-only kernel
    walks (field layout documented above pallas_encode3._p2). Built in
    lane layout from the already-transposed planes — elementwise plus a
    position shift and a pair->position repeat, so no extra
    [B, P] -> lane transpose."""
    qm0 = _qmin_ge(jnp.abs(coef_l), "2.5")          # [G, P, 1, LAN]
    qm1 = jnp.concatenate([qm0[:, 1:], qm0[:, -1:]], axis=1)
    qmn = jnp.repeat(_qmin_ge(ampn_l, "0.5"), 2, axis=1)
    qmh = jnp.repeat(_qmin_ge(hfa_l, "0.125"), 2, axis=1)
    hfok = jnp.repeat((hfm_l >> 8) & 1, 2, axis=1)
    return (
        qm0 | (qm1 << 6) | (qmn << 12) | (qmh << 18) | (hfok << 24)
    ).astype(jnp.int32)


def _v3_planes(fb: FastBlockData, interpret: bool = False) -> _V3Planes:
    from ulcx.bitstream import pallas_encode3 as pe3

    b, p_tot = fb.coef.shape
    hdrw = fb.header[:, 0] | (fb.header[:, 1] << 4) | (fb.n_header << 8)
    hdr_l = jnp.broadcast_to(
        hdrw.reshape(b // pe3.LAN, 1, pe3.LAN), (b // pe3.LAN, pe3.SUBC, pe3.LAN)
    )
    coef_l = _to_lanes3(fb.coef, b)
    ampn_l = _to_lanes3(fb.amp_noise, b)
    hfa_l = _to_lanes3(fb.amp_lin, b)
    hfm_l = _to_lanes3(fb.hf_meta, b)
    key_l = _to_lanes3(fb.key, b)
    # stable (key desc, position asc) sort, once per encode, in lane
    # layout (a non-minor-axis sort costs the same as a last-dim sort
    # on this backend — devtools/sort_probe.py). ~key is strictly
    # order-reversing on i32, so an ASCENDING stable sort of ~key is
    # exactly the descending key order with position-ascending ties.
    kl = key_l[:, :, 0, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, kl.shape, 1)
    skinv, sidx = jax.lax.sort((~kl, iota), dimension=1, num_keys=1)
    return _V3Planes(
        coef_l,
        _thr_plane_l(coef_l, ampn_l, hfa_l, hfm_l),
        _to_lanes3(fb.aux.astype(jnp.int32), b),
        key_l,
        ~skinv,
        sidx,
        ampn_l,
        hfa_l,
        hfm_l,
        hdr_l,
        b,
        p_tot,
    )


def _tc_of(pl3: _V3Planes, nn):
    """Per-candidate keep thresholds for candidate counts nn
    [G, SUBC, LAN]: (t, c) = the nn-th entry of the sorted (key desc,
    pos asc) order, so the kernels' `key > t | (key == t & p <= c)`
    equals `stable-desc rank < nn` bit-exactly, ties included.
    nn <= 0 maps to an unreachable threshold (keep nothing)."""
    j = jnp.clip(nn - 1, 0, pl3.p_tot - 1)
    t = jnp.take_along_axis(pl3.skey, j, axis=1)
    c = jnp.take_along_axis(pl3.sidx, j, axis=1)
    none = nn <= 0
    t = jnp.where(none, jnp.int32(2**31 - 1), t)
    c = jnp.where(none, jnp.int32(-1), c)
    return t, c


def _v3_call_l(pl3: _V3Planes, nout_l, materialize=False, interpret=False):
    """Lane-native v3 round: nout_l [G, SUBC, LAN] i32 (candidate in
    sublane, stream in lane); outputs stay in kernel layout — the
    production ladder keeps ALL its state in this layout so no
    [B, 8] <-> [G, SUBC, LAN] relayout round trips happen per round."""
    from ulcx.bitstream import pallas_encode3 as pe3

    # the group axis folds into the Pallas grid (ONE launch per phase);
    # a vmap here would emit one launch per 128-stream group.
    # ULCX_V3_VMAP=1 restores the vmap form (A/B harness).
    import os as _os

    t, c = _tc_of(pl3, nout_l)
    if _os.environ.get("ULCX_V3_VMAP", "0") == "1":
        return jax.vmap(
            lambda tt, cc, ky, cf, th, an, ax, ha, hm, hd: tuple(
                x[0]
                for x in pe3.encode_kernel_call3(
                    tt[None], cc[None], ky[None], cf[None], th[None],
                    an[None], ax[None], ha[None], hm[None], hd[None],
                    pl3.p_tot, materialize, interpret,
                )
            )
        )(t, c, pl3.key_l, pl3.coef_l, pl3.thr_l, pl3.ampn_l, pl3.aux_l,
          pl3.hfa_l, pl3.hfm_l, pl3.hdr_l)
    return pe3.encode_kernel_call3(
        t, c, pl3.key_l, pl3.coef_l, pl3.thr_l, pl3.ampn_l, pl3.aux_l,
        pl3.hfa_l, pl3.hfm_l, pl3.hdr_l, pl3.p_tot, materialize, interpret,
    )


def _v3_call(pl3: _V3Planes, nout, materialize=False, interpret=False):
    """v3 size round through the [B, 8] batch interface (total_sizes /
    the bisect replica); the production paths (materialize_fast,
    search_materialize_fast) call _v3_call_l directly and keep
    everything in kernel lane layout. Returns (bits [B, 8],) — tails
    included, header excluded."""
    from ulcx.bitstream import pallas_encode3 as pe3

    assert not materialize, "materialize rides the lane-layout path"
    b = pl3.b
    # nout [B, 8] -> [G3, SUBC, LAN]: candidate in sublane, stream in lane
    nout_l = nout.reshape(b // pe3.LAN, pe3.LAN, pe3.N_CAND).transpose(0, 2, 1)
    out = _v3_call_l(pl3, nout_l, materialize, interpret)
    bits = _from_lanes3(out[0][:, None], b)[:, :, 0]
    return (bits,)


def _v3_sizes(pl3: _V3Planes, n_header, nout, interpret=False):
    (bits,) = _v3_call(pl3, nout, False, interpret)
    total = 4 * (bits + n_header[:, None])
    return (total + 7) & ~7


def total_sizes(fb: FastBlockData, nout, cfg: CodecConfig, interpret=False):
    """Byte-aligned block sizes in bits for candidates nout [B, K]."""
    b, p_tot = fb.coef.shape
    fbp = _pad128(fb)
    return _v3_sizes(
        _v3_planes(fbp, interpret), fbp.n_header, _pad_vec(nout, b), interpret
    )[:b]


# --- interp-seeded ladder schedule -----------------------------------------
#
# The classic k-candidate ladder needs ceil(log_k P) size rounds to pin
# the largest feasible n exactly; each round is a full serial kernel
# walk (~6.4 ms at B=512/P=4096 — NOTES.md round-3 budget). Measured on
# the bench corpus (devtools/search_seed_study.py, bs2048 stereo
# CBR-128): after ONE coarse round, linearly interpolating the bracket
# edge sizes predicts the budget crossing within |err| p50=7 p90=16
# p99=36 max=41 coefficients. So the middle rounds collapse to ONE
# round of candidates spread around the prediction, and the final
# round stretches its spacing to cover whatever bracket remains:
# exact whenever the remaining bracket is < k (the common case), at
# worst ceil(bracket/(k-1))-1 ≈ 2-5 coefficients short of the true
# maximum in the interp-miss tail — never infeasible. Rate-control
# contract unchanged: chosen size <= budget always.

# Seeded-round offsets in 1/256ths of the bracket gap (applied as
# (gap * W) >> 8). Gap-proportional spread because the interpolation
# error scales with the bracket and its BIAS scales with the curve's
# local convexity, which grows at low rates: measured |err| p99 is
# ~7% of the gap at 128 kbps but ~15% (all positive-signed) at
# 48 kbps (devtools/search_seed_study.py) — a fixed span misses there.
_SEED_W = {
    8: np.array([-51, -31, -18, -9, -4, 0, 5, 15], np.int32),
    16: np.array(
        [-64, -51, -40, -31, -23, -16, -10, -6, -3, 0, 2, 5, 9, 14, 21, 30],
        np.int32,
    ),
}


def _seed_plan(rounds: int):
    """(classic_size_rounds, use_seeded_round) before the final round.

    ONE classic round suffices at every P: the seeded round's
    gap-proportional spread covers the interpolation error even when
    the bracket is the full first-round step (P/8). Measured at bs4096
    (devtools/search_seed_study.py 48 4096, classic->seeded->final
    emulation): interp |err| max 64 vs a seeded span of ~0.32*gap;
    final selection lands exact 39% / p50 -1 / worst -5 coefficients
    of n_true p50 1219 — inside the <=1%-under contract. This drops a
    full size round (p1+p2 state rebuild + p3-size walk) at
    rounds >= 5 shapes (P >= 8192: stereo bs4096+, mono bs8192+)."""
    if rounds - 1 < 2:
        return rounds - 1, False
    return 1, True


def _bracket_search(size_fn, n_nz, budget, k: int, rounds: int):
    """Classic + interp-seeded ladder rounds; returns (lo, hi) with the
    crossing bracketed and lo = best known-feasible count (or 0).

    Layout-generic: n_nz/budget are [B] or [G, LAN]; candidates ride
    axis 1 (size_fn maps candidate grids to byte-rounded bit sizes of
    the same shape). All arithmetic is int32 so the flat and
    lane-layout callers produce bit-identical brackets.

    The rounds run as ONE lax.scan over a per-round is_seeded flag
    (the seeded round already falls back to the classic grid when
    seed_ok is false, so the bodies unify exactly): the round graph —
    the costliest XLA-codegen unit in the whole encode compile,
    ~38 s/instantiation (devtools/aot_bisect.py) — is compiled once
    instead of once per round. Bit-identical brackets."""
    classic, seeded = _seed_plan(rounds)
    x1 = lambda a: jnp.expand_dims(a, 1)
    kshape = (1, k) + (1,) * (n_nz.ndim - 1)
    karr1 = jnp.arange(1, k + 1, dtype=jnp.int32).reshape(kshape)
    jidx = jnp.arange(k, dtype=jnp.int32).reshape(kshape)
    bud = x1(budget)
    lo = jnp.zeros(n_nz.shape, jnp.int32)
    hi = n_nz.astype(jnp.int32)
    s_lo = gap = jnp.zeros(n_nz.shape, jnp.int32)
    den = jnp.ones(n_nz.shape, jnp.int32)
    seed_ok = jnp.zeros(n_nz.shape, bool)

    def update(cands, cands_c, sizes, lo, hi):
        feas = (sizes <= bud) & (cands <= x1(hi))
        any_f = jnp.any(feas, axis=1)
        best = jnp.max(jnp.where(feas, cands_c, x1(lo)), axis=1)
        fbad = jnp.min(
            jnp.where(feas | (cands > x1(hi)), jnp.int32(2**30), cands), axis=1
        )
        # bracket-edge sizes for the interpolation (one-hot selects:
        # candidates ascend, so the max feasible index holds the max
        # feasible value and the min infeasible index the min)
        bestj = jnp.max(jnp.where(feas, jidx, -1), axis=1)
        badj = jnp.min(
            jnp.where(feas | (cands > x1(hi)), jnp.int32(k), jidx), axis=1
        )
        s_lo = jnp.sum(jnp.where(jidx == x1(bestj), sizes, 0), axis=1)
        s_hi = jnp.sum(jnp.where(jidx == x1(badj), sizes, 0), axis=1)
        new_lo = jnp.where(any_f, best, lo)
        new_hi = jnp.minimum(hi, fbad - 1)
        ok = any_f & (fbad < 2**30) & (fbad > new_lo)
        return (
            new_lo,
            new_hi,
            s_lo,
            fbad - new_lo,
            jnp.maximum(s_hi - s_lo, 1),
            ok,
        )

    w = jnp.asarray(_SEED_W[k]).reshape(kshape)

    def round_body(carry, is_seeded):
        lo, hi, s_lo, gap, den, seed_ok = carry
        step = jnp.maximum((hi - lo + k - 1) // k, 1)
        std = x1(lo) + x1(step) * karr1
        n_star = jnp.clip(
            lo + (budget - s_lo) * gap // den, lo, jnp.maximum(hi, lo)
        )
        off = (x1(gap) * w) >> 8
        sc = jnp.clip(x1(n_star) + off, x1(lo), x1(jnp.maximum(hi, lo)))
        cands = jnp.where(x1(seed_ok & is_seeded), sc, std)
        cands_c = jnp.minimum(cands, x1(jnp.maximum(hi, 0)))
        sizes = size_fn(cands_c)
        return update(cands, cands_c, sizes, lo, hi), None

    flags_py = [False] * classic + ([True] if seeded else [])
    carry = (lo, hi, s_lo, gap, den, seed_ok)
    if os.environ.get("ULCX_LADDER_SCAN", "0") == "1":
        # Scanned A/B variant (was briefly the default): one lax.scan
        # over a per-round is_seeded flag. Measured WORSE on both axes
        # at r5 HEAD — end-to-end T=64 encode 2588x vs 2635x unrolled
        # (the scan pays [G,LAN] carry-copy stalls around while.77,
        # r5 device trace), and AOT compile 144.2 s vs 111.9 s clean
        # (the round scan was a codegen pessimization, not a dedup
        # win). Kept as the opt-in; brackets are bit-identical.
        carry, _ = lax.scan(round_body, carry, jnp.asarray(flags_py))
        return carry[0], carry[1]
    for f in flags_py:
        carry, _ = round_body(carry, jnp.asarray(f))
    return carry[0], carry[1]


def _final_cands(lo, hi, k: int):
    """Final-round candidate grid lo + s*(0..k-1): spacing s stretches
    to cover the remaining bracket (s = 1 -> exact max-feasible)."""
    x1 = lambda a: jnp.expand_dims(a, 1)
    hi_c = jnp.maximum(hi, lo)
    s = jnp.maximum(1, -(-(hi_c - lo) // (k - 1)))
    kshape = (1, k) + (1,) * (lo.ndim - 1)
    jidx = jnp.arange(k, dtype=jnp.int32).reshape(kshape)
    cands = x1(lo) + x1(s) * jidx
    cands_c = jnp.minimum(cands, x1(hi_c))
    return cands, cands_c, hi_c


def rate_search_fast(fb: FastBlockData, n_nz, budget, cfg: CodecConfig,
                     interpret=False):
    """Interp-seeded ladder on the kernel (cf. _cbr_search_ladder);
    candidate-for-candidate identical to search_materialize_fast so the
    fused and separate forms return the same n."""
    import math

    b = fb.coef.shape[0]
    p_tot = fb.coef.shape[1]
    k = cand_count(b, p_tot)
    fbp = _pad128(fb)
    pl3 = _v3_planes(fbp, interpret)
    size_fn = lambda nn: _v3_sizes(pl3, fbp.n_header, nn, interpret)
    rounds = max(1, int(math.ceil(math.log(p_tot, k))))
    budget = _pad_vec(budget.astype(jnp.int32), b)
    n_nz = _pad_vec(n_nz, b)
    lo, hi = _bracket_search(size_fn, n_nz, budget, k, rounds)
    cands, cands_c, hi_c = _final_cands(lo, hi, k)
    sizes = size_fn(cands_c)
    # clipped candidates equal hi_c (in-bracket) and stay selectable —
    # no cands <= hi_c gate here, unlike the bracketing rounds
    feas = sizes <= budget[:, None]
    feas = feas.at[:, 0].set(True)  # lane 0 = lo, always a fallback
    return jnp.max(jnp.where(feas, cands_c, lo[:, None]), axis=-1)[:b]


def _assemble_v3_lanes(word, widx, freg, fwc, max_bytes: int,
                       interpret=False):
    """Compact in-kernel-packed stream words into byte streams, in
    kernel lane layout: word/widx [G, P, LAN] (the emitted u32 word at
    each position; index 2**30 where no word completed), freg/fwc
    [G, LAN]; returns bytes [G*LAN, max_bytes]. Word indices of valid
    entries are exactly 0..fwc-1 in position order, so one two-operand
    lax.sort places every completed word; the final partial register is
    appended at index fwc with an iota compare (no scatter).

    The compaction sort runs along the POSITION axis (axis 1) with
    streams kept in lanes: a non-minor-dim lax.sort costs the same as a
    last-dim sort on this backend (devtools/sort_probe.py — every
    comparator stage is an elementwise min/max over [P, LAN] tiles), so
    the [G,P,LAN] -> [B,P] relayout copies the device trace showed
    around the old sort (~1.5 ms each per block step at P=8192) are
    deleted, and only the n_words = P/4 prefix is transposed after."""
    g, p_tot, lan = word.shape
    n_words = (2 * max_bytes) // 8
    _, sval = lax.sort((widx, word), dimension=1, num_keys=1)
    iota = jnp.arange(n_words, dtype=jnp.int32)[None, :, None]
    wc = fwc[:, None, :]
    words = jnp.where(
        iota < wc,
        sval[:, :n_words],
        jnp.where(iota == wc, freg[:, None, :], 0),
    )
    words_b = words.transpose(0, 2, 1).reshape(g * lan, n_words)
    sh = jnp.arange(4) * 8
    by = ((words_b[:, :, None] >> sh[None, None, :]) & 0xFF).astype(jnp.uint8)
    return by.reshape(g * lan, 4 * n_words)


def materialize_fast(fb: FastBlockData, n_out, cfg: CodecConfig, max_bytes: int,
                     interpret=False):
    """Assemble byte streams for chosen n_out [B]. Returns
    (size_bits [B], bytes [B, max_bytes])."""
    from ulcx.bitstream import pallas_encode3 as pe3

    b_in = fb.coef.shape[0]
    fb = _pad128(fb)
    n_out = _pad_vec(n_out, b_in)
    b, p_tot = fb.coef.shape
    g = b // pe3.LAN
    nout_l = jnp.broadcast_to(
        n_out.astype(jnp.int32).reshape(g, 1, pe3.LAN),
        (g, pe3.SUBC, pe3.LAN),
    )
    bits_l, word_l, widx_l, freg_l, fwc_l = _v3_call_l(
        _v3_planes(fb, interpret), nout_l, True, interpret
    )
    size_bits = (4 * (bits_l[:, 0, :].reshape(b) + fb.n_header) + 7) & ~7
    by = _assemble_v3_lanes(
        word_l[:, :, 0, :], widx_l[:, :, 0, :], freg_l[:, 0, :],
        fwc_l[:, 0, :], max_bytes, interpret,
    )
    return size_bits[:b_in], by[:b_in]


def search_materialize_fast(fb: FastBlockData, n_nz, budget, cfg: CodecConfig,
                            max_bytes: int, interpret=False):
    """CBR/ABR: interp-seeded ladder rate search with the final round
    fused into materialization (the kernel prices and packs every
    candidate lane; the best feasible lane's stream is selected).
    Returns (n_out [B], size_bits [B], bytes [B, max_bytes])."""
    import math

    from ulcx.bitstream import pallas_encode3 as pe3

    b_in = fb.coef.shape[0]
    fb = _pad128(fb)
    n_nz = _pad_vec(n_nz, b_in)
    budget = _pad_vec(budget, b_in)
    b, p_tot = fb.coef.shape
    k = cand_count(b, p_tot)
    rounds = max(1, int(math.ceil(math.log(p_tot, k))))

    # the whole ladder runs in KERNEL LAYOUT ([G, cand-sublane,
    # stream-lane]): bracket state, candidate grids, feasibility and
    # the final select never round-trip through [B, k] — the device
    # trace showed the per-round [G,8,128]<->[B,8] relayout copies
    # costing more than the feasibility math itself
    pl3 = _v3_planes(fb, interpret)
    g = b // 128
    bud = budget.astype(jnp.int32).reshape(g, 128)[:, None, :]
    nh_l = fb.n_header.reshape(g, 128)[:, None, :]
    size_fn_l = lambda nn: (
        4 * (_v3_call_l(pl3, nn, False, interpret)[0] + nh_l) + 7
    ) & ~7
    lo, hi = _bracket_search(
        size_fn_l,
        n_nz.astype(jnp.int32).reshape(g, 128),
        budget.astype(jnp.int32).reshape(g, 128),
        k,
        rounds,
    )

    # final round: adaptive-spacing candidates, fused with
    # materialization
    cands, cands_c, hi_c = _final_cands(lo, hi, k)
    bits_l, word_l, widx_l, freg_l, fwc_l = _v3_call_l(
        pl3, cands_c, True, interpret
    )
    sizes = (4 * (bits_l + nh_l) + 7) & ~7
    # clipped candidates equal hi_c (in-bracket): selectable
    feas = sizes <= bud
    feas = feas.at[:, 0, :].set(True)  # lane 0 = lo, always a fallback
    jidx = jnp.arange(k)[None, :, None]
    best_j = jnp.max(jnp.where(feas, jidx, 0), axis=1)  # [G, LAN]

    def sel_l(x):
        # k-way sublane select by best_j (where-chain; gathers and
        # one-hot einsum selects both measured slower)
        if x.ndim == 3:  # [G, k, LAN]
            out = x[:, 0]
            for j in range(1, k):
                out = jnp.where(best_j == j, x[:, j], out)
            return out
        out = x[:, :, 0]  # [G, P, k, LAN]
        for j in range(1, k):
            out = jnp.where((best_j == j)[:, None, :], x[:, :, j], out)
        return out

    n_out = sel_l(cands_c).reshape(b)
    size_bits = sel_l(sizes).reshape(b)
    by = _assemble_v3_lanes(
        sel_l(word_l), sel_l(widx_l), sel_l(freg_l), sel_l(fwc_l),
        max_bytes, interpret,
    )
    return n_out[:b_in], size_bits[:b_in], by[:b_in]
