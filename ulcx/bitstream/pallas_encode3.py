"""Transposed encode-pass kernels: 128 streams x 8 candidates.

The retired v1/v2 layouts replicated every per-position input across
the 16 candidate lanes (lane = subgroup x candidate), so each kernel
round read 16x more coef/aux/amp bytes than exist — and the rounds
measured bandwidth-bound on exactly that traffic. v3 transposes the
layout:

  lanes (128)    = distinct streams        -> inputs are [P, 1, 128],
  sublanes (8)   = rate-search candidates     read ONCE per stream and
                                              broadcast across the
                                              sublane dim for free

Candidate count is 8, so the CBR ladder needs ceil(log8 P) rounds
(4 for P=4096) — each round is latency-bound on the serial P-walk, so
batches smaller than 128 streams are PADDED to the full lane width by
the fast_encode glue at zero wall-clock cost. State arrays stay
per-(candidate, stream): [P, 8, 128].

Keep test: the reference keeps a coefficient when its importance RANK
is below the candidate count (heapsort ranks,
ulcEncoder_BlockTransform.c:349-355). Materializing per-position ranks
costs an argsort PLUS an inverse-permutation sort per block batch —
the largest coherent block in the round-3 device trace. The kernels
instead test the stable-descending-order predicate directly:

  kept(p, n)  <=>  key[p] > t_n  |  (key[p] == t_n  &  p <= c_n)

where key = order-preserving monotone i32 of the importance (±0.0
squashed, NaNs collapsed below -inf — ops/keys.monotone_i32) and
(t_n, c_n) = the n-th entry of ONE (key desc, idx asc) sort, fetched
per candidate. Bit-identical to rank < n, ties included, with the
inverse-permutation sort gone and the rank field freed from the aux
word.

Field widths (P = n_chan * block_size <= 32768 — the kernel now holds
the reference's full BLOCK envelope incl. mono bs32768,
ulcEncoder.c:21; many-channel shapes past P=32768 take the scan path):
  aux:   segment length 16 bits [0..15] (a full bs32768 block =
         32768 = 0x8000), seg-start bit 16
  state: next-coded-pos 16 bits [0..15] (sentinel 65535 > P-1),
         quantizer 5 bits [16..20], coded bit 21

Byte-identical to the scan path (ulcx.bitstream.encode).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBC = 8       # sublanes: candidates
LAN = 128      # lanes: streams
N_STREAMS = 128
N_CAND = 8

SENT = np.int32(1 << 20)  # "no position" sentinel (> any p)

# BuildQuantizer constants (reference ulcEncoder_Encode.c:50-87):
# qi = clip(floor(A - log2(max*2/3)), 5, 31) with A = 5 + log2(1.5)
_BQ_A = np.float32(float.fromhex("0x1.657006p2"))
_INV_LN2 = np.float32(float.fromhex("0x1.715476p0"))


def _cq_unsigned(v):
    """Companded quantize |v| (reference ulcHelper.h:50-65)."""
    q = jnp.floor(jnp.float32(0.5) + jnp.sqrt(jnp.maximum(v - jnp.float32(0.25), 0.0)))
    return jnp.where(v >= 0.5, q, 0.0).astype(jnp.int32)


def _exp2i(q):
    """2^q as f32 for q in [0, 31] via exponent-field construction."""
    return lax.bitcast_convert_type(
        ((jnp.clip(q, 0, 31) + 127) << 23).astype(jnp.int32), jnp.float32
    )
CHUNK = int(os.environ.get("ULCX_KERNEL_CHUNK", "128"))
_u = os.environ.get("ULCX_KERNEL_UNROLL", "full")
UNROLL = CHUNK if _u == "full" else int(_u)


def _chunk_loop(body, carry, unroll: int):
    """CHUNK-step serial walk with configurable unrolling.

    fori_loop's own ``unroll=`` only works at 1 or CHUNK under Mosaic
    (partial values miscompile/SLOW — round-3 A/B), so partial unroll
    is built structurally: an outer fori over CHUNK//u with u
    statically-traced steps inside. full (default) = straight-line
    trace; compile time scales with the traced step count, which is
    what the ~minutes-long bench compiles pay — partial unroll trades
    a little runtime for much faster Mosaic compiles."""
    if unroll >= CHUNK:
        for i in range(CHUNK):
            carry = body(i, carry)
        return carry
    if unroll <= 1:
        return lax.fori_loop(0, CHUNK, body, carry, unroll=1)
    assert CHUNK % unroll == 0

    def outer(j, c):
        for k in range(unroll):
            c = body(j * unroll + k, c)
        return c

    return lax.fori_loop(0, CHUNK // unroll, outer, carry)


# ---------------------------------------------------------------------------
# Phase 1: forward zone scan.
#
# The backward pass only ever consumes the *quantizer index* derived
# from the running zone maximum (qi = clip(floor(A - log2 runq), 5, 31)
# — 5 bits) plus the 1-bit split flag, so phase 1 emits qi|split<<5 in
# ONE i32 plane instead of (runq f32, split i32): half the per-candidate
# inter-phase HBM traffic, same log count, bit-identical qi.


def _p1(t_ref, c_ref, key_ref, coef_ref, aux_ref, s12_ref, qmin_sc, qmax_sc,
        *, unroll: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        qmin_sc[...] = jnp.full((SUBC, LAN), 1000.0, jnp.float32)
        qmax_sc[...] = jnp.full((SUBC, LAN), -1000.0, jnp.float32)

    t = t_ref[...]
    c = c_ref[...]
    base = j * CHUNK

    def body(p, carry):
        qmin, qmax = carry
        a = jnp.abs(coef_ref[p])          # (1, LAN) -> broadcasts
        aux = aux_ref[p]
        key = key_ref[p]
        segstart = (aux >> 16) & 1
        kept = (key > t) | ((key == t) & (base + p <= c))
        qmin = jnp.where(segstart == 1, jnp.float32(1000.0), qmin)
        qmax = jnp.where(segstart == 1, jnp.float32(-1000.0), qmax)
        nmin = jnp.minimum(qmin, a)
        nmax = jnp.maximum(qmax, a)
        split = kept & (nmax > nmin * 4.0)
        qmin = jnp.where(kept, jnp.where(split, a, nmin), qmin)
        qmax = jnp.where(kept, jnp.where(split, a, nmax), qmax)
        qi = jnp.clip(
            jnp.floor(
                _BQ_A - _INV_LN2 * jnp.log(jnp.maximum(qmax, 1e-38))
            ).astype(jnp.int32),
            5,
            31,
        )
        s12_ref[p] = qi | (split.astype(jnp.int32) << 5)
        return qmin, qmax

    qmin, qmax = _chunk_loop(body, (qmin_sc[...], qmax_sc[...]), unroll)
    qmin_sc[...] = qmin
    qmax_sc[...] = qmax


# ---------------------------------------------------------------------------
# Phase 2: reverse backfill.


# The 2.5/0.5/0.125 magnitude tests against value*2^q products are
# integer compares q >= qmin(value) (the scaling by 2^q is exact in
# f32, so the smallest passing q is a pure function of the value's bit
# pattern — fast_encode._qmin_ge builds them). The size-only walks read
# ONE packed per-position threshold plane instead of the four value
# planes (coef/coefn/ampn/hfamp + hfmeta), cutting both the serial-loop
# op count (the walks are issue-bound — NOTES.md round-3 facts) and the
# per-round HBM traffic. Field layout (i32):
#   bits 0-5   qmin(|coef[p]|, 2.5)      - resc test / p2 coded test
#   bits 6-11  qmin(|coef[p+1]|, 2.5)    - resc second-coef test
#   bits 12-17 qmin(ampn[pair], 0.5)     - noise-run amplitude test
#   bits 18-23 qmin(hfamp[pair], 0.125)  - HF-extension amplitude test
#   bit  24    hfok[pair]                - HF fit validity
# 63 = "never" (beyond the 5-bit quantizer range).


def _p2(t_ref, c_ref, key_ref, thr_ref, aux_ref, s12_ref, state_ref, st_sc,
        *, unroll: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st_sc[0] = jnp.full((SUBC, LAN), SENT, jnp.int32)       # nk
        st_sc[1] = jnp.zeros((SUBC, LAN), jnp.int32)            # nk_split
        st_sc[2] = jnp.full((SUBC, LAN), 31, jnp.int32)         # cur_qi
        st_sc[3] = jnp.full((SUBC, LAN), 31, jnp.int32)         # q_next
        st_sc[4] = jnp.full((SUBC, LAN), SENT, jnp.int32)       # ncp

    t = t_ref[...]
    c = c_ref[...]
    base = (pl.num_programs(1) - 1 - j) * CHUNK

    def body(k, carry):
        nk, nk_split, cur_qi, q_next, ncp = carry
        lp = CHUNK - 1 - k
        p = base + lp
        aux = aux_ref[lp]
        key = key_ref[lp]
        segdelta = aux & 0xFFFF
        kept = (key > t) | ((key == t) & (p <= c))
        s12 = s12_ref[lp]
        split_p = (s12 >> 5) & 1
        diff_seg = nk >= p + segdelta
        zone_end = kept & ((nk >= SENT) | (nk_split == 1) | diff_seg)
        qi_new = s12 & 0x1F
        cur_qi = jnp.where(zone_end, qi_new, cur_qi)
        # |coef|*2^cur_qi >= 2.5 as an integer threshold compare
        coded = kept & (cur_qi >= (thr_ref[lp] & 63))
        q_next = jnp.where(coded, cur_qi, q_next)
        ncp_new = jnp.where(coded, p, ncp)
        state_ref[lp] = (
            jnp.clip(ncp_new, 0, (1 << 16) - 1)
            | (q_next << 16)
            | (coded.astype(jnp.int32) << 21)
        )
        nk = jnp.where(kept, p, nk)
        nk_split = jnp.where(kept, split_p, nk_split)
        return nk, nk_split, cur_qi, q_next, ncp_new

    out = _chunk_loop(
        body, (st_sc[0], st_sc[1], st_sc[2], st_sc[3], st_sc[4]), unroll
    )
    for i in range(5):
        st_sc[i] = out[i]


# ---------------------------------------------------------------------------
# Phase 3: forward emission walk with in-kernel tail pricing + packing.
#
# Round-2 measured the post-kernel chain (tail_info's [B,16S] gathers +
# the [B,7P] sort-assemble) at ~150 ms of the 396 ms budget. Both fold
# into the walk:
#  - tail tokens (ulcEncoder_NoiseFill.c:41-94 pricing; stop/zero-tail
#    codes of ulcEncoder_Encode.c) are emitted at the first in-segment
#    position past the last coded coefficient — the walk knows it is
#    there (`is_tail`) the moment it arrives, so the token is priced and
#    packed inline and `bits` already includes it;
#  - in materialize mode a per-lane nybble shift register (one u32 = 8
#    nybbles) accumulates the stream; each completed u32 word is emitted
#    at the *grid-uniform* position index together with its running word
#    index, and a single [B, P] two-operand sort outside compacts the
#    words (per-lane VMEM offsets — the round-2 blocker — never arise).


def _p3(*refs, materialize: bool, unroll: int):
    if materialize:
        (coef_ref, coefn_ref, amp_ref, aux_ref, hfamp_ref, hfmeta_ref,
         state_ref, hdr_ref, bits_ref, word_ref, widx_ref, freg_ref,
         fwc_ref, st_sc) = refs
    else:
        # size-only walk: the value planes collapse into the packed
        # threshold plane (see the field-layout comment above _p2)
        (thr_ref, aux_ref, state_ref, bits_ref, st_sc) = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st_sc[0] = jnp.zeros((SUBC, LAN), jnp.int32)            # covered
        st_sc[1] = jnp.full((SUBC, LAN), -1, jnp.int32)         # prev_q
        st_sc[2] = jnp.zeros((SUBC, LAN), jnp.int32)            # bits
        st_sc[3] = jnp.zeros((SUBC, LAN), jnp.int32)            # tail_done
        if materialize:
            h = jnp.broadcast_to(hdr_ref[...], (SUBC, LAN))
            nh = h >> 8
            st_sc[4] = jnp.where(nh == 2, h & 0xFF, h & 0xF)    # reg
            st_sc[5] = nh                                       # fill
            st_sc[6] = jnp.zeros((SUBC, LAN), jnp.int32)        # wcount

    base = j * CHUNK

    def body(lp, carry):
        if materialize:
            covered, prev_q, bits, tail_done, reg, fill, wcount = carry
        else:
            covered, prev_q, bits, tail_done = carry
        p = base + lp
        aux = aux_ref[lp]
        segdelta = aux & 0xFFFF
        segstart = (aux >> 16) & 1
        srow = state_ref[lp]
        ncp = srow & 0xFFFF
        q_ev = (srow >> 16) & 0x1F
        coded = (srow >> 21) & 1

        # Speculation: every event decision below is computed from
        # DATA ONLY (this position's loads + thr planes); the carry
        # enters only through the late act/neq selects. The walk is
        # latency-bound on the carry-to-carry dependence chain
        # (NOTES.md round-4 budget): hoisting the run/price
        # where-chains off that chain shortens covered's loop-carried
        # path from ~10 dependent ops to 3 (cmp, and, select).
        # Bit-identical: speculated values at inactive positions are
        # masked (cnt = 0 -> hb-1 = 0 packs a zero word; covered and
        # prev_q keep their old values through the selects).
        is_code = coded == 1
        is_tail = (ncp - p) >= segdelta
        gp = (~is_code) & (~is_tail)
        qq = q_ev
        s = qq - 5
        ext_q = (s >= 14).astype(jnp.int32)

        z_r = jnp.clip(ncp - p, 0, SENT)
        if materialize:
            scale = _exp2i(qq)
            c0 = coef_ref[lp]
            c1 = coefn_ref[lp]
            qn1 = jnp.minimum(_cq_unsigned(jnp.abs(c0) * scale), 7)
            qn1 = jnp.where(c0 < 0, -qn1, qn1)
            qn2 = jnp.minimum(_cq_unsigned(jnp.abs(c1) * scale), 7)
            qn2 = jnp.where(c1 < 0, -qn2, qn2)
            amp = amp_ref[lp >> 1]
            nq_est = jnp.where(
                amp > 0, jnp.minimum(_cq_unsigned(amp * scale), 8), 0
            )
            resc_ok = (jnp.abs(qn1) > 1) & ((z_r < 2) | (jnp.abs(qn2) > 1))
            noise_ok = nq_est > 0
        else:
            thr = thr_ref[lp]
            resc_ok = (qq >= (thr & 63)) & (
                (z_r < 2) | (qq >= ((thr >> 6) & 63))
            )
            noise_ok = qq >= ((thr >> 12) & 63)

        do_resc = gp & (z_r <= 2) & resc_ok
        do_noise = gp & (~do_resc) & (z_r >= 16) & noise_ok
        do_zs = gp & (~do_resc) & (~do_noise) & (z_r < 33)
        run_n = jnp.where(
            do_resc,
            z_r,
            jnp.where(
                do_noise,
                jnp.minimum(z_r, 527),
                jnp.where(do_zs, jnp.minimum(z_r, 16), jnp.minimum(z_r, 288)),
            ),
        )
        run_cnt = jnp.where(
            do_resc, z_r, jnp.where(do_noise, 4, jnp.where(do_zs, 2, 3))
        )
        evt = is_code | gp
        cov_evt = jnp.where(is_code, p + 1, p + run_n)
        base_cnt = jnp.where(is_code, jnp.int32(1), run_cnt)

        # --- carry chain (everything above is speculative/data-only) ---
        prev_q = jnp.where(segstart == 1, jnp.int32(-1), prev_q)
        tail_done = jnp.where(segstart == 1, jnp.int32(0), tail_done)
        skip = p < covered
        act = (~skip) & evt
        coded_ev = act & is_code
        lead = (prev_q >= 0).astype(jnp.int32)
        need_q = act & (qq != prev_q)
        q_cnt = jnp.where(need_q, 1 + ext_q + lead, 0)
        cnt = jnp.where(act, q_cnt + base_cnt, 0)
        new_covered = jnp.where(act, cov_evt, covered)
        new_prev_q = jnp.where(need_q, qq, prev_q)

        # --- tail token (fires exactly at p_tail = max(last_coded+1,
        # seg_start): the first in-segment position with nothing coded
        # ahead; same pricing as the former tail_info) ---
        tail_ev = (coded == 0) & is_tail & (tail_done == 0)
        n_tail = segdelta
        pq_valid = prev_q >= 0
        if materialize:
            meta = hfmeta_ref[lp >> 1]
            hfok = (meta >> 8) == 1
            dec_t = meta & 0xFF
            pq_scale = _exp2i(jnp.clip(prev_q, 0, 31))
            amp_t = hfamp_ref[lp >> 1]
            nq_hf = jnp.minimum(_cq_unsigned(amp_t * pq_scale * 4.0), 16)
            hf_amp_ok = nq_hf > 0
        else:
            hfok = ((thr >> 24) & 1) == 1
            hf_amp_ok = prev_q >= ((thr >> 18) & 63)
        do_hf = tail_ev & pq_valid & (n_tail >= 16) & hfok & hf_amp_ok
        do_stop = tail_ev & (n_tail > 4) & (~do_hf)
        do_zt = tail_ev & (n_tail > 0) & (n_tail <= 4)
        cnt_tail = jnp.where(
            do_hf,
            5,
            jnp.where(
                do_stop,
                jnp.where(pq_valid, 3, 2),
                jnp.where(do_zt, 2, 0),
            ),
        )
        tail_done = jnp.where(tail_ev, jnp.int32(1), tail_done)
        bits = bits + cnt + cnt_tail

        if materialize:
            qv0 = jnp.where(lead == 1, 0xF, jnp.where(ext_q == 1, 0xE, s))
            qv1 = jnp.where(lead == 1, jnp.where(ext_q == 1, 0xE, s), s - 14)
            qv2 = s - 14
            v_noise = run_n - 16
            v_long = run_n - 33
            t0 = jnp.where(
                coded_ev | do_resc,
                qn1 & 0xF,
                jnp.where(do_noise, 0x8, jnp.where(do_zs, 0x0, 0x1)),
            )
            t1 = jnp.where(
                do_resc,
                qn2 & 0xF,
                jnp.where(
                    do_noise,
                    (v_noise >> 5) & 0xF,
                    jnp.where(do_zs, run_n - 1, (v_long >> 4) & 0xF),
                ),
            )
            t2 = jnp.where(do_noise, (v_noise >> 1) & 0xF, v_long & 0xF)
            t3 = ((v_noise & 1) | ((nq_est - 1) << 1)) & 0xF
            # arithmetic pack instead of a 7-step select loop (~20
            # fewer ops in the issue-bound walk): quantizer nybbles,
            # then the token nybbles shifted up by 4*q_cnt, masked to
            # cnt nybbles. q_cnt <= 3 and cnt <= 7, so the variable
            # shifts decompose into predicated STATIC shifts (variable
            # vector shifts lower poorly on Mosaic — round-2 A/B).
            qpart = (
                (qv0 & 0xF) | ((qv1 & 0xF) << 4) | ((qv2 & 0xF) << 8)
            )
            qm = jnp.where((q_cnt & 1) == 1, 0xF, 0)
            qm = qm | jnp.where((q_cnt & 2) == 2, (qm << 8) | 0xFF, 0)
            tpart = (
                (t0 & 0xF) | ((t1 & 0xF) << 4) | ((t2 & 0xF) << 8)
                | ((t3 & 0xF) << 12)
            )
            tpart = jnp.where((q_cnt & 1) == 1, tpart << 4, tpart)
            tpart = jnp.where((q_cnt & 2) == 2, tpart << 8, tpart)
            one = jnp.full((SUBC, LAN), 1, jnp.int32)
            hb = jnp.where((cnt & 1) == 1, one << 4, one)
            hb = jnp.where((cnt & 2) == 2, hb << 8, hb)
            hb = jnp.where((cnt & 4) == 4, hb << 16, hb)
            packed = ((qpart & qm) | tpart) & (hb - 1)
            tail_packed = jnp.where(
                do_hf,
                0xF
                | (0xF << 4)
                | (((nq_hf - 1) & 0xF) << 8)
                | (((dec_t >> 4) & 0xF) << 12)
                | ((dec_t & 0xF) << 16),
                jnp.where(
                    do_stop,
                    jnp.where(pq_valid, 0xF | (0xE << 4) | (0xF << 8),
                              0xE | (0xF << 4)),
                    0x0 | (jnp.clip(n_tail - 1, 0, 0xF) << 4),
                ),
            )
            pos_packed = jnp.where(
                tail_ev, jnp.where(cnt_tail > 0, tail_packed, 0), packed
            )
            pos_cnt = cnt + cnt_tail

            # per-lane nybble shift register: one u32 = 8 nybbles.
            # Variable shifts lower poorly on Mosaic (round-2 A/B);
            # shift-by-fill decomposes over fill's BITS (3 predicated
            # static shifts instead of an 8-deep select chain — the
            # materialize walk is latency-bound on exactly this chain).
            lo_add = jnp.where((fill & 1) == 1, pos_packed << 4, pos_packed)
            lo_add = jnp.where((fill & 2) == 2, lo_add << 8, lo_add)
            lo_add = jnp.where((fill & 4) == 4, lo_add << 16, lo_add)
            # residue = pos_packed >> (32 - 4*fill): decompose 8 - fill
            inv = 8 - fill
            residue = jnp.where((inv & 1) == 1, pos_packed >> 4, pos_packed)
            residue = jnp.where((inv & 2) == 2, residue >> 8, residue)
            residue = jnp.where((inv & 4) == 4, residue >> 16, residue)
            residue = jnp.where(fill == 0, 0, residue)
            full = reg | lo_add
            newfill = fill + pos_cnt
            crossed = newfill >= 8
            wv = jnp.where(crossed, wcount, jnp.int32(2**30))
            word_ref[lp] = full
            widx_ref[lp] = wv
            reg = jnp.where(crossed, residue, full)
            fill = newfill & 7
            wcount = wcount + crossed.astype(jnp.int32)
            return new_covered, new_prev_q, bits, tail_done, reg, fill, wcount

        return new_covered, new_prev_q, bits, tail_done

    n_carry = 7 if materialize else 4
    out = _chunk_loop(body, tuple(st_sc[i] for i in range(n_carry)), unroll)
    for i in range(n_carry):
        st_sc[i] = out[i]
    bits_ref[...] = out[2]
    if materialize:
        freg_ref[...] = out[4]
        fwc_ref[...] = out[6]


# ---------------------------------------------------------------------------
# Caller.


def _specs(p_tot: int):
    n_chunks = p_tot // CHUNK
    in_spec = pl.BlockSpec(
        (None, CHUNK, 1, LAN), lambda gg, j: (gg, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    lin_spec = pl.BlockSpec(
        (None, CHUNK // 2, 1, LAN), lambda gg, j: (gg, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    rin_spec = pl.BlockSpec(
        (None, CHUNK, 1, LAN),
        lambda gg, j: (gg, n_chunks - 1 - j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    chunk_spec = pl.BlockSpec(
        (None, CHUNK, SUBC, LAN), lambda gg, j: (gg, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    rchunk_spec = pl.BlockSpec(
        (None, CHUNK, SUBC, LAN),
        lambda gg, j: (gg, n_chunks - 1 - j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = pl.BlockSpec(
        (None, SUBC, LAN), lambda gg, j: (gg, 0, 0), memory_space=pltpu.VMEM
    )
    return in_spec, lin_spec, rin_spec, chunk_spec, rchunk_spec, whole


def p12_call(t, c, key, coef, thr, aux, p_tot: int, interpret: bool = False):
    """Phases 1+2 (forward zone scan, reverse backfill): the packed
    per-position state plane [G, P, SUBC, LAN] consumed by phase 3.
    Exposed separately so a size pass and a materialize pass over the
    SAME candidates reuse one state build.
    t/c [G, SUBC, LAN] are the per-candidate keep thresholds (see
    module docstring); key [G, P, 1, LAN] the monotone importance.
    p1 reads the coefficient values (zone min/max); p2 only ever tests
    |coef|*2^q >= 2.5, so it reads the packed threshold plane."""
    n_chunks = p_tot // CHUNK
    g = t.shape[0]
    grid = (g, n_chunks)
    unroll = 1 if interpret else UNROLL
    in_spec, _, rin_spec, chunk_spec, rchunk_spec, whole = _specs(p_tot)

    s12 = pl.pallas_call(
        functools.partial(_p1, unroll=unroll),
        grid=grid,
        in_specs=[whole, whole, in_spec, in_spec, in_spec],
        out_specs=chunk_spec,
        out_shape=jax.ShapeDtypeStruct((g, p_tot, SUBC, LAN), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SUBC, LAN), jnp.float32),
            pltpu.VMEM((SUBC, LAN), jnp.float32),
        ],
        interpret=interpret,
    )(t, c, key, coef, aux)

    return pl.pallas_call(
        functools.partial(_p2, unroll=unroll),
        grid=grid,
        in_specs=[whole, whole, rin_spec, rin_spec, rin_spec, rchunk_spec],
        out_specs=rchunk_spec,
        out_shape=jax.ShapeDtypeStruct((g, p_tot, SUBC, LAN), jnp.int32),
        scratch_shapes=[pltpu.VMEM((5, SUBC, LAN), jnp.int32)],
        interpret=interpret,
    )(t, c, key, thr, aux, s12)


def p3_call(coef, thr, ampn, aux, hfamp, hfmeta, state, hdr,
            p_tot: int, materialize: bool, interpret: bool = False):
    """Phase 3 (forward emission walk) over a prebuilt state plane.

    Size-only mode reads (thr, aux, state): the coefficient/amplitude
    value planes are replaced by the packed threshold plane (pass
    coef/ampn/hfamp/hfmeta as None). Materialize mode reads the full
    value planes (thr unused). Keep decisions are already baked into
    the state plane, so phase 3 needs no keep thresholds."""
    n_chunks = p_tot // CHUNK
    g = state.shape[0]
    grid = (g, n_chunks)
    unroll = 1 if interpret else UNROLL
    in_spec, lin_spec, _, chunk_spec, _, whole = _specs(p_tot)

    kern3 = functools.partial(_p3, materialize=materialize, unroll=unroll)
    if not materialize:
        return (pl.pallas_call(
            kern3,
            grid=grid,
            in_specs=[in_spec, in_spec, chunk_spec],
            out_specs=whole,
            out_shape=jax.ShapeDtypeStruct((g, SUBC, LAN), jnp.int32),
            scratch_shapes=[pltpu.VMEM((4, SUBC, LAN), jnp.int32)],
            interpret=interpret,
        )(thr, aux, state),)

    coefn = jnp.concatenate([coef[:, 1:], coef[:, -1:]], axis=1)
    in_specs = [in_spec, in_spec, lin_spec, in_spec, lin_spec,
                lin_spec, chunk_spec]
    if materialize:
        return pl.pallas_call(
            kern3,
            grid=grid,
            in_specs=in_specs + [whole],
            out_specs=(whole, chunk_spec, chunk_spec, whole, whole),
            out_shape=(
                jax.ShapeDtypeStruct((g, SUBC, LAN), jnp.int32),
                jax.ShapeDtypeStruct((g, p_tot, SUBC, LAN), jnp.int32),
                jax.ShapeDtypeStruct((g, p_tot, SUBC, LAN), jnp.int32),
                jax.ShapeDtypeStruct((g, SUBC, LAN), jnp.int32),
                jax.ShapeDtypeStruct((g, SUBC, LAN), jnp.int32),
            ),
            scratch_shapes=[pltpu.VMEM((7, SUBC, LAN), jnp.int32)],
            interpret=interpret,
        )(coef, coefn, ampn, aux, hfamp, hfmeta, state, hdr)


def encode_kernel_call3(t, c, key, coef, thr, ampn, aux, hfamp, hfmeta, hdr,
                        p_tot: int, materialize: bool,
                        interpret: bool = False):
    """v3 invocation: G groups x (128 streams x 8 candidates).

    The group axis rides the PALLAS GRID (grid = (G, n_chunks)), not a
    vmap: one kernel launch per phase regardless of batch size, and
    Mosaic pipelines chunk DMA across group boundaries (the per-launch
    fixed cost and the serial-loop drain bubbles were the measured
    round cost at B=512, not HBM traffic).

    t/c/hdr [G, SUBC, LAN] i32 (t/c = per-candidate keep thresholds);
    coef [G, P, 1, LAN] f32; key/aux alike i32; ampn/hfamp
    [G, P/2, 1, LAN] f32 and hfmeta i32 in the pseudo-DFT line domain
    (pairwise-constant, read at lp >> 1).
    Returns bits [G, SUBC, LAN] (tail tokens included; header excluded),
    plus in materialize mode (word [G, P, SUBC, LAN], widx alike,
    freg [G, SUBC, LAN], fwc [G, SUBC, LAN]): emitted u32 stream words
    with their word indices (2**30 where no word completed), the final
    partial word, and the completed-word count.
    """
    state = p12_call(t, c, key, coef, thr, aux, p_tot, interpret)
    return p3_call(coef, thr, ampn, aux, hfamp, hfmeta, state, hdr,
                   p_tot, materialize, interpret)
