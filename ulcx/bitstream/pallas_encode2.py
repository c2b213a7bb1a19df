"""Sublane-packed encode-pass kernels (v2): 64 streams x 16 candidates.

v1 (ulcx.bitstream.pallas_encode) keeps all state VMEM-resident, which
caps the working set at [P, 128] arrays — one (1, 128) vector row per
loop step, i.e. 8 streams per invocation. v2 splits the three phases
into three ``pallas_call``s whose grids walk *position chunks* (phase 2
with a reversed index map); Pallas pipelines the chunked state arrays
through HBM automatically, carries persist in small scratch across grid
steps, and every loop step now processes a full native (8, 128) tile —
64 streams x 16 candidates — at the same per-step cost.

Bit-identical to v1 and to the scan path (same math, same f32 ops).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ulcx.bitstream.pallas_encode import _cq_unsigned, _exp2i, _BQ_A, _INV_LN2, SENT

import os

SUB = 8      # sublanes: stream groups
LAN = 128    # lanes: 8 stream-subgroups x 16 candidates
N_STREAMS = 64
N_CAND = 16
# positions per grid step; env-tunable for A/B (must divide P)
CHUNK = int(os.environ.get("ULCX_KERNEL_CHUNK", "128"))


def _row(ref, p):
    return ref[p]  # [SUB, LAN]


# ---------------------------------------------------------------------------
# Phase 1: forward zone scan.


def _p1(nout_ref, coef_ref, aux_ref, s1_ref, s2_ref, qmin_sc, qmax_sc):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        qmin_sc[...] = jnp.full((SUB, LAN), 1000.0, jnp.float32)
        qmax_sc[...] = jnp.full((SUB, LAN), -1000.0, jnp.float32)

    nout = nout_ref[...]

    def body(p, carry):
        qmin, qmax = carry
        a = jnp.abs(coef_ref[p])
        aux = aux_ref[p]
        rank = aux & 0x1FFF
        segstart = (aux >> 30) & 1
        kept = rank < nout
        qmin = jnp.where(segstart == 1, jnp.float32(1000.0), qmin)
        qmax = jnp.where(segstart == 1, jnp.float32(-1000.0), qmax)
        nmin = jnp.minimum(qmin, a)
        nmax = jnp.maximum(qmax, a)
        split = kept & (nmax > nmin * 4.0)
        qmin = jnp.where(kept, jnp.where(split, a, nmin), qmin)
        qmax = jnp.where(kept, jnp.where(split, a, nmax), qmax)
        s1_ref[p] = qmax
        s2_ref[p] = split.astype(jnp.int32)
        return qmin, qmax

    qmin, qmax = lax.fori_loop(0, CHUNK, body, (qmin_sc[...], qmax_sc[...]))
    qmin_sc[...] = qmin
    qmax_sc[...] = qmax


# ---------------------------------------------------------------------------
# Phase 2: reverse backfill. Grid reversed; in-chunk loop also reversed.


def _p2(nout_ref, coef_ref, aux_ref, s1_ref, s2in_ref, state_ref, st_sc):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        st_sc[0] = jnp.full((SUB, LAN), SENT, jnp.int32)       # nk
        st_sc[1] = jnp.zeros((SUB, LAN), jnp.int32)            # nk_split
        st_sc[2] = jnp.full((SUB, LAN), 31, jnp.int32)         # cur_qi
        st_sc[3] = jnp.full((SUB, LAN), 31, jnp.int32)         # q_next
        st_sc[4] = jnp.full((SUB, LAN), SENT, jnp.int32)       # ncp

    nout = nout_ref[...]
    base = (pl.num_programs(0) - 1 - j) * CHUNK  # global position of local row 0

    def body(k, carry):
        nk, nk_split, cur_qi, q_next, ncp = carry
        lp = CHUNK - 1 - k
        p = base + lp
        aux = aux_ref[lp]
        rank = aux & 0x1FFF
        segdelta = (aux >> 13) & 0x3FFF
        kept = rank < nout
        runq = s1_ref[lp]
        split_p = s2in_ref[lp]
        diff_seg = nk >= p + segdelta
        zone_end = kept & ((nk >= SENT) | (nk_split == 1) | diff_seg)
        qi_new = jnp.clip(
            jnp.floor(
                _BQ_A - _INV_LN2 * jnp.log(jnp.maximum(runq, 1e-38))
            ).astype(jnp.int32),
            5,
            31,
        )
        cur_qi = jnp.where(zone_end, qi_new, cur_qi)
        scale = _exp2i(cur_qi)
        coded = kept & (jnp.abs(coef_ref[lp]) * scale >= 2.5)
        q_next = jnp.where(coded, cur_qi, q_next)
        ncp_new = jnp.where(coded, p, ncp)
        # one packed output: ncp(14b) | q_ev(8b)<<14 | coded<<22
        state_ref[lp] = (
            jnp.clip(ncp_new, 0, (1 << 14) - 1)
            | (q_next << 14)
            | (coded.astype(jnp.int32) << 22)
        )
        nk = jnp.where(kept, p, nk)
        nk_split = jnp.where(kept, split_p, nk_split)
        return nk, nk_split, cur_qi, q_next, ncp_new

    out = lax.fori_loop(
        0, CHUNK, body, (st_sc[0], st_sc[1], st_sc[2], st_sc[3], st_sc[4])
    )
    for i in range(5):
        st_sc[i] = out[i]


# ---------------------------------------------------------------------------
# Phase 3: forward emission walk.


def _p3(nout_ref, coef_ref, coefn_ref, amp_ref, aux_ref, state_ref,
        bits_ref, slotpq_ref, slotlc_ref, nyb_ref, st_sc,
        *, slot_len: int, materialize: bool):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        st_sc[0] = jnp.zeros((SUB, LAN), jnp.int32)            # covered
        st_sc[1] = jnp.full((SUB, LAN), -1, jnp.int32)         # prev_q
        st_sc[2] = jnp.zeros((SUB, LAN), jnp.int32)            # bits
        st_sc[3] = jnp.full((SUB, LAN), -1, jnp.int32)         # last_coded
        if not materialize:
            nyb_ref[0] = jnp.zeros((SUB, LAN), jnp.int32)

    base = j * CHUNK

    def body(lp, carry):
        covered, prev_q, bits, last_coded = carry
        p = base + lp
        aux = aux_ref[lp]
        segdelta = (aux >> 13) & 0x3FFF
        segstart = (aux >> 30) & 1
        srow = state_ref[lp]
        ncp = srow & 0x3FFF
        q_ev = (srow >> 14) & 0xFF
        coded = (srow >> 22) & 1

        prev_q = jnp.where(segstart == 1, jnp.int32(-1), prev_q)
        skip = p < covered
        coded_ev = (~skip) & (coded == 1)
        is_tail = (ncp - p) >= segdelta
        gap_ev = (~skip) & (coded == 0) & (~is_tail)

        qq = q_ev
        need_q = (coded_ev | gap_ev) & (qq != prev_q)
        lead = (prev_q >= 0).astype(jnp.int32)
        s = qq - 5
        ext_q = (s >= 14).astype(jnp.int32)
        q_cnt = jnp.where(need_q, 1 + ext_q + lead, 0)

        z_r = jnp.clip(ncp - p, 0, SENT)
        scale = _exp2i(qq)
        c0 = coef_ref[lp]
        c1 = coefn_ref[lp]
        qn1 = jnp.minimum(_cq_unsigned(jnp.abs(c0) * scale), 7)
        qn1 = jnp.where(c0 < 0, -qn1, qn1)
        qn2 = jnp.minimum(_cq_unsigned(jnp.abs(c1) * scale), 7)
        qn2 = jnp.where(c1 < 0, -qn2, qn2)
        amp = amp_ref[lp]
        nq_est = jnp.where(amp > 0, jnp.minimum(_cq_unsigned(amp * scale), 8), 0)

        do_resc = (
            gap_ev
            & (z_r <= 2)
            & (jnp.abs(qn1) > 1)
            & ((z_r < 2) | (jnp.abs(qn2) > 1))
        )
        do_noise = gap_ev & (~do_resc) & (z_r >= 16) & (nq_est > 0)
        do_zs = gap_ev & (~do_resc) & (~do_noise) & (z_r < 33)
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

        cnt = jnp.where(
            coded_ev, q_cnt + 1, jnp.where(gap_ev, q_cnt + run_cnt, 0)
        )
        new_covered = jnp.where(
            coded_ev, p + 1, jnp.where(gap_ev, p + run_n, covered)
        )
        new_prev_q = jnp.where(need_q, qq, prev_q)
        bits = bits + cnt
        last_coded = jnp.where(coded_ev, p, last_coded)

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
            # NOTE: an arithmetic pack via variable shifts was A/B'd
            # and is ~75ms SLOWER per bench (Mosaic vector-variable
            # shifts); keep the unrolled select loop.
            token = [t0, t1, t2, t3]
            packed = jnp.zeros((SUB, LAN), jnp.int32)
            for k in range(7):
                tk = jnp.clip(k - q_cnt, 0, 3)
                tv = token[0]
                for jj in range(1, 4):
                    tv = jnp.where(tk == jj, token[jj], tv)
                qv = qv0 if k == 0 else (qv1 if k == 1 else qv2)
                if k <= 2:
                    val = jnp.where(k < q_cnt, qv, tv) & 0xF
                else:
                    val = tv & 0xF
                packed = packed | jnp.where(k < cnt, val << (4 * k), 0)
            nyb_ref[lp] = packed | (cnt << 28)

        # slot boundary store (slot_len is a multiple of CHUNK or vice versa)
        is_slot_end = (p + 1) % slot_len == 0
        @pl.when(is_slot_end)
        def _():
            slot = (p + 1) // slot_len - 1
            slotpq_ref[slot] = new_prev_q
            slotlc_ref[slot] = last_coded

        return new_covered, new_prev_q, bits, last_coded

    out = lax.fori_loop(0, CHUNK, body, (st_sc[0], st_sc[1], st_sc[2], st_sc[3]))
    for i in range(4):
        st_sc[i] = out[i]
    bits_ref[...] = out[2]


# ---------------------------------------------------------------------------
# Caller.


def encode_kernel_call2(nout, coef, amp, aux, p_tot: int, n_slots: int,
                        materialize: bool, interpret: bool = False):
    """v2 invocation: 64 streams x 16 candidates.

    nout [SUB, LAN] i32; coef/amp [P, SUB, LAN] f32; aux [P, SUB, LAN] i32.
    Returns (bits [SUB, LAN], slotpq [n_slots, SUB, LAN],
             slotlc [n_slots, SUB, LAN], nyb [P or 8, SUB, LAN] i32).
    """
    n_chunks = p_tot // CHUNK
    slot_len = p_tot // n_slots

    chunk_spec = pl.BlockSpec(
        (CHUNK, SUB, LAN), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    rchunk_spec = pl.BlockSpec(
        (CHUNK, SUB, LAN),
        lambda j: (n_chunks - 1 - j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = pl.BlockSpec((SUB, LAN), lambda j: (0, 0), memory_space=pltpu.VMEM)

    s1, s2 = pl.pallas_call(
        _p1,
        grid=(n_chunks,),
        in_specs=[whole, chunk_spec, chunk_spec],
        out_specs=(chunk_spec, chunk_spec),
        out_shape=(
            jax.ShapeDtypeStruct((p_tot, SUB, LAN), jnp.float32),
            jax.ShapeDtypeStruct((p_tot, SUB, LAN), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, LAN), jnp.float32),
            pltpu.VMEM((SUB, LAN), jnp.float32),
        ],
        interpret=interpret,
    )(nout, coef, aux)

    state = pl.pallas_call(
        _p2,
        grid=(n_chunks,),
        in_specs=[whole, rchunk_spec, rchunk_spec, rchunk_spec, rchunk_spec],
        out_specs=rchunk_spec,
        out_shape=jax.ShapeDtypeStruct((p_tot, SUB, LAN), jnp.int32),
        scratch_shapes=[pltpu.VMEM((5, SUB, LAN), jnp.int32)],
        interpret=interpret,
    )(nout, coef, aux, s1, s2)

    coefn = jnp.concatenate([coef[1:], coef[-1:]], axis=0)
    nslot_spec = pl.BlockSpec(
        (n_slots, SUB, LAN), lambda j: (0, 0, 0), memory_space=pltpu.VMEM
    )
    kern3 = functools.partial(_p3, slot_len=slot_len, materialize=materialize)
    nyb_shape = (p_tot, SUB, LAN) if materialize else (8, SUB, LAN)
    nyb_spec = (
        chunk_spec
        if materialize
        else pl.BlockSpec((8, SUB, LAN), lambda j: (0, 0, 0), memory_space=pltpu.VMEM)
    )
    bits, slotpq, slotlc, nyb = pl.pallas_call(
        kern3,
        grid=(n_chunks,),
        in_specs=[whole] + [chunk_spec] * 5,
        out_specs=(whole, nslot_spec, nslot_spec, nyb_spec),
        out_shape=(
            jax.ShapeDtypeStruct((SUB, LAN), jnp.int32),
            jax.ShapeDtypeStruct((n_slots, SUB, LAN), jnp.int32),
            jax.ShapeDtypeStruct((n_slots, SUB, LAN), jnp.int32),
            jax.ShapeDtypeStruct(nyb_shape, jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((4, SUB, LAN), jnp.int32)],
        interpret=interpret,
    )(nout, coef, coefn, amp, aux, state)
    return bits, slotpq, slotlc, nyb
