"""Fused Pallas TPU kernel for the bitstream encode pass.

The XLA-level scans in ``ulcx.bitstream.encode`` are correct but pay
10-40us *per loop step* on TPU (each while-loop iteration round-trips
carries and xs slices through HBM). This kernel runs the same three
sequential recurrences as hardware loops over VMEM-resident state —
roughly two orders of magnitude cheaper per step:

  phase 1 (forward):  quantizer-zone scan  -> running max, split flags
  phase 2 (reverse):  zone quantizer backfill, coded mask, next-coded
                      pointer, next-coded quantizer (no gathers: all
                      "future" values become reverse-carried state)
  phase 3 (forward):  emission walk -> per-position token nybble counts
                      (and, in materialize mode, the packed nybbles)

Lane layout: 128 lanes = 8 streams x 16 rate-search candidates, so one
kernel invocation prices 16 candidate coefficient budgets for 8 streams
at once; the CBR ladder needs just 3 invocations per block batch. All
state arrays are [P, 128] (P = n_chan * block_size <= 4096 for this
kernel; larger configs use the scan path).

Tail (end-of-segment) tokens are intentionally *not* priced here: the
kernel reports per-slot (N/8-grid) cumulative last-coded position and
active quantizer, and the caller prices/injects the <= 4*n_chan tail
tokens vectorized outside (they need the HF-extension fit, which is
candidate-independent).

Semantics match ``encode_pass_size(..., noise_run_window="segment")``
exactly (the candidate-independent noise window is what makes the
noise decision a per-position input).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N_STREAMS = 8          # streams per kernel invocation
N_CAND = 16            # rate-search candidates per stream
SENT = np.int32(1 << 20)

_BQ_A = np.float32(float.fromhex("0x1.657006p2"))
_INV_LN2 = np.float32(float.fromhex("0x1.715476p0"))


def _cq_unsigned(v):
    q = jnp.floor(jnp.float32(0.5) + jnp.sqrt(jnp.maximum(v - jnp.float32(0.25), 0.0)))
    return jnp.where(v >= 0.5, q, 0.0).astype(jnp.int32)


def _exp2i(q):
    """2^q as f32 for q in [0, 31] via exponent-field construction."""
    return lax.bitcast_convert_type(
        ((jnp.clip(q, 0, 31) + 127) << 23).astype(jnp.int32), jnp.float32
    )


def _kernel(nout_ref, coef_ref, amp_ref, aux_ref, size_ref, slotpq_ref, slotlc_ref,
            nyb_ref, s1, s2, s3, *, p_tot: int, n_slots: int, materialize: bool):
    nout = nout_ref[0, :]  # [LANES] i32
    if not materialize:
        nyb_ref[0, :] = jnp.zeros((LANES,), jnp.int32)

    # ---------------- phase 1: forward zone scan ----------------
    def p1(p, carry):
        qmin, qmax = carry
        row_a = jnp.abs(coef_ref[p, :])
        aux = aux_ref[p, :]
        rank = aux & 0x1FFF
        segstart = (aux >> 30) & 1
        kept = rank < nout
        qmin = jnp.where(segstart == 1, jnp.float32(1000.0), qmin)
        qmax = jnp.where(segstart == 1, jnp.float32(-1000.0), qmax)
        nmin = jnp.minimum(qmin, row_a)
        nmax = jnp.maximum(qmax, row_a)
        split = kept & (nmax > nmin * 4.0)
        qmin = jnp.where(kept, jnp.where(split, row_a, nmin), qmin)
        qmax = jnp.where(kept, jnp.where(split, row_a, nmax), qmax)
        s1[p, :] = qmax
        s2[p, :] = split.astype(jnp.int32)
        return qmin, qmax

    lax.fori_loop(
        0, p_tot, p1,
        (jnp.full((LANES,), 1000.0, jnp.float32),
         jnp.full((LANES,), -1000.0, jnp.float32)),
    )

    # ---------------- phase 2: reverse backfill ----------------
    def p2(k, carry):
        nk, nk_split, cur_qi, q_next, ncp = carry
        p = p_tot - 1 - k
        aux = aux_ref[p, :]
        rank = aux & 0x1FFF
        segdelta = (aux >> 13) & 0x3FFF
        kept = rank < nout
        runq = s1[p, :]
        split_p = s2[p, :]
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
        coded = kept & (jnp.abs(coef_ref[p, :]) * scale >= 2.5)
        q_next = jnp.where(coded, cur_qi, q_next)
        ncp_new = jnp.where(coded, p, ncp)
        s3[p, :] = ncp_new
        s2[p, :] = q_next | (coded.astype(jnp.int32) << 8)
        nk = jnp.where(kept, p, nk)
        nk_split = jnp.where(kept, split_p, nk_split)
        return nk, nk_split, cur_qi, q_next, ncp_new

    lax.fori_loop(
        0, p_tot, p2,
        (jnp.full((LANES,), SENT, jnp.int32),
         jnp.zeros((LANES,), jnp.int32),
         jnp.full((LANES,), 31, jnp.int32),
         jnp.full((LANES,), 31, jnp.int32),
         jnp.full((LANES,), SENT, jnp.int32)),
    )

    # ---------------- phase 3: emission walk ----------------
    slot_len = p_tot // n_slots

    def p3_step(p, carry):
        covered, prev_q, bits, last_coded = carry
        aux = aux_ref[p, :]
        segdelta = (aux >> 13) & 0x3FFF
        segstart = (aux >> 30) & 1
        s2row = s2[p, :]
        q_ev = s2row & 0xFF
        coded = (s2row >> 8) & 1
        ncp = s3[p, :]

        prev_q = jnp.where(segstart == 1, jnp.int32(-1), prev_q)
        skip = p < covered
        coded_ev = (~skip) & (coded == 1)
        is_tail = (ncp - p) >= segdelta
        tail_ev = (~skip) & (coded == 0) & is_tail
        gap_ev = (~skip) & (coded == 0) & (~is_tail)

        qq = q_ev
        need_q = (coded_ev | gap_ev) & (qq != prev_q)
        lead = (prev_q >= 0).astype(jnp.int32)
        s = qq - 5
        ext_q = (s >= 14).astype(jnp.int32)
        q_cnt = jnp.where(need_q, 1 + ext_q + lead, 0)

        z_r = jnp.clip(ncp - p, 0, SENT)
        scale = _exp2i(qq)
        # noise-run amplitude quantization (reference ULCi_GetNoiseQ):
        # amp is candidate-independent, the quantizer comes from q_ev
        amp = amp_ref[p, :]
        nq_est = jnp.where(amp > 0, jnp.minimum(_cq_unsigned(amp * scale), 8), 0)
        c0 = coef_ref[p, :]
        c1 = coef_ref[jnp.minimum(p + 1, p_tot - 1), :]
        qn1 = jnp.minimum(_cq_unsigned(jnp.abs(c0) * scale), 7)
        qn1 = jnp.where(c0 < 0, -qn1, qn1)
        qn2 = jnp.minimum(_cq_unsigned(jnp.abs(c1) * scale), 7)
        qn2 = jnp.where(c1 < 0, -qn2, qn2)

        do_resc = (
            gap_ev
            & (z_r <= 2)
            & (jnp.abs(qn1) > 1)
            & ((z_r < 2) | (jnp.abs(qn2) > 1))
        )
        do_noise = gap_ev & (~do_resc) & (z_r >= 16) & (nq_est > 0)
        do_zs = gap_ev & (~do_resc) & (~do_noise) & (z_r < 33)
        do_zl = gap_ev & (~do_resc) & (~do_noise) & (z_r >= 33)
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
            # quantizer-change nybbles (up to 3)
            qv0 = jnp.where(lead == 1, 0xF, jnp.where(ext_q == 1, 0xE, s))
            qv1 = jnp.where(lead == 1, jnp.where(ext_q == 1, 0xE, s), s - 14)
            qv2 = s - 14
            v_noise = run_n - 16
            v_long = run_n - 33
            t0 = jnp.where(
                coded_ev,
                qn1 & 0xF,
                jnp.where(
                    do_resc,
                    qn1 & 0xF,
                    jnp.where(
                        do_noise, 0x8, jnp.where(do_zs, 0x0, 0x1)
                    ),
                ),
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
            # NOTE: an arithmetic pack via variable shifts
            # ((tok & mask) << 4*q_cnt) was A/B-tested and is ~75ms
            # SLOWER per bench — Mosaic lowers vector-variable shifts
            # poorly; the unrolled select loop wins.
            token = [t0, t1, t2, t3]
            packed = jnp.zeros((LANES,), jnp.int32)
            for k in range(7):
                tk = jnp.clip(k - q_cnt, 0, 3)
                tv = token[0]
                for j in range(1, 4):
                    tv = jnp.where(tk == j, token[j], tv)
                qv = jnp.where(
                    jnp.clip(k, 0, 2) == 0,
                    qv0,
                    jnp.where(jnp.clip(k, 0, 2) == 1, qv1, qv2),
                )
                val = jnp.where(k < q_cnt, qv, tv) & 0xF
                packed = packed | jnp.where(k < cnt, val << (4 * k), 0)
            nyb_ref[p, :] = packed | (cnt << 28)

        return new_covered, new_prev_q, bits, last_coded

    def p3_slot(slot, carry):
        covered, prev_q, bits, last_coded = lax.fori_loop(
            slot * slot_len, (slot + 1) * slot_len, p3_step, carry
        )
        slotpq_ref[slot, :] = prev_q
        slotlc_ref[slot, :] = last_coded
        return covered, prev_q, bits, last_coded

    _, _, bits, _ = lax.fori_loop(
        0, n_slots, p3_slot,
        (jnp.zeros((LANES,), jnp.int32),
         jnp.full((LANES,), -1, jnp.int32),
         jnp.zeros((LANES,), jnp.int32),
         jnp.full((LANES,), -1, jnp.int32)),
    )
    size_ref[0, :] = bits


def encode_kernel_call(nout, coef, amp, aux, p_tot: int, n_slots: int,
                       materialize: bool, interpret: bool = False):
    """Run one kernel invocation.

    nout [LANES] i32, coef/amp [P, LANES] f32, aux [P, LANES] i32.
    Returns (bits [LANES] (token nybbles, no header/tail),
             slotpq [n_slots, LANES], slotlc [n_slots, LANES],
             nyb [P, LANES] i32 packed nybbles|count<<28 (zeros unless
             materialize)).
    """
    kern = functools.partial(
        _kernel, p_tot=p_tot, n_slots=n_slots, materialize=materialize
    )
    out_shapes = (
        jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_slots, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_slots, LANES), jnp.int32),
        jax.ShapeDtypeStruct((p_tot if materialize else 8, LANES), jnp.int32),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sizes8, slotpq, slotlc, nyb = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=(vspec, vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((p_tot, LANES), jnp.float32),
            pltpu.VMEM((p_tot, LANES), jnp.int32),
            pltpu.VMEM((p_tot, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.broadcast_to(nout[None, :], (8, LANES)).astype(jnp.int32), coef, amp, aux)
    return sizes8[0], slotpq, slotlc, nyb
