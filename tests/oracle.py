"""Full-stream reference-faithful oracle: a sequential NumPy encoder +
decoder mirroring the C reference end to end, independent of ulcx.

With libfourier an empty submodule (reference .gitmodules:1-3) the C
tools cannot be built, so this module stands in for them when measuring
the BASELINE quality targets (decoded PCM RMS <= 1e-3, bitstream sizes
within 1%): it re-implements the complete encoder analysis chain
(reference libulc/ulcEncoder_BlockTransform.c:82-356,
ulcEncoder_WindowControl.c:31-239, ulcEncoder_Psyopt.c:60-250,
ulcEncoder_NoiseFill.c:15-94), the C-exact serialization walk
(ulcEncoder_Encode.c:92-360 — including quantizer emission for zones
with no surviving coefficients, where ulcx deviates), the CBR bisection
(ulcEncoder.c:93-116) and VBR/ABR mappings (:128-158), plus a decoder
built on the pyref syntax mirror with float64 lapped synthesis.

Arithmetic policy: transforms and filter recurrences run in float64
(the ideal the f32 implementations approximate); values the reference
handles at bit level keep exact C semantics (FastLog on f32 bits,
companded quantization, double LineSum accumulation as in Psyopt.c:37-50,
heapsort tie order).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from pyref import (
    Xorshift,
    build_quantizer,
    cq_coef,
    cq_unsigned,
    decode_block,
    get_hf_ext_params,
    get_noise_q,
)

N_BARK = 25

# Decimation-pattern LUT, 4 bits per subblock {shift(0..2), transient
# flag(bit3)}, LSB-first (reference ulcHelper.h:27-44).
DECIM_PATTERN = [
    0x0000, 0x0008, 0x0019, 0x0091, 0x012A, 0x01A2, 0x02A1, 0x0A21,
    0x123B, 0x12B3, 0x1B32, 0x1332 | 0x0800, 0x2331 | 0x0080,
    0x2331 | 0x0800, 0x3321 | 0x0800, 0x3321 | 0x8000,
]
# (re-derive the low entries explicitly to avoid transcription slips)
DECIM_PATTERN = [
    0x0000 | 0x0000, 0x0000 | 0x0008, 0x0011 | 0x0008, 0x0011 | 0x0080,
    0x0122 | 0x0008, 0x0122 | 0x0080, 0x0221 | 0x0080, 0x0221 | 0x0800,
    0x1233 | 0x0008, 0x1233 | 0x0080, 0x1332 | 0x0080, 0x1332 | 0x0800,
    0x2331 | 0x0080, 0x2331 | 0x0800, 0x3321 | 0x0800, 0x3321 | 0x8000,
]


def subblocks(window_ctrl: int, block_size: int):
    """[(offset, size, transient_flag)] for a window-ctrl word."""
    pat = DECIM_PATTERN[window_ctrl >> 4]
    out, off = [], 0
    while True:
        size = block_size >> (pat & 0x7)
        out.append((off, size, (pat >> 3) & 1))
        off += size
        pat >>= 4
        if not pat:
            return out


def first_overlap(window_ctrl: int, block_size: int) -> int:
    """Nominal overlap into a block's first subblock
    (reference ulcEncoder_BlockTransform.c:124-128)."""
    pat = DECIM_PATTERN[window_ctrl >> 4]
    ov = block_size >> (pat & 0x7)
    if pat & 0x8:
        ov >>= window_ctrl & 0x7
    return ov


def fast_log(x) -> np.ndarray:
    """Exact mirror of the reference FastLog (ulcHelper.h:128-136)."""
    x = np.asarray(x, np.float32)
    bx = x.view(np.uint32) if x.ndim else np.float32(x).reshape(1).view(np.uint32)
    ex = bx >> np.uint32(23)
    t = ex.astype(np.int32) - 127
    mx = (np.uint32(127 << 23) | (bx & np.uint32((1 << 23) - 1))).view(np.float32)
    c = [
        np.float32(-1.7417939), np.float32(2.8212026), np.float32(-1.4699568),
        np.float32(0.44717955), np.float32(-0.056570851),
    ]
    r = c[0] + (c[1] + (c[2] + (c[3] + c[4] * mx) * mx) * mx) * mx
    out = r + np.float32(0.6931471806) * t.astype(np.float32)
    return out if x.ndim else np.float32(out[0])


# ---------------------------------------------------------------------------
# Transforms (float64). Direct basis evaluation of the bitstream-defined
# IMDCT y[n] = -sum_k X[k] cos(pi/N (n+1/2+N/2)(k+1/2)) and its matching
# forward X[k] = -(2/N) sum_n z[n] cos(...) (reference FormatSpecs.md:148-155;
# encoder-side 2/SubBlockSize normalization, ulcEncoder_BlockTransform.c:243).


@lru_cache(maxsize=16)
def _basis(s: int):
    n = np.arange(2 * s, dtype=np.float64)[:, None]
    k = np.arange(s, dtype=np.float64)[None, :]
    arg = np.pi / s * (n + 0.5 + s / 2.0) * (k + 0.5)
    return np.cos(arg), np.sin(arg)


def sine_window(s: int, o_left: int, o_right: int) -> np.ndarray:
    """[2s] window: sine rise of width o_left centered at s/2, mirrored
    fall of width o_right centered at 3s/2 (FormatSpecs.md overlap =
    SubBlockSize*2^-Scale samples around the boundary)."""
    w = np.ones(2 * s, np.float64)

    def rise(o):
        r = np.ones(s, np.float64)
        start = s // 2 - o // 2
        j = np.arange(s)
        t = (j - start + 0.5) / max(o, 1)
        r = np.where(j < start, 0.0, np.where(j >= start + o, 1.0,
                                              np.sin(np.pi / 2 * np.clip(t, 0.0, 1.0))))
        return r

    w[:s] = rise(o_left)
    w[s:] = rise(o_right)[::-1]
    return w


def mdct_mdst(frame: np.ndarray, o_left: int, o_right: int):
    """[2s] float64 frame -> (mdct [s], mdst [s]) with 2/s normalization."""
    s = frame.shape[-1] // 2
    cb, sb = _basis(s)
    z = frame * sine_window(s, o_left, o_right)
    norm = 2.0 / s
    return -norm * (z @ cb), -norm * (z @ sb)


def imdct(x: np.ndarray) -> np.ndarray:
    """[s] coefficients -> [2s] unnormalized IMDCT output."""
    s = x.shape[-1]
    cb, _ = _basis(s)
    return -(cb @ np.asarray(x, np.float64))


# ---------------------------------------------------------------------------
# Window control (reference ulcEncoder_WindowControl.c). Filter
# recurrences in float64; control-flow decisions mirror the C exactly.

_LN2 = float.fromhex("0x1.62E430p-1")
MAX_DECIM = 8


class WindowState:
    def __init__(self):
        self.env_hp = 0.0
        self.env_bp = 0.0
        self.env_blk = 0.0
        self.buf = np.zeros((2 * MAX_DECIM, 2), np.float64)  # {Sum, SumW}


def _transient_filtering(samples: np.ndarray, st: WindowState, rate_hz: int):
    """samples: [C, 2N] (prev || new, M/S'd)."""
    c, n2 = samples.shape
    n = n2 // 2
    q = samples[:, n // 2 - 1 : n // 2 - 1 + n + 2]
    t0, t1, t2 = q[:, :-2], q[:, 1:-1], q[:, 2:]
    hp = np.sum((-t0 + 2 * t1 - t2) ** 2, axis=0)
    bp = np.sum((-t0 + t2) ** 2, axis=0)

    def ema(v, rate, init):
        # x[k] = x[k-1] + (v[k]-x[k-1])*(1-rate), sequential float64
        from scipy.signal import lfilter

        a = 1.0 - rate
        out, _ = lfilter([a], [1.0, -rate], v, zi=[rate * init])
        return out

    r_hp = math.exp(-float.fromhex("0x1.CC845Cp6") / rate_hz)
    r_bp = math.exp(-float.fromhex("0x1.596344p8") / rate_hz)
    env_hp = ema(np.sqrt(hp), r_hp, st.env_hp)
    env_bp = ema(np.sqrt(bp), r_bp, st.env_bp)
    st.env_hp, st.env_bp = env_hp[-1], env_bp[-1]

    rb_hp = math.exp(-float.fromhex("0x1.CC845Cp7") / rate_hz)
    rb_bp = math.exp(-float.fromhex("0x1.596344p8") / rate_hz)
    pre_hp = ema(env_hp[::-1], rb_hp, env_hp[-1])[::-1]
    pre_bp = ema(env_bp[::-1], rb_bp, env_bp[-1])[::-1]
    before_hp = np.concatenate([pre_hp[1:], [env_hp[-1]]])
    before_bp = np.concatenate([pre_bp[1:], [env_bp[-1]]])
    d_hp = env_hp - before_hp
    d_bp = env_bp - before_bp
    err = (d_hp * pre_bp) ** 2 + (d_bp * pre_hp) ** 2

    r_blk = math.exp(-float.fromhex("0x1.1AF110p-6") * n / rate_hz)
    em = ema(err, r_blk, st.env_blk)
    st.env_blk = em[-1]
    seg = np.sum(em.reshape(MAX_DECIM, n // MAX_DECIM), axis=-1)

    st.buf[:MAX_DECIM] = st.buf[MAX_DECIM:]
    st.buf[MAX_DECIM:, 0] = seg
    st.buf[MAX_DECIM:, 1] = float(n // MAX_DECIM)


def get_window_ctrl(samples: np.ndarray, st: WindowState, block_size: int,
                    rate_hz: int) -> int:
    """Mirror of ULCi_GetWindowCtrl (WindowControl.c:140-239)."""
    _transient_filtering(samples, st, rate_hz)
    buf = st.buf[MAX_DECIM:]
    full = st.buf

    log2_sub = int(math.log2(block_size // MAX_DECIM))
    decimation = 1
    trans_ratio = 0.0
    n_segments = MAX_DECIM
    seg_size = 1
    if log2_sub < 6:
        shift = 6 - log2_sub
        n_segments >>= shift
        seg_size <<= shift
        log2_sub = 6
    while True:
        log2_sub += 1
        max_seg, max_ratio = 0, -1000.0
        for s in range(n_segments):
            lsum = lw = rsum = rw = 0.0
            base = MAX_DECIM + s * seg_size
            for i in range(seg_size):
                lsum += full[base + i - seg_size, 0]
                lw += full[base + i - seg_size, 1]
                rsum += full[base + i, 0]
                rw += full[base + i, 1]
            l_np = math.log(lsum / lw) if lsum else -100.0
            r_np = math.log(rsum / rw) if rsum else -100.0
            ratio = abs(r_np - l_np)
            if ratio > max_ratio:
                max_seg, max_ratio = s, ratio
        if max_ratio - trans_ratio < _LN2:
            break
        decimation = n_segments + max_seg
        trans_ratio = max_ratio
        if n_segments > 1 and trans_ratio < _LN2:
            n_segments //= 2
            seg_size *= 2
        else:
            break

    if trans_ratio < _LN2 / 2:
        return 0x10
    ratio_l2 = trans_ratio * float.fromhex("0x1.715476p0")
    if ratio_l2 < 0.5:
        scale = 0
    elif ratio_l2 >= 6.5:
        scale = 7
    else:
        scale = int(np.rint(ratio_l2))  # lrintf: ties to even
    if log2_sub - scale < 6:
        scale = log2_sub - 6
    return scale + 0x8 * (decimation != 1) + 0x10 * decimation


# ---------------------------------------------------------------------------
# Psychoacoustics / noise spectra (reference ulcEncoder_Psyopt.c).


def _freq_to_line(f, nyq, n):
    return np.float32(f) * np.float32(n) / np.float32(nyq) - np.float32(0.5)


def _line_to_freq(line, nyq, n):
    return (np.float32(line) + np.float32(0.5)) * np.float32(nyq) / np.float32(n)


def _bark_to_freq(b):
    return np.float32(600.0) * np.float32(math.sinh(np.float32(b) / 6.0))


def _freq_to_bark(f):
    return np.float32(6.0) * np.float32(math.asinh(np.float32(f) / 600.0))


def masking_np(amp2: np.ndarray, rate_hz: int) -> np.ndarray:
    """ULCi_CalculatePsychoacoustics for one subblock's [m] line
    energies (already summed over channels); returns [m] nepers."""
    m = amp2.shape[0]
    nyq = rate_hz * 0.5
    log_amp = fast_log(np.float32(2.0**-126) + amp2.astype(np.float32))
    bark = np.zeros(N_BARK, np.float64)
    unmask = 0.0
    lo = hi = 0
    s_flo = s_flo2 = 0.0
    sums = np.zeros(6, np.float64)  # floor/peak/peakw at lo and hi cursors
    for band in range(N_BARK):
        fb = _bark_to_freq(band - 0.75)
        fe = _bark_to_freq(band + 0.25)
        lb = int(math.floor(_freq_to_line(fb, nyq, m)))
        le = int(math.ceil(_freq_to_line(fe, nyq, m)))
        lb = min(max(lb, 0), m - 1)
        le = min(max(le, 0), m)
        while lo < lb:
            v, vl = float(amp2[lo]), float(log_amp[lo])
            sums[0] += vl; sums[1] += vl * v; sums[2] += v
            lo += 1
        while hi < le:
            v, vl = float(amp2[hi]), float(log_amp[hi])
            sums[3] += vl; sums[4] += vl * v; sums[5] += v
            hi += 1
        floor = sums[3] - sums[0]
        peak = sums[4] - sums[1]
        peakw = sums[5] - sums[2]
        if peakw > 0.0:
            unmask = float(
                np.float32(peak / peakw - floor / (le - lb) - math.log(peakw))
            )
        bark[band] = unmask
    out = np.zeros(m, np.float64)
    for line in range(m):
        bb = _freq_to_bark(_line_to_freq(line, nyq, m))
        bi = int(bb)
        frac = np.float32(bb) - np.float32(bi)
        bl = bark[bi] if bi < N_BARK else bark[N_BARK - 1]
        br = bark[bi + 1] if bi + 1 < N_BARK else bl
        out[line] = np.float32(bl * (1.0 - frac) + br * frac)
    return out


def noise_log_spectrum(energy: np.ndarray, rate_hz: int) -> np.ndarray:
    """ULCi_CalculateNoiseLogSpectrum for one channel-subblock's [m]
    line energies; returns [2m] interleaved {w, w*(level+ln2)}."""
    m = energy.shape[0]
    nyq = rate_hz * 0.5
    log_e = fast_log(np.float32(2.0**-126) + energy.astype(np.float32))
    bark = np.zeros(N_BARK, np.float64)
    level = -100.0
    lo = hi = 0
    sums = np.zeros(6, np.float64)
    for band in range(N_BARK):
        fb = _bark_to_freq(float(band))
        fe = _bark_to_freq(band + 2.0)
        lb = int(math.floor(_freq_to_line(fb, nyq, m)))
        le = int(math.ceil(_freq_to_line(fe, nyq, m)))
        lb = min(max(lb, 0), m - 1)
        le = min(max(le, 0), m)
        while lo < lb:
            v, vl = float(energy[lo]), float(log_e[lo])
            sums[0] += vl; sums[1] += vl * v; sums[2] += v
            lo += 1
        while hi < le:
            v, vl = float(energy[hi]), float(log_e[hi])
            sums[3] += vl; sums[4] += vl * v; sums[5] += v
            hi += 1
        floor = sums[3] - sums[0]
        peak = sums[4] - sums[1]
        peakw = sums[5] - sums[2]
        if peakw > 0.0:
            ls = 1.0 / (le - lb)
            level = 0.5 * float(
                np.float32(math.log(peakw * ls) + floor * ls - peak / peakw)
            )
        bark[band] = level
    out = np.zeros(2 * m, np.float64)
    for line in range(m):
        bb = _freq_to_bark(_line_to_freq(line, nyq, m))
        bi = int(bb)
        frac = np.float32(bb) - np.float32(bi)
        bl = bark[bi] if bi < N_BARK else bark[N_BARK - 1]
        br = bark[bi + 1] if bi + 1 < N_BARK else bl
        noise = np.float32(bl * (1.0 - frac) + br * frac)
        w = np.float32(math.exp(0.5 * noise))
        out[2 * line] = w
        out[2 * line + 1] = w * (noise + np.float32(_LN2))
    return out


# ---------------------------------------------------------------------------
# Heapsort ranks (reference ulcEncoder_BlockTransform.c:20-77): rank 0 =
# most important; exact C tie order.


def heapsort_ranks(values: np.ndarray) -> np.ndarray:
    n = values.shape[0]
    order = list(range(n))
    v = values

    def sift_down(root, nn):
        child = 2 * root + 1
        if child >= nn:
            return
        while True:
            root_idx = order[root]
            child_idx = order[child]
            nxt = child + 1
            if nxt < nn and v[order[nxt]] < v[child_idx]:
                child = nxt
                child_idx = order[child]
            if v[child_idx] > v[root_idx]:
                return
            order[root] = child_idx
            order[child] = root_idx
            root = child
            child = 2 * root + 1
            if child >= nn:
                return

    ranks = np.zeros(n, np.int32)
    for i in range(n // 2 - 1, -1, -1):
        sift_down(i, n)
    for i in range(n - 1, 0, -1):
        ranks[order[0]] = i
        order[0] = order[i]
        sift_down(0, i)
    ranks[order[0]] = 0
    return ranks


# ---------------------------------------------------------------------------
# C-exact encode pass (reference ulcEncoder_Encode.c) — unlike
# tests/pyref.py this emits quantizer tokens even for zones whose
# coefficients all collapse, exactly like WriteSubBlock.


def _write_quant(ny, qi, lead):
    s = qi - 5
    if lead:
        ny.append(0xF)
    if s < 0xE:
        ny.append(s)
    else:
        ny.append(0xE)
        ny.append(s - 0xE)


def _write_zone(ny, cur, end, qi, coef, noise, rank, n_out, next_coded):
    quant = np.float32(1 << qi)
    while True:
        while cur < end and rank[cur] >= n_out:
            cur += 1
        if cur >= end:
            break
        if abs(np.float32(coef[cur]) * quant) < 2.5:
            cur += 1
            continue
        z_r = cur - next_coded
        while z_r:
            if z_r <= 2:
                qn1 = cq_coef(np.float32(coef[next_coded]) * quant, 7)
                qn2 = (
                    cq_coef(np.float32(coef[next_coded + 1]) * quant, 7)
                    if z_r >= 2 else 0
                )
                if abs(qn1) > 1 and (z_r < 2 or abs(qn2) > 1):
                    ny.append(qn1 & 0xF)
                    if z_r >= 2:
                        ny.append(qn2 & 0xF)
                    next_coded += z_r
                    break
            nq = 0
            if z_r >= 16:
                v = min(z_r - 16, 0x1FF)
                n = v + 16
                nq = get_noise_q(noise, next_coded, n, quant)
            if nq:
                ny += [0x8, (v >> 5) & 0xF, (v >> 1) & 0xF,
                       ((v & 1) | ((nq - 1) << 1)) & 0xF]
            elif z_r < 33:
                v = min(z_r - 1, 0xF)
                n = v + 1
                ny += [0x0, v]
            else:
                v = min(z_r - 33, 0xFF)
                n = v + 33
                ny += [0x1, (v >> 4) & 0xF, v & 0xF]
            next_coded += n
            z_r -= n
        qn = cq_coef(np.float32(coef[cur]) * quant, 7)
        ny.append(qn & 0xF)
        next_coded += 1
        cur += 1
    return next_coded


def _write_subblock(ny, coef, noise, rank, n_out, start, end):
    idx = start
    next_coded = start
    prev_quant = -1
    quant_start = -1
    qmin, qmax = np.float32(1000.0), np.float32(-1000.0)
    while True:
        while idx < end and rank[idx] >= n_out:
            idx += 1
        newmin = np.float32(0.0)
        newmax = qmax
        cur = np.float32(0.0)
        if idx < end:
            cur = np.float32(abs(coef[idx]))
            newmin = min(cur, qmin)
            newmax = max(cur, qmax)
            if quant_start == -1:
                quant_start = idx
        if newmax > newmin * np.float32(4.0):
            qi = build_quantizer(qmax)
            if qi != prev_quant:
                _write_quant(ny, qi, prev_quant != -1)
                prev_quant = qi
            next_coded = _write_zone(
                ny, quant_start, idx, qi, coef, noise, rank, n_out, next_coded
            )
            quant_start = idx
            qmin = qmax = cur
        else:
            qmin, qmax = newmin, newmax
        idx += 1
        if idx > end:
            break

    n = end - next_coded
    if n > 4:
        if prev_quant != -1:
            ny.append(0xF)
        nq = nd = 0
        if prev_quant != -1 and n >= 16:
            nq, nd = get_hf_ext_params(
                noise, next_coded, n, np.float32(1 << prev_quant)
            )
        if nq:
            ny += [0xF, (nq - 1) & 0xF, (nd >> 4) & 0xF, nd & 0xF]
        else:
            ny += [0xE, 0xF]
    elif n > 0:
        ny += [0x0, n - 1]


def encode_pass(coef, noise, rank, n_out, wc, block_size, n_chan):
    """C-exact ULCi_EncodePass. Returns (size_bits, bytes)."""
    ny = [wc & 0xF]
    if wc & 0x8:
        ny.append((wc >> 4) & 0xF)
    for c in range(n_chan):
        base = c * block_size
        for off, ss, _fl in subblocks(wc, block_size):
            _write_subblock(ny, coef, noise, rank, n_out, base + off,
                            base + off + ss)
    size = (4 * len(ny) + 7) & ~7
    by = bytearray(size // 8)
    for i, x in enumerate(ny):
        by[i // 2] |= (x & 0xF) << (4 * (i % 2))
    return size, bytes(by)


# ---------------------------------------------------------------------------
# Encoder driver.

COEF_EPS = float.fromhex("0x1.0p-31")


class OracleEncoder:
    """Sequential block encoder (reference ULC_EncoderState_t semantics)."""

    def __init__(self, rate_hz: int, n_chan: int, block_size: int):
        self.rate_hz = rate_hz
        self.n_chan = n_chan
        self.n = block_size
        self.sample_prev = np.zeros((n_chan, block_size), np.float64)
        self.wstate = WindowState()
        self.next_wc = 0x10
        self.prev_ov = block_size  # last boundary overlap into this block
        self.prev_last_ss = block_size
        self.block_complexity = 0.0

    def _analyze(self, block: np.ndarray):
        n, c = self.n, self.n_chan
        new = np.asarray(block, np.float64).copy()
        for ch in range(1, c, 2):
            a = new[ch - 1].copy()
            b = new[ch].copy()
            new[ch - 1] = (a + b) * 0.5
            new[ch] = (a - b) * 0.5
        samples = np.concatenate([self.sample_prev, new], axis=-1)

        wc = self.next_wc
        self.next_wc = get_window_ctrl(samples, self.wstate, n, self.rate_hz)
        next_ov = first_overlap(self.next_wc, n)

        subs = subblocks(wc, n)
        coef = np.zeros(c * n, np.float32)
        noise = np.zeros(c * n, np.float64)
        index = np.zeros(c * n, np.float32)
        amp2 = np.zeros(n // 2, np.float64)
        cx_sum = 0.0
        cx_w = 0.0
        n_nz = 0
        for ch in range(c):
            o_left = self.prev_ov if ch == 0 else o_left_0
            if ch == 0:
                o_left_0 = o_left
            o_l = self.prev_ov
            for si, (off, ss, _fl) in enumerate(subs):
                if si + 1 < len(subs):
                    _noff, nss, nfl = subs[si + 1]
                    o_r = nss >> ((wc & 0x7) if nfl else 0)
                else:
                    o_r = next_ov
                o_r = min(o_r, ss)
                frame = samples[ch, n // 2 + off - ss // 2 : n // 2 + off + 3 * ss // 2]
                re, im = mdct_mdst(frame, o_l, o_r)
                re32 = re.astype(np.float32)
                coef[ch * n + off : ch * n + off + ss] = re32
                abs2 = re * re + im * im
                lines = abs2[0::2] + abs2[1::2]
                amp2[off // 2 : off // 2 + ss // 2] += lines
                noise[ch * n + off : ch * n + off + ss] = noise_log_spectrum(
                    lines, self.rate_hz
                )
                re2 = re32 * re32
                lg = fast_log(re2)
                iv = np.where(
                    np.abs(re32) < np.float32(0.5 * COEF_EPS),
                    np.float32(-np.inf), lg,
                )
                index[ch * n + off : ch * n + off + ss] = iv
                n_nz += int(np.sum(np.abs(re32) >= np.float32(0.5 * COEF_EPS)))
                cx_sum += float(np.sum(re2.astype(np.float64)))
                cx_w += float(np.sum(np.abs(re32).astype(np.float64)))
                o_l = o_r

        cx = 0.0
        if cx_sum:
            scale = _LN2 * int(math.log2(n))
            cx = math.log(cx_w * cx_w / cx_sum) / scale
            cx = min(max(cx, 0.0), 1.0)
        self.block_complexity = cx

        masking = np.zeros(n // 2, np.float64)
        for off, ss, _fl in subs:
            masking[off // 2 : off // 2 + ss // 2] = masking_np(
                amp2[off // 2 : off // 2 + ss // 2], self.rate_hz
            )
        for ch in range(c):
            pen = np.float32(-float.fromhex("0x1.62E430p0")) * (ch & 1)
            seg = index[ch * n : (ch + 1) * n]
            index[ch * n : (ch + 1) * n] = (
                2.0 * seg + masking.astype(np.float32)[np.arange(n) // 2] + pen
            )

        rank = heapsort_ranks(index)

        self.sample_prev = new
        # boundary into the next block = next_ov clamped by this block's
        # last subblock (ulcEncoder_BlockTransform.c:171)
        last_ss = subs[-1][1]
        self.prev_ov = min(next_ov, last_ss)
        self.prev_last_ss = last_ss
        return coef, noise.astype(np.float32), rank, wc, n_nz

    def encode_block_cbr(self, block, rate_kbps: float):
        coef, noise, rank, wc, n_nz = self._analyze(block)
        budget = int((self.n * np.float32(rate_kbps)) * np.float32(1000.0) / self.rate_hz)
        return self._cbr_core(coef, noise, rank, wc, n_nz, budget)

    def encode_block_abr(self, block, rate_kbps: float, avg_complexity: float):
        coef, noise, rank, wc, n_nz = self._analyze(block)
        target = np.float32(rate_kbps) * np.float32(self.block_complexity) / np.float32(avg_complexity)
        budget = int((self.n * target) * np.float32(1000.0) / self.rate_hz)
        return self._cbr_core(coef, noise, rank, wc, n_nz, budget)

    def encode_block_vbr(self, block, quality: float):
        coef, noise, rank, wc, n_nz = self._analyze(block)
        target_cx = np.float32(float.fromhex("0x1.E4EFB7p3")) * np.float32(
            math.log(100.0 / quality)
        )
        n_target = n_nz
        if target_cx > 0.0:
            f = (self.n_chan * self.n) * np.float32(self.block_complexity) / target_cx
            if f < n_nz:
                n_target = int(f)
        return encode_pass(coef, noise, rank, n_target, wc, self.n, self.n_chan)

    def _cbr_core(self, coef, noise, rank, wc, max_coef, budget):
        """Reference bisection (ulcEncoder.c:98-115)."""
        ep = lambda n_out: encode_pass(
            coef, noise, rank, n_out, wc, self.n, self.n_chan
        )
        n_out = -1
        size, data = ep(0)
        lo, hi = 0, max_coef
        if lo < hi:
            while True:
                n_out = (lo + hi) // 2
                size, data = ep(n_out)
                if size < budget:
                    lo = n_out
                elif size > budget:
                    hi = n_out - 1
                else:
                    lo = n_out
                    break
                if not (lo < hi - 1):
                    break
        if lo != n_out:
            size, data = ep(lo)
        return size, data


# ---------------------------------------------------------------------------
# Decoder driver: pyref syntax + float64 lapped synthesis (overlap-add
# over the whole stream; reference ulcDecoder.c:198-302 semantics).


def decode_stream(data: bytes, n_blocks: int, block_size: int, n_chan: int):
    """Returns pcm [n_blocks, n_chan, block_size] float64 (M/S undone,
    deinterleaved layout), or raises on corrupt stream."""
    n = block_size
    rng = Xorshift()
    blocks = []
    pos = 0
    for _ in range(n_blocks):
        res = decode_block(data[pos:], None, n, n_chan, rng)
        if res is None:
            raise ValueError("corrupt stream")
        coefs, wc, bits = res
        blocks.append((coefs, wc))
        pos += (bits + 7) // 8

    total = (n_blocks + 1) * n
    out = np.zeros((n_chan, total + n), np.float64)
    last_ss = 0
    # per-subblock synthesis windows need the next subblock's overlap;
    # walk all (block, subblock) pairs flat per channel
    flat = []  # (t, off, ss, o_nominal)
    for t, (_c, wc) in enumerate(blocks):
        for off, ss, fl in subblocks(wc, n):
            o_nom = ss >> ((wc & 0x7) if fl else 0)
            flat.append((t, off, ss, o_nom))
    for ch in range(n_chan):
        last_ss = 0
        for k, (t, off, ss, o_nom) in enumerate(flat):
            o_l = min(o_nom, last_ss) if last_ss else 0
            last_ss = ss
            if k + 1 < len(flat):
                _tn, _offn, ssn, o_nomn = flat[k + 1]
                o_r = min(o_nomn, ss)
            else:
                o_r = ss
            x = blocks[t][0][ch, off : off + ss]
            y = imdct(x) * sine_window(ss, o_l, o_r)
            start = t * n + n // 2 + off - ss // 2
            out[ch, start : start + 2 * ss] += y

    pcm = out[:, : n_blocks * n].reshape(n_chan, n_blocks, n).transpose(1, 0, 2).copy()
    for chb in range(1, n_chan, 2):
        a = pcm[:, chb - 1].copy()
        b = pcm[:, chb].copy()
        pcm[:, chb - 1] = a + b
        pcm[:, chb] = a - b
    return pcm
