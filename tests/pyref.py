"""Sequential NumPy mirror of the bitstream semantics, used as a test
oracle for the vectorized JAX passes.

Implements the encode-pass walk of reference ulcEncoder_Encode.c and
the decoder syntax of reference ulcDecoder.c / FormatSpecs.md:57-141,
including ulcx's one documented deviation (quantizer zones with no
surviving coefficients emit no quantizer token).
"""

from __future__ import annotations

import math

import numpy as np

from ulcx.ops.patterns import pattern_subblock_offsets, pattern_subblock_sizes

_BQ_A = float.fromhex("0x1.657006p2")
_INV_LN2 = float.fromhex("0x1.715476p0")


def cq_unsigned(v: float) -> int:
    v = np.float32(v)
    if v >= 0.5:
        return int(np.float32(0.5) + np.float32(math.sqrt(np.float32(v - np.float32(0.25)))))
    return 0


def cq_coef(v: float, limit: int) -> int:
    q = min(cq_unsigned(abs(v)), limit)
    return -q if v < 0 else q


def build_quantizer(maxval: float) -> int:
    maxval = max(np.float32(maxval), np.float32(1e-38))
    q = int(np.float32(_BQ_A) + np.float32(-_INV_LN2) * np.float32(np.log(np.float32(maxval))))
    return min(max(q, 5), 31)


def get_noise_q(noise, band, n, q):
    data = noise[band // 2 * 2 :]
    nn = (n + (band & 1) + 1) // 2
    s = sw = np.float64(0.0)
    for i in range(nn):
        s += np.float32(data[2 * i + 1])
        sw += np.float32(data[2 * i])
    s, sw = np.float32(s), np.float32(sw)
    if s == 0.0:
        return 0
    amp = np.float32(np.exp(np.float32(s / sw)))
    return min(cq_unsigned(np.float32(amp * q)), 8)


def get_hf_ext_params(noise, band, n, q):
    data = noise[band // 2 * 2 :]
    nn = (n + (band & 1) + 1) // 2
    sx = sx2 = sxy = sy = sw = np.float32(0.0)
    for i in range(nn):
        x = np.float32(i * 2.0)
        w = np.float32(data[2 * i])
        wy = np.float32(data[2 * i + 1])
        sx += w * x
        sx2 += w * x * x
        sxy += x * wy
        sy += wy
        sw += w
    det = sw * sx2 - sx * sx
    if det == 0.0:
        return 0, 0
    amp = np.float32((sx2 * sy - sx * sxy) / det)
    dec = np.float32((sw * sxy - sx * sy) / det)
    amp = np.float32(np.exp(amp))
    dec = np.float32(np.exp(dec)) if dec < 0.0 else np.float32(1.0)
    nq = min(cq_unsigned(np.float32(amp * q * 4.0)), 16)
    nd = cq_unsigned(np.float32((dec - 1.0) * np.float32(-(2.0**19))))
    if nd == 0:
        return 0, 0
    return nq, min(nd, 255)


def encode_pass(coef, noise, rank, n_out, wc, block_size, n_chan, noise_window="gap"):
    """Returns (size_bits, bytes). Mirrors ULCi_EncodePass + deviations.

    noise_window: "gap" = C-exact noise analysis window; "segment" =
    ulcx's candidate-independent window (CodecConfig.noise_run_window).
    """
    ny = [wc & 0xF]
    if wc & 0x8:
        ny.append((wc >> 4) & 0xF)

    offs = pattern_subblock_offsets(wc >> 4 or 1, block_size)
    szs = pattern_subblock_sizes(wc >> 4 or 1, block_size)

    for c in range(n_chan):
        base = c * block_size
        for off, ss in zip(offs, szs):
            _encode_segment(
                ny, coef, noise, rank, n_out, base + off, base + off + ss,
                noise_window,
            )

    size = 4 * len(ny)
    size_pad = (size + 7) & ~7
    by = bytearray((len(ny) + 1) // 2)
    for i, x in enumerate(ny):
        by[i // 2] |= (x & 0xF) << (4 * (i % 2))
    return size_pad, bytes(by)


def _write_quant(ny, qi, lead):
    s = qi - 5
    if lead:
        ny.append(0xF)
    if s < 0xE:
        ny.append(s)
    else:
        ny.append(0xE)
        ny.append(s - 0xE)


def _write_zone(ny, cur, end, qi, coef, noise, rank, n_out, next_coded, seg_end, noise_window):
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
                    if z_r >= 2
                    else 0
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
                win = n if noise_window == "gap" else min(seg_end - next_coded, 527)
                nq = get_noise_q(noise, next_coded, win, quant)
            if nq:
                ny += [0x8, (v >> 5) & 0xF, (v >> 1) & 0xF, ((v & 1) | ((nq - 1) << 1)) & 0xF]
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


def _zone_has_coded(coef, rank, n_out, beg, end, qi):
    quant = np.float32(1 << qi)
    for i in range(beg, end):
        if rank[i] < n_out and abs(np.float32(coef[i]) * quant) >= 2.5:
            return True
    return False


def _encode_segment(ny, coef, noise, rank, n_out, start, end, noise_window="gap"):
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
            # deviation: skip zones with no surviving coefficients
            if _zone_has_coded(coef, rank, n_out, quant_start, idx, qi):
                if qi != prev_quant:
                    _write_quant(ny, qi, prev_quant != -1)
                    prev_quant = qi
                next_coded = _write_zone(
                    ny, quant_start, idx, qi, coef, noise, rank, n_out,
                    next_coded, end, noise_window,
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
            nq, nd = get_hf_ext_params(noise, next_coded, n, np.float32(1 << prev_quant))
        if nq:
            ny += [0xF, (nq - 1) & 0xF, (nd >> 4) & 0xF, nd & 0xF]
        else:
            ny += [0xE, 0xF]
    elif n > 0:
        ny += [0x0, n - 1]


# ---------------------------------------------------------------------------
# Decoder mirror (reference ulcDecoder.c:99-197 + FormatSpecs syntax).


class Xorshift:
    def __init__(self, seed=1234567):
        self.s = np.uint32(seed)

    def next(self):
        s = np.uint32(self.s)
        s ^= np.uint32(s << np.uint32(13))
        s ^= np.uint32(s >> np.uint32(17))
        s ^= np.uint32(s << np.uint32(5))
        self.s = s
        return int(s)


class NybbleReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self) -> int:
        byte = self.data[self.pos // 2]
        x = (byte >> 4) if self.pos % 2 else (byte & 0xF)
        self.pos += 1
        return x

    @property
    def bits(self):
        return 4 * self.pos


def decode_block(data, wc_expected, block_size, n_chan, rng: Xorshift):
    """Returns (coefs [C, N], window_ctrl, bits consumed) or None if corrupt."""
    rd = NybbleReader(data)
    wc = rd.read()
    if wc & 0x8:
        wc |= rd.read() << 4
    else:
        wc |= 1 << 4

    offs = pattern_subblock_offsets(wc >> 4, block_size)
    szs = pattern_subblock_sizes(wc >> 4, block_size)
    out = np.zeros((n_chan, block_size), np.float32)
    for c in range(n_chan):
        for off, ss in zip(offs, szs):
            ok = _decode_segment(rd, out[c], off, ss, rng)
            if not ok:
                return None
    return out, wc, rd.bits  # unpadded, like ULC_DecodeBlock


def _read_quantizer(rd):
    qi = rd.read()
    if qi == 0xF:
        return "stop_noise"
    if qi == 0xE:
        qi += rd.read()
    if qi == 0xE + 0xF:
        return "stop"
    return qi


def _decode_segment(rd, dst, off, n, rng):
    pos = off
    remaining = n
    v = _read_quantizer(rd)
    if v == "stop":
        return True
    if v == "stop_noise":
        return False  # meaningless at segment start
    quant = np.float32(2.0 ** -(5 + v))
    while True:
        x = rd.read()
        if x not in (0x0, 0x1, 0x8, 0xF):
            s = x - 16 if x & 0x8 else x
            val = np.float32(-(s * s)) if s < 0 else np.float32(s * s)
            dst[pos] = val * quant
            pos += 1
            remaining -= 1
            if remaining == 0:
                return True
            continue
        if x == 0x0:
            cnt = rd.read() + 1
            if cnt > remaining:
                return False
            pos += cnt
            remaining -= cnt
            if remaining == 0:
                return True
            continue
        if x == 0x1:
            cnt = rd.read()
            cnt = rd.read() | (cnt << 4)
            cnt += 33
            if cnt > remaining:
                return False
            pos += cnt
            remaining -= cnt
            if remaining == 0:
                return True
            continue
        if x == 0x8:
            cnt = rd.read()
            cnt = rd.read() | (cnt << 4)
            xx = rd.read()
            cnt = (xx & 1) | (cnt << 1)
            lvl = (xx >> 1) + 1
            cnt += 16
            if cnt > remaining:
                return False
            p = np.float32(lvl * lvl) * quant * np.float32(0.25)
            for _ in range(cnt):
                if rng.next() & 0x80000000:
                    p = -p
                dst[pos] = p
                pos += 1
            remaining -= cnt
            if remaining == 0:
                return True
            continue
        # 0xF: quantizer change / stops
        v = _read_quantizer(rd)
        if v == "stop":
            return True
        if v == "stop_noise":
            lvl = rd.read() + 1
            cnt = rd.read()
            cnt = rd.read() | (cnt << 4)
            p = np.float32(lvl * lvl) * quant * np.float32(1.0 / 16)
            r = np.float32(1.0) + np.float32(cnt * cnt) * np.float32(-(2.0**-19))
            for _ in range(remaining):
                if rng.next() & 0x80000000:
                    p = -p
                dst[pos] = p
                pos += 1
                p = np.float32(p * r)
            return True
        quant = np.float32(2.0 ** -(5 + v))
