"""Synthesized *realistic* test material (no network, deterministic).

The reference codec was validated by listening tests on real music
(/root/reference/README.md:58); the repo's earlier quality evidence was
tone stacks + noise + injected onsets. This module synthesizes material
with the statistics that actually stress a transform codec:

- speech  — glottal pulse train (F0 ~120 Hz with vibrato and jitter)
            through time-varying formant resonators (F1/F2 vowel
            sweeps), syllable-rate amplitude gating, interleaved
            unvoiced fricative bursts (shaped noise). Exercises pitch
            harmonics + formant masking + voiced/unvoiced transients.
- percussion — kick (exponential 150->55 Hz sine sweep), snare (body
            tone + bandpassed noise burst), closed hats (short HF
            noise), on a 126 BPM sixteenth grid with velocity
            variation. Dense sharp attacks: the window-switching and
            transient-detector path.
- poly    — detuned-saw chord pad (slow attacks) + plucked melody
            (Karplus-Strong-style damped feedback) + soft bass line.
            Polyphonic spectra with both tonal density and decaying
            note tails: the noise-fill / HF-extension path.

Every generator returns float32 in [-1, 1], shaped [T, C, N] blocks,
channel 1 a decorrelated variant (delay + level tilt) so M/S coding
sees realistic side energy.
"""

from __future__ import annotations

import numpy as np


def _resonator_blocked(x, freq, bw, rate, hop=64):
    """Resonator with frequency held per hop (vectorized inner loop via
    scipy-free lfilter equivalent): the pure-python per-sample loop is
    too slow for test material; piecewise-constant formants are fine."""
    y = np.zeros_like(x)
    y1 = y2 = 0.0
    r = np.exp(-np.pi * bw / rate)
    a2 = r * r
    for s in range(0, len(x), hop):
        e = min(s + hop, len(x))
        a1 = -2 * r * np.cos(2 * np.pi * freq[s] / rate)
        for i in range(s, e):
            v = x[i] - a1 * y1 - a2 * y2
            y2 = y1
            y1 = v
            y[i] = v
    return y


def speech_like(total: int, rate: float = 44100.0, seed: int = 101):
    rng = np.random.default_rng(seed)
    t = np.arange(total) / rate
    # glottal source: impulse train at F0 with vibrato + jitter
    f0 = 118.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.1 * t)) * (
        1 + 0.25 * np.sin(2 * np.pi * 0.37 * t)
    )
    phase = np.cumsum(f0) / rate
    src = np.zeros(total)
    marks = np.diff(np.floor(phase), prepend=0.0) > 0
    src[marks] = 1.0
    # soften pulses (glottal roll-off) + jitter amplitude
    k = np.exp(-np.arange(48) / 9.0)
    src = np.convolve(src, k, mode="same") * (
        1 + 0.12 * rng.standard_normal(total)
    )
    # vowel formant sweeps (a-e-i-o-u loop, ~2.5 vowels/s)
    vow = np.array([[800, 1200], [530, 1850], [300, 2300],
                    [500, 900], [320, 800]], float)
    idx = (t * 2.5).astype(int) % len(vow)
    frac = (t * 2.5) % 1.0
    nxt = (idx + 1) % len(vow)
    f1 = vow[idx, 0] * (1 - frac) + vow[nxt, 0] * frac
    f2 = vow[idx, 1] * (1 - frac) + vow[nxt, 1] * frac
    voiced = (
        _resonator_blocked(src, f1, 90.0, rate)
        + 0.7 * _resonator_blocked(src, f2, 120.0, rate)
    )
    # unvoiced fricatives: HF-shaped noise bursts between "syllables"
    syl = 0.5 * (1 + np.sin(2 * np.pi * 3.8 * t - np.pi / 2))
    nz = rng.standard_normal(total)
    nz = np.diff(nz, prepend=0.0)  # +6 dB/oct tilt
    unvoiced = nz * np.clip(0.35 - syl, 0, None) * 2.2
    sig = voiced * syl ** 1.5 + unvoiced
    return sig / (np.abs(sig).max() + 1e-9) * 0.8


def percussion(total: int, rate: float = 44100.0, seed: int = 202):
    rng = np.random.default_rng(seed)
    sig = np.zeros(total)
    step = int(rate * 60 / 126 / 4)  # sixteenths at 126 BPM

    def kick(at):
        n = min(int(0.12 * rate), total - at)
        tt = np.arange(n) / rate
        f = 55 + 95 * np.exp(-tt / 0.02)
        sig[at : at + n] += 0.9 * np.sin(
            2 * np.pi * np.cumsum(f) / rate
        ) * np.exp(-tt / 0.05)

    def snare(at, vel):
        n = min(int(0.09 * rate), total - at)
        tt = np.arange(n) / rate
        body = 0.4 * np.sin(2 * np.pi * 196 * tt) * np.exp(-tt / 0.03)
        nz = rng.standard_normal(n)
        nz = nz - np.convolve(nz, np.ones(9) / 9, mode="same")  # HP
        sig[at : at + n] += vel * (body + 0.8 * nz * np.exp(-tt / 0.04))

    def hat(at, vel):
        n = min(int(0.025 * rate), total - at)
        nz = rng.standard_normal(n)
        nz = np.diff(nz, prepend=0.0)
        sig[at : at + n] += 0.3 * vel * nz * np.exp(-np.arange(n) / (0.004 * rate))

    i = 0
    while i * step < total - 1:
        at = i * step
        if i % 8 == 0 or (i % 16 == 14):
            kick(at)
        if i % 8 == 4:
            snare(at, 0.8 + 0.2 * rng.random())
        hat(at, 0.5 + 0.5 * rng.random())
        i += 1
    return sig / (np.abs(sig).max() + 1e-9) * 0.85


def polyphonic(total: int, rate: float = 44100.0, seed: int = 303):
    rng = np.random.default_rng(seed)
    t = np.arange(total) / rate
    sig = np.zeros(total)
    # chord pad: detuned saw partials, slow attack, chord change each 1.6 s
    chords = [[0, 4, 7, 11], [5, 9, 12, 16], [7, 11, 14, 17], [2, 5, 9, 12]]
    seg = int(1.6 * rate)
    for ci in range(max(1, total // seg + 1)):
        s, e = ci * seg, min((ci + 1) * seg, total)
        if s >= total:
            break
        tt = t[s:e] - t[s]
        env = np.minimum(tt / 0.4, 1.0) * np.exp(-tt / 2.8)
        for semi in chords[ci % len(chords)]:
            f = 220.0 * 2 ** (semi / 12)
            for h in range(1, 9):
                det = 1 + 0.0007 * rng.standard_normal()
                sig[s:e] += (
                    (0.12 / h) * env
                    * np.sin(2 * np.pi * f * h * det * tt
                             + 2 * np.pi * rng.random())
                )
    # plucked melody: damped noise-burst resonation (KS-flavored)
    scale = [0, 2, 4, 7, 9, 12, 14, 16]
    note_len = int(0.4 * rate)
    for ni in range(total // note_len):
        f = 440.0 * 2 ** (scale[int(rng.integers(len(scale)))] / 12)
        period = max(2, int(rate / f))
        n = min(note_len * 2, total - ni * note_len)
        buf = rng.standard_normal(period) * 0.5
        out = np.zeros(n)
        for i in range(n):
            out[i] = buf[i % period]
            buf[i % period] = 0.5 * (buf[i % period] + buf[(i + 1) % period]) * 0.996
        sig[ni * note_len : ni * note_len + n] += 0.5 * out * np.exp(
            -np.arange(n) / (0.35 * rate)
        )
    # soft bass
    sig += 0.25 * np.sin(2 * np.pi * 55 * t) * (
        0.5 + 0.5 * np.sin(2 * np.pi * 0.31 * t)
    )
    return sig / (np.abs(sig).max() + 1e-9) * 0.8


GENERATORS = {
    "speech": speech_like,
    "percussion": percussion,
    "poly": polyphonic,
}
_KIND_SEED = {"speech": 11, "percussion": 23, "poly": 37}


def blocks_of(kind: str, n: int, t: int, c: int, rate: float = 44100.0,
              seed_offset: int = 0):
    """[T, C, N] float32 blocks of the named material; channel k gets a
    small delay + level tilt (decorrelated stereo -> real M/S side
    energy)."""
    gen = GENERATORS[kind]
    total = t * n
    delay = 24
    base = gen(total + delay * max(c - 1, 0) + delay, rate,
               seed=100 + seed_offset + _KIND_SEED[kind])
    chans = []
    for k in range(c):
        off = delay * k
        g = 1.0 - 0.18 * k / max(c - 1, 1) if c > 1 else 1.0
        chans.append(g * base[off : off + total])
    x = np.stack(chans).reshape(c, t, n).transpose(1, 0, 2)
    return np.clip(x, -1, 1).astype(np.float32)
