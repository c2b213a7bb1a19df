"""CLI tool round trip: WAV -> .ulc -> WAV, plus WAV I/O conversions."""

import os

import numpy as np
import pytest

from ulcx.container import UlcHeader
from ulcx.io.wavio import WavReader, WavWriter, float_to_raw, raw_to_float
from ulcx.tools.decode_tool import main as decode_main
from ulcx.tools.encode_tool import main as encode_main


def test_pcm_conversions(rng):
    x = np.clip(rng.standard_normal(1000).astype(np.float32) * 0.3, -1, 1)
    for bits, tag in ((8, 1), (16, 1), (24, 1), (32, 3)):
        raw = float_to_raw(x, bits, tag)
        back = raw_to_float(raw.tobytes(), bits, tag)
        tol = {8: 2.0**-7, 16: 2.0**-15, 24: 2.0**-23, 32: 0.0}[bits]
        assert np.abs(back - x).max() <= tol, bits


def test_wav_reader_writer(tmp_path, rng):
    x = np.clip(rng.standard_normal(5000).astype(np.float32) * 0.3, -1, 1)
    p = str(tmp_path / "t.wav")
    w = WavWriter(p, 44100, 2, 16, 1)
    w.write_frames(x)
    w.close()
    r = WavReader(p)
    assert r.info.rate_hz == 44100 and r.info.n_chan == 2
    assert r.info.n_samples == 2500
    y = r.read_frames(2600)  # padded past EOF
    assert np.abs(y[:5000] - x).max() <= 2.0**-15
    assert (y[5000:] == 0).all()
    r.close()


@pytest.mark.parametrize("rate_arg,fmt", [("-90", "FLOAT32"), ("400", "PCM16")])
def test_tool_roundtrip(tmp_path, rng, rate_arg, fmt):
    n = 256
    t = np.arange(5 * n) / 44100.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    stereo = np.stack([sig, sig * 0.8], axis=-1).reshape(-1)

    wav_in = str(tmp_path / "in.wav")
    ulc = str(tmp_path / "a.ulc")
    wav_out = str(tmp_path / "out.wav")
    w = WavWriter(wav_in, 44100, 2, 16, 1)
    w.write_frames(stereo)
    w.close()

    rc = encode_main(["enc", wav_in, ulc, rate_arg, f"-blocksize:{n}", "-chunk:4"])
    assert rc == 0
    hdr = UlcHeader.unpack(open(ulc, "rb").read())
    assert hdr.block_size == n and hdr.n_chan == 2 and hdr.n_blocks == 7
    assert hdr.max_block_size > 0

    rc = decode_main(["dec", ulc, wav_out, f"-format:{fmt}", "-chunk:4"])
    assert rc == 0
    r = WavReader(wav_out)
    assert r.info.n_samples == hdr.n_blocks * n
    y = r.read_frames(r.info.n_samples).reshape(-1, 2)
    r.close()

    # delay: decoded block t covers input block t-1
    xin = stereo.reshape(-1, 2)
    got = y[n : n + 5 * n]
    seg = slice(n, 4 * n)
    err = got[seg] - xin[seg]
    snr = 10 * np.log10((xin[seg] ** 2).mean() / max((err**2).mean(), 1e-12))
    assert snr > 12.0, snr
