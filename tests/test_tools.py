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


def test_device_pcm_conversion_bit_exact(rng):
    """The decode tool's on-device float->int conversion (jnp
    rint/clip) must be bit-exact vs the host converters (lrintf
    semantics), including clamp edges and round-half-even ties."""
    import jax.numpy as jnp

    edge = np.array(
        [0.0, -0.0, 1.0, -1.0, 2.0, -2.0, 0.5, -0.5,
         (0x7FFF + 0.5) * 2.0**-15, (0x7FFE + 0.5) * 2.0**-15,
         -(0x8000 + 0.5) * 2.0**-15, 1.5 * 2.0**-15, 2.5 * 2.0**-15,
         -1.5 * 2.0**-15, 3e-8, -3e-8],
        np.float32,
    )
    x = np.concatenate(
        [edge, np.clip(rng.standard_normal(4096).astype(np.float32) * 0.7, -1.2, 1.2)]
    )
    # PCM16
    dev = np.asarray(
        jnp.rint(jnp.clip(jnp.asarray(x) * jnp.float32(2.0**15), -32768.0, 32767.0))
    ).astype("<i2")
    host = float_to_raw(x, 16, 1).view("<i2")
    assert (dev == host).all()
    # PCM8 (stored unsigned-offset-128)
    dev8 = np.asarray(
        jnp.rint(jnp.clip(jnp.asarray(x) * jnp.float32(2.0**7), -128.0, 127.0))
    ).astype(np.int8)
    host8 = float_to_raw(x, 8, 1)
    assert ((dev8.view(np.uint8) ^ np.uint8(0x80)) == host8).all()


def test_int_upload_reads_bit_exact(tmp_path, rng):
    """read_frames_int * int_scale must equal read_frames exactly for
    PCM8/PCM16 sources (the encode tool's raw-int upload contract)."""
    for bits in (8, 16):
        x = np.clip(rng.standard_normal(3000).astype(np.float32) * 0.5, -1, 1)
        p = str(tmp_path / f"i{bits}.wav")
        w = WavWriter(p, 44100, 2, bits, 1)
        w.write_frames(x)
        w.close()
        r1, r2 = WavReader(p), WavReader(p)
        scale = r1.int_scale()
        assert scale is not None
        xi = r1.read_frames_int(1600)
        xf = r2.read_frames(1600)
        assert xi.dtype == (np.int8 if bits == 8 else np.int16)
        assert (xi.astype(np.float32) * np.float32(scale) == xf).all()
        r1.close(), r2.close()
    # float32 source: no int form
    p = str(tmp_path / "f32.wav")
    w = WavWriter(p, 44100, 1, 32, 3)
    w.write_frames(np.zeros(64, np.float32))
    w.close()
    r = WavReader(p)
    assert r.int_scale() is None
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


def test_int_upload_encode_bit_identical(tmp_path, rng):
    """The encode tool's raw-int upload path (PCM16 source) must emit a
    byte-identical .ulc to the float-upload path (FLOAT32 source with
    the same sample values)."""
    n = 256
    t = np.arange(5 * n) / 44100.0
    sig = (0.4 * np.sin(2 * np.pi * 340 * t)
           + 0.1 * rng.standard_normal(5 * n)).astype(np.float32)
    stereo = np.clip(np.stack([sig, -0.7 * sig], -1).reshape(-1), -1, 1)

    p16 = str(tmp_path / "in16.wav")
    w = WavWriter(p16, 44100, 2, 16, 1)
    w.write_frames(stereo)
    w.close()
    # float WAV carrying exactly the PCM16-quantized values
    r = WavReader(p16)
    vals = r.read_frames(r.info.n_samples)
    r.close()
    pf = str(tmp_path / "inf.wav")
    w = WavWriter(pf, 44100, 2, 32, 3)
    w.write_frames(vals)
    w.close()

    u16, uf = str(tmp_path / "a16.ulc"), str(tmp_path / "af.ulc")
    assert encode_main(["e", p16, u16, "128", f"-blocksize:{n}", "-chunk:4"]) == 0
    assert encode_main(["e", pf, uf, "128", f"-blocksize:{n}", "-chunk:4"]) == 0
    assert open(u16, "rb").read() == open(uf, "rb").read()


def test_tool_roundtrip_pcm8(tmp_path, rng):
    """PCM8 in -> PCM8 out exercises the int8 upload and the on-device
    PCM8 conversion + offset-128 store."""
    n = 256
    t = np.arange(4 * n) / 44100.0
    sig = 0.5 * np.sin(2 * np.pi * 500 * t).astype(np.float32)

    wav_in = str(tmp_path / "in8.wav")
    w = WavWriter(wav_in, 44100, 1, 8, 1)
    w.write_frames(sig)
    w.close()
    ulc, wav_out = str(tmp_path / "a.ulc"), str(tmp_path / "out8.wav")
    assert encode_main(["e", wav_in, ulc, "200", f"-blocksize:{n}", "-chunk:4"]) == 0
    assert decode_main(["d", ulc, wav_out, "-format:PCM8", "-chunk:4"]) == 0
    r = WavReader(wav_out)
    assert r.info.bits == 8 and r.info.n_samples > 4 * n
    y = r.read_frames(r.info.n_samples)
    r.close()
    xin = sig
    got = y[n : n + 4 * n]
    seg = slice(n, 3 * n)
    err = got[seg] - xin[seg]
    snr = 10 * np.log10((xin[seg] ** 2).mean() / max((err**2).mean(), 1e-12))
    assert snr > 10.0, snr
