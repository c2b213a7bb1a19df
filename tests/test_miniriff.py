"""MiniRIFF recursive chunk dispatcher (reference tools/MiniRIFF.c)."""

import os
import struct

import numpy as np

from ulcx.io.wavio import WavReader


def _wav_with_extras(path, rate=44100, nch=2, n=400):
    pcm = (np.sin(np.arange(n) / 10) * 20000).astype("<i2")
    data = np.repeat(pcm, nch).tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    info = b"INFOIART" + struct.pack("<I", 5) + b"someo\x00"  # odd size -> pad
    chunks = b"LIST" + struct.pack("<I", len(info)) + info  # nested LIST first
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd unknown chunk
    chunks += b"data" + struct.pack("<I", len(data)) + data
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with open(path, "wb") as f:
        f.write(riff)
    return pcm


def test_wav_reader_skips_list_and_junk(tmp_path):
    """A WAVE containing a LIST(INFO) sub-list and an odd-sized unknown
    chunk around fmt/data parses via the recursive dispatcher
    with 2-byte chunk alignment (MiniRIFF.c:14-16, 29-37)."""
    p = os.path.join(tmp_path, "x.wav")
    pcm = _wav_with_extras(p)
    r = WavReader(p)
    assert r.info.rate_hz == 44100
    assert r.info.n_chan == 2
    assert r.info.n_samples == 400
    x = r.read_frames(400).reshape(400, 2)
    np.testing.assert_allclose(x[:, 0], pcm.astype(np.float32) / 32768.0, atol=1e-6)
    r.close()


def test_list_handler_callbacks(tmp_path):
    from ulcx.io.miniriff import ChunkHandler, ListHandler, ck_read

    p = os.path.join(tmp_path, "y.wav")
    _wav_with_extras(p)
    seen = {"begin": 0, "end": 0, "fmt": 0, "data": 0, "stopped": 0}

    def on_fmt(f, st, fourcc, size):
        st["fmt"] += 1
        return 1

    def on_data(f, st, fourcc, size):
        st["data"] += 1
        return -1  # negative return stops traversal (MiniRIFF.c:29-37)

    def beg(f, st):
        st["begin"] += 1
        return 0

    def end(f, st):
        st["end"] += 1
        return 0

    wave = ListHandler(
        b"WAVE", [ChunkHandler(b"fmt ", on_fmt), ChunkHandler(b"data", on_data)],
        [], on_begin=beg, on_end=end,
    )
    with open(p, "rb") as f:
        ret = ck_read(f, seen, None, [wave])
    assert seen == {"begin": 1, "end": 0, "fmt": 1, "data": 1, "stopped": 0}
    assert ret < 0
