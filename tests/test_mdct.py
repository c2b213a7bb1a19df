"""MDCT/IMDCT perfect-reconstruction tests at the frame level."""

import numpy as np
import jax.numpy as jnp

from ulcx.ops.mdct import (
    frame_window,
    imdct_expand,
    imdct_halfspec,
    mdct_frame,
    mdct_mdst_frame,
    rise_window,
)


def test_window_shapes():
    w = np.asarray(frame_window(256, 256, 256))
    # full overlap both sides -> plain sine window over 2N
    want = np.sin(np.pi / 2 * (np.arange(512) + 0.5) / 256)
    assert np.abs(w - want).max() < 1e-6

    w2 = np.asarray(frame_window(256, 64, 32))
    assert np.all(w2[: 128 - 32] == 0)
    assert np.all(w2[128 + 32 : 384 - 16] == 1)
    assert np.all(w2[384 + 16 :] == 0)
    # princen-bradley on each transition
    r = np.asarray(rise_window(256, 64))
    assert np.abs(r**2 + r[::-1] ** 2 - 1).max() < 1e-6


def _pr_roundtrip(n, overlaps, rng):
    """Stream full-size frames with per-boundary overlaps; check PR.

    overlaps[t] is the boundary overlap between frame t-1 and frame t.
    """
    nblk = len(overlaps) - 1
    x = rng.standard_normal((nblk + 1) * n).astype(np.float32)
    coefs = []
    for t in range(nblk):
        frame = jnp.asarray(x[t * n : (t + 2) * n])
        coefs.append(mdct_frame(frame, overlaps[t], overlaps[t + 1]))
    # decode: output block t is OLA of frame t-1's right half and frame t's
    # left half (both windowed), t >= 1
    outs = []
    ys = [np.asarray(imdct_expand(imdct_halfspec(c))) for c in coefs]
    ws = [np.asarray(frame_window(n, overlaps[t], overlaps[t + 1])) for t in range(nblk)]
    for t in range(1, nblk):
        out = ws[t - 1][n:] * ys[t - 1][n:] + ws[t][:n] * ys[t][:n]
        outs.append(out)
    got = np.concatenate(outs)
    want = x[n : nblk * n]
    err = np.abs(got - want).max()
    assert err < 1e-4, (n, overlaps, err)


def test_pr_full_overlap(rng):
    _pr_roundtrip(256, [256] * 6, rng)


def test_pr_reduced_overlap(rng):
    _pr_roundtrip(256, [256, 128, 32, 256, 64, 256], rng)


def test_pr_minimal_overlap(rng):
    _pr_roundtrip(512, [512, 2, 512, 1, 512], rng)


def test_mdst_magnitude_reasonable(rng):
    # MDST only feeds |Im|^2; check it behaves like the quadrature part:
    # for a pure cosine burst, MDCT+MDST power spectrum is smoother than
    # MDCT alone (sanity, not exactness).
    n = 256
    t = np.arange(2 * n)
    x = np.cos(2 * np.pi * 17.3 * t / n).astype(np.float32)
    c, s = mdct_mdst_frame(jnp.asarray(x), n, n)
    p = np.asarray(c) ** 2 + np.asarray(s) ** 2
    # bin k spans frequency (k+1/2)/(2N) cycles/sample; 17.3/N -> k ~ 34
    assert p.argmax() in (34, 35)
