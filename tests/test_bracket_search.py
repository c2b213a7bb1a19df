"""Seeded-ladder engine vs brute force on synthetic size curves.

_bracket_search + _final_cands drive the kernel-path CBR/ABR rate
search (fast_encode). Against arbitrary monotone size curves the
3-evaluation schedule must land exactly on (or a bounded few below)
the true max-feasible count, and NEVER pick an infeasible one — for
convex, concave, stair-stepped and noisy-monotone shapes across
budgets. Pure engine logic: size_fn is a table lookup, no kernels.
"""

import numpy as np
import jax.numpy as jnp

from ulcx.bitstream.fast_encode import _bracket_search, _final_cands

P = 4096


def _curves(rng, b):
    """[B, P+1] int32 monotone-ish size curves, bits at every n."""
    kinds = []
    for i in range(b):
        x = np.arange(P + 1, dtype=np.float64)
        kind = i % 4
        if kind == 0:    # linear-ish: constant per-coef cost
            y = 12 + 4.6 * x
        elif kind == 1:  # convex (rising marginal cost, low-rate shape)
            y = 12 + 3.2 * x + 9e-4 * x * x
        elif kind == 2:  # concave (falling marginal cost)
            y = 12 + 6.0 * x - 4e-4 * x * x
        else:            # stair-step + jitter (run/quantizer tokens)
            y = 12 + 4.0 * x + 24 * np.floor(x / 96.0)
            y += rng.integers(0, 8, P + 1)
            y = np.maximum.accumulate(y)  # keep monotone
        kinds.append(np.round(y).astype(np.int64))
    c = np.stack(kinds)
    return ((c + 1) & ~1).astype(np.int32)  # byte-ish rounding, monotone


def _run(curves, n_nz, budget, k=8, rounds=4):
    cur = jnp.asarray(curves)

    def size_fn(nn):
        return jnp.take_along_axis(cur, jnp.clip(nn, 0, P), axis=1)

    bud = jnp.asarray(budget, jnp.int32)
    lo, hi = _bracket_search(size_fn, jnp.asarray(n_nz, jnp.int32), bud, k, rounds)
    cands, cands_c, hi_c = _final_cands(lo, hi, k)
    sizes = size_fn(cands_c)
    feas = sizes <= bud[:, None]
    feas = feas.at[:, 0].set(True)
    return np.asarray(jnp.max(jnp.where(feas, cands_c, lo[:, None]), axis=-1))


def test_monotone_curves_exact_or_bounded():
    rng = np.random.default_rng(3)
    b = 64
    curves = _curves(rng, b)
    n_nz = rng.integers(200, P, b)
    for kbps_frac in (0.15, 0.5, 0.9):
        budget = np.array(
            [int(curves[i, int(n_nz[i])] * kbps_frac) for i in range(b)]
        )
        n_sel = _run(curves, n_nz, budget)
        for i in range(b):
            feas_n = np.nonzero(curves[i, : int(n_nz[i]) + 1] <= budget[i])[0]
            n_true = int(feas_n.max()) if len(feas_n) else 0
            # never infeasible, never above the true max
            assert curves[i, n_sel[i]] <= budget[i] or n_sel[i] == 0
            assert n_sel[i] <= n_true
            # tightness: within 1% of n_true (seeded-miss tail bound)
            assert n_true - n_sel[i] <= max(4, 0.01 * n_true), (
                i, i % 4, n_true, int(n_sel[i]), int(budget[i]),
            )


def test_degenerate_inputs():
    rng = np.random.default_rng(4)
    curves = _curves(rng, 8)
    # zero coefficients / tiny budgets / budget above everything
    n_nz = np.array([0, 1, 5, P, P, 300, 2, P])
    budget = np.array([8, 8, 2, 10**8, 40, 10**8, 10**8, 1])
    n_sel = _run(curves, n_nz, budget)
    for i in range(8):
        assert 0 <= n_sel[i] <= n_nz[i]
        if n_sel[i] > 0:
            assert curves[i, n_sel[i]] <= budget[i]


def test_rounds5_schedule_tightness():
    """P >= 8192 shapes run rounds=5 with ONE classic round (r5 seed
    plan); never-infeasible must hold everywhere, and the under-max
    tail is bounded by max(6, 1%): one classic round leaves a wider
    seeded bracket, whose final-round spacing can land ~6 under on
    small-n concave curves — at the real P >= 8192 shapes n_true is in
    the thousands (bs4096 study: worst -5 of n_true p50 1219), so the
    1% clause governs in practice."""
    rng = np.random.default_rng(7)
    b = 64
    curves = _curves(rng, b)
    n_nz = rng.integers(200, P, b)
    for kbps_frac in (0.15, 0.5, 0.9):
        budget = np.array(
            [int(curves[i, int(n_nz[i])] * kbps_frac) for i in range(b)]
        )
        n_sel = _run(curves, n_nz, budget, rounds=5)
        for i in range(b):
            feas_n = np.nonzero(curves[i, : int(n_nz[i]) + 1] <= budget[i])[0]
            n_true = int(feas_n.max()) if len(feas_n) else 0
            assert curves[i, n_sel[i]] <= budget[i] or n_sel[i] == 0
            assert n_sel[i] <= n_true
            assert n_true - n_sel[i] <= max(6, 0.01 * n_true), (
                i, i % 4, n_true, int(n_sel[i]), int(budget[i]),
            )


def test_ladder_scan_unroll_parity(monkeypatch):
    """ULCX_LADDER_SCAN=1 (lax.scan over rounds) must produce brackets
    bit-identical to the unrolled default."""
    import os

    rng = np.random.default_rng(9)
    b = 32
    curves = _curves(rng, b)
    n_nz = rng.integers(200, P, b)
    budget = np.array(
        [int(curves[i, int(n_nz[i])] * 0.4) for i in range(b)]
    )
    monkeypatch.delenv("ULCX_LADDER_SCAN", raising=False)
    a = _run(curves, n_nz, budget, rounds=5)
    monkeypatch.setenv("ULCX_LADDER_SCAN", "1")
    c = _run(curves, n_nz, budget, rounds=5)
    assert (a == c).all()
