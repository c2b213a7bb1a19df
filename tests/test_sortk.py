"""In-VMEM bitonic sort kernel (ulcx/ops/sortk.py) vs the XLA path,
plus the monotone key map the threshold-keep scheme builds on.

Shapes are tiny (P=64) because compiling the comparator network costs
~30 s/shape on XLA:CPU (one-time; the persistent cache absorbs warm
reruns) — the network is identical at every power-of-two length, and
production P=4096/8192 Mosaic acceptance + bit-exactness is covered on
hardware by devtools/sortk_check.py."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ulcx.ops.sortk import (
    _lane_tile,
    monotone_i32,
    sort_kv_lanes,
    sort_kv_lanes2,
    sortable,
    use_kv_kernel,
)


def _tie_heavy(rng, b, p):
    flat = rng.standard_normal((b, p)).astype(np.float32)
    flat[flat < -1.2] = -np.inf
    flat[np.abs(flat) < 0.05] = 0.0
    flat[0, : p // 8] = flat[0, p // 8 : p // 4]  # exact duplicates
    flat[1, 0] = -0.0
    flat[1, 1] = 0.0
    return flat


def test_monotone_i32_matches_argsort_order():
    """monotone_i32 must order EXACTLY like jax's float comparator:
    ±0.0 tied, all NaN payloads/signs collapsed to one key sorted
    last under the descending convention (kernel keep tests and the
    sorted-threshold fetch both assume this)."""
    rng = np.random.default_rng(13)
    flat = _tie_heavy(rng, 8, 64)
    flat[2, 3] = np.nan
    flat[2, 9] = -np.nan
    flat[3, :8] = np.frombuffer(
        np.uint32(0x7FC00001).tobytes(), dtype=np.float32
    )[0]
    flat[4, 60:] = np.frombuffer(
        np.uint32(0xFFC00001).tobytes(), dtype=np.float32
    )[0]
    flat[5, 0] = np.inf
    flat[5, 1] = np.nan
    flat[5, 2] = -np.inf

    fj = jnp.asarray(flat)
    key = monotone_i32(fj)
    # stable descending order via the key == argsort(-flat)
    iota = jnp.broadcast_to(jnp.arange(64), key.shape)
    _, order_k = lax.sort((~key, iota), dimension=1, num_keys=1)
    order_f = jnp.argsort(-fj, axis=-1)
    np.testing.assert_array_equal(np.asarray(order_k), np.asarray(order_f))


def test_sort_kv_lanes_matches_lax():
    """Assemble-compaction shape: distinct small keys + massed sentinel
    ties. With the val tiebreak the result equals a 2-key lax.sort; the
    production caller only consumes the distinct-key prefix."""
    rng = np.random.default_rng(11)
    g, p, lan = 2, 64, 16
    key = rng.integers(0, p // 2, (g, p, lan)).astype(np.int32)
    key[key > p // 3] = 2**30
    val = rng.integers(0, 2**20, (g, p, lan)).astype(np.int32)
    ref = np.asarray(
        lax.sort((jnp.asarray(key), jnp.asarray(val)), dimension=1, num_keys=2)[1]
    )
    got = np.asarray(
        sort_kv_lanes(jnp.asarray(key), jnp.asarray(val), interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_sort_kv_lanes_split_form():
    """The P > _CAP split (half-local kernels + XLA cross substage)
    must equal the fallback; exercised at CI size by shrinking the cap
    (production: P=8192, cap 4096)."""
    from ulcx.ops import sortk

    rng = np.random.default_rng(5)
    old = sortk._CAP
    sortk._CAP = 32
    # sort_kv_lanes is jit-cached by shape; _CAP is read at trace time,
    # so stale traces from other tests would silently bypass the split
    # path if shapes ever collided.
    jax.clear_caches()
    try:
        g, p, lan = 2, 64, 8
        key = rng.integers(0, p // 2, (g, p, lan)).astype(np.int32)
        key[key > p // 3] = 2**30
        val = rng.integers(0, 2**20, (g, p, lan)).astype(np.int32)
        ref = np.asarray(
            lax.sort(
                (jnp.asarray(key), jnp.asarray(val)), dimension=1, num_keys=2
            )[1]
        )
        got = np.asarray(
            sort_kv_lanes(jnp.asarray(key), jnp.asarray(val), interpret=True)
        )
        np.testing.assert_array_equal(got, ref)
    finally:
        sortk._CAP = old
        jax.clear_caches()


def test_sort_kv_lanes2_matches_lax():
    """Threshold-plane shape (_v3_planes): val is the position iota, so
    the kernel's (key asc, val asc) comparator equals the stable 1-key
    lax.sort on BOTH outputs — including heavy key ties."""
    rng = np.random.default_rng(7)
    g, p, lan = 2, 64, 16
    key = rng.integers(-8, 8, (g, p, lan)).astype(np.int32)  # many ties
    val = np.broadcast_to(
        np.arange(p, dtype=np.int32)[None, :, None], (g, p, lan)
    ).copy()
    kj, vj = jnp.asarray(key), jnp.asarray(val)
    rk, rv = lax.sort((kj, vj), dimension=1, num_keys=1)
    gk, gv = sort_kv_lanes2(kj, vj, interpret=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))


def test_sort_kv_lanes2_split_form():
    """P > _CAP split form of the dual-output sort (production: the
    P=8192 threshold sort)."""
    from ulcx.ops import sortk

    rng = np.random.default_rng(3)
    old = sortk._CAP
    sortk._CAP = 32
    jax.clear_caches()  # jit-cached by shape; _CAP is read at trace time
    try:
        g, p, lan = 2, 64, 8
        key = rng.integers(-8, 8, (g, p, lan)).astype(np.int32)
        val = np.broadcast_to(
            np.arange(p, dtype=np.int32)[None, :, None], (g, p, lan)
        ).copy()
        kj, vj = jnp.asarray(key), jnp.asarray(val)
        rk, rv = lax.sort((kj, vj), dimension=1, num_keys=1)
        gk, gv = sort_kv_lanes2(kj, vj, interpret=True)
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(rk))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))
    finally:
        sortk._CAP = old
        jax.clear_caches()


def test_use_kv_kernel_gate(monkeypatch):
    """Dispatch: DEFAULT OFF (end-to-end loss despite the isolated win
    — see use_kv_kernel docstring); ULCX_SORTK=1 forces anywhere
    sortable, interpret mode always falls back."""
    monkeypatch.delenv("ULCX_SORTK", raising=False)
    assert not use_kv_kernel(8192, 128, interpret=False)
    assert not use_kv_kernel(4096, 128, interpret=False)
    monkeypatch.setenv("ULCX_SORTK", "1")
    assert use_kv_kernel(4096, 128, interpret=False)
    assert use_kv_kernel(8192, 128, interpret=False)
    assert not use_kv_kernel(4096, 128, interpret=True)
    assert not use_kv_kernel(256, 8, interpret=False)  # not sortable
    monkeypatch.setenv("ULCX_SORTK", "0")
    assert not use_kv_kernel(8192, 128, interpret=False)


def test_gate():
    """The gate admits exactly the production kernel shapes."""
    assert sortable(4096, 512)
    assert sortable(8192, 128)  # split (half-local) form
    assert not sortable(6144, 512)  # 3-channel P: not a power of two
    assert not sortable(256, 8)  # CI shapes stay on the XLA path
    assert not sortable(32768, 512)  # needs multi-level cross merges
    assert _lane_tile(8192, 512) == 128
    assert _lane_tile(4096, 24) == 24  # full-dim lane block
