"""In-VMEM bitonic sort kernels (ulcx/ops/sortk.py) vs the XLA path.

The rank kernel must be BIT-identical to the production fallback
(argsort(-flat) + packed inverse sort, analysis/batched.py) including
tie order — ranks feed the aux word of the encode kernels, so any
deviation changes bitstreams. Tie semantics covered here: exact
duplicate values, -inf (masked coefficients), and ±0.0 (XLA's sort
treats them as equal; the kernel canonicalizes -0.0 in the int
domain).

Shapes are tiny (P=64) because compiling the comparator network costs
~30 s/shape on XLA:CPU (one-time; the persistent cache absorbs warm
reruns) — the network is identical at every power-of-two length, and
production P=4096/8192 Mosaic acceptance is covered by
devtools/aot_check.py + the hardware bench."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from ulcx.ops.sortk import (
    _lane_tile,
    ranks_batched,
    ranks_kernel,
    sort_kv_lanes,
    sortable,
)
from ulcx.utils.config import CodecConfig


def _rank_ref(flat):
    b, p = flat.shape
    order = np.asarray(jnp.argsort(-jnp.asarray(flat), axis=-1))
    bits = int(p - 1).bit_length()
    packed = (order << bits) | np.arange(p)
    return np.sort(packed, axis=-1) & ((1 << bits) - 1)


def _tie_heavy(rng, b, p):
    flat = rng.standard_normal((b, p)).astype(np.float32)
    flat[flat < -1.2] = -np.inf
    flat[np.abs(flat) < 0.05] = 0.0
    flat[0, : p // 8] = flat[0, p // 8 : p // 4]  # exact duplicates
    flat[1, 0] = -0.0
    flat[1, 1] = 0.0
    return flat


def test_ranks_kernel_exact():
    rng = np.random.default_rng(7)
    flat = _tie_heavy(rng, 16, 64)
    got = np.asarray(ranks_kernel(jnp.asarray(flat), interpret=True))
    np.testing.assert_array_equal(got, _rank_ref(flat))


def test_split_form_exact():
    """The P > _CAP split (half-local kernels + XLA cross substage)
    must equal the fallback; exercised at CI size by shrinking the cap
    (production: P=8192, cap 4096)."""
    import jax

    from ulcx.ops import sortk

    rng = np.random.default_rng(5)
    old = sortk._CAP
    sortk._CAP = 32
    # ranks_kernel/sort_kv_lanes are jit-cached by shape; _CAP is read
    # at trace time, so stale traces from other tests would silently
    # bypass the split path if shapes ever collided.
    jax.clear_caches()
    try:
        flat = _tie_heavy(rng, 24, 64)
        got = np.asarray(ranks_kernel(jnp.asarray(flat), interpret=True))
        np.testing.assert_array_equal(got, _rank_ref(flat))

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


def test_ranks_kernel_nan_order():
    """NaNs (any sign/payload) must rank exactly like the XLA argsort:
    canonicalized to one key sorted after everything else, stable
    index order among themselves (_monotone_i32 maps them to
    INT32_MIN under the descending comparator)."""
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
    got = np.asarray(ranks_kernel(jnp.asarray(flat), interpret=True))
    np.testing.assert_array_equal(got, _rank_ref(flat))


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


def test_ranks_batched_fallback_and_gate():
    """Below the gate (CI shapes) ranks_batched uses the XLA sorts;
    the gate itself admits exactly the production kernel shapes."""
    rng = np.random.default_rng(3)
    flat = _tie_heavy(rng, 16, 256)
    off = CodecConfig(rate_hz=44100, n_chan=1, block_size=256, use_pallas="off")
    np.testing.assert_array_equal(
        np.asarray(ranks_batched(jnp.asarray(flat), off)), _rank_ref(flat)
    )

    assert sortable(4096, 512)
    assert sortable(8192, 128)  # split (half-local) form
    assert not sortable(6144, 512)  # 3-channel P: not a power of two
    assert not sortable(256, 8)  # CI shapes stay on the XLA path
    assert not sortable(32768, 512)  # needs multi-level cross merges
    assert _lane_tile(8192, 512) == 128
    assert _lane_tile(4096, 24) == 24  # full-dim lane block
