"""In-VMEM bitonic sort kernels (Pallas/Mosaic).

Why: XLA's ``lax.sort`` on this backend lowers to a sorting network
whose every comparator stage round-trips HBM — the round-3 device
trace (NOTES.md) shows the three [B, 8192]-class sorts in the encode
pipeline costing 13-21 ms EACH (~26% of bs4096 device time), i.e.
~50 passes over arrays that are only 4-17 MB. A [P, lanes] tile of
the sort axis fits VMEM whole, so a bitonic network that keeps the
operands resident runs the same ~log²(P)/2 compare-exchange stages
with ONE HBM read + ONE write: the sort becomes VPU-bound instead of
bandwidth-bound.

Layout: the sort axis rides SUBLANES ([P, L] blocks, streams in
lanes), so every compare-exchange is an elementwise min/max between an
array and a sublane-rolled copy of itself — the same observation that
let the v3 assemble compaction sort run along a non-minor axis
(fast_encode._assemble_v3_lanes), but without XLA's per-stage HBM
round trips.

P=8192 (stereo bs4096 / mono bs8192): a [8192, 128] block is 4 MiB
per operand — over the VMEM budget once Mosaic double-buffers the
grid pipeline. The network splits instead: every substage with
stride < 4096 touches only one contiguous 4096-half of the sort axis,
so those run in half-sized blocks (grid axis = halves, direction
masks offset by the half index), and the ONE cross-half substage per
sort (stage P, stride P/2) runs as a plain XLA elementwise pass
(~3 ops over the arrays — bandwidth-trivial).

Contents: ``sort_kv_lanes`` (the assemble compaction sort) and
``monotone_i32`` (the order-preserving f32 -> i32 key map the
threshold-keep scheme builds on — pallas_encode3 docstring). A fused
rank kernel (argsort + inverse permutation in one VMEM pass) lived
here through round 3; it measured 1.15-1.24x SLOWER than the XLA sorts
it replaced (devtools/sortk_bench.py) and the rank materialization it
accelerated was itself retired by the threshold-keep redesign, so it
is gone (git history has it). sort_kv_lanes measures ~10% FASTER than
lax.sort at P=8192 and neutral at P=4096.

Reference parity note: the stable-descending order convention replaces
the heapsort of ``ulcEncoder_BlockTransform.c:349-355`` (SortIndices);
tie order follows the repo-wide stable-argsort convention, not
heapsort tie order (see SURVEY §7 hard part 2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the ~70-substage network keeps many [4096, 128] i32 temporaries live
# (the Mosaic stack allocator measured ~44 MiB at P=4096); v5e has
# 128 MiB physical VMEM per core, so raise the scoped limit instead of
# splitting the network further
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# largest sort length held whole in one VMEM block ([4096, 128] i32 =
# 2 MiB/operand); longer sorts split at this boundary
_CAP = 4096


def _roll(x, shift: int, interpret: bool):
    """Circular shift along axis 0 (sublanes); pltpu.roll wants the
    shift non-negative, so negative shifts wrap mod P."""
    if interpret:
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


def _schedule(p: int):
    """Full bitonic network: (size, stride) pairs in execution order."""
    out = []
    size = 2
    while size <= p:
        s = size // 2
        while s >= 1:
            out.append((size, s))
            s //= 2
        size *= 2
    return out


def _split_schedules(p: int):
    """(local-before, cross, local-after) for a sort of length p run in
    halves of length p//2: strides < p//2 are half-local; the single
    (p, p//2) substage crosses."""
    pre = [st for st in _schedule(p) if st[1] < p // 2 and st[0] < p]
    post = [(p, s) for s in _half_strides(p)]
    return pre, (p, p // 2), post


def _half_strides(p: int):
    out = []
    s = p // 4
    while s >= 1:
        out.append(s)
        s //= 2
    return out


def _substage(arrs, less_fn, idx0, size, s, interpret):
    """One compare-exchange substage over [P_local, L] arrays. idx0 is
    the GLOBAL sort index per sublane (iota + half offset), so
    direction masks stay correct in split halves; the roll is local
    (every XOR-partner pair lies within the local block whenever
    s < P_local). m[i] = (self_is_low == block_ascending) is where
    slot i keeps SELF when self precedes partner in comparator order."""
    low = (idx0 & s) == 0  # partner is at i + s
    partners = tuple(
        jnp.where(low, _roll(a, -s, interpret), _roll(a, s, interpret))
        for a in arrs
    )
    m = low == ((idx0 & size) == 0)
    take_self = less_fn(arrs, partners) == m
    return tuple(jnp.where(take_self, a, pa) for a, pa in zip(arrs, partners))


def _run(arrs, less_fn, idx0, sched, interpret):
    for size, s in sched:
        arrs = _substage(arrs, less_fn, idx0, size, s, interpret)
    return arrs


def _substage_xla(arrs, less_fn, p: int, size: int, s: int, axis: int = 0):
    """The cross-half substage as plain XLA elementwise ops (identical
    math to _substage, sort axis selectable)."""
    shape = [1] * arrs[0].ndim
    shape[axis] = p
    idx0 = lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    low = (idx0 & s) == 0
    partners = tuple(
        jnp.where(low, jnp.roll(a, -s, axis=axis), jnp.roll(a, s, axis=axis))
        for a in arrs
    )
    m = low == ((idx0 & size) == 0)
    take_self = less_fn(arrs, partners) == m
    return tuple(jnp.where(take_self, a, pa) for a, pa in zip(arrs, partners))


def _substage_xla3(arrs, less_fn, p: int, size: int, s: int):
    return _substage_xla(arrs, less_fn, p, size, s, axis=1)



def _asc(a, b):
    return a[0] < b[0]


def _asc_tie_val(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def monotone_i32(f):
    """f32 -> signed i32 preserving order; ±0.0 collapse to one key so
    ties (and thus stable-index order) match IEEE comparison. The -0.0
    squash runs in the int domain: ``f + 0.0f`` gets algebraically
    simplified away by XLA, silently keeping -0.0 distinct.

    NaNs (any sign/payload) collapse to ONE key too: jax's argsort
    canonicalizes every NaN to a single value sorted LAST in stable
    index order (measured on jax 0.9.0), so under our DESCENDING rank
    comparator NaNs must map to the minimum key. INT32_MIN is free —
    the most negative key a real float can produce is -inf's
    0x807fffff."""
    u = lax.bitcast_convert_type(f, jnp.int32)
    is_nan = (u & jnp.int32(0x7FFFFFFF)) > jnp.int32(0x7F800000)
    u = jnp.where(u == jnp.int32(-(2**31)), jnp.int32(0), u)
    m = jnp.where(u < 0, jnp.bitwise_xor(~u, jnp.int32(-(2**31))), u)
    return jnp.where(is_nan, jnp.int32(-(2**31)), m)


def _iota_block(p_local: int, l: int, halves: bool):
    """Global sort index per sublane: grid axis 0 is the half index
    when the sort is split."""
    idx = lax.broadcasted_iota(jnp.int32, (p_local, l), 0)
    if halves:
        idx = idx + pl.program_id(0) * p_local
    return idx


def _lane_tile(p: int, b: int) -> int:
    """Lane-tile width: Mosaic requires the minor block dim be a
    multiple of 128 or the whole array dim."""
    return 128 if b % 128 == 0 else b


def sortable(p: int, b: int) -> bool:
    """Shapes the kernels accept: power-of-two sort length with
    [min(p, 4096), lane_tile] i32 operand blocks within the VMEM
    budget; sorts longer than 2*_CAP would need multi-level merges.
    The 2048 floor keeps tiny-P pipelines (CI shapes) off the kernel:
    compiling the ~70-substage network costs ~30 s on XLA:CPU even at
    P=64 — the kernels exist for the production P=4096/8192 encodes,
    where the XLA sorts are the measured 13-21 ms stages."""
    lt = _lane_tile(p, b)
    return (
        2048 <= p <= 2 * _CAP
        and (p & (p - 1)) == 0
        and b >= 8
        and b % lt == 0
        and min(p, _CAP) * lt * 4 <= 2**21
    )


# --------------------------------------------------------------------------
# (key, val) ascending sort in assemble lane layout


def _kv_kernel(key_ref, val_ref, out_ref, *, interpret: bool):
    p, l = key_ref.shape
    idx = lax.broadcasted_iota(jnp.int32, (p, l), 0)
    _, val = _run(
        (key_ref[...], val_ref[...]), _asc_tie_val, idx, _schedule(p), interpret
    )
    out_ref[...] = val


def _kv_pre_kernel(key_ref, val_ref, ko_ref, vo_ref, *, interpret: bool):
    p, l = key_ref.shape
    idx = _iota_block(p, l, True)
    pre, _, _ = _split_schedules(2 * p)
    key, val = _run((key_ref[...], val_ref[...]), _asc_tie_val, idx, pre, interpret)
    ko_ref[...] = key
    vo_ref[...] = val


def _kv_post_kernel(key_ref, val_ref, out_ref, *, interpret: bool):
    p, l = key_ref.shape
    idx = _iota_block(p, l, True)
    _, _, post = _split_schedules(2 * p)
    _, val = _run(
        (key_ref[...], val_ref[...]), _asc_tie_val, idx, post, interpret
    )
    out_ref[...] = val


def _kv2_kernel(key_ref, val_ref, ko_ref, vo_ref, *, interpret: bool):
    p, l = key_ref.shape
    idx = lax.broadcasted_iota(jnp.int32, (p, l), 0)
    key, val = _run(
        (key_ref[...], val_ref[...]), _asc_tie_val, idx, _schedule(p), interpret
    )
    ko_ref[...] = key
    vo_ref[...] = val


def _kv2_post_kernel(key_ref, val_ref, ko_ref, vo_ref, *, interpret: bool):
    p, l = key_ref.shape
    idx = _iota_block(p, l, True)
    _, _, post = _split_schedules(2 * p)
    key, val = _run(
        (key_ref[...], val_ref[...]), _asc_tie_val, idx, post, interpret
    )
    ko_ref[...] = key
    vo_ref[...] = val


def _call3(kernel, args, n_out, g: int, p: int, lan: int, halves: bool,
           interpret: bool):
    """pallas_call wrapper in assemble lane layout: [G, P, LAN] arrays,
    (None, p_blk, lan) blocks, grid (G, halves?)."""
    p_blk = p // 2 if halves else p
    if halves:
        grid = (2, g)
        spec = pl.BlockSpec(
            (None, p_blk, lan), lambda h, gg: (gg, h, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        grid = (g,)
        spec = pl.BlockSpec(
            (None, p_blk, lan), lambda gg: (gg, 0, 0),
            memory_space=pltpu.VMEM,
        )
    outs = [jax.ShapeDtypeStruct((g, p, lan), jnp.int32)] * n_out
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=[spec] * n_out if n_out > 1 else spec,
        out_shape=outs if n_out > 1 else outs[0],
        interpret=interpret,
        compiler_params=None if interpret else _PARAMS,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_kv_lanes(key, val, interpret: bool = False):
    """Ascending (key, tie: val) sort along axis 1 of [G, P, L] int32
    arrays, vals returned ([G, P, L]); the in-VMEM form of
    ``lax.sort((key, val), dimension=1, num_keys=1)[1]`` for the
    assemble compaction (valid keys there are distinct; massed
    sentinel ties are totally ordered by the val tiebreak). Runs
    directly in the kernel lane layout — no relayout transposes."""
    g, p, lan = key.shape
    if p <= _CAP:
        return _call3(
            functools.partial(_kv_kernel, interpret=interpret),
            (key, val), 1, g, p, lan, False, interpret,
        )
    pre, cross, post = _split_schedules(p)
    ks, vs = _call3(
        functools.partial(_kv_pre_kernel, interpret=interpret),
        (key, val), 2, g, p, lan, True, interpret,
    )
    ks, vs = _substage_xla3((ks, vs), _asc_tie_val, p, *cross)
    return _call3(
        functools.partial(_kv_post_kernel, interpret=interpret),
        (ks, vs), 1, g, p, lan, True, interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_kv_lanes2(key, val, interpret: bool = False):
    """Like sort_kv_lanes but returns BOTH sorted operands (key, val) —
    the in-VMEM form of ``lax.sort((key, val), dimension=1,
    num_keys=1)`` used for the threshold-keep sorted planes
    (fast_encode._v3_planes: key = ~monotone importance, val =
    position iota, both consumed downstream)."""
    g, p, lan = key.shape
    if p <= _CAP:
        return _call3(
            functools.partial(_kv2_kernel, interpret=interpret),
            (key, val), 2, g, p, lan, False, interpret,
        )
    pre, cross, post = _split_schedules(p)
    ks, vs = _call3(
        functools.partial(_kv_pre_kernel, interpret=interpret),
        (key, val), 2, g, p, lan, True, interpret,
    )
    ks, vs = _substage_xla3((ks, vs), _asc_tie_val, p, *cross)
    return _call3(
        functools.partial(_kv2_post_kernel, interpret=interpret),
        (ks, vs), 2, g, p, lan, True, interpret,
    )


def use_kv_kernel(p: int, lan: int, interpret: bool) -> bool:
    """Dispatch for the lane kv sorts — DEFAULT OFF everywhere.

    The isolated hardware A/B (devtools/sortk_bench.py, 2026-08-19)
    measured the kernels ~10% faster than lax.sort at P=8192, but the
    END-TO-END bs4096 bench with them engaged measured 1803.7x vs
    2128.8x with them off (-15%; bench_configs stereo_abr128_bs4096,
    same session) — the same verdict that retired the round-3 rank
    kernel: in the full pipeline XLA overlaps the bandwidth-bound sort
    stages with the latency-bound Pallas walks, so their HBM cost
    largely hides, while the VPU-bound bitonic network competes with
    the walks for issue slots. Isolated sort timing does not transfer.

    ULCX_SORTK=1 forces the kernels wherever sortable (kept: correct,
    tested, hardware-EXACT — devtools/sortk_check.py — and a future
    backend may flip the tradeoff). Interpret mode always falls back
    (the eager ~78-substage network is minutes-slow on CPU)."""
    import os

    env = os.environ.get("ULCX_SORTK", "auto")
    if env == "0" or interpret or not sortable(p, lan):
        return False
    return env == "1"
