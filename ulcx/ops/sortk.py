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

Exactness: the rank entry point reproduces
``_inverse_perm(argsort(-flat))`` (analysis/batched.py) BIT-EXACTLY,
ties included: the f32 key is mapped to a monotone signed i32 (-0.0
squashed in the int domain so ±0.0 stay tied, as under IEEE
comparison), the comparator orders by (key desc, index asc) — exactly
a stable descending sort — and the inverse permutation runs as a
packed single-operand network (cf. _inverse_perm) without leaving
VMEM.

Reference parity note: this replaces the heapsort of
``ulcEncoder_BlockTransform.c:349-355`` (SortIndices) in the batched
TPU pipeline; ordering semantics follow the repo-wide stable-argsort
convention, not heapsort tie order (see SURVEY §7 hard part 2).
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


def _desc_tie_asc(a, b):
    # (key desc, index asc): argsort(-flat) stable-tie semantics
    return (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def _asc(a, b):
    return a[0] < b[0]


def _asc_tie_val(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def _monotone_i32(f):
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
# rank (stable descending argsort + inverse permutation, fused)


def _rank_kernel(imp_ref, out_ref, *, bits: int, interpret: bool):
    p, l = imp_ref.shape
    key = _monotone_i32(imp_ref[...])
    idx = lax.broadcasted_iota(jnp.int32, (p, l), 0)
    _, order = _run((key, idx), _desc_tie_asc, idx, _schedule(p), interpret)
    # inverse permutation: one packed single-operand network (all keys
    # distinct -> plain ascending compare is already strict)
    packed = (order << bits) | idx
    (packed,) = _run((packed,), _asc, idx, _schedule(p), interpret)
    out_ref[...] = packed & ((1 << bits) - 1)


def _rank_pre_kernel(imp_ref, key_ref, ord_ref, *, interpret: bool):
    """Split form, stage 1: half-local prefix of the (key, idx) sort."""
    p, l = imp_ref.shape
    key = _monotone_i32(imp_ref[...])
    idx = _iota_block(p, l, True)
    pre, _, _ = _split_schedules(2 * p)
    key, order = _run((key, idx), _desc_tie_asc, idx, pre, interpret)
    key_ref[...] = key
    ord_ref[...] = order


def _rank_mid_kernel(key_ref, ord_ref, pk_ref, *, bits: int, interpret: bool):
    """Split form, stage 2: post-cross suffix of the (key, idx) sort,
    then the half-local prefix of the packed inverse sort."""
    p, l = key_ref.shape
    idx = _iota_block(p, l, True)
    pre, _, post = _split_schedules(2 * p)
    _, order = _run(
        (key_ref[...], ord_ref[...]), _desc_tie_asc, idx, post, interpret
    )
    packed = (order << bits) | idx
    (packed,) = _run((packed,), _asc, idx, pre, interpret)
    pk_ref[...] = packed


def _rank_post_kernel(pk_ref, out_ref, *, bits: int, interpret: bool):
    """Split form, stage 3: post-cross suffix of the inverse sort."""
    p, l = pk_ref.shape
    idx = _iota_block(p, l, True)
    _, _, post = _split_schedules(2 * p)
    (packed,) = _run((pk_ref[...],), _asc, idx, post, interpret)
    out_ref[...] = packed & ((1 << bits) - 1)


def _call(kernel, args, n_out, p: int, lt: int, b: int, halves: bool,
          interpret: bool, dtypes=None):
    """pallas_call wrapper: grid (halves?, lane tiles), [p_blk, lt]
    blocks of [P, B] operands."""
    p_blk = p // 2 if halves else p
    if halves:
        grid = (2, b // lt)
        spec = pl.BlockSpec(
            (p_blk, lt), lambda h, g: (h, g), memory_space=pltpu.VMEM
        )
    else:
        grid = (b // lt,)
        spec = pl.BlockSpec(
            (p_blk, lt), lambda g: (0, g), memory_space=pltpu.VMEM
        )
    outs = [
        jax.ShapeDtypeStruct((p, b), dt)
        for dt in (dtypes or [jnp.int32] * n_out)
    ]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=[spec] * n_out if n_out > 1 else spec,
        out_shape=outs if n_out > 1 else outs[0],
        interpret=interpret,
        compiler_params=None if interpret else _PARAMS,
    )(*args)
    return res


@functools.partial(jax.jit, static_argnames=("interpret",))
def ranks_kernel(flat, interpret: bool = False):
    """rank[i] = position of element i in a stable descending sort of
    ``flat`` along the last axis; == _inverse_perm(argsort(-flat)).
    flat: [B, P] f32 -> [B, P] i32."""
    b, p = flat.shape
    bits = int(p - 1).bit_length()
    lt = _lane_tile(p, b)
    imp_t = flat.T  # [P, B]: sort axis on sublanes, streams in lanes
    if p <= _CAP:
        out = _call(
            functools.partial(_rank_kernel, bits=bits, interpret=interpret),
            (imp_t,), 1, p, lt, b, False, interpret,
        )
        return out.T
    pre, cross, post = _split_schedules(p)
    key, order = _call(
        functools.partial(_rank_pre_kernel, interpret=interpret),
        (imp_t,), 2, p, lt, b, True, interpret,
    )
    key, order = _substage_xla((key, order), _desc_tie_asc, p, *cross)
    packed = _call(
        functools.partial(_rank_mid_kernel, bits=bits, interpret=interpret),
        (key, order), 1, p, lt, b, True, interpret,
    )
    (packed,) = _substage_xla((packed,), _asc, p, *cross)
    out = _call(
        functools.partial(_rank_post_kernel, bits=bits, interpret=interpret),
        (packed,), 1, p, lt, b, True, interpret,
    )
    return out.T


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


# --------------------------------------------------------------------------
# dispatch


def ranks_batched(flat, cfg):
    """Dispatch: in-VMEM kernel when the shape fits and kernels are on
    (same gate shape as codec.encoder._use_kernel), else the two-sort
    XLA path. Bit-identical either way."""
    import os

    from ulcx.utils.config import mosaic_interpret

    b, p = flat.shape
    use = (
        os.environ.get("ULCX_SORTK", "0") == "1"
        and cfg.use_pallas != "off"
        and sortable(p, b)
        # interpret mode runs the ~70-substage network eagerly —
        # minutes-slow at production P; fall back to the XLA sorts
        # (same gate shape as _assemble_v3_lanes)
        and not mosaic_interpret()
        and (cfg.use_pallas == "on" or jax.default_backend() not in ("cpu",))
    )
    if use:
        return ranks_kernel(flat, interpret=False)
    # XLA fallback: rank = inverse_perm(argsort(-flat)). argsort lowers
    # to a 2-operand (key, iota) sort; the inverse runs as ONE
    # 1-operand sort of the packed (order << bits | iota) int — exact,
    # ~half the sort traffic of a second argsort. This is the single
    # canonical implementation (the kernel reproduces it bit-exactly).
    order = jnp.argsort(-flat, axis=-1)
    bits = int(p - 1).bit_length()
    iota = jnp.arange(p, dtype=order.dtype)
    packed = (order << bits) | iota
    return jnp.sort(packed, axis=-1) & ((1 << bits) - 1)
