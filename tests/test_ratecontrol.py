"""Rate-control: ladder search vs reference-style bisection."""

import numpy as np
import jax
import jax.numpy as jnp

from test_encode_pass import synth_block, CFG, N, C
from ulcx.bitstream.encode import prepare_block, encode_pass_size
from ulcx.codec.encoder import _cbr_search, _cbr_search_ladder, cbr_bit_budget


def test_ladder_matches_bisection(rng):
    lad = jax.jit(lambda bd, nz, bud: _cbr_search_ladder(bd, nz, bud, CFG))
    bis = jax.jit(lambda bd, nz, bud: _cbr_search(bd, nz, bud, CFG))
    size_f = jax.jit(lambda bd, n: encode_pass_size(bd, n))
    for trial, kbps in enumerate([64.0, 128.0, 256.0, 32.0]):
        blk, *_ = synth_block(rng, 0x10, sparsity=0.3)
        bd = prepare_block(blk, CFG)
        budget = cbr_bit_budget(CFG, kbps)
        n_l = int(lad(bd, blk.n_nz, budget))
        n_b = int(bis(bd, blk.n_nz, budget))
        s_l = int(size_f(bd, jnp.int32(n_l)))
        s_b = int(size_f(bd, jnp.int32(n_b)))
        assert s_l <= int(budget) or n_l == 0, (kbps, n_l, s_l)
        # ladder finds the max feasible n; bisection may stop slightly
        # below on non-monotone spots — ladder must never be worse
        assert s_l >= s_b or n_l >= n_b, (kbps, n_l, n_b, s_l, s_b)
        assert abs(n_l - n_b) <= max(4, 0.02 * max(n_b, 1)), (kbps, n_l, n_b)
