"""xorshift32 jump-ahead over GF(2).

The decoder's noise RNG (xorshift32 shifts 13/17/5, process-global
seed 1234567, never reset — reference ulcDecoder.c:75-81) is a linear
map over GF(2)^32, so stepping it k times is multiplication by M^k.
Precomputing M^(2^j) for j < 32 lets a batch of seeds jump by
per-element counts in 32 conditional matrix applications — this is
what breaks the only remaining cross-block serial dependency when a
single stream's blocks are decoded as a batch
(ulcx.codec.decoder.decode_stream_pipelined): per-block draw counts
come out of the (cheap, serial) FSM pass, their exclusive prefix sums
give every block its exact RNG entry state.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def _step(x: np.uint64) -> np.uint64:
    x = (x ^ (x << np.uint64(13))) & np.uint64(0xFFFFFFFF)
    x = x ^ (x >> np.uint64(17))
    return (x ^ (x << np.uint64(5))) & np.uint64(0xFFFFFFFF)


@lru_cache(maxsize=1)
def _jump_tables() -> np.ndarray:
    """[32, 32] uint32: table[j][i] = column i of M^(2^j) (the image of
    basis vector e_i), with vectors packed as uint32."""
    cols = np.array(
        [_step(np.uint64(1) << np.uint64(i)) for i in range(32)], np.uint64
    )

    def matmat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        out = np.zeros(32, np.uint64)
        for i in range(32):
            v = int(b[i])
            r = 0
            for j in range(32):
                if (v >> j) & 1:
                    r ^= int(a[j])
            out[i] = r
        return out

    mats = [cols]
    for _ in range(31):
        mats.append(matmat(mats[-1], mats[-1]))
    return np.stack(mats).astype(np.uint32)


def jump(seed, count):
    """seed [..] uint32, count [..] integer >= 0 -> seed stepped
    ``count`` times (elementwise, exact)."""
    tables = jnp.asarray(_jump_tables())  # [32, 32] u32
    seed = seed.astype(jnp.uint32)
    count = count.astype(jnp.uint32)
    for b in range(32):
        r = jnp.zeros_like(seed)
        for i in range(32):
            r = r ^ jnp.where(
                (seed >> i) & 1 == 1, tables[b, i], jnp.uint32(0)
            )
        seed = jnp.where((count >> b) & 1 == 1, r, seed)
    return seed
