"""Codec state checkpoint/resume.

The reference has no checkpointing, but its codec state *is* the
checkpoint (SURVEY.md §5): the encoder's sample/lap/transient carry
(reference include/ulcEncoder.h:64-77) and the decoder's inverse lap +
RNG (include/ulcDecoder.h:27-31, ulcDecoder.c:75-81). In ulcx those are
already pure pytrees (EncoderCarry / DecoderCarry), so checkpointing is
a flat .npz round trip — mid-stream encode/decode can stop on one host
and resume on another.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_carry(path: str, carry) -> None:
    """Save any codec carry pytree (Encoder/Decoder, single or batched)."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_carry(path: str, like):
    """Load a carry saved by save_carry; ``like`` provides the pytree
    structure and dtypes (e.g. EncoderCarry.init(cfg)). The stored
    treedef must match ``like``'s — a structure mismatch (e.g. loading
    an encoder carry as a decoder carry, or an old layout) raises
    instead of silently reinterpreting leaves."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    stored_def = bytes(data["__treedef__"]).decode()
    if stored_def != str(treedef):
        raise ValueError(
            "checkpoint pytree structure mismatch:\n"
            f"  stored:   {stored_def}\n  expected: {treedef}"
        )
    n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_stored != len(leaves):
        raise ValueError(
            f"checkpoint has {n_stored} leaves, expected {len(leaves)}"
        )
    loaded = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(ref.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {tuple(ref.shape)}"
            )
        loaded.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, loaded)
