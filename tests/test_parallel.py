"""Mesh-sharded batch encode/decode on the 8-device virtual CPU mesh."""

import numpy as np
import jax

from __graft_entry__ import dryrun_multichip, entry


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8
    dryrun_multichip(8)


def test_entry_compiles():
    fn, args = entry()
    data, size, carry = jax.jit(fn)(*args)
    assert (np.asarray(size) > 0).all()
