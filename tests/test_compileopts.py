"""ULCX_COMPILE_EFFORT knob (ulcx/utils/compileopts.py): parsing and
that jax.jit actually accepts the produced options dict."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax
from ulcx.utils.compileopts import jit_options


def test_parse(monkeypatch):
    monkeypatch.delenv("ULCX_COMPILE_EFFORT", raising=False)
    assert jit_options() is None
    monkeypatch.setenv("ULCX_COMPILE_EFFORT", "lo")
    assert jit_options() == {"exec_time_optimization_effort": -1.0}
    monkeypatch.setenv("ULCX_COMPILE_EFFORT", "hi")
    assert jit_options() == {"exec_time_optimization_effort": 1.0}
    monkeypatch.setenv("ULCX_COMPILE_EFFORT", "-0.25")
    assert jit_options() == {"exec_time_optimization_effort": -0.25}
    monkeypatch.setenv("ULCX_COMPILE_EFFORT", "fast")
    with pytest.raises(ValueError):
        jit_options()


def test_caller_default(monkeypatch):
    """The tools pass default='lo'; env overrides it either way."""
    monkeypatch.delenv("ULCX_COMPILE_EFFORT", raising=False)
    assert jit_options(default="lo") == {
        "exec_time_optimization_effort": -1.0
    }
    monkeypatch.setenv("ULCX_COMPILE_EFFORT", "default")
    assert jit_options(default="lo") is None
    monkeypatch.setenv("ULCX_COMPILE_EFFORT", "0.0")
    assert jit_options(default="lo") == {
        "exec_time_optimization_effort": 0.0
    }


def test_jit_accepts_options(monkeypatch):
    monkeypatch.setenv("ULCX_COMPILE_EFFORT", "lo")
    f = jax.jit(lambda x: x * 2 + 1, compiler_options=jit_options())
    np.testing.assert_array_equal(
        np.asarray(f(jnp.arange(4))), np.arange(4) * 2 + 1
    )
