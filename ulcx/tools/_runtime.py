"""Shared CLI runtime setup: jit cache + platform override.

Referenced by all three tools (encode/decode/batch). Two env knobs:

- ``ULCX_JIT_CACHE``: persistent compilation cache directory
  (default ``~/.cache/ulcx-jit``) — CLI invocations recompile
  identical programs otherwise (~40 s per run on CPU, minutes on TPU).
- ``ULCX_PLATFORM``: jax platform selection (e.g. ``cpu``). This must
  be a *config* update, not the ``JAX_PLATFORMS`` env var: TPU plugin
  shims may call ``jax.config.update("jax_platforms", ...)`` at
  interpreter boot (sitecustomize), which silently overrides the env
  var — so ``JAX_PLATFORMS=cpu`` alone does not keep a CLI run off the
  accelerator. A config update made here, after import but before any
  backend is instantiated, wins.
"""

from __future__ import annotations

import os


def setup_cli_runtime() -> None:
    import jax

    plat = os.environ.get("ULCX_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    try:
        d = os.environ.get(
            "ULCX_JIT_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "ulcx-jit"),
        )
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
