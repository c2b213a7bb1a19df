"""Top-level XLA compile-effort knob.

Cold-start compile of the full batched encode graph costs minutes at
XLA's default optimization effort (AOT figures in NOTES.md: 182-245 s
deviceless for the headline configs). XLA exposes a documented effort
scale via compiler options; ``exec_time_optimization_effort=-1.0``
compiles the same VBR encode module in 27.9 s (6.5x less) — the
runtime cost is measured on hardware by bench.py A/B (NOTES.md round-4
log) and the knob is applied only where the caller opts in.

Measured trade (chip bench, stereo CBR-128 bs2048 B=512 T=64):
  effort default: encode 2602.7x rt   AOT compile 244.5 s
  effort -0.5:    encode 1478.5x (-43%)            113.8 s
  effort -1.0:    encode 1297.4x (-50%)             27.9 s
So sub-zero effort is NEVER the default for throughput paths (bench,
batch_tool). It IS the right default for the single-file CLI tools:
a 3-minute WAV is < 1 s of chip compute even at the -1.0 throughput,
while the compile saving is minutes of user-visible cold latency —
the tools pass default="lo".

Env: ULCX_COMPILE_EFFORT
  unset / ""     -> the caller's default (None = XLA default effort)
  "default"      -> None (force XLA default, overriding a caller's lo)
  "lo"           -> exec_time_optimization_effort = -1.0
  "hi"           -> +1.0
  a float string -> that value
"""

from __future__ import annotations

import os

_NAMED = {"lo": -1.0, "hi": 1.0}


def jit_options(default: str | None = None) -> dict | None:
    """compiler_options dict for jax.jit, or None for XLA defaults."""
    v = os.environ.get("ULCX_COMPILE_EFFORT", "").strip() or (default or "")
    if not v or v == "default":
        return None
    effort = _NAMED.get(v)
    if effort is None:
        try:
            effort = float(v)
        except ValueError:
            raise ValueError(
                f"ULCX_COMPILE_EFFORT={v!r}: use 'lo', 'hi', or a float"
            ) from None
    return {"exec_time_optimization_effort": effort}
