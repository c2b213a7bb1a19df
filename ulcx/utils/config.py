"""Codec configuration.

The reference's only configuration is three compile-time feature flags
(reference include/ulcEncoder.h:9-33: ULC_USE_PSYCHOACOUSTICS,
ULC_USE_NOISE_CODING, ULC_USE_WINDOW_SWITCHING) plus the CLI parameters
(rate mode, block size, output PCM format). Here they are one runtime
dataclass; everything is static from XLA's point of view (baked into the
jitted program), so toggling a flag triggers a recompile, exactly like
the reference's #ifdef but without rebuilding.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property


MIN_CHANS = 1
MAX_CHANS = 255
MIN_BANDS = 256          # reference libulc/ulcEncoder.c:20 (transient detector limit)
MAX_BANDS = 32768
MAX_BLOCK_DECIMATION_FACTOR = 8   # reference include/ulcEncoder.h:30
MAX_SUBBLOCKS = 4
COEF_EPS = 2.0 ** -31    # reference include/ulcEncoder.h:36

N_BARK_BANDS = 25


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Static codec parameters shared by encoder and decoder.

    Mirrors the reference's ULC_EncoderState_t globals (RateHz, nChan,
    BlockSize; reference include/ulcEncoder.h:47-52) plus the three
    feature flags as runtime switches.
    """

    rate_hz: int = 44100
    n_chan: int = 2
    block_size: int = 2048
    use_psychoacoustics: bool = True
    use_noise_coding: bool = True
    use_window_switching: bool = True
    # Transform backend: "matmul" uses MXU cosine-matrix products (exact,
    # fastest for block sizes <= matmul_max_n), "fact" factorizes the
    # DCT-IV into two small matmul stages via an M=N/2 Cooley-Tukey FFT
    # (~N^1.5 MACs, KiB-scale constants — the fast choice for large
    # blocks), "fft" uses jnp.fft (O(N log N), kept for A/B), "auto"
    # picks per subblock size (matmul below matmul_max_n, fact above).
    transform_backend: str = "auto"
    # 2048: the n=4096 cosine matrices alone are ~67 MB of f32 program
    # constants (x2 for DST), which overflows the remote-compile
    # payload limit on the tunneled backend; FFT takes over above this
    matmul_max_n: int = 2048
    # CBR/ABR rate search: "ladder" evaluates 16 candidates per scan
    # round (TPU-native, exact under monotone Size(n)); "bisect"
    # replicates the reference's sequential bisection step-for-step.
    rate_search: str = "ladder"
    # Noise-run amplitude analysis window: "segment" averages the noise
    # spectrum over min(seg_end - pos, 527) lines — candidate-independent,
    # which makes the whole noise decision precomputable once per block
    # (the TPU-native choice). "gap" replicates the reference exactly
    # (window = min(gap_len, 527); reference ulcEncoder_Encode.c:150-153),
    # at the cost of a per-candidate recompute. Both windows coincide
    # whenever the gap runs to the end of the [sub]block; levels differ
    # by at most ~1 quantization step otherwise (measured corpus impact
    # <= 0.114% size / <= 0.12 dB, PARITY.md §2).
    #
    # LOUD NOTE — "gap" is SCAN-ONLY: the run end is candidate-dependent
    # state the streaming kernels cannot address (a dynamic sublane read
    # into the prefix-sum planes, which Mosaic does not support), so
    # "gap" disables the Pallas fast path regardless of use_pallas
    # (ValueError under use_pallas="on" rather than a silent fallback).
    noise_run_window: str = "segment"
    # Fused Pallas bitstream kernels: "auto" uses them on TPU backends
    # whenever the shape constraints hold (P <= 32768, batch % 8 == 0,
    # segment noise window); "on" forces them (interpret mode off-TPU)
    # and raises ValueError on shapes outside the kernel envelope
    # (never a silent fallback); "off" always uses the XLA scan path.
    use_pallas: str = "auto"
    # Whole-chunk pipeline shape: fold the block axis T into the batch
    # (scan only over window control). Byte-identical to the per-block
    # scan (tests/test_stream_flat.py) but measured ~15% slower
    # end-to-end on the round-2 chip (NOTES.md) — kept as an A/B-able
    # alternative; default off.
    flat_stream: bool = False
    # Fold the BITSTREAM stages (prepare/rate-search/materialize/
    # assemble) over chunks of fold_bitstream blocks while analysis
    # stays a per-block scan: the kernel pipeline then launches once
    # per chunk at fold*B streams instead of once per block — fewer
    # Pallas launches and ladder-glue dispatches, identical bytes
    # (per-stream independence). 1 = off (per-block, the measured
    # round-3 configuration); memory for the kernel state planes scales
    # with fold*B.
    fold_bitstream: int = 1

    def __post_init__(self):
        if not (MIN_CHANS <= self.n_chan <= MAX_CHANS):
            raise ValueError(f"n_chan must be in [{MIN_CHANS},{MAX_CHANS}], got {self.n_chan}")
        bs = self.block_size
        if not (MIN_BANDS <= bs <= MAX_BANDS) or (bs & (bs - 1)) != 0:
            raise ValueError(f"block_size must be a power of 2 in [{MIN_BANDS},{MAX_BANDS}], got {bs}")
        if self.rate_hz < 1:
            raise ValueError(f"rate_hz must be >= 1, got {self.rate_hz}")
        if self.transform_backend not in ("auto", "matmul", "fact", "fft"):
            raise ValueError(f"bad transform_backend {self.transform_backend!r}")
        if self.rate_search not in ("ladder", "bisect"):
            raise ValueError(f"bad rate_search {self.rate_search!r}")
        if self.noise_run_window not in ("segment", "gap"):
            raise ValueError(f"bad noise_run_window {self.noise_run_window!r}")
        if self.use_pallas not in ("auto", "on", "off"):
            raise ValueError(f"bad use_pallas {self.use_pallas!r}")
        if self.noise_run_window == "gap" and self.use_pallas == "on":
            raise ValueError(
                "noise_run_window='gap' is scan-only (the C-exact run "
                "window is candidate-dependent state the streaming "
                "kernels cannot address); use use_pallas='auto'/'off' "
                "with it, or the default 'segment' window for the fast "
                "path (corpus impact <= 0.114% size, PARITY.md §2)"
            )
        if not (isinstance(self.fold_bitstream, int) and self.fold_bitstream >= 1):
            raise ValueError(
                f"fold_bitstream must be an int >= 1, got {self.fold_bitstream!r}"
            )

    @cached_property
    def max_decimation(self) -> int:
        return MAX_BLOCK_DECIMATION_FACTOR if self.use_window_switching else 1

    @cached_property
    def subblock_sizes(self) -> tuple[int, ...]:
        """All possible subblock sizes (block_size >> {0,1,2,3})."""
        if not self.use_window_switching:
            return (self.block_size,)
        return tuple(self.block_size >> s for s in range(4))

    def transform_for(self, n: int) -> str:
        """Backend name for a length-n DCT-IV/DST-IV."""
        if self.transform_backend != "auto":
            return self.transform_backend
        return "matmul" if n <= self.matmul_max_n else "fact"


def mosaic_interpret() -> bool:
    """Pallas interpret-mode default: on CPU backends the kernels run
    interpreted (tests), on TPU they compile via Mosaic. ULCX_FORCE_
    MOSAIC=1 overrides to compiled form even when the default backend
    is CPU — used by devtools/aot_check.py, which AOT-compiles the
    production pipeline against a deviceless v5e TopologyDescription
    to validate Mosaic acceptance and measure compile cost without a
    chip."""
    import os

    import jax

    if os.environ.get("ULCX_FORCE_MOSAIC") == "1":
        return False
    return jax.default_backend() in ("cpu",)
