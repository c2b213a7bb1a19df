from ulcx.ops.fastlog import fast_log  # noqa: F401
from ulcx.ops.dct import dct4, dst4  # noqa: F401
from ulcx.ops.patterns import (  # noqa: F401
    decimation_pattern,
    PATTERN_TABLE,
    pattern_subblock_shifts,
    pattern_transient_flags,
    pattern_n_subblocks,
)
from ulcx.ops.quant import (  # noqa: F401
    companded_quantize_unsigned,
    companded_quantize,
    companded_quantize_coef,
)
