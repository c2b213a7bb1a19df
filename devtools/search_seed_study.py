"""Offline study: how well does linear interpolation of round-1 ladder
sizes predict the CBR budget crossing?

The 8-candidate ladder needs ceil(log8 P) = 4 size rounds at P=4096 to
pin the max feasible n exactly. If the size(n) curve is near-linear
between round-1 samples, an interpolation-seeded round 2 can place its
candidates tightly around the predicted crossing and land within a
±few-coefficient window — cutting a full round (~6.4 ms of the ~84 ms
device budget at B=512/T=8). This measures the prediction error |n* -
n_true| on bench-like material so the round-2 candidate spread can be
sized to cover p99 (run on CPU, scan path only).

Usage: python devtools/search_seed_study.py [n_blocks] [block_size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from bench import make_corpus
from ulcx.bitstream.encode import encode_pass_size, prepare_block
from ulcx.codec.encoder import cbr_bit_budget
from ulcx.utils.config import CodecConfig


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    cfg = CodecConfig(rate_hz=44100, n_chan=2, block_size=bs)
    t = 2
    x = make_corpus(nb, t, bs)  # [B, T, C, N]

    from ulcx.analysis.block import EncoderCarry, analyze_block

    # per-stream analysis (scan path) to get BlockData per block
    budget = int(cbr_bit_budget(cfg, float(os.environ.get("ULCX_STUDY_KBPS", "128"))))
    size_f = jax.jit(lambda bd, k: encode_pass_size(bd, k, "segment"))
    ana_f = jax.jit(lambda c, x: analyze_block(c, x, cfg))
    prep_f = jax.jit(lambda blk: prepare_block(blk, cfg))

    errs, n_trues, finals = [], [], []
    for i in range(nb):
        carry = EncoderCarry.init(cfg)
        for tt in range(t):
            carry, blk = ana_f(carry, jnp.asarray(x[i, tt]))
        bd = prep_f(blk)
        n_nz = int(blk.n_nz)
        if n_nz < 16:
            continue
        # round 1: 8 candidates, ladder spacing over [0, n_nz]
        step = max((n_nz + 7) // 8, 1)
        cands = [min(step * j, n_nz) for j in range(1, 9)]
        sizes = [int(size_f(bd, jnp.int32(c))) for c in cands]
        feas = [s <= budget for s in sizes]
        if all(feas):
            continue  # budget unconstrained; search trivially ends
        if not any(feas):
            lo, slo = 0, 4 * 8  # header-ish floor
            hi, shi = cands[0], sizes[0]
        else:
            k = max(j for j in range(8) if feas[j])
            lo, slo = cands[k], sizes[k]
            hi, shi = cands[k + 1], sizes[k + 1]
        # linear interpolation of the crossing inside [lo, hi]
        if shi == slo:
            n_star = hi
        else:
            n_star = lo + (budget - slo) * (hi - lo) / (shi - slo)
        n_star = int(round(max(lo, min(n_star, hi))))
        # true crossing: max n in [lo, hi] with size <= budget (linear
        # scan in the bracket, coarse->fine to keep it cheap)
        t_lo, t_hi = lo, hi
        while t_hi - t_lo > 1:
            mid = (t_lo + t_hi) // 2
            if int(size_f(bd, jnp.int32(mid))) <= budget:
                t_lo = mid
            else:
                t_hi = mid
        n_true = t_lo
        errs.append(n_star - n_true)
        n_trues.append(n_true)

        # end-to-end schedule emulation: gap-scaled seeded round +
        # adaptive-spacing final round (mirrors _bracket_search /
        # _final_cands integer math)
        from ulcx.bitstream.fast_encode import _SEED_W

        s_lo2, s_hi2 = slo, shi
        gap = (hi + 1) - lo  # fbad - lo, fbad = hi + 1
        den = max(s_hi2 - s_lo2, 1)
        n_star_i = lo + (budget - s_lo2) * gap // den
        n_star_i = max(lo, min(n_star_i, hi))
        sc = sorted(
            set(
                max(lo, min(n_star_i + ((gap * int(w)) >> 8), hi))
                for w in _SEED_W[8]
            )
        )
        s2 = {c: int(size_f(bd, jnp.int32(c))) for c in sc}
        feas2 = [c for c in sc if s2[c] <= budget]
        lo2 = max(feas2) if feas2 else lo
        bad2 = [c for c in sc if s2[c] > budget]
        hi2 = min(hi, min(bad2) - 1) if bad2 else hi
        hi2 = max(hi2, lo2)
        sp = max(1, -(-(hi2 - lo2) // 7))
        fc = [min(lo2 + sp * j, hi2) for j in range(8)]
        s3 = {c: int(size_f(bd, jnp.int32(c))) for c in fc}
        feas3 = [c for c in fc if s3[c] <= budget]
        n_sel = max(feas3) if feas3 else lo2
        finals.append(n_sel - n_true)

    e = np.abs(np.asarray(errs))
    print(f"blocks measured: {len(errs)} (bs={bs}, budget={budget})")
    if len(e):
        print(
            "abs err    mean %.1f  p50 %.0f  p90 %.0f  p99 %.0f  max %.0f"
            % (e.mean(), *np.percentile(e, [50, 90, 99]), e.max())
        )
        print("signed err mean %.1f" % np.mean(errs))
        print("n_true     p50 %.0f" % np.percentile(n_trues, 50))
        f = np.asarray(finals)
        print(
            "final n_sel-n_true: exact %d%%  p50 %.0f  p1 %.0f  min %.0f"
            % (100 * np.mean(f == 0), *np.percentile(f, [50, 1]), f.min())
        )
        assert (f <= 0).all(), "selected above true max-feasible?!"


if __name__ == "__main__":
    main()
