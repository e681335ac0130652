"""Code-family exploration: QBER ceilings for candidate mother codes.

Compares (a) block length n=4096 vs 16384, (b) base-graph granularity
nb=16/32/64, (c) irregular degree profiles, under the production layered
min-sum decoder.  Informs the default ladder families (qtpu.ldpc.codes).

Usage: python benchmarks/profile_sweep.py [rate ...]   (default 0.5 0.7)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from qtpu.ldpc.calibrate import measure_fer
from qtpu.ldpc.codes import (RateStep, make_irregular_code, make_regular_code,
                             irregular_profile)


def ceiling(step, alg="layered", blocks=256, fer_target=0.05, q_hi=0.13):
    grid = [x / 400 for x in range(1, int(q_hi * 400) + 1)]
    best, iters_at_best = 0.0, 0.0
    for q in grid:
        fer, iters = measure_fer(step, q, blocks=blocks, seed=int(q * 1e6),
                                 alg=alg)
        if fer <= fer_target:
            best, iters_at_best = q, iters
        else:
            break
    return best, iters_at_best


def profile_counts(nb, mb, kind):
    """Column-degree profiles at base granularity nb for design rate 1-mb/nb."""
    if kind == "reg3":
        return [3] * nb
    if kind == "legacy":
        return irregular_profile(nb, mb)
    if kind == "rich":
        # Denser irregular recipe: ~40% deg-2 (capped at mb-1 total), a
        # high-degree tail ~10%, deg-3 body.
        n2 = min(int(0.40 * nb), mb - 1)
        nhi = max(2, nb // 10)
        hi = min(mb, 10)
        return [2] * n2 + [3] * (nb - n2 - nhi) + [hi] * nhi
    if kind == "rich35":
        n2 = min(int(0.35 * nb), mb - 1)
        nhi = max(2, nb // 8)
        hi = min(mb, 8)
        return [2] * n2 + [3] * (nb - n2 - nhi) + [hi] * nhi
    raise ValueError(kind)


def main():
    rates = [float(x) for x in sys.argv[1:]] or [0.5, 0.7]
    cases = []
    for r in rates:
        for n in (4096, 16384):
            for nb in (16, 32):
                mb = int(round(nb * (1 - r)))
                z = n // nb
                for kind in ("reg3", "legacy", "rich", "rich35"):
                    if kind == "reg3":
                        dc = round(3 * nb / mb)
                        if 3 * nb != dc * mb:
                            continue  # regular needs exact divisibility
                        code = make_regular_code(n, 3, dc, z=z, seed=0xBEEF)
                    else:
                        prof = profile_counts(nb, mb, kind)
                        code = make_irregular_code(n, prof, mb=mb, z=z,
                                                   seed=0xBEEF)
                    cases.append((r, n, nb, kind, code))
    for r, n, nb, kind, code in cases:
        step = RateStep(name=f"r{r}", code=code, punct_cols=(), short_cols=())
        t0 = time.time()
        c, it = ceiling(step)
        print(f"rate={r} n={n:5d} nb={nb} {kind:7s}: ceiling={c:.4f} "
              f"iters@ceiling={it:.1f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
