"""Degree-profile sweep for the production rungs around the 3%-QBER
operating point (n=16384, nb=32, layered min-sum).

The round-1 heuristic profile (qtpu.ldpc.codes.irregular_profile) uses
mb//2 degree-2 columns and a 2-column degree-8 tail.  Density-evolution
practice (Richardson-Urbanke irregular ensembles) wants the degree-2 node
count pushed to its cycle-safety limit (mb - 1) and a taller/heavier tail;
this script measures those variants head-to-head per rung.

Usage: python benchmarks/profile_sweep_prod.py [mb ...]   (default: 9 8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qtpu.ldpc.calibrate import measure_fer
from qtpu.ldpc.codes import RateStep, make_irregular_code, irregular_profile


def candidates(nb: int, mb: int) -> dict[str, list[int]]:
    n2 = mb - 1  # cycle-safety limit for degree-2 columns
    out = {"legacy": irregular_profile(nb, mb)}
    hi = min(mb, 12)
    out["max2_t2"] = [2] * n2 + [3] * (nb - n2 - 2) + [hi] * 2
    out["max2_t4"] = [2] * n2 + [3] * (nb - n2 - 4) + [min(mb, 10)] * 4
    n4 = 4
    out["max2_shoulder"] = ([2] * n2 + [3] * (nb - n2 - n4 - 2)
                            + [4] * n4 + [hi] * 2)
    out["max2_t3_d4body"] = ([2] * n2 + [3] * (nb - n2 - 6 - 3)
                             + [4] * 6 + [min(mb, 10)] * 3)
    return out


def main() -> None:
    n = 16384
    nb = 32
    z = n // nb
    mbs = [int(x) for x in sys.argv[1:]] or [9, 8]
    grid = [x / 400 for x in range(4, 41)]  # 1% .. 10%
    for mb in mbs:
        print(f"=== mb={mb} rate={1 - mb / nb:.5f} ===", flush=True)
        for name, prof in candidates(nb, mb).items():
            code = make_irregular_code(n, prof, mb=mb, z=z, seed=0xCAFE + mb)
            step = RateStep(name=name, code=code, punct_cols=(),
                            short_cols=())
            t0, best, it_best = time.time(), 0.0, 0.0
            for q in grid:
                fer, iters = measure_fer(step, q, blocks=256,
                                         seed=int(q * 1e6), alg="layered")
                if fer <= 0.05:
                    best, it_best = q, iters
                else:
                    break
            print(f"  {name:16s}: ceiling={best:.4f} iters={it_best:.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
