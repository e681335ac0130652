"""Targeted degree-profile sweep for one native rung (default: the rate-0.69
rung that carries the 3%-QBER operating point).

Each candidate is a column-degree profile at nb=32; ceilings measured under
the production layered min-sum decoder.

Usage: python benchmarks/profile_sweep_rung.py [n [mb]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qtpu.ldpc.calibrate import measure_fer
from qtpu.ldpc.codes import RateStep, make_irregular_code, irregular_profile


def candidates(nb: int, mb: int) -> dict[str, list[int]]:
    """Candidate profiles; every profile must keep deg-2 count <= mb - 1
    (the deg-2 subgraph must stay cycle-light) and sum to a reasonable
    average degree for min-sum."""
    n2max = mb - 1
    out = {"legacy": irregular_profile(nb, mb)}
    # More deg-2 mass + a taller high-degree tail (Richardson-Urbanke-ish).
    n2 = min(int(0.44 * nb), n2max)
    nhi = max(2, nb // 8)
    out["heavy2"] = [2] * n2 + [3] * (nb - n2 - nhi) + [min(mb, 10)] * nhi
    # Add a deg-4 shoulder between the body and the tail.
    n4 = max(2, nb // 8)
    n2b = min(int(0.40 * nb), n2max)
    nhi2 = max(2, nb // 10)
    out["shoulder"] = ([2] * n2b + [3] * (nb - n2b - n4 - nhi2)
                       + [4] * n4 + [min(mb, 10)] * nhi2)
    # Flatter: no deg-2 at all (min-sum sometimes prefers it at high rate).
    out["no2"] = [3] * (nb - 2) + [min(mb, 8)] * 2
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nb = 32
    z = n // nb
    grid = [x / 400 for x in range(1, 41)]
    for name, prof in candidates(nb, mb).items():
        code = make_irregular_code(n, prof, mb=mb, z=z, seed=0xCAFE + mb)
        step = RateStep(name=name, code=code, punct_cols=(), short_cols=())
        t0, best, it_best = time.time(), 0.0, 0.0
        for q in grid:
            fer, iters = measure_fer(step, q, blocks=256, seed=int(q * 1e6),
                                     alg="layered")
            if fer <= 0.05:
                best, it_best = q, iters
            else:
                break
        print(f"n={n} mb={mb} {name:9s}: ceiling={best:.4f} "
              f"iters={it_best:.1f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
