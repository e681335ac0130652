"""Degree-profile optimizer for native-rate rungs.

Measured (not analytic) profile search: each candidate column-degree profile
is lifted into a QC code and its FER<=target QBER ceiling is measured under
the production layered min-sum decoder (qtpu.ldpc.calibrate.measure_fer).
Density-evolution-optimal profiles (Richardson-Urbanke) inform the candidate
shapes — more degree-2 mass (capped at mb-1 so the deg-2 subgraph stays
cycle-light), a deg-4 shoulder, and a taller high-degree tail — but the
winner is whatever measures best at finite length under min-sum, which is
what the production ladder actually runs (SURVEY.md §8 "hard parts").

Usage:
  python benchmarks/profile_opt.py <n> <mb> [nb] [--blocks B] [--seeds k]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qtpu.ldpc.calibrate import measure_fer
from qtpu.ldpc.codes import RateStep, make_irregular_code, irregular_profile

GRID = [x / 800 for x in range(1, 120)]  # 0.125% steps


def ceiling(step: RateStep, blocks: int, guess: float, fer_target: float = 0.05,
            seed: int = 0) -> tuple[float, float]:
    """Largest grid QBER with FER <= target (walk up/down from guess)."""
    gi = min(range(len(GRID)), key=lambda i: abs(GRID[i] - guess))
    fer, iters = measure_fer(step, GRID[gi], blocks, seed=seed + gi,
                             alg="layered")
    if fer <= fer_target:
        best, it_best = GRID[gi], iters
        for i in range(gi + 1, len(GRID)):
            fer, iters = measure_fer(step, GRID[i], blocks, seed=seed + i,
                                     alg="layered")
            if fer > fer_target:
                break
            best, it_best = GRID[i], iters
        return best, it_best
    for i in range(gi - 1, -1, -1):
        fer, iters = measure_fer(step, GRID[i], blocks, seed=seed + i,
                                 alg="layered")
        if fer <= fer_target:
            return GRID[i], iters
    return 0.0, 0.0


def norm(prof: list[int], nb: int) -> list[int]:
    assert len(prof) == nb, f"profile length {len(prof)} != nb={nb}"
    return sorted(prof)


def candidates(nb: int, mb: int) -> dict[str, list[int]]:
    n2max = mb - 1           # deg-2 subgraph must stay cycle-light
    dmax = mb                # a simple base column has at most mb edges
    out: dict[str, list[int]] = {}
    out["legacy"] = irregular_profile(nb, mb)
    frac = max(1, nb // 32)  # scale counts with base-graph size
    # Max deg-2 mass, deg-3 body, short max-degree tail.
    n2 = min(max(4, int(0.40 * nb)), n2max)
    out["d2max"] = norm([2] * n2 + [3] * (nb - n2 - 2 * frac)
                        + [dmax] * (2 * frac), nb)
    # Max deg-2, deg-4 shoulder, taller tail (RU-shaped).
    n4 = max(2, nb // 8)
    nhi = max(2, nb // 10)
    body = nb - n2 - n4 - nhi
    out["ru"] = norm([2] * n2 + [3] * body + [4] * n4 + [dmax] * nhi, nb)
    # Wider tail mass.
    out["tail+"] = norm([2] * n2 + [3] * (nb - n2 - 3 * frac)
                        + [dmax] * (3 * frac), nb)
    # Leaner: deg-2 + deg-3 + shoulder only (low avg degree).
    out["lean"] = norm([2] * n2 + [3] * (nb - n2 - n4) + [4] * n4, nb)
    # Half-tail degree (tail at ~mb/2 — cheaper edges, often enough).
    dh = max(5, dmax // 2)
    out["ru-half"] = norm([2] * n2 + [3] * body + [4] * n4 + [dh] * nhi, nb)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int)
    ap.add_argument("mb", type=int)
    ap.add_argument("nb", type=int, nargs="?", default=32)
    ap.add_argument("--blocks", type=int, default=256)
    ap.add_argument("--seeds", type=int, default=1,
                    help="construction seeds per profile (min ceiling wins)")
    ap.add_argument("--guess", type=float, default=None)
    args = ap.parse_args()
    n, mb, nb = args.n, args.mb * (args.nb // 32), args.nb
    z = n // nb
    guess = args.guess or 0.03
    print(f"n={n} nb={nb} mb={mb} z={z} rate={1 - mb / nb:.4f} "
          f"blocks={args.blocks}", flush=True)
    results = []
    for name, prof in candidates(nb, mb).items():
        ceils = []
        for si in range(args.seeds):
            code = make_irregular_code(n, prof, mb=mb, z=z,
                                       seed=0xCAFE + mb + 7919 * si)
            step = RateStep(name=name, code=code, punct_cols=(),
                            short_cols=())
            t0 = time.time()
            c, iters = ceiling(step, args.blocks, guess, seed=1000 * si)
            ceils.append(c)
            print(f"  {name:10s} seed{si}: ceiling={c:.4f} iters={iters:.1f} "
                  f"E={code.num_edges} ({time.time() - t0:.0f}s)", flush=True)
        results.append((min(ceils), name, prof))
    results.sort(reverse=True)
    print("\nranking:")
    for c, name, prof in results:
        hist = {}
        for d in prof:
            hist[d] = hist.get(d, 0) + 1
        print(f"  {c:.4f} {name:10s} {hist}")


if __name__ == "__main__":
    main()
