"""Calibrate the production ladder: 7-rung native-family n=16384.

Dense native-rate rungs (1/32-rate grid, no puncturing) + measured
ceiling-vs-shortening curves = the lowest-leakage configuration found in
round-1/2 sweeps.  Prints the frozen-table lines for qtpu.ldpc.calibrate.

Usage: python benchmarks/calibrate_production.py [n ...]   (default 16384)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qtpu.ldpc.calibrate import calibrate_ladder, calibrate_short
from qtpu.ldpc.codes import PRODUCTION_RATES, make_rate_ladder


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [16384]
    for n in ns:
        ladder = make_rate_ladder(n, target_rates=PRODUCTION_RATES,
                                  family="native", alg="layered")
        print(f"production ladder n={n}: "
              f"{[round(s.effective_rate(), 4) for s in ladder.steps]}",
              flush=True)
        k = len(ladder.steps)
        ceilings = calibrate_ladder(ladder, verbose=True, alg="layered")
        print(f"  ({n}, 3, 'layered', 'native'): {{{k}: {ceilings}}},",
              flush=True)
        fracs, curves = calibrate_short(ladder, verbose=True, alg="layered")
        print(f"  ({n}, 3, 'layered', 'native'): {{{k}: ({fracs}, "
              f"{curves})}},", flush=True)


if __name__ == "__main__":
    main()
