"""Calibrate the native2 (optimized-profile) 7-rung production ladder.

Same procedure as calibrate_production.py but for family="native2"
(irregular_profile_v2 mothers).  Prints the frozen-table lines for
qtpu.ldpc.calibrate.DEFAULT_CALIBRATION / DEFAULT_SHORT_CALIBRATION.

Usage: python benchmarks/calibrate_native2.py [n ...]   (default 16384)
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
                                  family="native2", alg="layered")
        print(f"native2 ladder n={n}: "
              f"{[round(s.effective_rate(), 4) for s in ladder.steps]}",
              flush=True)
        k = len(ladder.steps)
        ceilings = calibrate_ladder(ladder, verbose=True, alg="layered")
        print(f"  ({n}, 3, 'layered', 'native2'): {{{k}: {ceilings}}},",
              flush=True)
        fracs, curves = calibrate_short(ladder, verbose=True, alg="layered")
        print(f"  ({n}, 3, 'layered', 'native2'): {{{k}: ({fracs}, "
              f"{curves})}},", flush=True)


if __name__ == "__main__":
    main()
