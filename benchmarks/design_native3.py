"""Optimize one rung's base graph with protograph DE (the "native3" family).

Usage: python benchmarks/design_native3.py MB [NB] [ROUNDS] [SEED]

Writes the designed base graph + its DE threshold to
benchmarks/out/native3_nb{NB}_mb{MB}.json; the winners get frozen into
qtpu/ldpc/designed.py (protocol configuration, like the calibration tables).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qtpu.ldpc.design import optimize_base_graph, proto_threshold
from qtpu.ldpc.codes import make_irregular_code, irregular_profile_v2


def main() -> None:
    mb = int(sys.argv[1])
    nb = int(sys.argv[2]) if len(sys.argv) > 3 or (len(sys.argv) > 2 and int(sys.argv[2]) > 20) else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 11
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"native3_nb{nb}_mb{mb}.json")

    # Baseline: the native2 (irregular_profile_v2) base graph this replaces.
    base = make_irregular_code(nb * 8, irregular_profile_v2(nb, mb), mb=mb,
                               z=8, seed=0x0AD0 + mb)
    t0 = time.time()
    t_base = proto_threshold(base.edge_row, base.edge_col)
    print(f"nb={nb} mb={mb}: native2 baseline threshold {t_base:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    rows, cols, t_opt = optimize_base_graph(nb, mb, rounds=rounds, seed=seed,
                                            verbose=True)
    rec = {
        "nb": nb, "mb": mb, "seed": seed, "rounds": rounds,
        "threshold_native2": t_base, "threshold_opt": t_opt,
        "edge_row": [int(x) for x in rows],
        "edge_col": [int(x) for x in cols],
        "elapsed_s": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f)
    print(f"nb={nb} mb={mb}: optimized {t_base:.4f} -> {t_opt:.4f} "
          f"E={len(rows)} ({rec['elapsed_s']}s) -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
