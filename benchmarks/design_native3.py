"""Optimize one rung's punctured protograph with protograph DE ("native3").

Usage: python benchmarks/design_native3.py MB P [NB] [ROUNDS] [SEED] [INIT]

MB: base rows; P: punctured (state) columns — by convention the last P
column indices; NB: base columns (default 32).  INIT: path to a previous
result JSON to warm-start from.

Writes the designed base graph + its DE threshold to
benchmarks/out/native3_nb{NB}_mb{MB}_p{P}.json; winners get frozen into
qtpu/ldpc/designed.py (protocol configuration, like the calibration tables).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qtpu.ldpc.design import optimize_base_graph, proto_threshold


def main() -> None:
    mb = int(sys.argv[1])
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 11
    init = None
    if len(sys.argv) > 6:
        rec = json.load(open(sys.argv[6]))
        init = (np.asarray(rec["edge_row"]), np.asarray(rec["edge_col"]))
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"native3_nb{nb}_mb{mb}_p{p}.json")

    rate_eff = 1.0 - (mb - p) / (nb - p)
    t0 = time.time()
    rows, cols, t_opt = optimize_base_graph(nb, mb, rounds=rounds, seed=seed,
                                            num_punct=p, init=init,
                                            verbose=True)
    rec = {
        "nb": nb, "mb": mb, "num_punct": p, "seed": seed, "rounds": rounds,
        "rate_eff": rate_eff, "threshold_opt": t_opt,
        "edge_row": [int(x) for x in rows],
        "edge_col": [int(x) for x in cols],
        "elapsed_s": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f)
    print(f"nb={nb} mb={mb} p={p} (rate_eff {rate_eff:.4f}): threshold "
          f"{t_opt:.4f} E={len(rows)} ({rec['elapsed_s']}s) -> {out_path}",
          flush=True)


if __name__ == "__main__":
    main()
