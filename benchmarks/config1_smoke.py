"""BASELINE config 1: (3,6)-regular rate-1/2, n=4096, min-sum, single block,
BSC @ QBER 2%, CPU — the golden-model smoke test."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from qtpu.ldpc.codes import make_regular_code
from qtpu.ldpc import golden

code = make_regular_code(4096)
rng = np.random.default_rng(1)
key = rng.integers(0, 2, code.n).astype(np.uint8)
bob = key ^ (rng.random(code.n) < 0.02).astype(np.uint8)
llr = golden.channel_llr(bob, 0.02).reshape(code.nb, code.z)
syn = golden.encode_syndrome(code, key)
t0 = time.perf_counter()
res = golden.decode(code, llr, syn, max_iters=60, alg="minsum")
dt = time.perf_counter() - t0
print(json.dumps({"config": 1, "converged": res.converged,
                  "iterations": res.iterations,
                  "key_exact": bool(np.array_equal(res.bits.reshape(-1), key)),
                  "decode_s": round(dt, 4)}))
