"""BASELINE config 3: the puncture/shorten ladder (mixed family) — FER of
every rung at its calibrated QBER ceiling."""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from qtpu.ldpc.calibrate import measure_fer
from qtpu.ldpc.codes import make_rate_ladder

ladder = make_rate_ladder(4096)
rows = []
for idx, step in enumerate(ladder.steps):
    q = ladder.max_qber[idx] if ladder.max_qber else 0.02
    if q <= 0:
        continue
    fer, iters = measure_fer(step, q, blocks=256, seed=idx)
    rows.append({"rung": step.name, "rate_eff": round(step.effective_rate(), 4),
                 "qber": q, "fer": round(fer, 4), "iters_mean": round(iters, 1),
                 "leak_per_payload": round(step.leaked_bits() / step.payload_bits(), 4)})
print(json.dumps({"config": 3, "rungs": rows}))
