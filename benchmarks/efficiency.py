"""Reconciliation-efficiency benchmark: f and secret fraction vs QBER.

The quality metric of QKD error correction (complementing the throughput
benchmarks): f = syndrome_leak / (payload * h2(q)) — 1.0 is Shannon-optimal —
and the net secret fraction on consumed sifted bits.  Runs the REAL two-party
loopback protocol (QBER handshake, fine rate adaptation, retries, PA), not a
bare decoder sweep.

Usage: python benchmarks/efficiency.py [n [blocks_per_window]]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from qtpu.pipeline import PipelineConfig, run_loopback


def h2(p: float) -> float:
    return float(-p * np.log2(p) - (1 - p) * np.log2(1 - p))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "production":
        from qtpu.pipeline import production_config
        cfg = production_config()
        n, bpw = cfg.n, cfg.blocks_per_window
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
        bpw = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        cfg = PipelineConfig(n=n, blocks_per_window=bpw,
                             qber_test_bits=8192)
    rng = np.random.default_rng(1)
    rows = []
    for q in (0.01, 0.02, 0.03, 0.05, 0.07):
        total = max(800_000, 8 * bpw * n)
        a_bits = rng.integers(0, 2, total).astype(np.uint8)
        b_bits = a_bits ^ (rng.random(total) < q).astype(np.uint8)
        t0 = time.time()
        alice, bob = run_loopback(cfg, a_bits, b_bits)
        ka, kb = alice.final_key_bits(), bob.final_key_bits()
        assert ka.size == kb.size and (ka == kb).all(), "keys differ"
        led = alice.ledger
        consumed = led.sifted_bits - alice.stream.remaining
        rows.append({
            "qber": q,
            "f": round(led.syndrome_bits / max(1, led.reconciled_bits) / h2(q), 3),
            "secret_fraction": round(led.final_bits / max(1, consumed), 4),
            "blocks_failed": led.blocks_failed,
            "windows": len(bob.metrics),
            "mean_iters": round(float(np.mean([m.iters_mean for m in bob.metrics])), 1),
            "wall_s": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"config": "efficiency", "n": n,
                      "blocks_per_window": bpw, "rows": rows}))


if __name__ == "__main__":
    main()
