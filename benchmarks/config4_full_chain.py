"""BASELINE config 4: the full streaming chain at TPU scale.

Measures end-to-end reconciliation throughput of the production two-party
pipeline — QBER handshake, rate selection, framing, syndrome encode, batched
BP decode (Pallas on TPU), verification hashes, blind retry, Toeplitz PA,
leakage ledger — with BOTH parties' device work on one chip (pessimistic:
a deployment gives each party its own chips).

Usage: python benchmarks/config4_full_chain.py [WINDOWS] [QBER]
Also importable: ``measure_full_chain()`` (used by bench.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure_full_chain(windows: int = 24, qber: float = 0.03,
                       warmup_windows: int = 3, seed: int = 7,
                       config=None) -> dict:
    from qtpu.pipeline import production_config, AliceSession, BobSession
    from qtpu.link import make_loopback_pair

    cfg = config or production_config()
    per_window = cfg.qber_segment_bits + cfg.n * cfg.blocks_per_window
    total_bits = (windows + warmup_windows + 1) * per_window
    rng = np.random.default_rng(seed)
    a_bits = rng.integers(0, 2, total_bits).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(total_bits) < qber).astype(np.uint8)

    la, lb = make_loopback_pair()
    alice = AliceSession(cfg, 0x5E55, la)
    bob = BobSession(cfg, 0x5E55, lb)
    alice.push_sifted(a_bits)
    bob.push_sifted(b_bits)

    def pump_until(n_windows: int) -> None:
        for _ in range(1_000_000):
            progressed = False
            if bob.window_id >= n_windows:
                return
            if alice.can_start_window():
                alice.start_window()
                progressed = True
            m = lb.recv()
            if m is not None:
                bob.on_message(m)
                progressed = True
            m = la.recv()
            if m is not None:
                alice.on_message(m)
                progressed = True
            if not progressed and bob.flush():
                progressed = True
            if not progressed:
                return

    # Warmup: compiles the selected rung's programs (slow on the tunnel).
    pump_until(warmup_windows)
    assert bob.window_id >= warmup_windows, "warmup did not complete"
    consumed0 = alice.ledger.sifted_bits - len(alice.buffer)
    final0 = bob.ledger.final_bits
    t0 = time.perf_counter()
    pump_until(warmup_windows + windows)
    dt = time.perf_counter() - t0
    measured = bob.window_id - warmup_windows
    consumed = alice.ledger.sifted_bits - len(alice.buffer) - consumed0
    final = bob.ledger.final_bits - final0
    # Drain (outside the timed region): the timed loop stops as soon as Bob
    # completes the target window, which may leave Alice's final ack queued.
    for _ in range(1000):
        m = la.recv()
        if m is None:
            break
        alice.on_message(m)
    assert np.array_equal(alice.final_key_bits(), bob.final_key_bits())
    mets = bob.metrics[warmup_windows:]
    return {
        "windows": measured,
        "elapsed_s": round(dt, 4),
        "sifted_bits_per_s": round(consumed / dt, 1),
        "secret_bits_per_s": round(final / dt, 1),
        "secret_fraction": round(final / max(1, consumed), 4),
        "window_ms": round(1e3 * dt / max(1, measured), 3),
        "iters_mean": round(float(np.mean([m.iters_mean for m in mets])), 2),
        "fer": round(1.0 - sum(m.blocks_ok for m in mets)
                     / max(1, sum(m.blocks for m in mets)), 5),
    }


def main() -> None:
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    qber = float(sys.argv[2]) if len(sys.argv) > 2 else 0.03
    out = measure_full_chain(windows=windows, qber=qber)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
