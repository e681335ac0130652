"""BASELINE config 4: the full streaming chain at TPU scale.

Measures end-to-end reconciliation throughput of the production two-party
pipeline — window open, prior-driven rate selection, device framing, syndrome
encode, batched BP decode (Pallas on TPU), inline QBER disclosure+pinning,
verification hashes, blind retry, Toeplitz PA, bit-packed key drain, leakage
ledger — with BOTH parties' device work on one chip (pessimistic: a
deployment gives each party its own chips).

The sifted stream is generated ON DEVICE (threefry + BSC) and pushed as
device arrays: in deployment the stream arrives from the sifting stage's
device output, so the bench charges no host→device transfer for it.  The
classical channel is a DirectLink (device arrays pass by reference): a real
deployment serializes at the NIC between the two hosts — a cost measured
separately by the TCP/native-link paths — not on the accelerator's host
link.  Final keys DO drain to the host inside the timed region (bit-packed,
every cfg.drain_windows windows): the secret key is the product and must
land host-side.

Usage: python benchmarks/config4_full_chain.py [WINDOWS] [QBER]
Also importable: ``measure_full_chain()`` (used by bench.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def device_bsc_stream(total_bits: int, qber: float, seed: int):
    """(alice_bits, bob_bits) uint8 device arrays — BSC(qber) pair generated
    on device (the bench's stand-in for the sift stage's device output)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        ka, kb = jax.random.split(jax.random.wrap_key_data(key))
        a = jax.random.bernoulli(ka, 0.5, (total_bits,)).astype(jnp.uint8)
        flip = jax.random.bernoulli(kb, qber, (total_bits,)).astype(jnp.uint8)
        return a, a ^ flip

    key = np.frombuffer(np.uint64(seed).tobytes(), np.uint32)
    return gen(key)


def measure_full_chain(windows: int = 24, qber: float = 0.03,
                       warmup_windows: int = 3, seed: int = 7,
                       config=None, wire: bool = False) -> dict:
    from qtpu.pipeline import (AliceSession, BobSession, production_config,
                               pump_sessions)
    from qtpu.link import make_direct_pair, make_loopback_pair

    cfg = config or production_config()
    per_window = cfg.n * cfg.blocks_per_window
    total_bits = (windows + warmup_windows + 1) * per_window
    a_dev, b_dev = device_bsc_stream(total_bits, qber, seed)

    la, lb = make_loopback_pair() if wire else make_direct_pair()
    alice = AliceSession(cfg, 0x5E55, la)
    bob = BobSession(cfg, 0x5E55, lb)
    alice.push_sifted(a_dev)
    bob.push_sifted(b_dev)

    def pump_until(n_windows: int) -> None:
        pump_sessions(alice, bob, la, lb, max_rounds=1_000_000,
                      stop=lambda: bob.window_id >= n_windows)

    # Warmup: compiles the selected rung's programs (slow on the tunnel).
    pump_until(warmup_windows)
    assert bob.window_id >= warmup_windows, "warmup did not complete"
    consumed0 = alice.ledger.sifted_bits - alice.stream.remaining
    final0 = bob.ledger.final_bits
    t0 = time.perf_counter()
    pump_until(warmup_windows + windows)
    dt = time.perf_counter() - t0
    measured = bob.window_id - warmup_windows
    consumed = (alice.ledger.sifted_bits - alice.stream.remaining) - consumed0
    final = bob.ledger.final_bits - final0
    # Drain (outside the timed region): the timed loop stops as soon as Bob
    # completes the target window, which may leave Alice's final ack queued.
    pump_sessions(alice, bob, la, lb)
    assert np.array_equal(alice.final_key_bits(), bob.final_key_bits())
    assert alice.ledger.as_dict() == bob.ledger.as_dict()
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
