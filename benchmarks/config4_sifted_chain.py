"""BASELINE config 4 variant: the chain measured FROM SIMULATED DETECTOR
EVENTS (no BSC stand-in) — pfind offset acquisition, batched device
coincidence sifting with the on-device drift servo, splicing, and the full
EC pipeline (QBER → LDPC → verify → PA), both parties on one chip.

Event generation happens OUTSIDE the timed region (it stands in for the
timestamp hardware); the timed region covers everything the framework
would run in production: framing, sift dispatches, EC windows, drains.

Usage: python benchmarks/config4_sifted_chain.py [SIM_WINDOWS] [PAIR_RATE]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from config4_full_chain import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main() -> None:
    sim_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    pair_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 2e6
    from qtpu.chain import AliceChain, BobChain, ChainConfig
    from qtpu.channel import EntangledPairSource
    from qtpu.link import make_direct_pair
    from qtpu.pipeline import production_config

    window_s = 0.05
    cfg = ChainConfig(
        pipeline=production_config(blocks_per_window=4, qber_test_bits=512,
                                   drain_windows=4),
        window_s=window_s, sift_batch_frames=8)
    src = EntangledPairSource(pair_rate_hz=pair_rate, window_s=window_s,
                              offset_ns=4_321.0, error_rate=0.025,
                              dark_rate_hz=20_000.0)

    # Pre-generate the event stream (the hardware's job, untimed).
    rng = np.random.default_rng(7)
    span_units = int(window_s * 8e9)
    streams = []
    total_events = 0
    for w in range(sim_windows):
        ev = src.generate(rng, start_epoch=w)
        base = np.int64(w) * span_units
        sa = (np.asarray(ev.alice.times[: ev.alice.count], np.int64) + base,
              ev.alice.detectors[: ev.alice.count])
        sb = (np.asarray(ev.bob.times[: ev.bob.count], np.int64) + base,
              ev.bob.detectors[: ev.bob.count])
        total_events += ev.alice.count + ev.bob.count
        streams.append((sa, sb))

    la, lb = make_direct_pair()
    alice = AliceChain(cfg, 0x5E55, la)
    bob = BobChain(cfg, 0x5E55, lb)

    def pump():
        for _ in range(100_000):
            p = bob.pump()
            p = alice.pump() or p
            if not p:
                return

    # Warmup on the first few sim windows (pfind + first EC compiles).
    warm = min(6, sim_windows // 3)
    for sa, sb in streams[:warm]:
        alice.push_stream(*sa)
        bob.push_stream(*sb)
        pump()
    warm_events = sum(len(sa[0]) + len(sb[0]) for sa, sb in streams[:warm])

    t0 = time.perf_counter()
    for sa, sb in streams[warm:]:
        alice.push_stream(*sa)
        bob.push_stream(*sb)
        pump()
    bob.flush_sift()
    pump()
    bob.ec.flush()
    pump()
    dt = time.perf_counter() - t0

    ka = alice.ec.final_key_bits()
    kb = bob.ec.final_key_bits()
    assert np.array_equal(ka, kb), "final keys must agree"
    sifted = bob.ec.ledger.sifted_bits
    out = {
        "sim_windows": sim_windows - warm,
        "elapsed_s": round(dt, 3),
        "events_processed": total_events - warm_events,
        "chain_events_per_s": round((total_events - warm_events) / dt, 0),
        "sifted_bits_total": int(sifted),
        "final_key_bits": int(len(ka)),
        "sifted_bits_per_s_wall": round(sifted / dt, 0),
        "ec_windows": int(bob.ec.window_id),
        "acquired_offset_units": int(bob.offset),
        "mean_frame_events": round((total_events - warm_events)
                                   / max(1, len(bob.sift_stats)), 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
