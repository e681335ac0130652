"""Wall-clock breakdown of the full-chain window cycle (tunnel diagnosis).

Wraps the session hot-path methods with timers and prints a per-phase
breakdown over a few production windows.  Usage:

    python benchmarks/profile_full_chain.py [WINDOWS]
"""

import collections
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TIMES = collections.defaultdict(float)
COUNTS = collections.defaultdict(int)


def timed(name):
    def deco(fn):
        @functools.wraps(fn)
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            TIMES[name] += time.perf_counter() - t0
            COUNTS[name] += 1
            return out
        return wrap
    return deco


def main() -> None:
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from qtpu import pipeline as pl
    from qtpu import prng

    # Instrument the phases.
    pl.AliceSession.start_window = timed("alice.start_window")(pl.AliceSession.start_window)
    pl.AliceSession._on_rate_select = timed("alice.on_rate_select")(pl.AliceSession._on_rate_select)
    pl.AliceSession._on_verify_ack = timed("alice.on_verify_ack")(pl.AliceSession._on_verify_ack)
    pl.BobSession._service_opens = timed("bob.service_opens")(pl.BobSession._service_opens)
    pl.BobSession._on_syndromes = timed("bob.on_syndromes")(pl.BobSession._on_syndromes)
    pl.BobSession._resolve_decode = timed("bob.resolve_decode")(pl.BobSession._resolve_decode)
    pl._Party._privacy_amplify = timed("pa")(pl._Party._privacy_amplify)
    pl._Party._drain_chunks = timed("drain_final_keys")(pl._Party._drain_chunks)
    prng.derive = timed("prng.derive")(prng.derive)

    from qtpu.link import make_direct_pair
    cfg = pl.production_config()
    qber = 0.03
    warmup = 2
    per_window = cfg.n * cfg.blocks_per_window
    total_bits = (windows + warmup + 1) * per_window
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from config4_full_chain import device_bsc_stream
    a_dev, b_dev = device_bsc_stream(total_bits, qber, 7)
    la, lb = make_direct_pair()
    alice = pl.AliceSession(cfg, 0x5E55, la)
    bob = pl.BobSession(cfg, 0x5E55, lb)
    alice.push_sifted(a_dev)
    bob.push_sifted(b_dev)

    def pump_until(n_windows):
        while bob.window_id < n_windows:
            progressed = False
            if alice.can_start_window():
                alice.start_window()
                progressed = True
            m = lb.recv()
            if m is not None:
                bob.on_message(m); progressed = True
            m = la.recv()
            if m is not None:
                alice.on_message(m); progressed = True
            if not progressed and not bob.flush():
                return

    pump_until(warmup)
    TIMES.clear(); COUNTS.clear()
    t0 = time.perf_counter()
    pump_until(warmup + windows)
    total = time.perf_counter() - t0
    sifted = (bob.window_id - warmup) * cfg.n * cfg.blocks_per_window
    out = {"windows": bob.window_id - warmup,
           "window_ms": round(1e3 * total / max(1, bob.window_id - warmup), 1),
           "sifted_bits_per_s": round(sifted / total, 1)}
    print(json.dumps(out, indent=2))
    print(f"\nsteady-state wall: {total:.2f}s")
    rows = sorted(TIMES.items(), key=lambda kv: -kv[1])
    for name, t in rows:
        print(f"  {name:26s} {t*1e3:9.1f} ms total  {COUNTS[name]:4d} calls  "
              f"{t*1e3/max(1,COUNTS[name]):8.1f} ms/call")


if __name__ == "__main__":
    main()
