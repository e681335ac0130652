"""BASELINE config 4: full chain — sifting + QBER + LDPC + Toeplitz PA,
streaming blocks through the loopback link."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from qtpu.chain import ChainConfig, run_chain_loopback
from qtpu.channel import EntangledPairSource
from qtpu.pipeline import PipelineConfig

cfg = ChainConfig(pipeline=PipelineConfig(n=1024, blocks_per_window=4,
                                          qber_test_bits=512,
                                          qber_segment_bits=2048))
src = EntangledPairSource(pair_rate_hz=300_000, window_s=0.05, error_rate=0.02)
t0 = time.perf_counter()
alice, bob = run_chain_loopback(cfg, num_windows=10, source=src, seed=0)
dt = time.perf_counter() - t0
ka = alice.ec.final_key_bits()
led = bob.ec.ledger
print(json.dumps({
    "config": 4, "wall_s": round(dt, 1),
    "windows": bob.ec.window_id,
    "final_key_bits": int(len(ka)),
    "keys_identical": bool(np.array_equal(ka, bob.ec.final_key_bits())),
    "sifted_bits": led.sifted_bits,
    "secret_fraction": round(led.final_bits / max(1, led.sifted_bits), 4),
}))
