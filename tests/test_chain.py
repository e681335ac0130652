"""Full-chain integration (BASELINE config 4): simulated entangled source →
pfind → coincidence sifting → splice → QBER → LDPC → verify → PA, both
parties over one message link, identical final keys."""

import numpy as np
import pytest

from qtpu.chain import ChainConfig, run_chain_loopback
from qtpu.channel import EntangledPairSource
from qtpu.pipeline import PipelineConfig


@pytest.mark.slow
def test_full_chain_loopback():
    cfg = ChainConfig(
        pipeline=PipelineConfig(n=1024, blocks_per_window=2,
                                qber_test_bits=256, qber_segment_bits=1024),
        window_s=0.05,
    )
    src = EntangledPairSource(pair_rate_hz=150_000, window_s=0.05,
                              offset_ns=4_321.0, error_rate=0.025,
                              dark_rate_hz=2_000)
    alice, bob = run_chain_loopback(cfg, num_windows=6, source=src, seed=3)

    # The chain acquired the time offset without being told it.
    true_units = int(round(4_321.0 * 8))
    assert bob.offset is not None and abs(bob.offset - true_units) < 60

    # Sifting produced a matched stream on both sides.
    assert alice.ec.ledger.sifted_bits == bob.ec.ledger.sifted_bits
    assert bob.ec.ledger.sifted_bits > 5_000

    # Reconciliation ran and both parties hold the identical final key.
    assert bob.ec.window_id >= 1, "at least one EC window must complete"
    ka, kb = alice.ec.final_key_bits(), bob.ec.final_key_bits()
    assert len(ka) > 0
    np.testing.assert_array_equal(ka, kb)
    assert alice.ec.ledger.as_dict() == bob.ec.ledger.as_dict()

    # The estimated QBER reflects the simulated channel (2.5% + accidentals).
    q = bob.ec.metrics[0].qber_est
    assert 0.01 < q < 0.06, q
