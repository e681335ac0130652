"""Two-party loopback integration tests (SURVEY.md §5.3): full windows through
QBER handshake → rate select → syndromes → decode → verify → PA, asserting
identical final keys and exact leakage accounting on both sides."""

import numpy as np
import pytest

from qtpu.pipeline import PipelineConfig, run_loopback


def _cfg(**kw):
    base = dict(n=1024, blocks_per_window=4, qber_test_bits=512, max_iters=60,
                verify_hash_bits=64, security_margin_bits=64)
    base.update(kw)
    return PipelineConfig(**base)


def _sifted(rng, total, qber):
    alice = rng.integers(0, 2, total).astype(np.uint8)
    bob = alice ^ (rng.random(total) < qber).astype(np.uint8)
    return alice, bob


@pytest.mark.parametrize("qber", [0.01, 0.03, 0.05])
def test_loopback_identical_final_keys(qber):
    rng = np.random.default_rng(int(qber * 1000))
    alice_bits, bob_bits = _sifted(rng, 40_000, qber)
    a, b = run_loopback(_cfg(), alice_bits, bob_bits)
    assert b.window_id >= 2, "expected at least two windows processed"
    ka, kb = a.final_key_bits(), b.final_key_bits()
    assert len(ka) > 0, "no final key produced"
    np.testing.assert_array_equal(ka, kb)
    # Ledgers agree exactly (both parties account identically).
    assert a.ledger.as_dict() == b.ledger.as_dict()
    assert a.ledger.blocks_failed == 0
    # Secrecy arithmetic: final <= reconciled - leaked.
    led = a.ledger
    assert led.final_bits <= led.reconciled_bits - led.syndrome_bits


def test_rate_adapts_to_qber():
    rng = np.random.default_rng(77)
    lo_a, lo_b = _sifted(rng, 30_000, 0.01)
    hi_a, hi_b = _sifted(rng, 30_000, 0.05)
    _, bob_lo = run_loopback(_cfg(), lo_a, lo_b)
    _, bob_hi = run_loopback(_cfg(), hi_a, hi_b)
    # Window 0 is chosen from the cold prior (identical on both runs); once
    # the post-decode prior warms the rate must adapt to the channel.
    r_lo = bob_lo.metrics[-1].rate_index
    r_hi = bob_hi.metrics[-1].rate_index
    assert r_lo > r_hi, f"low QBER must pick higher rate ({r_lo} vs {r_hi})"
    # Higher rate leaks fewer syndrome bits per payload bit.
    eff_lo = (bob_lo.metrics[-1].leaked_syndrome
              / bob_lo.metrics[-1].payload_bits)
    eff_hi = (bob_hi.metrics[-1].leaked_syndrome
              / bob_hi.metrics[-1].payload_bits)
    assert eff_lo < eff_hi


def test_corrupted_channel_discards_blocks():
    """If Bob's QBER wildly exceeds the estimate (burst), verification must
    catch every failed block — never emit differing final keys."""
    rng = np.random.default_rng(5)
    total = 30_000
    alice_bits = rng.integers(0, 2, total).astype(np.uint8)
    # 1% except a catastrophic 20% burst in the payload region.
    bob_bits = alice_bits ^ (rng.random(total) < 0.01).astype(np.uint8)
    burst = slice(4000, 12_000)
    bob_bits[burst] ^= (rng.random(8000) < 0.25).astype(np.uint8)
    a, b = run_loopback(_cfg(), alice_bits, bob_bits)
    np.testing.assert_array_equal(a.final_key_bits(), b.final_key_bits())
    assert b.ledger.blocks_failed > 0, "burst should kill at least one block"
    assert a.ledger.as_dict() == b.ledger.as_dict()


def test_metrics_recorded():
    rng = np.random.default_rng(9)
    alice_bits, bob_bits = _sifted(rng, 30_000, 0.02)
    _, b = run_loopback(_cfg(), alice_bits, bob_bits)
    m = b.metrics[0]
    assert m.blocks == 4
    assert 0.0 < m.qber_est < 0.1
    assert m.final_bits > 0
    assert m.iters_mean > 0
    d = m.as_dict()
    assert set(d) >= {"qber_est", "rate_index", "final_bits", "leaked_syndrome"}


def test_leakage_never_exceeds_payload():
    rng = np.random.default_rng(13)
    alice_bits, bob_bits = _sifted(rng, 30_000, 0.04)
    a, _ = run_loopback(_cfg(), alice_bits, bob_bits)
    led = a.ledger
    assert led.final_bits > 0
    assert led.final_bits + led.total_leaked <= led.sifted_bits


def test_blind_retry_recovers_boundary_blocks():
    """With the true QBER above what the (prior-driven) rate choice was made
    for, early windows fail blocks; one blind-reconciliation retry (extra
    disclosed bits, pinned re-decode) must recover blocks, keep keys
    identical, and charge the extra disclosure to the ledger on both
    sides."""
    rng = np.random.default_rng(3)
    # Cold prior assumes 4%; the channel runs 6.5% — the first windows pick
    # a rung whose ceiling the channel exceeds, so blocks fail until the
    # prior catches up (and retries rescue the failures meanwhile).
    total, q = 30_000, 0.068
    alice_bits = rng.integers(0, 2, total).astype(np.uint8)
    bob_bits = alice_bits ^ (rng.random(total) < q).astype(np.uint8)

    # Small test disclosure so the inline pinning doesn't paper over the
    # rate mismatch this test needs.
    kw = dict(qber_initial=0.04, qber_test_bits=64, qber_test_floor=32)
    a0, b0 = run_loopback(_cfg(max_retries=0, **kw), alice_bits, bob_bits)
    a1, b1 = run_loopback(_cfg(max_retries=1, **kw), alice_bits, bob_bits)

    assert b1.ledger.blocks_ok > b0.ledger.blocks_ok, "retry must recover blocks"
    assert sum(m.blocks_retried for m in b1.metrics) > 0
    for a, b in ((a0, b0), (a1, b1)):
        np.testing.assert_array_equal(a.final_key_bits(), b.final_key_bits())
        assert a.ledger.as_dict() == b.ledger.as_dict()
        assert a.final_key_index == b.final_key_index
    # The retry's extra disclosure is charged as reconciliation leakage.
    assert b1.ledger.syndrome_bits > b0.ledger.syndrome_bits
    # Retried blocks compress further: per-block final length differs, but
    # total final bits still beat discarding.
    assert len(b1.final_key_bits()) > len(b0.final_key_bits())
