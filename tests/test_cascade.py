"""Cascade golden-model tests + the LDPC-vs-Cascade interactivity contrast
that motivates the -ldpc fork (SURVEY.md §4.3/§4.4)."""

import numpy as np
import pytest

from qtpu.ldpc.cascade import CascadeResult, ParityOracle, cascade_reconcile


def _pair(rng, n, q):
    a = rng.integers(0, 2, n).astype(np.uint8)
    b = a ^ (rng.random(n) < q).astype(np.uint8)
    return a, b


@pytest.mark.parametrize("qber", [0.01, 0.03, 0.05])
def test_cascade_corrects_all_errors(qber):
    rng = np.random.default_rng(int(qber * 1e4))
    alice, bob = _pair(rng, 4096, qber)
    oracle = ParityOracle(alice)
    res = cascade_reconcile(oracle, bob, qber, session_seed=1)
    np.testing.assert_array_equal(res.bits, alice)
    assert res.corrected_errors == int((alice != bob).sum()) or \
        res.corrected_errors >= int((alice != bob).sum())  # even # of comp flips
    assert res.leaked_bits > 0


def test_cascade_leakage_scales_with_qber():
    rng = np.random.default_rng(9)
    leaks = []
    for q in (0.01, 0.05):
        alice, bob = _pair(rng, 4096, q)
        res = cascade_reconcile(ParityOracle(alice), bob, q, session_seed=2)
        np.testing.assert_array_equal(res.bits, alice)
        leaks.append(res.leaked_bits)
    assert leaks[1] > leaks[0]


def test_interactivity_contrast_with_ldpc():
    """The fork's raison d'être: Cascade needs hundreds of round trips per
    block where LDPC needs ONE message (SURVEY.md §4.4)."""
    rng = np.random.default_rng(3)
    alice, bob = _pair(rng, 4096, 0.03)
    res = cascade_reconcile(ParityOracle(alice), bob, 0.03, session_seed=3)
    np.testing.assert_array_equal(res.bits, alice)
    assert res.round_trips > 100, "cascade is highly interactive"
    # LDPC: syndrome + verify hash in one shot, zero mid-flight interaction.
    ldpc_round_trips = 1
    assert res.round_trips / ldpc_round_trips > 100


def test_cascade_cross_checks_ldpc_leakage_order():
    """Sanity: cascade leakage lands in the same regime as h2(q)*n — the
    quantity the LDPC ladder's ledger must also approximate."""
    rng = np.random.default_rng(5)
    q = 0.03
    alice, bob = _pair(rng, 8192, q)
    res = cascade_reconcile(ParityOracle(alice), bob, q, session_seed=7)
    np.testing.assert_array_equal(res.bits, alice)
    h2 = -q * np.log2(q) - (1 - q) * np.log2(1 - q)
    # Cascade efficiency is typically ~1.1-1.6x the Shannon bound here.
    assert 0.9 * h2 * len(alice) < res.leaked_bits < 2.5 * h2 * len(alice)
