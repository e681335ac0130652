"""QBER estimation + protocol PRNG tests (SURVEY.md §3 #11, #16)."""

import numpy as np

from qtpu import prng, qber


def test_derive_is_deterministic_and_distinct():
    root = prng.root_key(0xDEAD)
    a = prng.derive(root, "perm", 1)
    b = prng.derive(root, "perm", 1)
    c = prng.derive(root, "perm", 2)
    d = prng.derive(root, "test", 1)
    ra = np.asarray(prng.random_bits(a, (64,)))
    np.testing.assert_array_equal(ra, np.asarray(prng.random_bits(b, (64,))))
    assert not np.array_equal(ra, np.asarray(prng.random_bits(c, (64,))))
    assert not np.array_equal(ra, np.asarray(prng.random_bits(d, (64,))))


def test_subset_indices_unique():
    key = prng.derive(prng.root_key(7), "qber", 0)
    idx = np.asarray(prng.subset_indices(key, 4096, 256))
    assert len(np.unique(idx)) == 256
    assert idx.min() >= 0 and idx.max() < 4096


def test_both_parties_select_same_test_bits():
    """The whole point: Alice and Bob derive identical positions."""
    for wid in range(4):
        alice = qber.test_positions(prng.root_key(42), wid, 2048, 128)
        bob = qber.test_positions(prng.root_key(42), wid, 2048, 128)
        np.testing.assert_array_equal(np.asarray(alice), np.asarray(bob))
    a0 = qber.test_positions(prng.root_key(42), 0, 2048, 128)
    other = qber.test_positions(prng.root_key(43), 0, 2048, 128)
    assert not np.array_equal(np.asarray(a0), np.asarray(other))
    a1 = qber.test_positions(prng.root_key(42), 1, 2048, 128)
    assert not np.array_equal(np.asarray(a0), np.asarray(a1))


def test_qber_estimate_accuracy():
    """Disclosed-sample estimate lands near the true QBER."""
    rng = np.random.default_rng(3)
    n, k = 65536, 4096
    true_q = 0.03
    alice_bits = rng.integers(0, 2, n).astype(np.uint8)
    bob_bits = alice_bits ^ (rng.random(n) < true_q).astype(np.uint8)
    pos = qber.test_positions(prng.root_key(1), 0, n, k)
    mism = int(np.sum(alice_bits[pos] != bob_bits[pos]))
    est = qber.QberEstimator(halflife=0)
    q_hat, q_ucb = est.estimate(mism, k)
    assert abs(q_hat - true_q) < 0.01
    assert q_ucb > q_hat


def test_estimate_smoothing_nonzero():
    """Zero observed mismatches must still give a nonzero estimate."""
    est = qber.QberEstimator(halflife=0)
    q_hat, q_ucb = est.estimate(0, 1000)
    assert 0 < q_hat < 0.01
    assert q_ucb > q_hat


def test_prior_tightens_and_request_drops():
    """Post-decode prior shrinks the requested disclosure to the floor."""
    est = qber.QberEstimator()
    assert est.request_bits(512, 8192) == 8192  # cold: ask for the ceiling
    for _ in range(8):
        est.update_prior(errors=0.03 * 65536, bits=65536.0)
    k = est.request_bits(512, 8192)
    assert k < 8192 and k % 512 == 0

    # The estimate with a warm prior is close to the injected rate.
    q_hat, _ = est.estimate(0, 0)
    assert abs(q_hat - 0.03) < 0.005


def test_estimator_checkpoint_roundtrip():
    est = qber.QberEstimator()
    est.update_prior(100.0, 4096.0)
    clone = qber.QberEstimator()
    clone.restore(est.state())
    assert clone.estimate(5, 512) == est.estimate(5, 512)
