"""QBER estimation + protocol PRNG tests (SURVEY.md §3 #11, #16)."""

import numpy as np
import jax.numpy as jnp

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
    alice = qber.test_positions(prng.root_key(42), jnp.arange(4), 2048, 128)
    bob = qber.test_positions(prng.root_key(42), jnp.arange(4), 2048, 128)
    np.testing.assert_array_equal(np.asarray(alice), np.asarray(bob))
    other = qber.test_positions(prng.root_key(43), jnp.arange(4), 2048, 128)
    assert not np.array_equal(np.asarray(alice), np.asarray(other))


def test_qber_estimate_accuracy():
    rng = np.random.default_rng(3)
    B, n, k = 16, 4096, 400
    true_q = 0.03
    alice_bits = rng.integers(0, 2, (B, n)).astype(np.uint8)
    bob_bits = alice_bits ^ (rng.random((B, n)) < true_q).astype(np.uint8)
    pos = qber.test_positions(prng.root_key(1), jnp.arange(B), n, k)
    da = qber.disclose_bits(jnp.asarray(alice_bits), pos)
    db = qber.disclose_bits(jnp.asarray(bob_bits), pos)
    est = qber.estimate_from_disclosed(da, db)
    q = np.asarray(est.qber)
    assert abs(q.mean() - true_q) < 0.01
    assert np.all(np.asarray(est.disclosed) == k)


def test_estimate_smoothing_nonzero():
    """Zero observed mismatches must still give a nonzero estimate."""
    same = jnp.zeros((2, 100), jnp.uint8)
    est = qber.estimate_from_disclosed(same, same)
    assert np.all(np.asarray(est.qber) > 0)
