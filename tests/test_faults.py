"""Fault injection on the classical channel (SURVEY.md §6.3): duplicated
messages, window aborts, and burst errors must never produce differing final
keys or diverging accounting."""

import numpy as np
import pytest

from qtpu.link import make_loopback_pair
from qtpu.messages import pack_message, unpack_message
from qtpu.pipeline import AliceSession, BobSession, PipelineConfig


def _cfg():
    return PipelineConfig(n=1024, blocks_per_window=2, qber_test_bits=256,
                          qber_segment_bits=1024)


class DupLink:
    """Link wrapper that duplicates every Nth sent message."""

    def __init__(self, inner, every=3):
        self._inner = inner
        self._every = every
        self._count = 0

    def send(self, msg):
        self._inner.send(msg)
        self._count += 1
        if self._count % self._every == 0:
            self._inner.send(unpack_message(pack_message(msg)))  # true copy

    def recv(self, timeout=None):
        return self._inner.recv(timeout)


def _pump(alice, bob, la, lb, rounds=10_000):
    for _ in range(rounds):
        progressed = False
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


def test_duplicated_messages_are_idempotent():
    rng = np.random.default_rng(0)
    a_bits = rng.integers(0, 2, 20_000).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(20_000) < 0.02).astype(np.uint8)
    la, lb = make_loopback_pair()
    alice = AliceSession(_cfg(), 1, DupLink(la, every=2))
    bob = BobSession(_cfg(), 1, DupLink(lb, every=2))
    alice.push_sifted(a_bits)
    bob.push_sifted(b_bits)
    _pump(alice, bob, la, lb)
    assert bob.window_id >= 2
    np.testing.assert_array_equal(alice.final_key_bits(), bob.final_key_bits())
    assert alice.ledger.as_dict() == bob.ledger.as_dict()
    assert len(alice.final_key_bits()) > 0


def test_window_abort_resynchronizes():
    """Drop Bob's RateSelect for window 0; Alice aborts, both mirror, and the
    stream continues with identical keys and ledgers."""
    rng = np.random.default_rng(1)
    a_bits = rng.integers(0, 2, 20_000).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(20_000) < 0.02).astype(np.uint8)
    la, lb = make_loopback_pair()
    alice = AliceSession(_cfg(), 2, la)
    bob = BobSession(_cfg(), 2, lb)
    alice.push_sifted(a_bits)
    bob.push_sifted(b_bits)

    # Window 0: Alice discloses; Bob replies; we DROP the reply.
    alice.start_window()
    bob.on_message(lb.recv())
    dropped = la.recv()
    assert dropped is not None and type(dropped).__name__ == "RateSelect"
    # Alice times out and aborts window 0; Bob mirrors.
    alice.abort_window(0)
    bob.on_message(lb.recv())
    assert 0 not in alice._inflight and 0 not in bob._inflight
    assert alice.window_id == 1 and bob.window_id == 1

    # Stream resumes and completes further windows.
    _pump(alice, bob, la, lb)
    assert bob.window_id >= 2
    ka, kb = alice.final_key_bits(), bob.final_key_bits()
    assert len(ka) > 0
    np.testing.assert_array_equal(ka, kb)
    assert alice.final_key_index == bob.final_key_index
    assert alice.ledger.as_dict() == bob.ledger.as_dict()
    # Window 0 produced no key material on either side.
    assert all(w != 0 for w, _ in alice.final_key_index)


def test_stale_ack_ignored():
    """A replayed VerifyAck for an already-completed window must be a no-op."""
    rng = np.random.default_rng(2)
    a_bits = rng.integers(0, 2, 20_000).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(20_000) < 0.02).astype(np.uint8)
    la, lb = make_loopback_pair()
    alice = AliceSession(_cfg(), 3, la)
    bob = BobSession(_cfg(), 3, lb)
    alice.push_sifted(a_bits)
    bob.push_sifted(b_bits)
    # Run one full window while capturing the ack.
    alice.start_window()
    bob.on_message(lb.recv())          # qber -> rate
    alice.on_message(la.recv())        # rate -> syndromes
    bob.on_message(lb.recv())          # syndromes -> (deferred) decode
    bob.flush()                        # resolve -> ack
    ack = la.recv()
    before = alice.ledger.as_dict()
    alice.on_message(ack)
    after_first = alice.ledger.as_dict()
    assert after_first != before       # the real ack did its work
    alice.on_message(ack)              # replay
    assert alice.ledger.as_dict() == after_first, "replayed ack must be a no-op"
