"""Channel authentication (SURVEY.md §1 'authenticated classical channel'):
Wegman-Carter MAC round-trips, tamper/replay rejection, and honest auth-key
accounting in the two-party session ledgers."""

import numpy as np
import pytest

from qtpu.auth import AuthedLink, AuthError
from qtpu.link import make_loopback_pair
from qtpu.messages import RateSelect
from qtpu.pipeline import AliceSession, BobSession, PipelineConfig


def _authed_pair(seed=0xC0FFEE):
    la, lb = make_loopback_pair()
    return AuthedLink(la, seed, True), AuthedLink(lb, seed, False), la, lb


def test_roundtrip():
    a, b, _, _ = _authed_pair()
    a.send(RateSelect(window_id=3, qber_milli=30, rate_index=2))
    m = b.recv()
    assert isinstance(m, RateSelect) and m.window_id == 3 and m.rate_index == 2
    # And the reverse direction with its own stream.
    b.send(RateSelect(window_id=4, qber_milli=10, rate_index=1))
    m = a.recv()
    assert m.window_id == 4


def test_tampered_frame_rejected():
    a, b, la, lb = _authed_pair()
    a.send(RateSelect(window_id=1, qber_milli=30, rate_index=2))
    frame = bytearray(lb.recv_bytes())
    frame[8] ^= 0x40  # flip one payload bit
    la._tx.append(bytes(frame))  # reinject the tampered frame
    with pytest.raises(AuthError, match="MAC mismatch"):
        b.recv()


def test_replayed_frame_rejected():
    a, b, la, lb = _authed_pair()
    a.send(RateSelect(window_id=1, qber_milli=30, rate_index=2))
    raw = lb.recv_bytes()
    la._tx.append(raw)
    la._tx.append(raw)
    assert b.recv() is not None
    with pytest.raises(AuthError, match="sequence"):
        b.recv()  # replay: stale sequence number


def test_wrong_preshared_key_rejected():
    la, lb = make_loopback_pair()
    a = AuthedLink(la, 1111, True)
    b = AuthedLink(lb, 2222, False)
    a.send(RateSelect(window_id=1, qber_milli=30, rate_index=2))
    with pytest.raises(AuthError):
        b.recv()


def test_session_ledgers_charge_auth_bits():
    rng = np.random.default_rng(0)
    n = 40_000
    a_bits = rng.integers(0, 2, n).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(n) < 0.02).astype(np.uint8)
    la, lb = make_loopback_pair()
    cfg = PipelineConfig(n=1024, blocks_per_window=4, qber_test_bits=512)
    alice = AliceSession(cfg, 7, AuthedLink(la, 0xC0FFEE, True))
    bob = BobSession(cfg, 7, AuthedLink(lb, 0xC0FFEE, False))
    alice.push_sifted(a_bits)
    bob.push_sifted(b_bits)
    for _ in range(10_000):
        progressed = False
        if alice.can_start_window():
            alice.start_window()
            progressed = True
        m = bob.link.recv()
        if m is not None:
            bob.on_message(m)
            progressed = True
        m = alice.link.recv()
        if m is not None:
            alice.on_message(m)
            progressed = True
        if not progressed and bob.flush():
            progressed = True
        if not progressed:
            break
    # Alice's last sync happens on the final ack; force one final sync on Bob
    # (his last sync was after his own last send).
    alice._sync_auth_bits()
    bob._sync_auth_bits()
    np.testing.assert_array_equal(alice.final_key_bits(), bob.final_key_bits())
    assert len(alice.final_key_bits()) > 0
    assert alice.ledger.auth_bits > 0, "auth consumption must be charged"
    assert alice.ledger.as_dict() == bob.ledger.as_dict()
    # 61-bit session point + 61 bits per message, both directions.
    msgs = alice.link._tx_seq + bob.link._tx_seq
    assert alice.ledger.auth_bits == 2 * 61 + 61 * msgs
