"""Wire-format round-trip tests for the EC message schema (SURVEY.md App A)."""

import numpy as np
import pytest

from qtpu import messages as M


def test_qber_disclose_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 333).astype(np.uint8)
    msg = M.QberDisclose(window_id=7, num_bits=333, bits=bits)
    out = M.unpack_message(M.pack_message(msg))
    assert isinstance(out, M.QberDisclose)
    assert out.window_id == 7 and out.num_bits == 333
    np.testing.assert_array_equal(out.bits, bits)


def test_rate_select_roundtrip():
    msg = M.RateSelect(window_id=3, qber_milli=34, rate_index=2)
    out = M.unpack_message(M.pack_message(msg))
    assert (out.window_id, out.qber_milli, out.rate_index) == (3, 34, 2)


def test_syndromes_roundtrip():
    rng = np.random.default_rng(1)
    B, m = 4, 1000
    syn = rng.integers(0, 2, (B, m)).astype(np.uint8)
    hashes = rng.integers(0, 2, (B, 64)).astype(np.uint8)
    msg = M.Syndromes(window_id=1, rate_index=2, num_blocks=B,
                      syndrome_bits=m, syndromes=syn, verify_hashes=hashes)
    out = M.unpack_message(M.pack_message(msg))
    np.testing.assert_array_equal(out.syndromes, syn)
    np.testing.assert_array_equal(out.verify_hashes, hashes)
    assert out.rate_index == 2 and out.syndrome_bits == m


def test_verify_ack_roundtrip():
    mask = np.array([1, 0, 1, 1, 0], np.uint8)
    out = M.unpack_message(M.pack_message(
        M.VerifyAck(window_id=9, num_blocks=5, ok_mask=mask)))
    np.testing.assert_array_equal(out.ok_mask, mask)


def test_abort_roundtrip():
    out = M.unpack_message(M.pack_message(M.Abort(window_id=2, reason="qber too high")))
    assert out.reason == "qber too high"


def test_bad_magic_rejected():
    data = bytearray(M.pack_message(M.RateSelect(window_id=0, qber_milli=1, rate_index=0)))
    data[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        M.unpack_message(bytes(data))


def test_truncated_rejected():
    data = M.pack_message(M.RateSelect(window_id=0, qber_milli=1, rate_index=0))
    with pytest.raises(ValueError, match="length"):
        M.unpack_message(data[:-2])
