"""Wire-format round-trip tests for the EC message schema (SURVEY.md App A)."""

import numpy as np
import pytest

from qtpu import messages as M


def test_window_open_roundtrip():
    out = M.unpack_message(M.pack_message(M.WindowOpen(window_id=7)))
    assert isinstance(out, M.WindowOpen) and out.window_id == 7


def test_rate_select_roundtrip():
    msg = M.RateSelect(window_id=3, qber_milli=34, rate_index=2,
                       short_bits=96, test_bits_pb=64)
    out = M.unpack_message(M.pack_message(msg))
    assert (out.window_id, out.qber_milli, out.rate_index) == (3, 34, 2)
    assert (out.short_bits, out.test_bits_pb) == (96, 64)


def test_syndromes_roundtrip():
    rng = np.random.default_rng(1)
    B, m, k = 4, 1000, 33
    syn = rng.integers(0, 2, (B, m)).astype(np.uint8)
    hashes = rng.integers(0, 2, (B, 64)).astype(np.uint8)
    test = rng.integers(0, 2, (B, k)).astype(np.uint8)
    msg = M.Syndromes(window_id=1, rate_index=2, num_blocks=B,
                      syndrome_bits=m, syndromes=syn, verify_hashes=hashes,
                      test_bits_pb=k, test_bits=test)
    out = M.unpack_message(M.pack_message(msg))
    np.testing.assert_array_equal(out.syndromes, syn)
    np.testing.assert_array_equal(out.verify_hashes, hashes)
    np.testing.assert_array_equal(out.test_bits, test)
    assert out.rate_index == 2 and out.syndrome_bits == m
    assert out.test_bits_pb == k


def test_syndromes_device_arrays_roundtrip():
    """Protocol v2 keeps message arrays on device through DirectLinks; the
    wire pack must serialize device arrays transparently."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    B, m = 2, 128
    syn = rng.integers(0, 2, (B, m)).astype(np.uint8)
    hashes = rng.integers(0, 2, (B, 64)).astype(np.uint8)
    msg = M.Syndromes(window_id=1, rate_index=0, num_blocks=B,
                      syndrome_bits=m, syndromes=jnp.asarray(syn),
                      verify_hashes=jnp.asarray(hashes))
    out = M.unpack_message(M.pack_message(msg))
    np.testing.assert_array_equal(out.syndromes, syn)


def test_retry_disclose_wire_slices_failed_rows():
    """The device form carries all B rows; the WIRE must disclose failed
    rows only (leakage = num_bits x num_failed, as the ledger charges)."""
    rng = np.random.default_rng(6)
    B, k = 4, 16
    mask = np.array([0, 1, 0, 1], np.uint8)
    bits = rng.integers(0, 2, (B, k)).astype(np.uint8)
    msg = M.RetryDisclose(window_id=2, round=0, num_bits=k,
                          failed_mask=mask, bits=bits)
    out = M.unpack_message(M.pack_message(msg))
    assert out.bits.shape == (2, k)
    np.testing.assert_array_equal(out.bits, bits[mask.astype(bool)])


def test_verify_ack_roundtrip():
    mask = np.array([1, 0, 1, 1, 0], np.uint8)
    out = M.unpack_message(M.pack_message(
        M.VerifyAck(window_id=9, num_blocks=5, ok_mask=mask)))
    np.testing.assert_array_equal(out.ok_mask, mask)


def test_abort_roundtrip():
    out = M.unpack_message(M.pack_message(M.Abort(
        window_id=2, reason="qber too high", consumed=12345,
        disclosed_qber=7, disclosed_syndrome=512, disclosed_hash=64)))
    assert out.reason == "qber too high"
    assert out.consumed == 12345
    assert (out.disclosed_qber, out.disclosed_syndrome,
            out.disclosed_hash) == (7, 512, 64)


def test_bad_magic_rejected():
    data = bytearray(M.pack_message(M.RateSelect(window_id=0, qber_milli=1, rate_index=0)))
    data[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        M.unpack_message(bytes(data))


def test_truncated_rejected():
    data = M.pack_message(M.RateSelect(window_id=0, qber_milli=1, rate_index=0))
    with pytest.raises(ValueError, match="length"):
        M.unpack_message(data[:-2])
