"""Final-key artifact (type-7 analog) round-trip tests."""

import numpy as np
import pytest

from qtpu import keystore


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    recs = [keystore.KeyRecord(window_id=w, block_index=b,
                               bits=rng.integers(0, 2, 500 + w).astype(np.uint8))
            for w in range(3) for b in range(2)]
    path = str(tmp_path / "keys.bin")
    keystore.write_keys(path, recs)
    back = list(keystore.read_keys(path))
    assert len(back) == len(recs)
    for a, b in zip(recs, back):
        assert (a.window_id, a.block_index) == (b.window_id, b.block_index)
        np.testing.assert_array_equal(a.bits, b.bits)


def test_append_mode(tmp_path):
    path = str(tmp_path / "keys.bin")
    r1 = keystore.KeyRecord(0, 0, np.ones(64, np.uint8))
    r2 = keystore.KeyRecord(1, 0, np.zeros(32, np.uint8))
    keystore.write_keys(path, [r1])
    keystore.write_keys(path, [r2])  # append
    back = list(keystore.read_keys(path))
    assert [(r.window_id, len(r.bits)) for r in back] == [(0, 64), (1, 32)]


def test_corrupt_magic_rejected(tmp_path):
    path = str(tmp_path / "keys.bin")
    keystore.write_keys(path, [keystore.KeyRecord(0, 0, np.ones(8, np.uint8))])
    data = bytearray(open(path, "rb").read())
    data[0] ^= 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="magic"):
        list(keystore.read_keys(path))


def test_records_from_session(tmp_path):
    from qtpu.pipeline import PipelineConfig, run_loopback
    rng = np.random.default_rng(1)
    a_bits = rng.integers(0, 2, 20_000).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(20_000) < 0.02).astype(np.uint8)
    cfg = PipelineConfig(n=1024, blocks_per_window=2, qber_test_bits=256)
    alice, bob = run_loopback(cfg, a_bits, b_bits)
    ra = keystore.records_from_session(alice)
    rb = keystore.records_from_session(bob)
    assert len(ra) == len(rb) > 0
    path = str(tmp_path / "alice.bin")
    keystore.write_keys(path, ra)
    for rec, orig in zip(keystore.read_keys(path), rb):
        assert (rec.window_id, rec.block_index) == (orig.window_id, orig.block_index)
        np.testing.assert_array_equal(rec.bits, orig.bits)
