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
                                qber_test_bits=256),
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


def test_epoch_true_framing_and_resume():
    """Epoch-addressed streaming (SURVEY.md Appendix A): frames carry real
    ids derived from absolute event times, TimingBasis survives its
    delta-compressed wire format, and an EC checkpoint taken mid-stream
    resumes across a frame boundary with both parties still agreeing."""
    import numpy as np
    from qtpu.chain import AliceChain, BobChain, ChainConfig
    from qtpu.channel import EntangledPairSource
    from qtpu.framing import FRAME_UNITS, split_epochs
    from qtpu.link import make_loopback_pair
    from qtpu.pipeline import PipelineConfig

    cfg = ChainConfig(pipeline=PipelineConfig(
        n=1024, blocks_per_window=2, qber_test_bits=256), window_s=0.05)
    src = EntangledPairSource(pair_rate_hz=120_000, window_s=0.05)
    rng = np.random.default_rng(3)
    span = int(0.05 * 8e9)

    def pump(alice, bob):
        for _ in range(10_000):
            p = bob.pump()
            p = alice.pump() or p
            if not p:
                return

    la, lb = make_loopback_pair()
    alice, bob = (AliceChain(cfg, 5, la), BobChain(cfg, 5, lb))
    # Stream enough windows to cross a frame boundary (frame = 2^29 units =
    # 67 ms > window 50 ms, so window 2 starts frame 1).
    for w in range(4):
        ev = src.generate(rng, start_epoch=w)
        base = np.int64(w) * span
        alice.push_stream(ev.alice.times[: ev.alice.count] + base,
                          ev.alice.detectors[: ev.alice.count])
        bob.push_stream(ev.bob.times[: ev.bob.count] + base,
                        ev.bob.detectors[: ev.bob.count])
        pump(alice, bob)
    # Frames observed must be real epoch-derived ids, crossing a boundary.
    fids = [s["window_id"] for s in bob.sift_stats]
    assert fids == sorted(fids)
    assert max(fids) >= 1, "stream must cross a frame boundary"
    # Checkpoint both EC sessions mid-stream, resume into fresh sessions fed
    # by the same link, and continue across the boundary.
    ck_a = alice.ec.checkpoint_state()
    ck_b = bob.ec.checkpoint_state()
    la2, lb2 = make_loopback_pair()
    alice2, bob2 = (AliceChain(cfg, 5, la2), BobChain(cfg, 5, lb2))
    alice2.ec.restore_state(ck_a)
    bob2.ec.restore_state(ck_b)
    bob2.offset = bob.offset
    for w in range(4, 8):
        ev = src.generate(rng, start_epoch=w)
        base = np.int64(w) * span
        alice2.push_stream(ev.alice.times[: ev.alice.count] + base,
                           ev.alice.detectors[: ev.alice.count])
        bob2.push_stream(ev.bob.times[: ev.bob.count] + base,
                         ev.bob.detectors[: ev.bob.count])
        pump(alice2, bob2)
    ka = np.concatenate([alice.ec.final_key_bits(),
                         alice2.ec.final_key_bits()])
    kb = np.concatenate([bob.ec.final_key_bits(), bob2.ec.final_key_bits()])
    assert len(ka) > 0
    np.testing.assert_array_equal(ka, kb)
    assert alice2.ec.ledger.as_dict() == bob2.ec.ledger.as_dict()


def test_batched_sift_matches_per_frame():
    """The batched multi-frame matcher (servo on device, one fetch per
    batch) must produce the SAME sifted stream, offsets, and final keys as
    the per-frame path — it is a dispatch-granularity change, not a
    protocol change."""
    from qtpu.chain import ChainConfig, run_chain_loopback
    from qtpu.channel import EntangledPairSource
    from qtpu.pipeline import PipelineConfig

    pl = PipelineConfig(n=1024, blocks_per_window=2, qber_test_bits=256)
    src_args = dict(pair_rate_hz=150_000, window_s=0.05,
                    offset_ns=1_234.0, error_rate=0.02)
    runs = {}
    for label, fbatch in (("single", 1), ("batched", 3)):
        cfg = ChainConfig(pipeline=pl, window_s=0.05,
                          sift_batch_frames=fbatch)
        a, b = run_chain_loopback(
            cfg, num_windows=6,
            source=EntangledPairSource(**src_args), seed=7)
        runs[label] = (a, b)
        np.testing.assert_array_equal(a.ec.final_key_bits(),
                                      b.ec.final_key_bits())
    sa, ba = runs["single"]
    sb, bb = runs["batched"]
    # Same sifted stream and servo trajectory...
    assert ba.ec.ledger.sifted_bits == bb.ec.ledger.sifted_bits > 0
    assert [s["sifted_bits"] for s in ba.sift_stats] == \
           [s["sifted_bits"] for s in bb.sift_stats]
    assert [s["offset_units"] for s in ba.sift_stats] == \
           [s["offset_units"] for s in bb.sift_stats]
    # ...and identical final keys across the two dispatch modes.
    np.testing.assert_array_equal(ba.ec.final_key_bits(),
                                  bb.ec.final_key_bits())


def test_split_epochs_roundtrip():
    import numpy as np
    from qtpu.framing import FRAME_UNITS, split_epochs, pack_deltas, unpack_deltas
    rng = np.random.default_rng(0)
    t = np.sort(rng.integers(0, 3 * FRAME_UNITS, 5000).astype(np.int64))
    d = rng.integers(0, 4, 5000).astype(np.uint8)
    frames = split_epochs(t, d)
    assert [f for f, _, _ in frames] == [0, 1, 2]
    total = sum(len(tt) for _, tt, _ in frames)
    assert total == 5000
    for fid, tt, dd in frames:
        assert tt.dtype == np.int32 and (tt >= 0).all()
        assert (tt < FRAME_UNITS).all()
    # Delta codec roundtrip at each width class.
    for scale in (200, 60_000, 2_000_000, 20_000_000):
        times = np.cumsum(rng.integers(0, scale, 300)).astype(np.int64)
        enc = pack_deltas(times)
        out = unpack_deltas(enc, len(times))
        np.testing.assert_array_equal(out, times)
        assert len(enc) <= 4 * len(times) + 5
