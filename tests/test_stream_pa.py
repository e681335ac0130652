"""Streaming privacy amplification (BASELINE.json:5 'streaming across block
boundaries'): overlap-save scan and mesh-sharded psum variants must be
bit-exact vs the golden Toeplitz mat-vec at segment/shard-crossing offsets,
and the session's stream-PA mode must yield identical keys on both parties
(single-device and DP-mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qtpu import pa as pa_mod
from qtpu.parallel import make_mesh, make_stream_pa
from qtpu.pipeline import PipelineConfig, run_loopback


def test_stream_toeplitz_matches_golden_across_segments():
    rng = np.random.default_rng(0)
    # 4 segments of 512; m chosen so outputs depend on every segment.
    N, m, seg = 2048, 300, 512
    x = rng.integers(0, 2, N).astype(np.uint8)
    t = rng.integers(0, 2, m + N - 1).astype(np.uint8)
    got = np.asarray(pa_mod.stream_toeplitz(jnp.asarray(t), jnp.asarray(x),
                                            m, segment=seg))
    want = pa_mod.toeplitz_hash_golden(t, x, m)
    np.testing.assert_array_equal(got, want)


def test_stream_toeplitz_single_segment_and_odd_m():
    rng = np.random.default_rng(1)
    N, m = 1024, 77
    x = rng.integers(0, 2, N).astype(np.uint8)
    t = rng.integers(0, 2, m + N - 1).astype(np.uint8)
    got = np.asarray(pa_mod.stream_toeplitz(jnp.asarray(t), jnp.asarray(x), m,
                                            segment=1024))
    np.testing.assert_array_equal(got, pa_mod.toeplitz_hash_golden(t, x, m))


def test_mesh_stream_pa_matches_golden():
    mesh = make_mesh("stream", num=8)
    rng = np.random.default_rng(2)
    N, m = 4096, 513   # shard length 512; m spans multiple shard windows
    x = rng.integers(0, 2, N).astype(np.uint8)
    t = rng.integers(0, 2, m + N - 1).astype(np.uint8)
    pa = make_stream_pa(mesh, N, m)
    got = np.asarray(pa(jnp.asarray(t), jnp.asarray(x)))
    np.testing.assert_array_equal(got, pa_mod.toeplitz_hash_golden(t, x, m))


def _run(cfg, mesh=None, seed=3):
    from qtpu.link import make_loopback_pair
    from qtpu.pipeline import AliceSession, BobSession
    rng = np.random.default_rng(seed)
    total = 60_000
    a_bits = rng.integers(0, 2, total).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(total) < 0.02).astype(np.uint8)
    la, lb = make_loopback_pair()
    alice = AliceSession(cfg, 11, la)
    bob = BobSession(cfg, 11, lb, mesh=mesh)
    alice.push_sifted(a_bits)
    bob.push_sifted(b_bits)
    for _ in range(10_000):
        progressed = alice.can_start_window()
        if progressed:
            alice.start_window()
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
            break
    return alice, bob


def _cfg(**kw):
    base = dict(n=1024, blocks_per_window=8, qber_test_bits=512, pa_mode="stream",
                pa_stream_windows=2)
    base.update(kw)
    return PipelineConfig(**base)


def test_session_stream_pa_mode():
    alice, bob = _run(_cfg())
    ka, kb = alice.final_key_bits(), bob.final_key_bits()
    assert len(ka) > 0, "stream flushes must emit key"
    np.testing.assert_array_equal(ka, kb)
    assert alice.ledger.as_dict() == bob.ledger.as_dict()
    # One flush per pa_stream_windows completed windows.
    assert alice._stream_flushes >= 2
    assert alice.final_key_index == bob.final_key_index


def test_session_stream_pa_mode_on_mesh():
    mesh = make_mesh("blocks", num=8)
    alice, bob = _run(_cfg())
    alice_m, bob_m = _run(_cfg(), mesh=mesh)
    np.testing.assert_array_equal(bob.final_key_bits(),
                                  bob_m.final_key_bits())
    np.testing.assert_array_equal(alice_m.final_key_bits(),
                                  bob_m.final_key_bits())
    assert bob.ledger.as_dict() == bob_m.ledger.as_dict()
