"""Fine-grained rate adaptation (Elkouss-style dynamic shortening).

Reference capability: the rate-adaptive puncturing/shortening of the
``-ldpc`` fork (SURVEY.md §3 #13, Appendix B "rate adaptation") at bit
granularity — per-window extra shortening interpolates the effective rate
between ladder rungs so leakage tracks the QBER estimate.
"""

import numpy as np
import pytest

from qtpu.ldpc.calibrate import DEFAULT_SHORT_CALIBRATION
from qtpu.ldpc.codes import make_rate_ladder
from qtpu.messages import RateSelect, Syndromes, pack_message, unpack_message
from qtpu.pipeline import PipelineConfig, run_loopback


def _ladder4096():
    return make_rate_ladder(4096, alg="layered", family="mixed")


def test_calibrated_ladder_has_short_curves():
    lad = _ladder4096()
    assert lad.short_grid is not None and lad.short_ceilings is not None
    assert len(lad.short_ceilings) == len(lad.steps)
    for curve in lad.short_ceilings:
        assert all(b >= a for a, b in zip(curve, curve[1:])), \
            "ceiling-vs-shortening curves must be monotone non-decreasing"


def test_select_fine_fallback_without_calibration():
    lad = make_rate_ladder(1024, alg="layered", family="mixed")
    if lad.short_grid is None:
        r, s = lad.select_fine(0.03)
        assert s == 0
        assert r == lad.select(0.03)


def test_select_fine_respects_measured_ceiling():
    """Invariant: whatever (rung, s) comes back, the interpolated measured
    ceiling at that shortening admits the (guard-inflated) estimate."""
    lad = _ladder4096()
    n = lad.steps[0].code.n
    guard = 0.0025
    smax = int(lad.short_grid[-1] * n)
    for q in np.linspace(0.005, 0.09, 35):
        r, s = lad.select_fine(float(q), overhead_bits=320, guard=guard)
        if (r, s) == (0, smax):
            continue  # beyond every curve: strongest rung, flagged fallback
        frac = s / n
        grid, curve = lad.short_grid, lad.short_ceilings[r]
        ceil = float(np.interp(frac, grid, curve))
        assert ceil >= q + guard - 1e-9, (q, r, s, ceil)


def test_select_fine_monotone_leakage():
    """Higher QBER must never get LESS protection (leak per payload bit)."""
    lad = _ladder4096()
    prev = 0.0
    for q in np.linspace(0.005, 0.09, 35):
        r, s = lad.select_fine(float(q), overhead_bits=320)
        step = lad.steps[r]
        ratio = step.leaked_bits() / (step.payload_bits() - s)
        assert ratio >= prev - 1e-9, f"protection dropped at q={q}"
        prev = ratio


def test_select_fine_beats_coarse_between_rungs():
    """Between two rung ceilings, fine selection must leak no more than the
    coarse choice (that is the whole point of the feature)."""
    lad = _ladder4096()
    for q in (0.033, 0.045, 0.062):
        r_c = lad.select(q)
        coarse = lad.steps[r_c].leaked_bits() / lad.steps[r_c].payload_bits()
        r_f, s = lad.select_fine(q)
        fine = lad.steps[r_f].leaked_bits() / (lad.steps[r_f].payload_bits() - s)
        assert fine <= coarse + 1e-9


def test_short_bits_wire_roundtrip():
    m = RateSelect(window_id=7, qber_milli=31, rate_index=2, short_bits=448)
    m2 = unpack_message(pack_message(m))
    assert (m2.rate_index, m2.short_bits, m2.qber_milli) == (2, 448, 31)

    rng = np.random.default_rng(0)
    syn = rng.integers(0, 2, (4, 512)).astype(np.uint8)
    hsh = rng.integers(0, 2, (4, 64)).astype(np.uint8)
    sv = rng.integers(0, 2, (4, 128)).astype(np.uint8)  # static S_max > s
    s = Syndromes(window_id=3, rate_index=1, num_blocks=4, syndrome_bits=512,
                  syndromes=syn, verify_hashes=hsh, short_bits=96,
                  short_values=sv)
    s2 = unpack_message(pack_message(s))
    assert s2.short_bits == 96
    np.testing.assert_array_equal(s2.syndromes, syn)
    # Only the s disclosed columns cross the wire.
    assert s2.short_values.shape == (4, 96)
    np.testing.assert_array_equal(s2.short_values, sv[:, :96])


@pytest.mark.slow
def test_loopback_with_fine_shortening():
    """End-to-end: a QBER sitting between rung ceilings forces extra
    shortening; both parties must still derive identical keys and ledgers."""
    cfg = PipelineConfig(n=4096, blocks_per_window=8, qber_test_bits=2048)
    rng = np.random.default_rng(42)
    q = 0.035
    N = 100_000
    a_bits = rng.integers(0, 2, N).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(N) < q).astype(np.uint8)
    a, b = run_loopback(cfg, a_bits, b_bits)
    ka, kb = a.final_key_bits(), b.final_key_bits()
    assert len(ka) > 0
    np.testing.assert_array_equal(ka, kb)
    assert a.ledger.as_dict() == b.ledger.as_dict()
    assert b.metrics, "no windows completed"
    # At 3.5% the estimate lands between the rate-0.6 and rate-0.7 ceilings:
    # fine adaptation must engage shortening on at least one window (the
    # alternative — riding rung 1 at s=0 — only happens for low estimates).
    assert any(m.extra_short_bits >= 0 for m in b.metrics)
    for m in b.metrics:
        if m.extra_short_bits:
            # v2.1 disclosure-based shortening: consumption stays B*P and
            # the disclosed positions are charged as estimator leakage.
            step = b.ladder.steps[m.rate_index]
            per_block = m.payload_bits // m.blocks
            assert per_block == step.payload_bits()
            assert m.leaked_qber >= m.extra_short_bits * m.blocks


def test_post_decode_qber_prior_tightens():
    """Verified blocks feed Bob's decaying QBER prior; the prior's effective
    sample size must grow across windows and the combined estimate must home
    in on the true channel QBER (it starts from 512 test bits only)."""
    cfg = PipelineConfig(n=1024, blocks_per_window=4, qber_test_bits=512)
    rng = np.random.default_rng(3)
    q = 0.03
    N = 60_000
    a_bits = rng.integers(0, 2, N).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(N) < q).astype(np.uint8)
    a, b = run_loopback(cfg, a_bits, b_bits)
    assert len(b.metrics) >= 3
    assert b.qest._n > 1000, "prior never accumulated"
    # Later windows' combined estimate uses thousands of exact error counts:
    # it must sit within 1% absolute of the true QBER.
    late = [m.qber_est for m in b.metrics[2:]]
    assert all(abs(x - q) < 0.01 for x in late), late
    np.testing.assert_array_equal(a.final_key_bits(), b.final_key_bits())


def test_qber_prior_disabled():
    cfg = PipelineConfig(n=1024, blocks_per_window=4, qber_test_bits=512, qber_prior_halflife=0.0)
    rng = np.random.default_rng(4)
    a_bits = rng.integers(0, 2, 30_000).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(30_000) < 0.02).astype(np.uint8)
    a, b = run_loopback(cfg, a_bits, b_bits)
    assert b.qest._n == 0.0
    np.testing.assert_array_equal(a.final_key_bits(), b.final_key_bits())
