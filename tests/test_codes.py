"""Tests for QC-LDPC code construction (BASELINE.json config 1 code)."""

import numpy as np
import pytest

from qtpu.ldpc.codes import make_regular_code, make_rate_ladder


def test_regular_code_structure():
    code = make_regular_code(4096)
    assert code.n == 4096
    assert code.m == 2048
    assert code.rate == pytest.approx(0.5)
    h = code.to_dense()
    assert np.all(h.sum(axis=1) == 6), "every check has degree 6"
    assert np.all(h.sum(axis=0) == 3), "every variable has degree 3"


def test_construction_is_deterministic():
    a = make_regular_code(4096, seed=42)
    b = make_regular_code(4096, seed=42)
    np.testing.assert_array_equal(a.edge_shift, b.edge_shift)
    np.testing.assert_array_equal(a.edge_row, b.edge_row)
    c = make_regular_code(4096, seed=43)
    assert not np.array_equal(a.edge_shift, c.edge_shift)


def test_no_lifted_4cycles():
    code = make_regular_code(4096)
    h = code.to_dense().astype(np.int32)
    # A 4-cycle exists iff two rows share >= 2 columns.
    gram = h @ h.T
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1, "girth >= 6 expected after shift repair"


def test_small_code_sizes():
    for n, dv, dc in [(1024, 3, 6), (2048, 3, 6), (4096, 4, 8)]:
        code = make_regular_code(n, dv, dc)
        assert code.n == n
        h = code.to_dense()
        assert np.all(h.sum(axis=1) == dc)
        assert np.all(h.sum(axis=0) == dv)


def test_rate_ladder():
    ladder = make_rate_ladder(4096)
    rates = ladder.rates()
    assert rates[0] == pytest.approx(0.5)
    assert all(b > a for a, b in zip(rates, rates[1:])), "rates ascend"
    assert rates[-1] >= 0.85
    # QBER-driven selection: low QBER → high rate, high QBER → low rate.
    assert ladder.select(0.01) > ladder.select(0.05)
    assert ladder.select(0.10) == 0
    # Default config carries measured QBER ceilings (qtpu.ldpc.calibrate).
    assert ladder.max_qber is not None
    assert all(a >= b for a, b in zip(ladder.max_qber, ladder.max_qber[1:])), \
        "ceilings descend as rate ascends"
    # Leakage bookkeeping is consistent with the rate formula.
    for step in ladder.steps:
        code = step.code
        r = step.effective_rate()
        assert step.leaked_bits() == pytest.approx(
            (1 - r) * (code.n - len(step.punct_cols) * code.z
                       - len(step.short_cols) * code.z), abs=1e-6)
        # Every mother code in the ladder is a valid simple graph: column
        # degrees match the base profile (mixed family: irregular rungs have
        # degree-2/3/high columns, regular rungs are uniform dv=3).
        h = code.to_dense()
        col_deg = h.sum(axis=0)
        assert col_deg.min() >= 2 and col_deg.max() <= code.mb
        base_deg = np.asarray([(code.col_edges[j] >= 0).sum()
                               for j in range(code.nb)])
        np.testing.assert_array_equal(
            col_deg.reshape(code.nb, code.z),
            np.repeat(base_deg[:, None], code.z, axis=1))


def test_native_family_ladder():
    """family="native": one native-rate irregular mother per rung, no
    puncturing (profile sweeps: puncturing costs ~0.5% QBER threshold)."""
    from qtpu.ldpc.codes import make_rate_ladder
    lad = make_rate_ladder(4096, family="native", alg="layered")
    rates = []
    for step in lad.steps:
        assert step.punct_cols == () and step.short_cols == ()
        step.code.validate()
        rates.append(step.effective_rate())
        # native rate == design rate == 1 - mb/nb
        assert abs(step.effective_rate() - step.code.rate) < 1e-12
    assert rates == sorted(rates)
    assert len({s.code.mb for s in lad.steps}) == len(lad.steps)
    # Deterministic protocol configuration: same seed -> identical codes.
    lad2 = make_rate_ladder(4096, family="native", alg="layered")
    for a, b in zip(lad.steps, lad2.steps):
        np.testing.assert_array_equal(a.code.edge_shift, b.code.edge_shift)


def test_native2_family_ladder():
    """family="native2": native-rate mothers with the optimized v2 profile
    (max degree-2 mass, deg-4 shoulder, 3-column tail); valid at every
    production rung and deterministic like native."""
    from qtpu.ldpc.codes import (PRODUCTION_RATES, irregular_profile_v2,
                                 make_rate_ladder)
    lad = make_rate_ladder(16384, family="native2", alg="layered",
                           target_rates=PRODUCTION_RATES)
    assert len(lad.steps) == len(PRODUCTION_RATES)
    for step in lad.steps:
        assert step.punct_cols == () and step.short_cols == ()
        step.code.validate()
        nb, mb = step.code.nb, step.code.mb
        prof = irregular_profile_v2(nb, mb)
        assert len(prof) == nb and sum(prof) == step.code.num_edges
        assert max(prof) <= mb  # simple columns: distinct rows exist
        assert prof.count(2) == min(mb - 1, nb // 2)  # cycle-safety cap
    assert [s.code.mb for s in lad.steps] == [16, 13, 11, 9, 7, 5, 4]
    lad2 = make_rate_ladder(16384, family="native2", alg="layered",
                            target_rates=PRODUCTION_RATES)
    for a, b in zip(lad.steps, lad2.steps):
        np.testing.assert_array_equal(a.code.edge_shift, b.code.edge_shift)
