"""Density-evolution code design (qtpu.ldpc.design).

The DE machinery is validated against the textbook anchor — the (3,6)-regular
ensemble's min-sum threshold on the BSC — plus internal consistency checks
(mass conservation, rate monotonicity) and an optimizer smoke test.
"""

import numpy as np
import pytest

from qtpu.ldpc.design import MinSumDE, de_threshold, optimize_profile
from qtpu.ldpc.codes import irregular_profile


def test_regular_36_threshold_anchor():
    # Sum-product (3,6) on BSC has threshold ~0.084; normalized min-sum
    # (alpha 13/16) lands just below.  Measured finite-length ceilings
    # (n=4096: 7.25%) sit under the asymptote, as they must.
    th = de_threshold([3] * 32, 16, bins=512, max_iters=120)
    assert 0.072 <= th <= 0.092, th


def test_threshold_monotone_in_rate():
    # Fewer checks (higher rate) must lower the threshold.
    ths = [de_threshold([3] * 32, mb, bins=256, max_iters=60)
           for mb in (16, 11, 7)]
    assert ths[0] > ths[1] > ths[2] > 0.0, ths


def test_densities_conserve_mass():
    de = MinSumDE(0.03, bins=256)
    prof = irregular_profile(32, 9)
    dvs = sorted(set(prof))
    cnt = {d: sum(1 for x in prof if x == d) for d in dvs}
    E = float(sum(prof))
    vf = [cnt[d] * d / E for d in dvs]
    c2v = np.zeros(2 * de.B + 1)
    c2v[de.B] = 1.0
    for _ in range(30):
        v2c = de.var_update(c2v, dvs, vf)
        assert abs(v2c.sum() - 1.0) < 1e-9
        c2v = de.chk_update(v2c, [11, 12], [0.5, 0.5])
        assert abs(c2v.sum() - 1.0) < 1e-9
    # 3% is below this rate-0.72-class ensemble's threshold (~3.45%): after
    # 30 iterations the message error must sit well under the channel rate.
    assert de.err(c2v) < 0.01


def test_check_update_exact_two_point():
    # dc=3 (k=2 inputs), inputs = +/-m two-point density: min-sum output is
    # +m w.p. p^2+q^2 and -m w.p. 2pq (alpha-scaled magnitude).  Exercises
    # the tail-sum construction against a hand computation.
    de = MinSumDE(0.1, alpha=1.0, bins=128)
    v2c = np.zeros(2 * de.B + 1)
    kb = int(round(de.mag / de.delta))
    p = 0.8
    v2c[de.B + kb] = p
    v2c[de.B - kb] = 1 - p
    out = de.chk_update(v2c, [3], [1.0])
    assert out[de.B + kb] == pytest.approx(p * p + (1 - p) * (1 - p))
    assert out[de.B - kb] == pytest.approx(2 * p * (1 - p))


def test_optimizer_smoke_improves_or_holds():
    init = irregular_profile(32, 9)
    prof, th = optimize_profile(32, 9, init=init, rounds=12, bins=256,
                                max_iters=60, seed=3)
    th0 = de_threshold(init, 9, bins=256, max_iters=60)
    assert th >= th0 - 1e-9
    assert len(prof) == 32 and all(2 <= d <= 9 for d in prof)
    assert sum(1 for d in prof if d == 2) <= 8
