"""Density-evolution code design for BSC min-sum reconciliation.

Reference capability: the `-ldpc` fork ships fixed parity-check matrices
(SURVEY.md §3 #13 "parity-check matrix construction/loading"); qtpu
constructs codes programmatically (qtpu.ldpc.codes) and this module supplies
the *design* step: given a target rate, find the base-column degree profile
with the best asymptotic decoding threshold under the production decoder
(normalized min-sum, alpha = 13/16) on the BSC.

Discrete density evolution (Chen & Fossorier's min-sum DE, specialized to
the two-point BSC channel density):

  * Message densities live on a uniform signed LLR grid (saturating ends).
  * Variable update = pmf convolution (channel ⊛ (dv-1)-fold c2v).
  * Min-sum check update is EXACT on the grid via magnitude tail sums:
    for iid inputs with magnitude-tail F(m) = P(|X| >= m) and signed tail
    S(m) = sum_{|x|>=m} sign(x) p(x),
        P(min >= m, sign prod = +1) = (F(m)^k + S(m)^k) / 2
    so the output pmf falls out of first differences; the alpha scaling is
    a magnitude re-bin (floor — conservative).
  * sign(0) = +1, matching the golden model/kernels (qtpu.ldpc.golden).

Degree distributions are taken at BASE-GRAPH granularity: nb columns with
integer degrees (each lifted to z variables), balanced row degrees q/q+1 —
exactly what make_irregular_code realizes — so a DE-optimized profile maps
1:1 onto a buildable QC code.

Everything is plain NumPy on host: code design is an offline step (the
output — a degree profile — is protocol configuration, like the frozen
calibration tables in qtpu.ldpc.calibrate).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["MinSumDE", "de_threshold", "optimize_profile"]


class MinSumDE:
    """Density evolution for normalized min-sum over BSC(q).

    Args:
      bins: number of magnitude bins (grid has 2*bins+1 signed points).
      max_llr: saturation magnitude, in units of the channel LLR magnitude
        (messages rarely exceed ~dv * channel magnitude before saturation
        matters; 16 is generous for dv <= 12).
    """

    def __init__(self, qber: float, alpha: float = 0.8125,
                 bins: int = 1024, max_llr_mult: float = 16.0):
        assert 0.0 < qber < 0.5
        self.q = float(qber)
        self.alpha = float(alpha)
        self.B = int(bins)
        self.mag = float(np.log((1.0 - qber) / qber))
        self.delta = max_llr_mult * self.mag / self.B
        # Channel density: +mag w.p. 1-q, -mag w.p. q (all-zero codeword,
        # symmetric channel — the coset trick makes reconciliation identical).
        self.ch = np.zeros(2 * self.B + 1)
        kb = min(self.B, int(round(self.mag / self.delta)))
        self.ch[self.B + kb] = 1.0 - self.q
        self.ch[self.B - kb] = self.q
        # Precompute alpha re-bin map for magnitudes 0..B (floor).
        m = np.arange(self.B + 1)
        self.alpha_map = np.floor(self.alpha * m).astype(np.int64)

    def err(self, pmf: np.ndarray) -> float:
        """Message error probability: P(x < 0) + P(x == 0)/2."""
        return float(pmf[: self.B].sum() + 0.5 * pmf[self.B])

    def var_update(self, c2v: np.ndarray, dvs: Sequence[int],
                   edge_frac: Sequence[float]) -> np.ndarray:
        """Edge-averaged v2c density: ch ⊛ (d-1)-fold c2v, mixed over the
        edge-perspective degree fractions."""
        out = np.zeros_like(c2v)
        # Build d-fold convolutions incrementally (degrees sorted).
        order = np.argsort(dvs)
        acc = self.ch.copy()
        have = 0  # number of c2v factors folded into acc
        for idx in order:
            d = int(dvs[idx])
            while have < d - 1:
                acc = self._conv(acc, c2v)
                have += 1
            out += float(edge_frac[idx]) * acc
        s = out.sum()
        return out / s if s > 0 else out

    def _conv(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Signed-grid convolution with saturation at the grid ends."""
        full = np.convolve(a, b)
        B = self.B
        c = 2 * B  # index of 0 in `full` (length 4B+1)
        out = full[c - B: c + B + 1].copy()
        out[0] += full[: c - B].sum()
        out[-1] += full[c + B + 1:].sum()
        return out

    def chk_update(self, v2c: np.ndarray, dcs: Sequence[int],
                   edge_frac: Sequence[float]) -> np.ndarray:
        """Edge-averaged c2v density under normalized min-sum (exact)."""
        B = self.B
        p_pos = v2c[B:].copy()          # magnitudes 0..B, positive sign
        p_pos[0] = v2c[B]               # sign(0) = +1 (golden convention)
        p_neg = np.zeros(B + 1)
        p_neg[1:] = v2c[B - 1:: -1]     # magnitudes 1..B, negative sign
        f = p_pos + p_neg               # magnitude pmf
        s = p_pos - p_neg               # signed difference
        # Tail sums over magnitude >= m  (index m = 0..B; F[B+1] = 0).
        F = np.concatenate([np.cumsum(f[::-1])[::-1], [0.0]])
        S = np.concatenate([np.cumsum(s[::-1])[::-1], [0.0]])
        out = np.zeros(2 * B + 1)
        for d, w in zip(dcs, edge_frac):
            k = int(d) - 1
            if k <= 0 or w == 0.0:
                continue
            Tp = 0.5 * (F ** k + S ** k)   # P(min >= m, sign +)
            Tm = 0.5 * (F ** k - S ** k)   # P(min >= m, sign -)
            pp = Tp[:-1] - Tp[1:]          # P(min == m, sign +)
            pm = Tm[:-1] - Tm[1:]
            # alpha re-bin (floor) onto the same grid.
            qp = np.bincount(self.alpha_map, weights=pp, minlength=B + 1)
            qm = np.bincount(self.alpha_map, weights=pm, minlength=B + 1)
            out[B:] += w * qp
            out[B - 1:: -1] += w * qm[1:]
            out[B] += w * qm[0]            # -0 == +0
        t = out.sum()
        return out / t if t > 0 else out

    def run(self, col_degrees: Sequence[int], mb: int,
            max_iters: int = 200, target: float = 1e-4) -> tuple[bool, int]:
        """Evolve densities for the (col_degrees, balanced-rows mb) ensemble.

        Returns (converged to < target message error, iterations used).
        Also stops early (failure) when the error stalls — the classic DE
        fixed-point plateau — to keep threshold searches fast.

        Why target 1e-4, not ~0: profiles with heavy degree-2 mass violate
        the asymptotic stability condition (the ensemble has a ~1e-5 error
        floor) yet their STRUCTURED finite realizations (cycle-broken QC
        lift, greedy distinct-row base graph, n ~ 1e4) decode cleanly —
        empirically irregular_profile_v2 (floor ~5e-5 at 2%) beats the
        stability-respecting legacy profile by +0.25% QBER at every rung.
        The design criterion must match the finite-length FER<=5% regime:
        residual message error ~1e-4 ≈ O(1) raw bit errors per block,
        which the waterfall has already decided.  Empirical calibration
        (qtpu.ldpc.calibrate) remains the ground truth gate.
        """
        dvs = sorted(set(int(d) for d in col_degrees))
        cnt = {d: 0 for d in dvs}
        for d in col_degrees:
            cnt[int(d)] += 1
        E = float(sum(col_degrees))
        v_frac = [cnt[d] * d / E for d in dvs]
        total = int(sum(col_degrees))
        qd, r = divmod(total, mb)
        dcs, c_frac = [], []
        if mb - r:
            dcs.append(qd)
            c_frac.append((mb - r) * qd / E)
        if r:
            dcs.append(qd + 1)
            c_frac.append(r * (qd + 1) / E)

        c2v = np.zeros(2 * self.B + 1)
        c2v[self.B] = 1.0  # iteration 0: no check info
        prev = 1.0
        stall = 0
        for it in range(1, max_iters + 1):
            v2c = self.var_update(c2v, dvs, v_frac)
            c2v = self.chk_update(v2c, dcs, c_frac)
            e = self.err(c2v)
            if e < target:
                return True, it
            if e > prev - 1e-9:
                stall += 1
                if stall >= 8:
                    return False, it
            else:
                stall = 0
            prev = e
        return False, max_iters


def de_threshold(col_degrees: Sequence[int], mb: int, alpha: float = 0.8125,
                 lo: float = 0.005, hi: float = 0.14, tol: float = 2.5e-4,
                 bins: int = 1024, max_iters: int = 200,
                 target: float = 1e-4) -> float:
    """Largest BSC error rate where DE converges (bisection to ``tol``)."""
    # Expand-verify the bracket ends first.
    if MinSumDE(hi, alpha, bins).run(col_degrees, mb, max_iters, target)[0]:
        return hi
    if not MinSumDE(lo, alpha, bins).run(col_degrees, mb, max_iters, target)[0]:
        return 0.0
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        ok, _ = MinSumDE(mid, alpha, bins).run(col_degrees, mb, max_iters,
                                               target)
        if ok:
            lo = mid
        else:
            hi = mid
    return lo


def optimize_profile(nb: int, mb: int, alpha: float = 0.8125,
                     max_deg: Optional[int] = None, bins: int = 768,
                     max_iters: int = 150, seed: int = 7,
                     rounds: int = 400, init: Optional[Sequence[int]] = None,
                     verbose: bool = False) -> tuple[list[int], float]:
    """Hill-climb the base-column degree profile for the best DE threshold.

    Constraints mirror the QC constructor's cycle-safety limits
    (qtpu.ldpc.codes): degrees in [2, min(mb, max_deg)], at most mb-1
    degree-2 columns (a simple base graph needs distinct rows per column and
    too much degree-2 mass creates low-weight cycle structures), and at most
    nb//2 degree-2 columns overall.

    Moves: bump one column's degree +/-1 (profiles are kept sorted — column
    identity is irrelevant at ensemble level).  Accept on strictly better
    threshold.  Deterministic from ``seed``.
    """
    cap = min(mb, max_deg if max_deg is not None else 12)
    max_d2 = min(mb - 1, nb // 2)
    rng = np.random.default_rng(seed)

    def legal(prof: list[int]) -> bool:
        return (len(prof) == nb and all(2 <= d <= cap for d in prof)
                and sum(1 for d in prof if d == 2) <= max_d2)

    if init is None:
        from qtpu.ldpc.codes import irregular_profile_v2
        init = irregular_profile_v2(nb, mb)
        init = [min(d, cap) for d in init]
    cur = sorted(int(d) for d in init)
    assert legal(cur), "initial profile violates constraints"
    cur_t = de_threshold(cur, mb, alpha, bins=bins, max_iters=max_iters)
    if verbose:
        print(f"init mb={mb}: threshold {cur_t:.4f} profile {cur}")
    for step in range(rounds):
        cand = list(cur)
        j = int(rng.integers(0, nb))
        cand[j] += int(rng.choice([-1, 1]))
        cand.sort()
        if not legal(cand) or cand == cur:
            continue
        t = de_threshold(cand, mb, alpha, bins=bins, max_iters=max_iters,
                         lo=max(0.005, cur_t - 0.01), hi=min(0.14, cur_t + 0.02))
        if t > cur_t + 1e-5:
            cur, cur_t = cand, t
            if verbose:
                print(f"  step {step}: threshold {cur_t:.4f} profile {cur}")
    return cur, cur_t
