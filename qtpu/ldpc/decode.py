"""Batched belief-propagation decoding in pure JAX (XLA path).

Reference capability: Bob's iterative BP decode loop — "THE hot loop" of the
``-ldpc`` fork (SURVEY.md §4.4) — redesigned for TPU:

- **DP over blocks**: the batch of independent key blocks rides the trailing
  (lane) axis of every tensor; 1024 concurrent n=4096 decodes are one program
  (BASELINE.json config 2).
- **QC structure**: the check-major ↔ variable-major edge permutation is a
  static circulant roll per base edge (~48 rolls/iteration), never a gather.
- **Flooding schedule with convergence freezing**: a `lax.while_loop` runs
  until every block's hard decision matches its target syndrome (or max
  iters); converged blocks freeze (masked no-ops) so their outputs and
  iteration counts are exact.

Bit-exactness contract with qtpu.ldpc.golden (min-sum): identical float32
operation order — sequential slot accumulation, "first minimal slot wins",
sign(0) = +1.  Tests assert decoded bits and iteration counts match exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from qtpu.ldpc.codes import QCCode

__all__ = ["make_batch_decoder", "BatchDecodeResult", "channel_llr", "BIG_LLR"]

BIG_LLR = 1e9  # shortened-bit prior magnitude (matches golden.BIG_LLR)


def channel_llr(bits: jax.Array, qber: jax.Array | float) -> jax.Array:
    """BSC LLRs log(P(0)/P(1)) for observed bits; qber may be per-block.

    bits: (..., n) 0/1; qber: scalar or broadcastable to bits' leading dims.
    """
    q = jnp.asarray(qber, dtype=jnp.float32)
    mag = jnp.log((1.0 - q) / q)
    mag = jnp.broadcast_to(mag[..., None] if mag.ndim else mag, bits.shape)
    return jnp.where(bits.astype(bool), -mag, mag).astype(jnp.float32)


def _leave_one_out_min(mags):
    """other[k] = min over j != k of mags[j] via prefix/suffix running mins
    (exact float min — value-identical to a two-smallest scan, fewer ops;
    the golden model uses the same construction)."""
    d = len(mags)
    pre = [None] * d
    run = None
    for k in range(d):
        pre[k] = run
        run = mags[k] if run is None else jnp.minimum(run, mags[k])
    suf = None
    out = [None] * d
    for k in range(d - 1, -1, -1):
        if suf is None:
            out[k] = pre[k]
        elif pre[k] is None:
            out[k] = suf
        else:
            out[k] = jnp.minimum(pre[k], suf)
        suf = mags[k] if suf is None else jnp.minimum(suf, mags[k])
    return out


class BatchDecodeResult(NamedTuple):
    bits: jax.Array        # (B, n) uint8 hard decisions (all n variables)
    converged: jax.Array   # (B,) bool
    iterations: jax.Array  # (B,) int32 — check-update rounds consumed


def make_batch_decoder(code: QCCode, max_iters: int = 50, alg: str = "minsum",
                       alpha: float = 0.8125):
    """Build a jitted batched decoder ``(llr (B,n) f32, syndrome (B,m)) -> BatchDecodeResult``.

    The code's base graph is baked in as static structure (shifts become
    static slice/concat pairs under XLA).

    alg="layered": row-layered normalized min-sum — base rows update
    sequentially with immediate posterior updates (the classic
    high-throughput schedule, cf. the row-layered GPU decoders in PAPERS.md);
    typically converges in about half the sweeps of flooding.  Bit-exact with
    the golden layered model.
    """
    if alg == "layered":
        return _make_layered_decoder(code, max_iters, alpha)
    if alg not in ("minsum", "sumprod"):
        raise ValueError(f"unknown alg {alg!r}")
    edge_col = [int(x) for x in code.edge_col]
    edge_shift = [int(x) for x in code.edge_shift]
    row_edges = [[int(e) for e in row if e >= 0] for row in code.row_edges]
    col_edges = [[int(e) for e in col if e >= 0] for col in code.col_edges]
    mb, nb, z, E = code.mb, code.nb, code.z, code.num_edges
    alpha_f = jnp.float32(alpha)

    def _sign(x):
        return jnp.where(x < 0, jnp.float32(-1.0), jnp.float32(1.0))

    def _totals(llr, c2v):
        """Posterior totals (nb, z, B) from chk-view c2v (E, z, B)."""
        # Sequential slot order per column — golden-model contract.
        total = []
        for j in range(nb):
            t = llr[j]
            for e in col_edges[j]:
                t = t + jnp.roll(c2v[e], edge_shift[e], axis=0)
            total.append(t)
        return jnp.stack(total)

    def _chk_view_and_syndrome(total, c2v):
        """Compute v2c (chk view), hard bits' syndrome, per-block match mask."""
        t_chk = [jnp.roll(total[edge_col[e]], -edge_shift[e], axis=0) for e in range(E)]
        v2c = [t_chk[e] - c2v[e] for e in range(E)]
        # Hard-decision bit (chk view) is the sign bit of the posterior.
        syn_hat = []
        for i in range(mb):
            p = None
            for e in row_edges[i]:
                b = (t_chk[e] < 0)
                p = b if p is None else p ^ b
            syn_hat.append(p)
        return jnp.stack(v2c), jnp.stack(syn_hat)  # (E,z,B), (mb,z,B)

    def _check_update_minsum(v2c, syn_sign):
        """Normalized min-sum over each base row; returns new c2v (E, z, B)."""
        out = [None] * E
        for i in range(mb):
            slots = row_edges[i]
            msgs = [v2c[e] for e in slots]
            signs = [_sign(m) for m in msgs]
            mags = [jnp.abs(m) for m in msgs]
            sign_all = signs[0]
            for sgn in signs[1:]:
                sign_all = sign_all * sgn
            others = _leave_one_out_min(mags)
            coset = syn_sign[i]
            for k, e in enumerate(slots):
                out[e] = alpha_f * coset * sign_all * signs[k] * others[k]
        return jnp.stack(out)

    def _check_update_sumprod(v2c, syn_sign):
        out = [None] * E
        eps = jnp.float32(1e-12)
        for i in range(mb):
            slots = row_edges[i]
            msgs = [jnp.clip(v2c[e], -30.0, 30.0) for e in slots]
            tanhs = [jnp.tanh(m * jnp.float32(0.5)) for m in msgs]
            d = len(slots)
            prefix = [jnp.ones_like(tanhs[0])]
            for k in range(d - 1):
                prefix.append(prefix[-1] * tanhs[k])
            suffix = [jnp.ones_like(tanhs[0])]
            for k in range(d - 1, 0, -1):
                suffix.append(suffix[-1] * tanhs[k])
            suffix = suffix[::-1]
            coset = syn_sign[i]
            for k, e in enumerate(slots):
                t = jnp.clip(prefix[k] * suffix[k], -1 + 1e-7, 1 - 1e-7)
                val = jnp.float32(2.0) * jnp.arctanh(t) * coset
                out[e] = jnp.where(jnp.abs(t) < eps, jnp.float32(0.0), val)
        return jnp.stack(out)

    _check_update = _check_update_minsum if alg == "minsum" else _check_update_sumprod

    @jax.jit
    def decode(llr: jax.Array, syndrome: jax.Array) -> BatchDecodeResult:
        bsz = llr.shape[0]
        llr_i = jnp.transpose(llr.reshape(bsz, nb, z), (1, 2, 0)).astype(jnp.float32)
        syn_i = jnp.transpose(syndrome.reshape(bsz, mb, z), (1, 2, 0))
        syn_sign = (1.0 - 2.0 * syn_i.astype(jnp.float32))
        syn_bool = syn_i.astype(bool)

        def converged_mask(total, c2v):
            v2c, syn_hat = _chk_view_and_syndrome(total, c2v)
            ok = jnp.all(syn_hat == syn_bool, axis=(0, 1))  # (B,)
            return v2c, ok

        # Derive the zero init from the inputs so its sharding variance
        # matches under shard_map (a plain zeros() is "unvarying" and breaks
        # the while_loop carry typing on a mesh).
        c2v0 = jnp.zeros((E, z, bsz), dtype=jnp.float32) + 0.0 * llr_i[:1, :1, :]
        total0 = _totals(llr_i, c2v0)
        v2c0, ok0 = converged_mask(total0, c2v0)

        def cond(state):
            _, _, _, ok, _, it = state
            return jnp.logical_and(it < max_iters, ~jnp.all(ok))

        def body(state):
            c2v, total, v2c, ok, iters, it = state
            c2v_new = _check_update(v2c, syn_sign)
            total_new = _totals(llr_i, c2v_new)
            v2c_new, ok_new = converged_mask(total_new, c2v_new)
            # Freeze blocks that had already converged (ok from previous
            # rounds) so their bits and iteration counts stay exact.
            keep = ok  # (B,) — True: retain previous state
            c2v = jnp.where(keep[None, None, :], c2v, c2v_new)
            total = jnp.where(keep[None, None, :], total, total_new)
            v2c = jnp.where(keep[None, None, :], v2c, v2c_new)
            iters = jnp.where(keep, iters, it + 1)
            ok = jnp.logical_or(ok, ok_new)
            return c2v, total, v2c, ok, iters, it + 1

        iters0 = jnp.zeros((bsz,), jnp.int32) + 0 * ok0.astype(jnp.int32)
        state = (c2v0, total0, v2c0, ok0, iters0, jnp.int32(0))
        c2v, total, v2c, ok, iters, _ = jax.lax.while_loop(cond, body, state)

        bits = jnp.transpose((total < 0).astype(jnp.uint8), (2, 0, 1)).reshape(bsz, nb * z)
        return BatchDecodeResult(bits=bits, converged=ok, iterations=iters)

    return decode


def _make_layered_decoder(code: QCCode, max_iters: int, alpha: float):
    """Row-layered normalized min-sum (XLA path); op order mirrors
    qtpu.ldpc.golden._decode_layered exactly."""
    edge_col = [int(x) for x in code.edge_col]
    edge_shift = [int(x) for x in code.edge_shift]
    row_edges = [[int(e) for e in row if e >= 0] for row in code.row_edges]
    mb, nb, z, E = code.mb, code.nb, code.z, code.num_edges
    alpha_f = jnp.float32(alpha)

    def _sign(x):
        return jnp.where(x < 0, jnp.float32(-1.0), jnp.float32(1.0))

    def _syndrome_ok(totals, syn_sign):
        worst = None
        for i in range(mb):
            prod = syn_sign[i]
            for e in row_edges[i]:
                t_chk = jnp.roll(totals[edge_col[e]], -edge_shift[e], axis=0)
                prod = prod * _sign(t_chk)
            row_min = jnp.min(prod, axis=0)  # (B,)
            worst = row_min if worst is None else jnp.minimum(worst, row_min)
        return worst > 0  # (B,)

    def _sweep(llr_i, totals, c2v, syn_sign):
        """One layered sweep; also returns the FUSED convergence check —
        each row's parity from the sign of the rolled totals the update
        needs anyway (pre-update of that row; same contract as
        golden._decode_layered v2 — no separate syndrome pass)."""
        c2v_list = [c2v[e] for e in range(E)]
        totals_list = [totals[j] for j in range(nb)]
        worst = None
        for i in range(mb):
            slots = row_edges[i]
            t_chk = [jnp.roll(totals_list[edge_col[e]], -edge_shift[e], axis=0)
                     for e in slots]
            prod = syn_sign[i]
            for t in t_chk:
                prod = prod * _sign(t)
            row_min = jnp.min(prod, axis=0)  # (B,)
            worst = row_min if worst is None else jnp.minimum(worst, row_min)
            msgs = [t_chk[k] - c2v_list[e] for k, e in enumerate(slots)]
            signs = [_sign(m) for m in msgs]
            mags = [jnp.abs(m) for m in msgs]
            sign_all = signs[0]
            for sgn in signs[1:]:
                sign_all = sign_all * sgn
            others = _leave_one_out_min(mags)
            coset = syn_sign[i]
            for k, e in enumerate(slots):
                new = alpha_f * coset * sign_all * signs[k] * others[k]
                delta = new - c2v_list[e]
                c2v_list[e] = new
                j = edge_col[e]
                totals_list[j] = totals_list[j] + jnp.roll(
                    delta, edge_shift[e], axis=0)
        return jnp.stack(totals_list), jnp.stack(c2v_list), worst > 0

    @jax.jit
    def decode(llr: jax.Array, syndrome: jax.Array) -> BatchDecodeResult:
        bsz = llr.shape[0]
        llr_i = jnp.transpose(llr.reshape(bsz, nb, z), (1, 2, 0)).astype(jnp.float32)
        syn_i = jnp.transpose(syndrome.reshape(bsz, mb, z), (1, 2, 0))
        syn_sign = (1.0 - 2.0 * syn_i.astype(jnp.float32))

        totals0 = llr_i + 0.0
        c2v0 = jnp.zeros((E, z, bsz), jnp.float32) + 0.0 * llr_i[:1, :1, :]
        ok0 = _syndrome_ok(totals0, syn_sign)
        iters0 = jnp.zeros((bsz,), jnp.int32) + 0 * ok0.astype(jnp.int32)

        def cond(state):
            _, _, ok, _, it = state
            return jnp.logical_and(it < max_iters, ~jnp.all(ok))

        def body(state):
            totals, c2v, ok, iters, it = state
            totals_new, c2v_new, ok_new = _sweep(llr_i, totals, c2v, syn_sign)
            keep = ok  # freeze converged blocks
            totals = jnp.where(keep[None, None, :], totals, totals_new)
            c2v = jnp.where(keep[None, None, :], c2v, c2v_new)
            iters = jnp.where(keep, iters, it + 1)
            ok = jnp.logical_or(ok, ok_new)
            return totals, c2v, ok, iters, it + 1

        totals, c2v, ok, iters, _ = jax.lax.while_loop(
            cond, body, (totals0, c2v0, ok0, iters0, jnp.int32(0)))
        bits = jnp.transpose((totals < 0).astype(jnp.uint8),
                             (2, 0, 1)).reshape(bsz, nb * z)
        return BatchDecodeResult(bits=bits, converged=ok, iterations=iters)

    return decode
