"""Fused belief-propagation decoding as a Pallas TPU kernel.

Reference capability: the BP decode hot loop (SURVEY.md §4.4); BASELINE
north-star: "BP decoder runs as fused Pallas kernels — variable-to-check and
check-to-variable message passing vectorized over thousands of concurrent key
blocks, min-sum updates in VMEM, early-termination via syndrome check
on-chip".

Why a kernel: the pure-XLA decoder (qtpu.ldpc.decode) moves every message
tensor through HBM once per fused op per iteration (~5 ms/iteration at
B=1024, n=4096 — measured 0.12 Gbit/s end to end).  Here the whole decoder
state lives in VMEM for the entire decode:

    per batch tile of 128 blocks (lane axis):
      llr        (nb, z, 128) f32   2 MB    read once from HBM
      syndrome   (mb, z, 128) i8    0.25 MB read once
      c2v msgs   (E,  z, 128) f32   6 MB    never touches HBM
      totals     (nb, z, 128) f32   2 MB    never touches HBM
      bits out   (nb, z, 128) i8    0.5 MB  doubles as the convergence latch
    (double-buffered inputs + scratch must fit the 16 MB VMEM budget —
    an f32 syndrome + separate latch buffer overflowed it by 1 MB)

HBM traffic is ~5.5 MB per 128 blocks *total* (vs ~600 MB/iteration for the
XLA path).  The check<->variable permutation is a static circulant roll on
the sublane (z) axis — the QC code design (qtpu.ldpc.codes) exists for this.
The grid walks batch tiles sequentially; each tile exits its decode loop as
soon as every lane's syndrome matches (on-chip early termination).

Bit-exactness: identical float32 op order as qtpu.ldpc.golden /
qtpu.ldpc.decode (sequential slot accumulation, first-min-wins, sign(0)=+1,
same multiply chain) — tests assert bits and iteration counts match the
golden model exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

from qtpu.ldpc.codes import QCCode
from qtpu.ldpc.decode import BatchDecodeResult

__all__ = ["make_pallas_decoder", "default_batch_tile"]


def default_batch_tile(code: QCCode, dtype=jnp.float32) -> int:
    """Largest batch tile whose kernel state fits the ~16 MB VMEM budget.

    State per block: c2v (E·z) + totals/llr (2·nb·z) in ``dtype`` plus int8
    syndrome/bits; n=4096 (3,6)-regular fits the full 128-lane tile, n=16384
    drops to 32 (the lane axis is then underfilled — the price of keeping
    4x-longer blocks VMEM-resident; see the transposed layout backlog note).
    """
    bytes_per = jnp.dtype(dtype).itemsize
    per_block = ((code.num_edges + 2 * code.nb) * code.z * bytes_per
                 + (code.mb + 2 * code.nb) * code.z)  # syndrome + bits + pad
    budget = 12 * 1024 * 1024  # leave headroom for double buffering
    for bt in (128, 64, 32, 16, 8):
        if per_block * bt <= budget:
            return bt
    return 8


def make_pallas_decoder(code: QCCode, max_iters: int = 50,
                        alpha: float = 0.8125, batch_tile: int | None = None,
                        interpret: bool = False, alg: str = "minsum",
                        dtype=jnp.float32, layout: str = "auto"):
    """Build a jitted Pallas decoder ``(llr (B,n) f32, syndrome (B,m)) ->
    BatchDecodeResult``; B must be a multiple of ``batch_tile`` (default:
    largest tile fitting VMEM — see ``default_batch_tile``).

    alg="minsum": flooding normalized min-sum with the syndrome check fused
    into the update rolls.  alg="layered": row-layered normalized min-sum —
    immediate posterior updates per base row, ~half the sweeps of flooding
    (the production schedule).  Both bit-exact vs their golden models;
    sum-product stays on the XLA path as the accuracy fallback.

    layout="zb": per-edge tiles are (z, batch_tile) — batch on the lane
    axis, circulant rolls on sublanes.  Full lane utilization needs
    batch_tile=128, which only fits VMEM for n<=4096-class codes.
    layout="bz": transposed (batch_tile, z) tiles — z on the lane axis
    (lane rolls), batch on sublanes.  z>=128 keeps the lanes full at ANY
    batch tile, so large-n codes (n=16384: batch_tile 32) stop wasting
    3/4 of the VPU.  "auto" picks bz when the fitted batch tile is lane-
    starved (<128) and z is lane-aligned.  Both layouts are value- and
    iteration-count-identical (same float ops, different axes).
    """
    if alg not in ("minsum", "layered"):
        raise ValueError(f"pallas decoder supports minsum/layered, got {alg!r}")
    if batch_tile is None:
        batch_tile = default_batch_tile(code, dtype)
    if dtype != jnp.float32:
        # bf16 messages would double lane width, but Mosaic fails to lower
        # even a minimal bf16 roll/sign/min op mix (re-probed 2026-08-18:
        # backend compile subprocess crash) — f32 is the only path.
        raise NotImplementedError("only float32 messages are supported")
    if layout == "auto":
        layout = "bz" if (batch_tile < 128 and code.z % 128 == 0) else "zb"
    if layout not in ("zb", "bz"):
        raise ValueError(f"layout must be zb/bz/auto, got {layout!r}")
    layered = alg == "layered"
    edge_col = [int(x) for x in code.edge_col]
    edge_shift = [int(x) for x in code.edge_shift]
    row_edges = [[int(e) for e in row if e >= 0] for row in code.row_edges]
    col_edges = [[int(e) for e in col if e >= 0] for col in code.col_edges]
    mb, nb, z, E = code.mb, code.nb, code.z, code.num_edges
    bt = batch_tile
    zb = layout == "zb"
    ZB = (z, bt) if zb else (bt, z)   # per-base-slot tile shape
    rax = 0 if zb else 1              # the circulant (z) axis of a tile
    ST = (8, bt) if zb else (bt, 8)   # state/iters/conv tile shape
    cdt = dtype             # compute dtype: f32 (bit-exact vs golden) or
                            # bf16 (2x lane width; FER-validated, not
                            # bit-exact — see tests)
    alpha_f = float(alpha)  # python scalar: jnp constants would be captured
                            # closure consts, which pallas_call rejects

    def _sget(ref, r):
        """Per-block vector r of a state-shaped ref/array."""
        return ref[r:r + 1, :] if zb else ref[:, r:r + 1]

    def _sset(ref, r, v):
        if zb:
            ref[r:r + 1, :] = v
        else:
            ref[:, r:r + 1] = v

    def _redmin(x):
        """Reduce min over the z axis -> per-block vector ((1,bt)/(bt,1))."""
        return jnp.min(x, axis=rax, keepdims=True)

    def _sign(x):
        return jnp.where(x < 0, -1.0, 1.0).astype(cdt)

    def _loo_min(mags):
        """other[k] = min over j != k (prefix/suffix running mins; exact
        float min — value-identical to the golden model's construction)."""
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

    def _roll(x, shift):
        # Mosaic rejects the zero-size slice jnp.roll produces for a
        # no-op shift; circulant shifts CAN be 0 (mod z).
        if shift % z == 0:
            return x
        return jnp.roll(x, shift, axis=rax)

    def kernel_layered(llr_ref, syn_ref, bits_ref, iters_ref, conv_ref,
                       c2v, totals, state):
        # state rows: 0 = converged flag (1.0/0.0), 1 = sweep count (f32)

        def coset(i):
            return (1.0 - 2.0 * syn_ref[i].astype(jnp.float32)).astype(cdt)

        def syndrome_ok():
            worst = None
            for i in range(mb):
                prod = coset(i)
                for e in row_edges[i]:
                    t_chk = _roll(totals[edge_col[e]], -edge_shift[e])
                    prod = prod * _sign(t_chk)
                row_min = _redmin(prod)  # per-block vector
                worst = row_min if worst is None else jnp.minimum(worst, row_min)
            return (worst > 0).astype(jnp.float32)

        for e in range(E):
            c2v[e] = jnp.zeros(ZB, cdt)
        for j in range(nb):
            totals[j] = llr_ref[j]
            bits_ref[j] = (llr_ref[j] < 0).astype(jnp.int8)
        _sset(state, 0, syndrome_ok())
        _sset(state, 1, jnp.zeros_like(_sget(state, 1)))

        def body(carry):
            it, _ = carry
            ok_prev = _sget(state, 0)
            # ---- one layered sweep: rows update sequentially with
            # immediate posterior (totals) updates.  The convergence check
            # is FUSED into the sweep: each row's parity comes from the
            # sign of the t_chk rolls the update needs anyway (pre-update
            # of that row — golden._decode_layered v2 contract), removing
            # the separate per-sweep syndrome pass (1/3 of the rolls,
            # measured ~35% of iteration cost).  The rare optimistic flag
            # (a later row flipping an earlier row's parity within the
            # declaring sweep) is caught by the pipeline's per-block
            # verification hash like any other decode failure. -----------
            worst = None
            for i in range(mb):
                slots = row_edges[i]
                t_chks = [_roll(totals[edge_col[e]], -edge_shift[e])
                          for e in slots]
                prod = coset(i)
                for t in t_chks:
                    prod = prod * _sign(t)
                row_min = _redmin(prod)
                worst = row_min if worst is None else jnp.minimum(worst,
                                                                  row_min)
                msgs = [t_chks[k] - c2v[e] for k, e in enumerate(slots)]
                signs = [_sign(m) for m in msgs]
                mags = [jnp.abs(m) for m in msgs]
                sign_all = signs[0]
                for sgn in signs[1:]:
                    sign_all = sign_all * sgn
                others = _loo_min(mags)
                cs = coset(i)
                for k, e in enumerate(slots):
                    new = alpha_f * cs * sign_all * signs[k] * others[k]
                    delta = new - c2v[e]
                    c2v[e] = new
                    j = edge_col[e]
                    totals[j] = totals[j] + _roll(delta, edge_shift[e])

            # ---- convergence latching ------------------------------------
            ok_cur = (worst > 0).astype(jnp.float32)
            newly = jnp.logical_and(ok_cur > 0, ok_prev <= 0)
            for j in range(nb):
                bits_ref[j] = jnp.where(newly, (totals[j] < 0).astype(jnp.int8),
                                        bits_ref[j])
            iters = _sget(state, 1)
            _sset(state, 1, jnp.where(ok_prev > 0, iters,
                                      (it + 1).astype(jnp.float32)))
            ok = jnp.maximum(ok_prev, ok_cur)
            _sset(state, 0, ok)
            return it + 1, jnp.min(ok) > 0

        def cond(carry):
            it, done = carry
            return jnp.logical_and(it < max_iters, jnp.logical_not(done))

        jax.lax.while_loop(cond, body, (jnp.int32(0),
                                        jnp.min(_sget(state, 0)) > 0))

        ok = _sget(state, 0) > 0
        for j in range(nb):
            bits_ref[j] = jnp.where(ok, bits_ref[j],
                                    (totals[j] < 0).astype(jnp.int8))
        iters_ref[...] = jnp.zeros(ST, jnp.int32)
        _sset(iters_ref, 0, _sget(state, 1).astype(jnp.int32))
        conv_ref[...] = jnp.zeros(ST, jnp.int32)
        _sset(conv_ref, 0, (_sget(state, 0) > 0).astype(jnp.int32))

    def kernel(llr_ref, syn_ref, bits_ref, iters_ref, conv_ref,
               c2v, totals, state):
        # state rows: 0 = converged flag (1.0/0.0), 1 = iteration count (f32)

        def coset(i):
            # syn_ref holds 0/1 int8 syndrome bits; coset sign = 1 - 2s.
            # (cast before arithmetic: Mosaic has no int8 multiply)
            return (1.0 - 2.0 * syn_ref[i].astype(jnp.float32)).astype(cdt)

        # --- init: c2v = 0, totals = llr ---------------------------------
        # (per-slice writes keep Mosaic stack temporaries small)
        for e in range(E):
            c2v[e] = jnp.zeros(ZB, cdt)
        for j in range(nb):
            totals[j] = llr_ref[j]
            bits_ref[j] = (llr_ref[j] < 0).astype(jnp.int8)
        _sset(state, 0, jnp.zeros_like(_sget(state, 0)))
        _sset(state, 1, jnp.zeros_like(_sget(state, 1)))

        def body(carry):
            """One fused round: the t_chk rolls feed BOTH the syndrome check
            of the current totals (convergence after `it` updates) and the
            v2c messages of update it+1 — no separate syndrome pass."""
            it, _ = carry
            ok_prev = _sget(state, 0)

            # ---- phase A: per-row rolls → syndrome + min-sum update ------
            # Rows partition the edge set, so updating c2v row-by-row while
            # reading the fixed `totals` is safe.
            worst = None
            for i in range(mb):
                slots = row_edges[i]
                t_chks = [_roll(totals[edge_col[e]], -edge_shift[e])
                          for e in slots]
                # Syndrome of the CURRENT totals for this check row (roll
                # preserves values, so sign(t_chk) is the hard bit).
                prod = coset(i)
                for t in t_chks:
                    prod = prod * _sign(t)
                row_min = _redmin(prod)  # per-block vector
                worst = row_min if worst is None else jnp.minimum(worst, row_min)

                msgs = [t_chks[k] - c2v[e] for k, e in enumerate(slots)]
                signs = [_sign(m) for m in msgs]
                mags = [jnp.abs(m) for m in msgs]
                sign_all = signs[0]
                for sgn in signs[1:]:
                    sign_all = sign_all * sgn
                others = _loo_min(mags)
                cs = coset(i)
                for k, e in enumerate(slots):
                    c2v[e] = alpha_f * cs * sign_all * signs[k] * others[k]

            # ---- convergence bookkeeping (totals still pre-update) -------
            ok_cur = (worst > 0).astype(jnp.float32)
            newly = jnp.logical_and(ok_cur > 0, ok_prev <= 0)  # per-block
            for j in range(nb):
                bits_ref[j] = jnp.where(newly, (totals[j] < 0).astype(jnp.int8),
                                        bits_ref[j])
            iters = _sget(state, 1)
            _sset(state, 1, jnp.where(ok_prev > 0, iters,
                                      it.astype(jnp.float32)))
            ok = jnp.maximum(ok_prev, ok_cur)
            _sset(state, 0, ok)
            done = jnp.min(ok) > 0

            # ---- phase B: variable-node totals ---------------------------
            # Skipped once done, and in the final checking round (so
            # never-converged lanes keep totals after exactly max_iters
            # updates — bit-exact with the XLA/golden path).
            @pl.when(jnp.logical_and(jnp.logical_not(done), it < max_iters))
            def _():
                for j in range(nb):
                    t = llr_ref[j]
                    for e in col_edges[j]:
                        t = t + _roll(c2v[e], edge_shift[e])
                    totals[j] = t

            return it + 1, done

        def cond(carry):
            it, done = carry
            # One extra round beyond max_iters: round `it` only *checks* the
            # totals produced by update `it` (phase B of the previous round).
            return jnp.logical_and(it <= max_iters, jnp.logical_not(done))

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

        # --- outputs ------------------------------------------------------
        # Converged lanes keep their latched bits; the rest take the current
        # hard decision.
        ok = _sget(state, 0) > 0  # per-block
        for j in range(nb):
            bits_ref[j] = jnp.where(ok, bits_ref[j],
                                    (totals[j] < 0).astype(jnp.int8))
        iters_ref[...] = jnp.zeros(ST, jnp.int32)
        _sset(iters_ref, 0, _sget(state, 1).astype(jnp.int32))
        conv_ref[...] = jnp.zeros(ST, jnp.int32)
        _sset(conv_ref, 0, (_sget(state, 0) > 0).astype(jnp.int32))

    grid_call = functools.partial(
        pl.pallas_call,
        kernel_layered if layered else kernel,
        scratch_shapes=[
            pltpu.VMEM((E,) + ZB, dtype),           # c2v
            pltpu.VMEM((nb,) + ZB, dtype),          # totals
            pltpu.VMEM(ST, jnp.float32),            # state (ok, iters)
        ],
        compiler_params=pltpu.CompilerParams(
            # The conservative default scoped-VMEM limit (16 MB) undercounts
            # headroom on v5e; raise it to fit state + double buffering.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    @jax.jit
    def decode(llr: jax.Array, syndrome: jax.Array) -> BatchDecodeResult:
        bsz = llr.shape[0]
        assert bsz % bt == 0, f"batch {bsz} not a multiple of tile {bt}"
        num_tiles = bsz // bt
        perm = (1, 2, 0) if zb else (1, 0, 2)   # (B, slots, z) -> slot-major
        llr_i = jnp.transpose(llr.reshape(bsz, nb, z), perm).astype(dtype)
        syn_i = jnp.transpose(syndrome.reshape(bsz, mb, z), perm).astype(jnp.int8)

        if zb:
            slot_spec = lambda s: pl.BlockSpec(  # noqa: E731
                (s, z, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
            st_spec = pl.BlockSpec((8, bt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
            st_shape = (8, bsz)
        else:
            slot_spec = lambda s: pl.BlockSpec(  # noqa: E731
                (s, bt, z), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
            st_spec = pl.BlockSpec((bt, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
            st_shape = (bsz, 8)

        bits, iters, conv = grid_call(
            grid=(num_tiles,),
            in_specs=[slot_spec(nb), slot_spec(mb)],
            out_specs=[slot_spec(nb), st_spec, st_spec],
            out_shape=[
                jax.ShapeDtypeStruct((nb,) + ((z, bsz) if zb else (bsz, z)),
                                     jnp.int8),
                jax.ShapeDtypeStruct(st_shape, jnp.int32),
                jax.ShapeDtypeStruct(st_shape, jnp.int32),
            ],
        )(llr_i, syn_i)

        iperm = (2, 0, 1) if zb else (1, 0, 2)  # back to (B, slots, z)
        bits_out = jnp.transpose(bits.astype(jnp.uint8), iperm).reshape(
            bsz, nb * z)
        it_v, cv_v = (iters[0], conv[0]) if zb else (iters[:, 0], conv[:, 0])
        return BatchDecodeResult(bits=bits_out, converged=cv_v > 0,
                                 iterations=it_v)

    return decode
