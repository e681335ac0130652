"""Fused per-window device programs for the reconciliation pipeline (v2).

Round-2 measured the decode kernel at multi-Gbit/s while the chain around it
ran 360x slower: every window serialized syndromes through the host, framed
payload in host NumPy and re-uploaded it, and fetched PA output eagerly —
~10 host<->device transfers per window on a link with ~26 ms fixed cost per
transfer (round-2 verdict missing #1).  v2 moves the WHOLE per-window data
path on device:

  * The sifted stream lives in a device arena (qtpu.stream.DeviceStream);
    framing is a ``dynamic_slice`` + gather inside the window programs.
  * All protocol randomness a window needs (fine-shortening mask + fill,
    whole-column shortening fill, QBER test positions, verification seeds,
    Alice's puncture pad) is derived ON DEVICE from one 64-bit window key
    (threefry fold_in tree, per-block keys folded by GLOBAL block index so
    mesh sharding cannot change protocol randomness).  The host uploads one
    8-word header per program call instead of megabytes of framed payload.
  * QBER test bits are INLINE: instead of carving a disclosure segment out
    of the stream (host-side delete/concatenate), Bob samples k_pb payload
    positions per block from the protocol PRNG; Alice's program discloses
    her bits there; Bob's program counts mismatches (the QBER measurement)
    AND pins those now-public positions at LLR ±BIG — the disclosure doubles
    as free shortening, so its leakage is recovered as decode strength.
  * Syndromes / hashes / disclosed bits stay device arrays end-to-end over
    an in-process DirectLink; a serializing link packs them at the wire.
  * Bob's per-window protocol decision needs exactly ONE device->host fetch:
    the (B, 4) stats array [ok, iters, errs, test_mismatches].

Programs per ladder rung (static shapes, compiled once per (rung, k_pb)):

  alice:        (arena, header) -> (payload, syn, hashes, test_bits)
  bob:          (arena, header, test_alice, syn, exp_hashes, qmag)
                -> (hat, rx_orig, rx_pin, pinmask, stats[, gled])
  retry_gather: (payload, positions) -> (B, k_r) disclosed retry bits
  retry:        (rx_orig, rx_pin, pinmask, hat, stats, failed, positions,
                 bits, syn, exp_hashes, qmag, header) -> merged state
  pa:           (payload, pakey) -> (B, l_max) uint8 final-key rows
  pack:         (B, L) uint8 -> (B, ceil(L/32)) uint32 (bit-packed drain —
                final keys cross the tunnel 8x smaller, on demand)

Reference capability: the per-processblock compute of ecd2 (SURVEY.md §4.3/
§4.4), QBER estimation sampling (§3 #11) and the PRNG contract (§3 #16).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.ldpc.codes import QCCode
from qtpu.ldpc.decode import BIG_LLR, make_batch_decoder

__all__ = ["WindowPrograms", "make_window_programs", "make_header"]

HEADER_WORDS = 8


def make_header(cursor: int, short_bits: int, wkey_data: np.ndarray,
                private_key_data: np.ndarray | None = None) -> np.ndarray:
    """One (8,) uint32 header — the ONLY per-window host->device upload.

    [0] stream cursor (bits, absolute arena offset)
    [1] extra-shortening bits per block (fine rate adaptation)
    [2:4] shared window key (both parties derive the same subkeys on device)
    [4:6] Alice-private key (puncture pad; zeros on Bob's side)
    """
    h = np.zeros(HEADER_WORDS, np.uint32)
    h[0] = cursor
    h[1] = short_bits
    h[2:4] = np.asarray(wkey_data, np.uint32)
    if private_key_data is not None:
        h[4:6] = np.asarray(private_key_data, np.uint32)
    return h


def _toeplitz_hash(t_bits, x_bits, m):
    """In-jit batched FFT Toeplitz hash ((B, n) x (B, m+n-1) -> (B, m)).

    Exactness at production shapes (conv length 2^18, f32) is pinned by
    tests/test_pa.py golden rows and the integer-margin guard."""
    n = x_bits.shape[-1]
    need = (m + n - 1) + n - 1
    L = 1 << (need - 1).bit_length()
    tf = jnp.fft.rfft(t_bits.astype(jnp.float32), L, axis=-1)
    xf = jnp.fft.rfft(x_bits.astype(jnp.float32), L, axis=-1)
    conv = jnp.fft.irfft(tf * xf, L, axis=-1)
    seg = jax.lax.dynamic_slice_in_dim(conv, n - 1, m, axis=-1)
    return (jnp.round(seg).astype(jnp.int32) & 1).astype(jnp.uint8)


class WindowPrograms(NamedTuple):
    alice: callable
    bob: callable
    retry_gather: callable
    retry: callable
    pa: callable
    pack: callable
    l_max: int
    k_pb: int       # QBER test bits disclosed per block (static)
    retry_bits: int  # retry disclosure bits per block (static)


def _pick_decoder(code: QCCode, max_iters: int, alg: str, batch: int):
    """Pallas VMEM-resident kernel on TPU (the production path — ~35x the
    XLA decoder, round-1 measurements); XLA elsewhere or when the batch
    doesn't tile."""
    if alg in ("minsum", "layered") and jax.devices()[0].platform == "tpu":
        from qtpu.ldpc.pallas_bp import default_batch_tile, make_pallas_decoder
        bt = default_batch_tile(code)
        if batch % bt == 0:
            return make_pallas_decoder(code, max_iters, alg=alg,
                                       batch_tile=bt)
    return make_batch_decoder(code, max_iters, alg)


def make_window_programs(code: QCCode, pay_pos: np.ndarray,
                         punct_pos: np.ndarray, short_pos: np.ndarray,
                         max_iters: int, alg: str, verify_hash_bits: int,
                         l_max: int, batch: int, k_pb: int,
                         retry_bits: int = 0, mesh=None) -> WindowPrograms:
    """Build the fused programs for one ladder rung at one test-bit size.

    pay_pos / punct_pos / short_pos: static variable-index arrays (the rung's
    column classes, expanded to bit positions).  l_max: the rung's maximum PA
    output length.  batch: blocks per window (B).  k_pb: QBER test positions
    sampled (with replacement) per block.  mesh: optional jax.sharding.Mesh —
    DP-shards Bob's program over the first axis with a psum'd device ledger
    (BASELINE config 5).
    """
    n = code.n
    B = int(batch)
    P = int(pay_pos.size)
    Vh = int(verify_hash_bits)
    Kq = int(k_pb)
    Kr = int(retry_bits)
    pay_pos = jnp.asarray(pay_pos, jnp.int32)
    punct_pos = jnp.asarray(punct_pos, jnp.int32)
    short_pos = jnp.asarray(short_pos, jnp.int32)
    decoder = _pick_decoder(code, max_iters, alg, B)

    edge_row = [int(x) for x in code.edge_row]
    edge_col = [int(x) for x in code.edge_col]
    edge_shift = [int(x) for x in code.edge_shift]
    mb, nb, z = code.mb, code.nb, code.z

    # Window-key fold tags (both parties derive identically on device).
    TAG_XMASK, TAG_XFILL, TAG_VERIFY, TAG_TPOS, TAG_SHORTFILL = 1, 2, 3, 4, 5

    def _encode(x_bits):
        """(b, n) -> (b, m) syndrome, roll+XOR over base edges."""
        b = x_bits.shape[0]
        xi = jnp.transpose(x_bits.reshape(b, nb, z), (1, 2, 0))
        syn = [None] * mb
        for e in range(len(edge_row)):
            i, j, s = edge_row[e], edge_col[e], edge_shift[e]
            contrib = jnp.roll(xi[j], -s, axis=0)
            syn[i] = contrib if syn[i] is None else syn[i] ^ contrib
        return jnp.transpose(jnp.stack(syn), (2, 0, 1)).reshape(b, mb * z)

    def _block_keys(key, b, row0):
        """Per-block threefry keys folded by GLOBAL block index — block i's
        randomness is identical no matter how the batch is sharded."""
        return jax.vmap(lambda i: jax.random.fold_in(key, i))(
            row0 + jnp.arange(b, dtype=jnp.uint32))

    def _seed_rows(key, b, length, row0):
        """(b, length) protocol-random bits from per-block folded keys."""
        return jax.vmap(
            lambda k: jax.random.bernoulli(k, 0.5, (length,))
        )(_block_keys(key, b, row0)).astype(jnp.uint8)

    def _wkey(header):
        return jax.random.wrap_key_data(
            jax.lax.dynamic_slice(header, (2,), (2,)))

    def _frame(arena, header, b, row0):
        """Stream framing on device: returns (payload, xmask, zeros_idx,
        tpos, take) where payload is (b, P) uint8 with shared-PRNG fill at
        the s extra-shortened positions, xmask is the (P,) shortening mask,
        tpos the (b, Kq) QBER test positions (payload coordinates), and
        take = P - s the stream bits consumed per block."""
        cursor = header[0].astype(jnp.int32)
        s = header[1].astype(jnp.int32)
        wk = _wkey(header)
        take = P - s
        flat = jax.lax.dynamic_slice(
            arena, (cursor + row0.astype(jnp.int32) * take,), (b * P,))
        # Extra-shortening mask: the s positions with the smallest uniform
        # draw (exact count, identical on both parties, s is data not shape).
        u = jax.random.uniform(jax.random.fold_in(wk, TAG_XMASK), (P,))
        ranks = jnp.argsort(jnp.argsort(u))
        xmask = ranks < s
        # Stream gather: payload position p takes the r(p)-th stream bit of
        # its block, where r = rank among non-shortened positions.
        nz_rank = jnp.cumsum(1 - xmask.astype(jnp.int32)) - 1
        idx = jnp.arange(b, dtype=jnp.int32)[:, None] * take + nz_rank[None, :]
        gathered = flat[idx.reshape(-1)].reshape(b, P)
        xfill = _seed_rows(jax.random.fold_in(wk, TAG_XFILL), b, P, row0)
        payload = jnp.where(xmask[None, :], xfill, gathered)
        # Inline QBER test positions: k_pb per block, sampled (with
        # replacement) over the block's non-shortened payload positions.
        zeros_idx = jnp.argsort(xmask, stable=True)   # payload-rank -> position
        tkeys = _block_keys(jax.random.fold_in(wk, TAG_TPOS), b, row0)
        tr = jax.vmap(lambda k: jax.random.randint(k, (Kq,), 0, take))(tkeys)
        tpos = zeros_idx[tr]
        return payload, xmask, tpos, take

    def _vseeds(header, b, row0):
        return _seed_rows(jax.random.fold_in(_wkey(header), TAG_VERIFY),
                          b, P + Vh - 1, row0)

    def _scatter_codeword(payload, header, b, row0, punct_bits):
        x = jnp.zeros((b, n), jnp.uint8)
        x = x.at[:, pay_pos].set(payload)
        if short_pos.size:
            sf = _seed_rows(jax.random.fold_in(_wkey(header), TAG_SHORTFILL),
                            b, int(short_pos.size), row0)
            x = x.at[:, short_pos].set(sf)
        if punct_pos.size:
            x = x.at[:, punct_pos].set(punct_bits)
        return x

    @jax.jit
    def alice_program(arena, header):
        payload, xmask, tpos, take = _frame(arena, header,
                                            B, jnp.uint32(0))
        if punct_pos.size:
            pk = jax.random.wrap_key_data(
                jax.lax.dynamic_slice(header, (4,), (2,)))
            punct = _seed_rows(pk, B, int(punct_pos.size), jnp.uint32(0))
        else:
            punct = jnp.zeros((B, 0), jnp.uint8)
        x = _scatter_codeword(payload, header, B, jnp.uint32(0), punct)
        syn = _encode(x)
        hashes = _toeplitz_hash(_vseeds(header, B, jnp.uint32(0)), payload, Vh)
        test_bits = jnp.take_along_axis(payload, tpos, axis=1)
        return payload, syn, hashes, test_bits

    def _bob_core(arena, header, test_alice, syndromes, exp_hashes, qmag,
                  b, row0, local_decoder):
        rx_orig, xmask, tpos, take = _frame(arena, header, b, row0)
        rows = jnp.arange(b)[:, None]
        # Pin the disclosed test positions to Alice's (true) values: the
        # QBER disclosure doubles as extra shortening.
        rx_pin = rx_orig.at[rows, tpos].set(test_alice)
        pinmask = jnp.broadcast_to(xmask[None, :], (b, P))
        pinmask = pinmask.at[rows, tpos].set(True)
        mism = jnp.sum(
            (jnp.take_along_axis(rx_orig, tpos, axis=1) != test_alice
             ).astype(jnp.int32), axis=1)
        hat, stats = _decode_core(arena, header, rx_orig, rx_pin, pinmask,
                                  syndromes, exp_hashes, qmag, b, row0,
                                  local_decoder)
        stats = jnp.concatenate([stats, mism[:, None]], axis=1)
        return hat, rx_orig, rx_pin, pinmask, stats

    def _decode_core(arena, header, rx_orig, rx_pin, pinmask, syndromes,
                     exp_hashes, qmag, b, row0, local_decoder):
        """LLR assembly -> decode -> verify.  stats: (b,3) [ok, iters, errs].
        Shared by the first decode and the retry re-decode."""
        sign = 1.0 - 2.0 * rx_pin.astype(jnp.float32)
        mag = jnp.where(pinmask, jnp.float32(BIG_LLR),
                        qmag.astype(jnp.float32))
        llr = jnp.zeros((b, n), jnp.float32)
        llr = llr.at[:, pay_pos].set(sign * mag)
        if short_pos.size:
            sf = _seed_rows(jax.random.fold_in(_wkey(header), TAG_SHORTFILL),
                            b, int(short_pos.size), row0)
            ssign = 1.0 - 2.0 * sf.astype(jnp.float32)
            llr = llr.at[:, short_pos].set(ssign * jnp.float32(BIG_LLR))
        res = local_decoder(llr, syndromes)
        hat = res.bits[:, pay_pos]
        hat = jnp.where(pinmask, rx_pin, hat)
        hashes = _toeplitz_hash(_vseeds(header, b, row0), hat, Vh)
        ok = jnp.all(hashes == exp_hashes, axis=1) & res.converged
        errs = jnp.sum((hat ^ rx_orig).astype(jnp.int32), axis=1)
        stats = jnp.stack([ok.astype(jnp.int32),
                           res.iterations.astype(jnp.int32), errs], axis=1)
        return hat, stats

    if mesh is None:
        @jax.jit
        def bob_program(arena, header, test_alice, syndromes, exp_hashes,
                        qmag):
            return _bob_core(arena, header, test_alice, syndromes,
                             exp_hashes, qmag, B, jnp.uint32(0), decoder)
    else:
        from jax.sharding import PartitionSpec as Psp
        from qtpu.accounting import LEDGER_FIELDS
        axis = mesh.axis_names[0]
        bl = B // mesh.size
        leaked_per_block = code.m - int(punct_pos.shape[0])
        idx_f = {f: i for i, f in enumerate(LEDGER_FIELDS)}
        shard_decoder = _pick_decoder(code, max_iters, alg, bl)

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(Psp(), Psp(), Psp(axis, None), Psp(axis, None),
                      Psp(axis, None), Psp()),
            out_specs=(Psp(axis, None), Psp(axis, None), Psp(axis, None),
                       Psp(axis, None), Psp(axis, None), Psp()),
        )
        def bob_program(arena, header, test_alice, syndromes, exp_hashes,
                        qmag):
            i = jax.lax.axis_index(axis)
            row0 = (i * bl).astype(jnp.uint32)
            hat, rx_orig, rx_pin, pinmask, stats = _bob_core(
                arena, header, test_alice, syndromes, exp_hashes, qmag,
                bl, row0, shard_decoder)
            # Per-shard decode-stage ledger, psum'd over ICI — the global
            # leaked-bit accounting of BASELINE config 5 fed by the REAL
            # session quantities (puncture credit, inline test disclosure,
            # fine shortening via P - take).
            s = header[1].astype(jnp.int32)
            okc = jnp.sum(stats[:, 0])
            led = jnp.zeros((len(LEDGER_FIELDS),), jnp.int32)
            led = led.at[idx_f["syndrome_bits"]].set(leaked_per_block * bl)
            led = led.at[idx_f["verify_hash_bits"]].set(Vh * bl)
            led = led.at[idx_f["qber_test_bits"]].set(Kq * bl)
            led = led.at[idx_f["reconciled_bits"]].set(okc * (P - s))
            led = led.at[idx_f["discarded_bits"]].set((bl - okc) * (P - s))
            led = led.at[idx_f["blocks_ok"]].set(okc)
            led = led.at[idx_f["blocks_failed"]].set(bl - okc)
            gled = jax.lax.psum(led, axis)
            return hat, rx_orig, rx_pin, pinmask.astype(jnp.uint8), stats, gled

    @jax.jit
    def retry_gather(payload, positions):
        """Alice's disclosed bits at the retry positions, all blocks (the
        link/wire layer slices failed rows; leakage is charged per failed
        block only)."""
        return payload[:, positions]

    @jax.jit
    def retry_program(arena, header, rx_orig, rx_pin, pinmask, hat, stats,
                      failed, positions, bits, syndromes, exp_hashes, qmag):
        """Blind-reconciliation retry: pin Alice's disclosed bits in failed
        rows, re-decode, merge with the previous round's results."""
        pinmask = pinmask.astype(bool)
        failed_b = failed.astype(bool)
        rx2_all = rx_pin.at[:, positions].set(bits)
        rx2 = jnp.where(failed_b[:, None], rx2_all, rx_pin)
        pin2_all = pinmask.at[:, positions].set(True)
        pin2 = jnp.where(failed_b[:, None], pin2_all, pinmask)
        hat2, st2 = _decode_core(arena, header, rx_orig, rx2, pin2,
                                 syndromes, exp_hashes, qmag,
                                 rx_orig.shape[0], jnp.uint32(0), decoder)
        ok = (stats[:, 0].astype(bool)
              | (failed_b & st2[:, 0].astype(bool)))
        hat_m = jnp.where(failed_b[:, None], hat2, hat)
        iters_m = jnp.maximum(stats[:, 1], st2[:, 1])
        errs_m = jnp.where(failed_b, st2[:, 2], stats[:, 2])
        stats_m = jnp.stack([ok.astype(jnp.int32), iters_m, errs_m,
                             stats[:, 3]], axis=1)
        return hat_m, rx2, pin2, stats_m

    if l_max > 0:
        @jax.jit
        def pa_program(payload, pakey_data):
            b = payload.shape[0]
            key = jax.random.wrap_key_data(pakey_data)
            t = _seed_rows(key, b, P + l_max - 1, jnp.uint32(0))
            return _toeplitz_hash(t, payload, l_max)
    else:
        def pa_program(payload, pakey):  # rung can never yield key
            return jnp.zeros((payload.shape[0], 0), jnp.uint8)

    @jax.jit
    def pack_rows(bits):
        """(b, L) uint8 -> (b, ceil(L/32)) uint32, LSB-first (matches
        framing.pack_bits) — final keys cross the host link bit-packed."""
        b, L = bits.shape
        pad = (-L) % 32
        if pad:
            bits = jnp.concatenate(
                [bits, jnp.zeros((b, pad), jnp.uint8)], axis=1)
        w = bits.reshape(b, -1, 32).astype(jnp.uint32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(w << shifts[None, None, :], axis=-1).astype(jnp.uint32)

    return WindowPrograms(alice=alice_program, bob=bob_program,
                          retry_gather=retry_gather, retry=retry_program,
                          pa=pa_program, pack=pack_rows,
                          l_max=l_max, k_pb=Kq, retry_bits=Kr)
