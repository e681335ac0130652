"""QBER estimation with disclosed-bit accounting.

Reference capability: ``errorcorrection/algorithms/qber_estim.c`` (SURVEY.md
§3 #11, §4.3): sacrifice a deterministic pseudo-random subset of sifted bits,
exchange them, count mismatches → initial error estimate that seeds the EC
rate choice; every disclosed bit feeds the leakage ledger.

TPU-first design: test positions derive from the protocol PRNG
(qtpu.prng.derive(session, "qber", block_id)) so both parties select identical
subsets with zero coordination; estimation is batched over blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from qtpu import prng

__all__ = ["QberEstimate", "test_positions", "disclose_bits", "estimate_from_disclosed"]


class QberEstimate(NamedTuple):
    qber: jax.Array          # (B,) float32 — point estimate (Bayes-smoothed)
    mismatches: jax.Array    # (B,) int32
    disclosed: jax.Array     # (B,) int32 — bits leaked per block (= k)


def test_positions(session_key: jax.Array, block_ids: jax.Array, n: int, k: int) -> jax.Array:
    """(B, k) test-bit positions for each block — protocol-deterministic."""

    def one(bid):
        key = prng.derive(session_key, "qber", bid)
        return prng.subset_indices(key, n, k)

    return jax.vmap(one)(block_ids.astype(jnp.uint32))


def disclose_bits(bits: jax.Array, positions: jax.Array) -> jax.Array:
    """Gather the disclosed test bits: (B, n) x (B, k) → (B, k)."""
    return jnp.take_along_axis(bits, positions, axis=-1)


def estimate_from_disclosed(local: jax.Array, remote: jax.Array) -> QberEstimate:
    """Compare both parties' disclosed bits → per-block QBER estimate.

    Uses a Bayesian (Jeffreys, +0.5/+1) smoothed point estimate so a zero-
    mismatch sample still yields a usable nonzero rate for LLR priors.
    """
    mism = jnp.sum(local.astype(jnp.int32) ^ remote.astype(jnp.int32), axis=-1)
    k = local.shape[-1]
    qber = (mism.astype(jnp.float32) + 0.5) / (k + 1.0)
    return QberEstimate(qber=qber, mismatches=mism,
                        disclosed=jnp.full_like(mism, k))


def remove_positions(bits: jax.Array, positions: jax.Array) -> jax.Array:
    """Zero-out disclosed positions (they must not enter the final key;
    keeping shapes static, the pipeline instead subtracts them in the leakage
    ledger and masks them out of the reconciled payload)."""
    b = bits.shape[0]
    mask = jnp.ones_like(bits, dtype=jnp.uint8)
    mask = mask.at[jnp.arange(b)[:, None], positions].set(0)
    return bits * mask, mask
