"""Protocol-deterministic randomness.

Reference capability: ``errorcorrection/rnd.c`` (SURVEY.md §3 #16) — a
deterministic PRNG both parties run from exchanged seeds so permutations,
test-bit choices and privacy-amplification matrices agree bit-exactly.

TPU-first design: `jax.random` threefry counter-based keys with an explicit,
documented key-derivation tree.  Every protocol use-site derives its key as

    derive(root, "purpose", block_id, ...)

so Alice and Bob obtain identical randomness from the exchanged 64-bit session
seed without any further coordination, and the derivation is order-independent
(no hidden global stream position, unlike the reference's LFSR).
"""

from __future__ import annotations

import functools
import zlib
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["root_key", "derive", "random_bits", "subset_indices",
           "toeplitz_seed_bits", "key_data"]

PathElem = Union[str, int]


@functools.lru_cache(maxsize=1)
def _cpu():
    # local_devices, not devices: in a multi-process (jax.distributed) run
    # the first GLOBAL cpu device may belong to another process, and keys
    # committed there cannot be read back.
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.devices("cpu")[0]

# Protocol PRNG ops are tiny and latency-bound; running them eagerly on an
# accelerator — worse, a TUNNELED one — costs a network round trip per op
# (round-2 measurement: ~0.5 s/window of pure PRNG dispatch).  Pin them to
# the host CPU backend; device programs receive raw key data instead.


def _tag(p: PathElem):
    """Stable 32-bit tag for a path element (strings via crc32).

    Traced integer arrays (e.g. block ids under vmap) pass through unchanged —
    fold_in accepts them directly.
    """
    if isinstance(p, str):
        return zlib.crc32(p.encode("utf-8")) & 0x7FFFFFFF
    if isinstance(p, (int, np.integer)):
        return int(p) & 0x7FFFFFFF
    return p  # jax scalar (possibly traced)


def root_key(seed: int) -> jax.Array:
    """Session root key from the exchanged seed (threefry, counter-based)."""
    with jax.default_device(_cpu()):
        return jax.random.key(seed & 0xFFFFFFFFFFFFFFFF)


def derive(key: jax.Array, *path: PathElem) -> jax.Array:
    """Derive a sub-key along a labeled path; commutative-free and collision-safe
    for distinct paths (fold_in of 32-bit tags)."""
    with jax.default_device(_cpu()):
        for p in path:
            key = jax.random.fold_in(key, _tag(p))
        return key


def key_data(key: jax.Array) -> np.ndarray:
    """Raw key data (uint32 numpy) — the form device programs take keys in
    (re-wrapped inside jit with jax.random.wrap_key_data), so that a
    CPU-resident protocol key never forces an eager accelerator op."""
    return np.asarray(jax.random.key_data(key))


def random_bits(key: jax.Array, shape: tuple[int, ...]) -> np.ndarray:
    """Uniform {0,1} uint8 bits of the given shape (host numpy)."""
    with jax.default_device(_cpu()):
        return np.asarray(jax.random.bernoulli(key, 0.5, shape)).astype(np.uint8)


def subset_indices(key: jax.Array, n: int, k: int) -> np.ndarray:
    """Choose k of n positions without replacement (QBER test bits).

    Deterministic given the key; both parties compute the same subset.
    """
    with jax.default_device(_cpu()):
        return np.asarray(jax.random.choice(key, n, shape=(k,), replace=False))


def toeplitz_seed_bits(key: jax.Array, n_in: int, n_out: int) -> jax.Array:
    """The n_in + n_out - 1 random bits defining a Toeplitz matrix row/col."""
    return random_bits(key, (n_in + n_out - 1,))


def key_to_numpy_seed(key: jax.Array) -> int:
    """Collapse a key to a 64-bit integer for host-side numpy RNGs (non-protocol
    uses only — simulators, tests)."""
    data = jax.random.key_data(key)
    return int(np.asarray(data).astype(np.uint64).sum() & 0xFFFFFFFFFFFFFFFF)
