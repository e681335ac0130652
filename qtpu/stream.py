"""Device-resident sifted-bit stream buffer.

Reference capability: the sifted-key epoch files queued between the sifting
chain and the EC daemon (SURVEY.md §2 "core runtime" — files-as-queues).

TPU-first redesign (round-3): the stream lives in ONE device arena (uint8,
one byte per bit) with host-side cursors, so per-window framing is a
``lax.dynamic_slice`` inside the fused window programs instead of host NumPy
plus a re-upload.  On the tunneled TPU of this environment a host→device
transfer costs ~26 ms fixed — keeping the stream on device removes the
largest per-window cost of the round-2 chain (round-2 verdict missing #1).

Design rules that keep XLA compile counts bounded:

- The arena has a static capacity; it grows geometrically (few reallocation
  shapes ever exist).
- Appends write pow2-padded chunks at the write position via
  ``dynamic_update_slice`` (static chunk shape per pow2 bucket, traced
  offset); the pad bytes are garbage that the NEXT append overwrites, so
  arbitrary push sizes never create new programs.
- Consumption is host bookkeeping only (cursor advance); window programs
  read ``(arena, cursor)`` and slice with static sizes.
- Compaction (when the cursor nears capacity) is one ``jnp.roll`` program
  with a traced shift.

Host pushes upload bit-PACKED words (framing.pack_bits layout, LSB-first)
and unpack on device — 8x less tunnel traffic than raw uint8 bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.framing import pack_bits

__all__ = ["DeviceStream"]

_MIN_CHUNK_WORDS = 256          # 8192 bits — smallest upload bucket
_MAX_CHUNK_WORDS = 1 << 17      # 4 Mbit per upload chunk


@jax.jit
def _write_chunk(arena, chunk, pos):
    return jax.lax.dynamic_update_slice(arena, chunk, (pos,))


@jax.jit
def _compact(arena, start):
    return jnp.roll(arena, -start)


@jax.jit
def _unpack_words(words):
    """(W,) uint32 -> (32*W,) uint8 bits, LSB-first (framing.pack_bits)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return ((words[:, None] >> shifts[None, :]) & 1).astype(jnp.uint8).reshape(-1)


@functools.partial(jax.jit, static_argnums=(1,))
def _grow(arena, new_cap):
    out = jnp.zeros((new_cap,), jnp.uint8)
    return jax.lax.dynamic_update_slice(out, arena, (0,))


def _pow2_words(n_words: int) -> int:
    w = _MIN_CHUNK_WORDS
    while w < n_words:
        w <<= 1
    return w


class DeviceStream:
    """Append-only bit stream on device with a host consumption cursor.

    ``strict_capacity=True`` turns arena growth into a hard error: the
    arena is a traced input of every window program, so a capacity change
    RECOMPILES them all (~25 s/rung over the tunneled TPU) — a production
    session sized from config should fail loudly rather than mysteriously
    stall on a burst of sifted input.  Growth is always counted in
    ``grow_events`` and warned once either way."""

    def __init__(self, capacity_bits: int = 1 << 22,
                 strict_capacity: bool = False):
        cap = 1 << max(15, int(capacity_bits - 1).bit_length())
        self.arena = jnp.zeros((cap,), jnp.uint8)
        self.start = 0   # first unconsumed bit (absolute arena offset)
        self.end = 0     # write position (absolute arena offset)
        self.total_pushed = 0
        self.strict_capacity = strict_capacity
        self.grow_events = 0

    # -- capacity management ---------------------------------------------

    @property
    def capacity(self) -> int:
        return int(self.arena.shape[0])

    @property
    def remaining(self) -> int:
        """Unconsumed bits available."""
        return self.end - self.start

    def _grow_arena(self) -> None:
        if self.strict_capacity:
            raise RuntimeError(
                f"DeviceStream arena would grow past its configured "
                f"capacity ({self.capacity} bits, start={self.start}, "
                f"end={self.end}) with strict_capacity=True — size "
                f"stream_capacity_bits for the peak backlog instead "
                f"(growth recompiles every window program)")
        self.grow_events += 1
        if self.grow_events == 1:
            import warnings
            warnings.warn(
                "DeviceStream arena grew beyond its configured capacity; "
                "every window program will recompile for the new shape. "
                "Size stream_capacity_bits for the peak backlog.",
                RuntimeWarning, stacklevel=3)
        self.arena = _grow(self.arena, self.capacity * 4)

    def _compact_arena(self) -> None:
        if self.start > 0:
            self.arena = _compact(self.arena, self.start)
            self.end -= self.start
            self.start = 0

    def _make_room(self, tail_bits: int) -> None:
        """Ensure [end, end + tail_bits) fits in the arena: compact first
        (drop consumed prefix), then grow geometrically if still short."""
        if self.end + tail_bits <= self.capacity:
            return
        self._compact_arena()
        while self.end + tail_bits > self.capacity:
            self._grow_arena()

    def ensure_contiguous(self, read_bits: int) -> None:
        """Guarantee that a static-size read of ``read_bits`` starting at the
        cursor stays in bounds (window programs may read slightly past the
        consumed region — the tail is unused garbage, but must be in-range
        so ``dynamic_slice`` can't clamp the offset and return wrong data)."""
        if self.start + read_bits > self.capacity:
            self._compact_arena()   # moves the cursor to offset 0
        while self.start + read_bits > self.capacity:
            self._grow_arena()

    # -- appends ----------------------------------------------------------

    def push(self, bits, n: int | None = None) -> None:
        """Append bits: host np.ndarray (uploaded bit-packed) or a device
        uint8 array (written directly, no host round trip).

        ``n`` (device arrays only): treat ``bits`` as a PADDED buffer whose
        first n entries are valid — the whole static-shape array is written
        (one compiled program per padded length) but the cursor advances by
        n; the pad tail is garbage the next push overwrites.  This is what
        lets the sift stage append its compacted output without a host
        round trip for the dynamic count."""
        if isinstance(bits, jax.Array):
            pad_n = int(bits.shape[0])
            n = pad_n if n is None else int(n)
            assert n <= pad_n
            if n == 0:
                return
            self._make_room(pad_n)
            self.arena = _write_chunk(self.arena, bits.astype(jnp.uint8),
                                      self.end)
            self.end += n
            self.total_pushed += n
            return
        assert n is None, "valid-prefix push is a device-array feature"
        bits = np.asarray(bits, np.uint8)
        off = 0
        while off < bits.size:
            take = min(bits.size - off, _MAX_CHUNK_WORDS * 32)
            self._push_host(bits[off:off + take])
            off += take

    def _push_host(self, bits: np.ndarray) -> None:
        n = bits.size
        if n == 0:
            return
        words = pack_bits(bits)
        wpad = _pow2_words(words.size)
        padded = np.zeros(wpad, np.uint32)
        padded[: words.size] = words
        self._make_room(32 * wpad)
        chunk = _unpack_words(jnp.asarray(padded))
        self.arena = _write_chunk(self.arena, chunk, self.end)
        self.end += n   # pad tail is garbage; the next push overwrites it
        self.total_pushed += n

    # -- consumption ------------------------------------------------------

    def consume(self, nbits: int) -> None:
        assert nbits <= self.remaining, (
            f"stream underflow: take {nbits} > buffered {self.remaining}")
        self.start += nbits

    def peek_host(self, nbits: int, offset: int = 0) -> np.ndarray:
        """Host copy of unconsumed bits [offset, offset+nbits) — tests and
        checkpointing only (forces a device→host transfer)."""
        assert offset + nbits <= self.remaining
        lo = self.start + offset
        return np.asarray(self.arena[lo:lo + nbits])

    def snapshot_host(self) -> np.ndarray:
        """All unconsumed bits as host array (checkpointing)."""
        return self.peek_host(self.remaining)
