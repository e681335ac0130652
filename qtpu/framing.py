"""Epoch framing, timestamped-event formats, and bit packing.

Reference capability: the epoch/file framing convention that every qcrypto
daemon sits on (SURVEY.md §2 "Core runtime", Appendix A): time is sliced into
epochs of 2^29 ns (~0.537 s); every stream artifact is addressed by a 32-bit
epoch number; events are 64-bit records (49-bit timestamp @ 125 ps + 4-bit
detector id).

TPU-first design: epochs become *array windows*, not files — a window of
events is a struct-of-arrays (times, detectors) with static capacity and a
validity count, so the whole sifting chain stays jit-compatible.  Keys are
bit-packed into uint32 words for host transport and hashing.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "EPOCH_NS", "TIME_UNITS_PER_NS", "EPOCH_UNITS",
    "epoch_of_time", "pack_bits", "unpack_bits",
    "EventWindow", "KeyBlock",
]

# Reference framing constants (SURVEY.md Appendix A):
EPOCH_NS = 2 ** 29                 # one epoch = 2^29 ns ≈ 0.537 s
TIME_UNITS_PER_NS = 8              # timestamps in 125 ps units
EPOCH_UNITS = EPOCH_NS * TIME_UNITS_PER_NS  # epoch length in 125 ps units
DETECTOR_BITS = 4
TIME_BITS = 49


def epoch_of_time(t_units: np.ndarray) -> np.ndarray:
    """Epoch number for timestamps in 125 ps units."""
    return (np.asarray(t_units) // EPOCH_UNITS).astype(np.uint32)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """Pack a (..., n) 0/1 array into (..., ceil(n/32)) uint32 words (LSB-first)."""
    bits = np.asarray(bits, dtype=np.uint8)
    n = bits.shape[-1]
    pad = (-n) % 32
    if pad:
        bits = np.concatenate(
            [bits, np.zeros(bits.shape[:-1] + (pad,), np.uint8)], axis=-1)
    words = bits.reshape(bits.shape[:-1] + (-1, 32))
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
    return (words.astype(np.uint32) * weights).sum(axis=-1).astype(np.uint32)


def unpack_bits(words: np.ndarray, n: int) -> np.ndarray:
    """Inverse of pack_bits, truncated to n bits."""
    words = np.asarray(words, dtype=np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((words[..., :, None] >> shifts) & 1).astype(np.uint8)
    return bits.reshape(words.shape[:-1] + (-1,))[..., :n]


@dataclasses.dataclass
class EventWindow:
    """A fixed-capacity window of detector events (one or more epochs).

    Struct-of-arrays with a validity count so shapes stay static under jit:
    entries at index >= count are padding (time = 2^63-1 sorts them last).
    """

    times: np.ndarray       # (capacity,) int64, 125 ps units, sorted ascending
    detectors: np.ndarray   # (capacity,) uint8 in [0, 16)
    count: int              # number of valid events
    start_epoch: int        # first epoch covered
    num_epochs: int         # epochs covered

    PAD_TIME = np.int64(2 ** 63 - 1)

    @classmethod
    def from_events(cls, times: np.ndarray, detectors: np.ndarray,
                    start_epoch: int, num_epochs: int,
                    capacity: int | None = None) -> "EventWindow":
        order = np.argsort(times, kind="stable")
        times = np.asarray(times, np.int64)[order]
        detectors = np.asarray(detectors, np.uint8)[order]
        n = len(times)
        cap = capacity or _next_pow2(max(n, 1))
        assert cap >= n, "capacity too small"
        t = np.full(cap, cls.PAD_TIME, np.int64)
        d = np.zeros(cap, np.uint8)
        t[:n] = times
        d[:n] = detectors
        return cls(times=t, detectors=d, count=n,
                   start_epoch=start_epoch, num_epochs=num_epochs)


@dataclasses.dataclass
class KeyBlock:
    """A contiguous run of key bits addressed by epoch range.

    This is the unit the EC pipeline works on (reference "processblock",
    SURVEY.md §1) and the shape of the final-key artifact (type-7 analog).
    """

    start_epoch: int
    num_epochs: int
    bits: np.ndarray          # (n,) uint8
    leaked_bits: int = 0      # running leakage attributed to this block

    @property
    def n(self) -> int:
        return int(self.bits.shape[0])

    def packed(self) -> np.ndarray:
        return pack_bits(self.bits)


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()
