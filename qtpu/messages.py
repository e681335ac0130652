"""Typed inter-party EC message schema with a packed wire format.

Reference capability: the EC packet layer — ``subcomponents/comms.c`` +
``definitions/ec_packet_def.h`` (SURVEY.md §3 #15, Appendix A): every message
carries {tag, length, subtype, epoch-range} so a streaming pipeline can route
it to in-flight blocks; payloads are subtype-specific.

Fresh design (not a field-for-field copy): dataclasses with explicit pack/
unpack to little-endian bytes.  The epoch-range addressing idea is kept as
``window_id`` — the streaming pipeline's unit of work (a fixed batch of key
blocks), which plays the reference's {start epoch, number of epochs} role.

Subtype families map to the LDPC protocol of SURVEY.md §4.4 (one round trip)
plus the QBER handshake of §4.3.
"""

from __future__ import annotations

import dataclasses
import struct
from enum import IntEnum
from typing import ClassVar, Type

import numpy as np

from qtpu.framing import pack_bits, unpack_bits

__all__ = [
    "MsgType", "Message", "QberDisclose", "RateSelect", "Syndromes",
    "VerifyAck", "Abort", "TimingBasis", "SiftIndex", "RetryDisclose",
    "pack_message", "unpack_message",
]

MAGIC = 0x51C0FFEE  # wire tag (reference: packet tag field)
_HEADER = struct.Struct("<IIII")  # magic, total_len, subtype, window_id


class MsgType(IntEnum):
    QBER_DISCLOSE = 1   # Alice → Bob: her values at the shared test positions
    RATE_SELECT = 2     # Bob → Alice: QBER estimate + chosen rate rung
    SYNDROMES = 3       # Alice → Bob: per-block syndromes + verify hashes
    VERIFY_ACK = 4      # Bob → Alice: per-block pass/fail mask
    ABORT = 5           # either → either: tear down the window/session
    TIMING_BASIS = 6    # Alice → Bob: event times + basis (type-2 role)
    SIFT_INDEX = 7      # Bob → Alice: matched-event index (type-4 role)
    RETRY_DISCLOSE = 8  # Alice → Bob: extra bits for failed blocks (blind-
                        # reconciliation retry)


@dataclasses.dataclass
class Message:
    window_id: int
    TYPE: ClassVar[MsgType]

    def payload_bytes(self) -> bytes:
        raise NotImplementedError

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "Message":
        raise NotImplementedError


@dataclasses.dataclass
class QberDisclose(Message):
    """Alice's bits at the protocol-PRNG-chosen test positions (k bits)."""
    num_bits: int
    bits: np.ndarray  # (k,) uint8
    TYPE: ClassVar[MsgType] = MsgType.QBER_DISCLOSE

    def payload_bytes(self) -> bytes:
        words = pack_bits(self.bits)
        return struct.pack("<I", self.num_bits) + words.tobytes()

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "QberDisclose":
        (k,) = struct.unpack_from("<I", data)
        words = np.frombuffer(data[4:], dtype=np.uint32)
        return cls(window_id=window_id, num_bits=k, bits=unpack_bits(words, k))


@dataclasses.dataclass
class RateSelect(Message):
    """Bob's QBER estimate and the ladder rung he wants Alice to encode at.

    ``short_bits``: extra payload positions per block to shorten (pin to
    shared-PRNG values) — the fine rate-adaptation knob interpolating the
    effective rate between ladder rungs."""
    qber_milli: int     # QBER in 1/1000 units (wire-friendly)
    rate_index: int
    short_bits: int = 0
    TYPE: ClassVar[MsgType] = MsgType.RATE_SELECT

    def payload_bytes(self) -> bytes:
        return struct.pack("<III", self.qber_milli, self.rate_index,
                           self.short_bits)

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "RateSelect":
        q, r, s = struct.unpack_from("<III", data)
        return cls(window_id=window_id, qber_milli=q, rate_index=r,
                   short_bits=s)


@dataclasses.dataclass
class Syndromes(Message):
    """The one-way reconciliation message: per-block syndromes + 64-bit
    verification hashes (SURVEY.md §4.4 — ONE message replaces Cascade's
    dozens of round trips)."""
    rate_index: int
    num_blocks: int
    syndrome_bits: int            # m per block
    syndromes: np.ndarray         # (B, m) uint8
    verify_hashes: np.ndarray     # (B, 64) uint8
    short_bits: int = 0           # echo of RateSelect.short_bits (idempotence)
    TYPE: ClassVar[MsgType] = MsgType.SYNDROMES

    def payload_bytes(self) -> bytes:
        syn_words = pack_bits(self.syndromes)      # (B, ceil(m/32))
        hash_words = pack_bits(self.verify_hashes)  # (B, 2)
        head = struct.pack("<IIII", self.rate_index, self.num_blocks,
                           self.syndrome_bits, self.short_bits)
        return head + syn_words.tobytes() + hash_words.tobytes()

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "Syndromes":
        r, b, m, s = struct.unpack_from("<IIII", data)
        off = 16
        syn_w = (m + 31) // 32
        syn_bytes = b * syn_w * 4
        syn_words = np.frombuffer(data[off:off + syn_bytes], np.uint32).reshape(b, syn_w)
        hash_words = np.frombuffer(data[off + syn_bytes:], np.uint32).reshape(b, 2)
        return cls(window_id=window_id, rate_index=r, num_blocks=b,
                   syndrome_bits=m, syndromes=unpack_bits(syn_words, m),
                   verify_hashes=unpack_bits(hash_words, 64), short_bits=s)


@dataclasses.dataclass
class VerifyAck(Message):
    """Bob's per-block verification results (True = hashes matched).

    ``round`` distinguishes the initial ack (0) from post-retry acks.
    ``next_test_bits``: how many QBER test bits Bob wants disclosed for the
    next window (adaptive disclosure — scales with his post-decode prior's
    effective sample size; 0 = no request, keep the current size)."""
    num_blocks: int
    ok_mask: np.ndarray  # (B,) uint8
    round: int = 0
    next_test_bits: int = 0
    TYPE: ClassVar[MsgType] = MsgType.VERIFY_ACK

    def payload_bytes(self) -> bytes:
        return (struct.pack("<III", self.num_blocks, self.round,
                            self.next_test_bits)
                + pack_bits(self.ok_mask).tobytes())

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "VerifyAck":
        b, rnd, nxt = struct.unpack_from("<III", data)
        words = np.frombuffer(data[12:], np.uint32)
        return cls(window_id=window_id, num_blocks=b,
                   ok_mask=unpack_bits(words, b), round=rnd,
                   next_test_bits=nxt)


@dataclasses.dataclass
class RetryDisclose(Message):
    """Blind-reconciliation retry: Alice's payload bits at protocol-PRNG
    positions for every still-failed block (row per failed block, in
    block-index order).  Bob pins these (LLR ±inf) and re-decodes."""
    round: int
    num_bits: int              # disclosed bits per failed block
    failed_mask: np.ndarray    # (B,) uint8
    bits: np.ndarray           # (num_failed, num_bits) uint8
    TYPE: ClassVar[MsgType] = MsgType.RETRY_DISCLOSE

    def payload_bytes(self) -> bytes:
        head = struct.pack("<III", self.round, self.num_bits,
                           len(self.failed_mask))
        return (head + pack_bits(self.failed_mask).tobytes()
                + pack_bits(self.bits).tobytes())

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "RetryDisclose":
        rnd, k, b = struct.unpack_from("<III", data)
        off = 12
        mask_words = (b + 31) // 32
        mask = unpack_bits(np.frombuffer(data[off:off + 4 * mask_words],
                                         np.uint32), b)
        nf = int(mask.sum())
        row_words = (k + 31) // 32
        bits = unpack_bits(
            np.frombuffer(data[off + 4 * mask_words:], np.uint32
                          ).reshape(nf, row_words), k)
        return cls(window_id=window_id, round=rnd, num_bits=k,
                   failed_mask=mask, bits=bits)


@dataclasses.dataclass
class Abort(Message):
    reason: str = ""
    TYPE: ClassVar[MsgType] = MsgType.ABORT

    def payload_bytes(self) -> bytes:
        return self.reason.encode("utf-8")

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "Abort":
        return cls(window_id=window_id, reason=data.decode("utf-8"))


@dataclasses.dataclass
class TimingBasis(Message):
    """Alice's compressed timing + basis info for one sift window — the
    reference type-2 stream (SURVEY.md Appendix A), sent source → receiver
    so costream can coincidence-match.  Timing is delta-encoded at the
    smallest byte width fitting the window's gaps (framing.pack_deltas);
    the basis bits are packed.  window_id carries the device-frame id
    (epoch id = frame id >> 3) when the chain runs epoch-true streaming."""
    times: np.ndarray    # (Na,) int32 device times (rebased to window start)
    basis: np.ndarray    # (Na,) uint8 0/1
    TYPE: ClassVar[MsgType] = MsgType.TIMING_BASIS

    def payload_bytes(self) -> bytes:
        from qtpu.framing import pack_deltas
        n = len(self.times)
        tb = pack_deltas(np.asarray(self.times, np.int64))
        return (struct.pack("<II", n, len(tb)) + tb
                + pack_bits(np.asarray(self.basis, np.uint8)).tobytes())

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "TimingBasis":
        from qtpu.framing import unpack_deltas
        n, tlen = struct.unpack_from("<II", data)
        times = unpack_deltas(data[8:8 + tlen], n).astype(np.int32)
        words = np.frombuffer(data[8 + tlen:], np.uint32)
        return cls(window_id=window_id, times=times,
                   basis=unpack_bits(words, n))


@dataclasses.dataclass
class SiftIndex(Message):
    """Bob's sifting decision for one window — the reference type-4 stream:
    indices of Alice's events that were coincidence-matched with agreeing
    basis, in order.  Alice splices her raw key at these positions."""
    indices: np.ndarray  # (K,) int32 indices into Alice's window events
    TYPE: ClassVar[MsgType] = MsgType.SIFT_INDEX

    def payload_bytes(self) -> bytes:
        return (struct.pack("<I", len(self.indices))
                + np.asarray(self.indices, np.int32).tobytes())

    @classmethod
    def from_payload(cls, window_id: int, data: bytes) -> "SiftIndex":
        (n,) = struct.unpack_from("<I", data)
        return cls(window_id=window_id,
                   indices=np.frombuffer(data[4:4 + 4 * n], np.int32))


_REGISTRY: dict[int, Type[Message]] = {
    int(c.TYPE): c for c in (QberDisclose, RateSelect, Syndromes, VerifyAck,
                             Abort, TimingBasis, SiftIndex, RetryDisclose)
}


def pack_message(msg: Message) -> bytes:
    payload = msg.payload_bytes()
    header = _HEADER.pack(MAGIC, _HEADER.size + len(payload), int(msg.TYPE),
                          msg.window_id)
    return header + payload


def unpack_message(data: bytes) -> Message:
    magic, total, subtype, window_id = _HEADER.unpack_from(data)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic:#x}")
    if total != len(data):
        raise ValueError(f"length mismatch: header {total}, got {len(data)}")
    cls = _REGISTRY.get(subtype)
    if cls is None:
        raise ValueError(f"unknown subtype {subtype}")
    return cls.from_payload(window_id, data[_HEADER.size:])
