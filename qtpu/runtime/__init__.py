"""Native runtime components (C++) with ctypes bindings.

Reference capability: the runtime around the compute path — transferd's
classical-channel transport and chopper's raw-event codec — is native C in
the reference (SURVEY.md §3 #3/#8); here it is native C++ behind the same
Python interfaces as the pure-Python fallbacks:

- `NativeTcpLink` — epoll/background-thread message channel, wire-compatible
  with qtpu.link.TcpLink (4-byte length-prefixed frames).
- `pack_events` / `unpack_events` / `split_epochs` / `pack_bits_native` —
  the 64-bit raw-event record codec and epoch boundary scan.

The shared libraries build on demand with the toolchain Makefile the first
time they're needed (cached next to the sources); if no compiler is
available every entry point raises `NativeUnavailable` and callers fall back
to the Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = [
    "NativeUnavailable", "native_available", "NativeTcpLink",
    "pack_events", "unpack_events", "split_epochs", "pack_bits_native",
]

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LOCK = threading.Lock()
_LIBS: dict[str, Optional[ctypes.CDLL]] = {}


class NativeUnavailable(RuntimeError):
    pass


def _load(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name in _LIBS:
            lib = _LIBS[name]
            if lib is None:
                raise NativeUnavailable(f"{name} failed to build previously")
            return lib
        so = os.path.join(_DIR, f"lib{name}.so")
        src = os.path.join(_DIR, f"{name.replace('qtpu_', '')}.cpp")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(["make", "-C", _DIR, f"lib{name}.so"],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except (subprocess.CalledProcessError, OSError) as e:
            _LIBS[name] = None
            raise NativeUnavailable(f"could not build/load {name}: {e}") from e
        _LIBS[name] = lib
        return lib


def native_available() -> bool:
    try:
        _load("qtpu_framing")
        return True
    except NativeUnavailable:
        return False


# ---------------------------------------------------------------------------
# transferd binding
# ---------------------------------------------------------------------------

def _td() -> ctypes.CDLL:
    lib = _load("qtpu_transferd")
    if not getattr(lib, "_qtpu_sigs", False):
        lib.td_listen.restype = ctypes.c_void_p
        lib.td_listen.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.td_connect.restype = ctypes.c_void_p
        lib.td_connect.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.td_send.restype = ctypes.c_int
        lib.td_send.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32]
        lib.td_recv.restype = ctypes.c_long
        lib.td_recv.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_uint32, ctypes.c_int]
        lib.td_pending.restype = ctypes.c_int
        lib.td_pending.argtypes = [ctypes.c_void_p]
        lib.td_bytes_sent.restype = ctypes.c_uint64
        lib.td_bytes_sent.argtypes = [ctypes.c_void_p]
        lib.td_bytes_received.restype = ctypes.c_uint64
        lib.td_bytes_received.argtypes = [ctypes.c_void_p]
        lib.td_close.argtypes = [ctypes.c_void_p]
        lib._qtpu_sigs = True
    return lib


class NativeTcpLink:
    """Drop-in for qtpu.link.TcpLink backed by the C++ transferd library.

    Sends never block the caller (background I/O thread owns the socket);
    receives pop completed frames from the native queue.
    """

    MAX_FRAME = 64 * 1024 * 1024

    def __init__(self, handle: int):
        self._lib = _td()
        self._h = handle
        self._buf = ctypes.create_string_buffer(1 << 20)

    @classmethod
    def listen(cls, host: str, port: int) -> "NativeTcpLink":
        h = _td().td_listen(host.encode(), port)
        if not h:
            raise ConnectionError(f"td_listen failed on {host}:{port}")
        return cls(h)

    @classmethod
    def connect(cls, host: str, port: int, retries: int = 50) -> "NativeTcpLink":
        h = _td().td_connect(host.encode(), port, retries)
        if not h:
            raise ConnectionError(f"td_connect failed to {host}:{port}")
        return cls(h)

    def send(self, msg) -> None:
        from qtpu.messages import pack_message
        data = pack_message(msg)
        if self._lib.td_send(self._h, data, len(data)) != 0:
            raise ConnectionError("native link is dead")

    def recv(self, timeout: Optional[float] = None):
        from qtpu.messages import unpack_message
        ms = int((timeout or 0.0) * 1000)
        n = self._lib.td_recv(self._h, self._buf, len(self._buf), ms)
        if n == 0:
            return None
        if n == -1:
            raise ConnectionError("peer closed")
        if n == -2:
            # Frame larger than the scratch buffer: grow and retry.
            if len(self._buf) * 2 > self.MAX_FRAME:
                raise ValueError("frame exceeds MAX_FRAME")
            self._buf = ctypes.create_string_buffer(len(self._buf) * 2)
            return self.recv(timeout)
        return unpack_message(self._buf.raw[:n])

    def pending(self) -> int:
        return self._lib.td_pending(self._h)

    @property
    def bytes_sent(self) -> int:
        return self._lib.td_bytes_sent(self._h)

    @property
    def bytes_received(self) -> int:
        return self._lib.td_bytes_received(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.td_close(self._h)
            self._h = None


# ---------------------------------------------------------------------------
# framing binding
# ---------------------------------------------------------------------------

def _fr() -> ctypes.CDLL:
    lib = _load("qtpu_framing")
    if not getattr(lib, "_qtpu_sigs", False):
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        lib.fr_pack_events.argtypes = [i64p, u8p, ctypes.c_int64, u64p]
        lib.fr_unpack_events.argtypes = [u64p, ctypes.c_int64, i64p, u8p]
        lib.fr_split_epochs.restype = ctypes.c_int64
        lib.fr_split_epochs.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                        u32p, i64p, i64p, ctypes.c_int64]
        lib.fr_pack_bits.argtypes = [u8p, ctypes.c_int64, u32p]
        lib._qtpu_sigs = True
    return lib


def pack_events(times: np.ndarray, dets: np.ndarray) -> np.ndarray:
    """(times int64, dets uint8) → 64-bit raw event records."""
    times = np.ascontiguousarray(times, np.int64)
    dets = np.ascontiguousarray(dets, np.uint8)
    out = np.empty(len(times), np.uint64)
    _fr().fr_pack_events(times, dets, len(times), out)
    return out


def unpack_events(records: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    records = np.ascontiguousarray(records, np.uint64)
    times = np.empty(len(records), np.int64)
    dets = np.empty(len(records), np.uint8)
    _fr().fr_unpack_events(records, len(records), times, dets)
    return times, dets


def split_epochs(times: np.ndarray, units_per_epoch: int):
    """Sorted times → list of (epoch_id, start_index, count)."""
    times = np.ascontiguousarray(times, np.int64)
    cap = len(times) + 1
    ids = np.empty(cap, np.uint32)
    starts = np.empty(cap, np.int64)
    counts = np.empty(cap, np.int64)
    n = _fr().fr_split_epochs(times, len(times), units_per_epoch,
                              ids, starts, counts, cap)
    if n < 0:
        raise RuntimeError("split_epochs overflow")
    return [(int(ids[i]), int(starts[i]), int(counts[i])) for i in range(n)]


def pack_bits_native(bits: np.ndarray) -> np.ndarray:
    bits = np.ascontiguousarray(bits, np.uint8)
    words = np.empty((len(bits) + 31) // 32, np.uint32)
    _fr().fr_pack_bits(bits, len(bits), words)
    return words
