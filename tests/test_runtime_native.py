"""Native runtime (C++) tests: transferd link + framing codec.

Skipped wholesale if the toolchain can't build the libraries.
"""

import threading

import numpy as np
import pytest

from qtpu import runtime
from qtpu.framing import EPOCH_UNITS, pack_bits
from qtpu.messages import RateSelect, Syndromes

pytestmark = pytest.mark.skipif(not runtime.native_available(),
                                reason="native toolchain unavailable")


def test_pack_unpack_events_roundtrip():
    rng = np.random.default_rng(0)
    times = np.sort(rng.integers(0, 2 ** 48, 10_000))
    dets = rng.integers(0, 16, 10_000).astype(np.uint8)
    recs = runtime.pack_events(times, dets)
    t2, d2 = runtime.unpack_events(recs)
    np.testing.assert_array_equal(t2, times)
    np.testing.assert_array_equal(d2, dets)


def test_split_epochs():
    rng = np.random.default_rng(1)
    times = np.sort(rng.integers(0, 5 * EPOCH_UNITS, 50_000))
    spans = runtime.split_epochs(times, EPOCH_UNITS)
    assert sum(c for _, _, c in spans) == len(times)
    for eid, start, count in spans:
        seg = times[start:start + count]
        np.testing.assert_array_equal(seg // EPOCH_UNITS, eid)
    # Boundaries are contiguous and ordered.
    assert [s for _, s, _ in spans] == sorted(s for _, s, _ in spans)


def test_pack_bits_matches_numpy():
    rng = np.random.default_rng(2)
    for n in (1, 31, 32, 1000, 4096):
        bits = rng.integers(0, 2, n).astype(np.uint8)
        np.testing.assert_array_equal(runtime.pack_bits_native(bits),
                                      pack_bits(bits))


def test_native_link_roundtrip():
    port = 19871
    results = {}

    def server():
        link = runtime.NativeTcpLink.listen("127.0.0.1", port)
        msgs = []
        for _ in range(3):
            m = link.recv(timeout=10.0)
            msgs.append(m)
            link.send(RateSelect(window_id=m.window_id, qber_milli=1, rate_index=0))
        results["server"] = msgs
        results["server_link"] = link

    t = threading.Thread(target=server)
    t.start()
    client = runtime.NativeTcpLink.connect("127.0.0.1", port)
    rng = np.random.default_rng(3)
    # Include a frame larger than the initial 1 MB scratch buffer to
    # exercise the grow-and-retry path on the server? (server recv default
    # buffer is 1 MB; send ~2 MB syndromes)
    big = Syndromes(window_id=2, rate_index=1, num_blocks=64,
                    syndrome_bits=2048,
                    syndromes=rng.integers(0, 2, (64, 2048)).astype(np.uint8),
                    verify_hashes=rng.integers(0, 2, (64, 64)).astype(np.uint8))
    client.send(RateSelect(window_id=0, qber_milli=30, rate_index=2))
    client.send(RateSelect(window_id=1, qber_milli=31, rate_index=3))
    client.send(big)
    acks = [client.recv(timeout=10.0) for _ in range(3)]
    t.join(timeout=20)
    assert not t.is_alive()
    got = results["server"]
    assert [m.window_id for m in got] == [0, 1, 2]
    np.testing.assert_array_equal(got[2].syndromes, big.syndromes)
    assert [a.window_id for a in acks] == [0, 1, 2]
    assert client.bytes_sent > 0 and client.bytes_received > 0
    client.close()
    results["server_link"].close()


def test_native_link_interop_with_python_tcplink():
    """The C++ link must interoperate with the pure-Python TcpLink on the
    same wire format."""
    from qtpu.link import TcpLink
    port = 19873
    results = {}

    def server():
        link = TcpLink.listen("127.0.0.1", port)
        m = link.recv(timeout=10.0)
        link.send(RateSelect(window_id=m.window_id + 1, qber_milli=9, rate_index=1))
        results["got"] = m
        link.close()

    t = threading.Thread(target=server)
    t.start()
    client = runtime.NativeTcpLink.connect("127.0.0.1", port)
    client.send(RateSelect(window_id=41, qber_milli=5, rate_index=0))
    back = client.recv(timeout=10.0)
    t.join(timeout=20)
    assert results["got"].window_id == 41
    assert back.window_id == 42
    client.close()


def test_recv_timeout_returns_none():
    port = 19875

    def server():
        link = runtime.NativeTcpLink.listen("127.0.0.1", port)
        import time
        time.sleep(1.0)
        link.close()

    t = threading.Thread(target=server)
    t.start()
    client = runtime.NativeTcpLink.connect("127.0.0.1", port)
    assert client.recv(timeout=0.2) is None
    t.join(timeout=10)
    client.close()
