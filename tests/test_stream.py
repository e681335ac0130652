"""DeviceStream arena semantics: growth accounting, strict capacity, and
compaction (round-3 verdict weak #6 / advisor findings)."""

import numpy as np
import pytest

from qtpu.stream import DeviceStream


def test_grow_is_counted_and_warned():
    s = DeviceStream(1 << 15)
    bits = np.ones(1 << 15, np.uint8)
    s.push(bits)
    assert s.grow_events == 0
    with pytest.warns(RuntimeWarning, match="recompile"):
        s.push(bits)   # overflows the arena -> growth
    assert s.grow_events >= 1
    got = s.peek_host(s.remaining)
    assert got.size == 2 * bits.size and got.all()


def test_strict_capacity_raises_instead_of_growing():
    s = DeviceStream(1 << 15, strict_capacity=True)
    bits = np.ones(1 << 15, np.uint8)
    s.push(bits)
    with pytest.raises(RuntimeError, match="strict_capacity"):
        s.push(bits)
    # The sized workload never trips it.
    s2 = DeviceStream(1 << 16, strict_capacity=True)
    s2.push(bits)
    s2.consume(bits.size)
    s2.push(bits)          # compaction makes room without growth
    assert s2.grow_events == 0


def test_ensure_contiguous_compacts_without_growing():
    """ensure_contiguous near the arena end must COMPACT (drop the consumed
    prefix), not grow 4x (the round-3 advisor found the documented
    compaction never ran)."""
    cap = 1 << 15
    s = DeviceStream(cap)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, cap, dtype=np.int64).astype(np.uint8)
    s.push(a)
    s.consume(cap - 100)           # cursor near the end
    s.ensure_contiguous(4096)      # read would run past capacity
    assert s.capacity == cap, "compaction must suffice — no growth"
    assert s.start == 0
    np.testing.assert_array_equal(s.peek_host(100), a[-100:])
