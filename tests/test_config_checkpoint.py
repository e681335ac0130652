"""Config system + checkpoint/resume tests (SURVEY.md §6.4, §6.6)."""

import json

import numpy as np
import pytest

from qtpu.config import RunConfig, apply_overrides, load_config, to_dict
from qtpu.pipeline import PipelineConfig, run_loopback


def test_defaults_reproduce_baseline_config():
    cfg = RunConfig()
    assert cfg.chain.pipeline.n == 4096
    assert cfg.chain.pipeline.dv == 3
    assert cfg.chain.pipeline.target_rates[0] == 0.5


def test_override_leaves():
    cfg = apply_overrides(RunConfig(), [
        "source.error_rate=0.04",
        "chain.pipeline.n=1024",
        "num_windows=7",
    ])
    assert cfg.source.error_rate == 0.04
    assert cfg.chain.pipeline.n == 1024
    assert cfg.num_windows == 7
    # Untouched leaves keep defaults.
    assert cfg.chain.pipeline.dv == 3


def test_override_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_overrides(RunConfig(), ["does.not.exist=1"])
    with pytest.raises(ValueError):
        apply_overrides(RunConfig(), ["missing-equals"])


def test_json_roundtrip(tmp_path):
    cfg = apply_overrides(RunConfig(), ["chain.pipeline.n=2048"])
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(to_dict(cfg)))
    back = load_config(str(p))
    assert back.chain.pipeline.n == 2048
    assert to_dict(back) == to_dict(cfg)


def test_checkpoint_roundtrip():
    cfg = PipelineConfig(n=1024, blocks_per_window=4, qber_test_bits=512)
    rng = np.random.default_rng(0)
    a_bits = rng.integers(0, 2, 20_000).astype(np.uint8)
    b_bits = a_bits ^ (rng.random(20_000) < 0.02).astype(np.uint8)
    alice, bob = run_loopback(cfg, a_bits, b_bits)
    state = json.loads(json.dumps(bob.checkpoint_state()))  # wire round-trip
    assert state["window_id"] == bob.window_id
    assert state["ledger"] == bob.ledger.as_dict()

    # Restore into a fresh session: cursor, ledger, buffer all survive.
    from qtpu.pipeline import BobSession
    from qtpu.link import make_loopback_pair
    _, lb = make_loopback_pair()
    fresh = BobSession(cfg, 0x5E55, lb)
    fresh.restore_state(state)
    assert fresh.window_id == bob.window_id
    assert fresh.ledger.as_dict() == bob.ledger.as_dict()
    np.testing.assert_array_equal(fresh.stream.snapshot_host(),
                                  bob.stream.snapshot_host())
