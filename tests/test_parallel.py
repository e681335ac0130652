"""Mesh/collective tests on the forced 8-device CPU mesh (SURVEY.md §5.4):
the same shard_map programs a pod slice would run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qtpu import pa as pa_mod
from qtpu.ldpc.codes import make_regular_code
from qtpu.ldpc.decode import make_batch_decoder, channel_llr
from qtpu.ldpc.encode import make_batch_encoder
from qtpu.parallel import (halo_exchange_right, make_mesh,
                           make_sharded_decoder, make_sharded_reconcile_step,
                           sharded_stream_toeplitz)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh("blocks", num=8)


@pytest.fixture(scope="module")
def code():
    return make_regular_code(1024)


def test_sharded_decode_matches_single_device(mesh, code):
    rng = np.random.default_rng(0)
    B = 16
    keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
    bob = keys ^ (rng.random((B, code.n)) < 0.02).astype(np.uint8)
    syn = make_batch_encoder(code)(jnp.asarray(keys))
    llr = channel_llr(jnp.asarray(bob), 0.02)

    single = make_batch_decoder(code, max_iters=40)(llr, syn)
    sh = NamedSharding(mesh, P("blocks", None))
    sharded = make_sharded_decoder(code, mesh, max_iters=40)(
        jax.device_put(llr, sh), jax.device_put(syn, sh))

    np.testing.assert_array_equal(np.asarray(single.bits), np.asarray(sharded.bits))
    np.testing.assert_array_equal(np.asarray(single.iterations),
                                  np.asarray(sharded.iterations))


def test_reconcile_step_global_ledger(mesh, code):
    rng = np.random.default_rng(1)
    B = 16
    keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
    bob = keys ^ (rng.random((B, code.n)) < 0.02).astype(np.uint8)
    syn = make_batch_encoder(code)(jnp.asarray(keys))
    llr = channel_llr(jnp.asarray(bob), 0.02)
    sh = NamedSharding(mesh, P("blocks", None))
    step = make_sharded_reconcile_step(code, mesh, max_iters=40)
    bits, conv, iters, ledger = step(jax.device_put(llr, sh),
                                     jax.device_put(syn, sh))
    gl = np.asarray(ledger)
    assert gl[0] == B * code.n                       # sifted
    assert gl[2] == B * code.m                       # syndrome
    assert gl[-2] + gl[-1] == B                      # ok + failed = blocks
    assert gl[-2] == int(np.asarray(conv).sum())
    np.testing.assert_array_equal(np.asarray(bits)[0], keys[0])


def test_halo_exchange(mesh):
    """Each shard receives its left neighbor's tail fragment (ring)."""
    import functools
    D, L, H = 8, 32, 4
    x = jnp.arange(D * L, dtype=jnp.int32)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("blocks"),
                       out_specs=P("blocks"))
    def run(xs):
        halo = halo_exchange_right(xs, H, "blocks")
        return jnp.concatenate([halo, xs[: L - H]])

    out = np.asarray(run(x)).reshape(D, L)
    for d in range(1, D):
        np.testing.assert_array_equal(
            out[d, :H], np.arange(d * L - H, d * L))  # left neighbor's tail


def test_sharded_stream_toeplitz_matches_golden(mesh):
    """Distributed streaming hash (psum over ICI) == direct GF(2) Toeplitz."""
    import functools
    rng = np.random.default_rng(3)
    D, L, m = 8, 256, 128
    N = D * L
    x = rng.integers(0, 2, N).astype(np.uint8)
    t = rng.integers(0, 2, m + N - 1).astype(np.uint8)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), P("blocks")), out_specs=P())
    def run(t_bits, xs):
        return sharded_stream_toeplitz(t_bits, xs, m, "blocks")

    got = np.asarray(run(jnp.asarray(t), jnp.asarray(x)))
    want = pa_mod.toeplitz_hash_golden(t, x, m)
    np.testing.assert_array_equal(got, want)


def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
