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
from qtpu.parallel import (make_mesh,
                           make_sharded_decoder, sharded_stream_toeplitz)


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


def test_session_mesh_ledger_psum(mesh, code):
    """The SESSION's fused decode program DP-sharded over the mesh: the
    psum'd per-window device ledger must report the real quantities and the
    outputs must be bit-identical to the unsharded program (the multi-chip
    accounting of BASELINE config 5, session-integrated — v2 device-stream
    programs)."""
    from qtpu.accounting import LEDGER_FIELDS
    from qtpu.stream import DeviceStream
    from qtpu.window_programs import make_header, make_window_programs
    from qtpu import prng
    rng = np.random.default_rng(1)
    B, k_pb = 16, 8
    keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
    bob = keys ^ (rng.random((B, code.n)) < 0.02).astype(np.uint8)
    pay = np.arange(code.n, dtype=np.int64)
    kwargs = dict(max_iters=40, alg="minsum", verify_hash_bits=64,
                  l_max=128, batch=B, k_pb=k_pb, s_max=32)
    empty = np.zeros(0, np.int64)
    p1 = make_window_programs(code, pay, empty, empty, **kwargs)
    p8 = make_window_programs(code, pay, empty, empty, mesh=mesh, **kwargs)
    sa, sb = DeviceStream(1 << 16), DeviceStream(1 << 16)
    sa.push(keys.reshape(-1))
    sb.push(bob.reshape(-1))
    wkey = prng.key_data(prng.derive(prng.root_key(3), "win", 0))
    pkey = prng.key_data(prng.derive(prng.root_key(7), "punct", 0))
    from qtpu.window_programs import choose_affine
    a, ainv = choose_affine(iter([7]), code.n)
    header = jnp.asarray(make_header(0, 0, wkey, pkey, test_bits_pb=k_pb,
                                     affine=(a, ainv, 3)))
    _, syn, hashes, test, shortv = p1.alice(sa.arena, header)
    mag = jnp.float32(np.log(0.98 / 0.02))
    args = (header, jnp.asarray(test), jnp.asarray(shortv),
            jnp.asarray(syn), jnp.asarray(hashes), mag)
    hat1, rx1, _, _, st1 = p1.bob(sb.arena, *args)
    hat8, rx8, _, _, st8, gled = p8.bob(sb.arena, *args)
    np.testing.assert_array_equal(np.asarray(hat1), np.asarray(hat8))
    np.testing.assert_array_equal(np.asarray(rx1), np.asarray(rx8))
    np.testing.assert_array_equal(np.asarray(st1), np.asarray(st8))
    np.testing.assert_array_equal(np.asarray(hat1), keys)
    ok1 = np.asarray(st1)[:, 0].astype(bool)
    idx = {f: i for i, f in enumerate(LEDGER_FIELDS)}
    gl = np.asarray(gled)
    okc = int(np.asarray(ok1).sum())
    assert gl[idx["syndrome_bits"]] == B * code.m
    assert gl[idx["verify_hash_bits"]] == B * 64
    assert gl[idx["qber_test_bits"]] == B * k_pb
    assert gl[idx["blocks_ok"]] == okc
    assert gl[idx["blocks_ok"]] + gl[idx["blocks_failed"]] == B
    assert gl[idx["reconciled_bits"]] == okc * code.n
    assert okc == B, "all blocks should verify at 2% with this code"


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
