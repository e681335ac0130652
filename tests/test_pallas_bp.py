"""Pallas fused BP kernel tests.

Hardware-parity strategy (SURVEY.md §5.5): the kernel runs in interpreter
mode on CPU in the default suite (same program, emulated), and on the real
chip under QTPU_TEST_TPU=1 — both must be bit-exact vs the XLA decoder,
which is itself bit-exact vs the golden model.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qtpu.ldpc.codes import make_regular_code
from qtpu.ldpc.decode import make_batch_decoder, channel_llr
from qtpu.ldpc.encode import make_batch_encoder
from qtpu.ldpc.pallas_bp import make_pallas_decoder


@pytest.fixture(scope="module")
def scenario():
    code = make_regular_code(1024)
    rng = np.random.default_rng(0)
    B = 8
    keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
    # Mixed difficulty so iteration counts differ across the tile.
    qbers = np.repeat([0.005, 0.02, 0.04, 0.06], 2)
    noise = (rng.random((B, code.n)) < qbers[:, None]).astype(np.uint8)
    bob = keys ^ noise
    syn = make_batch_encoder(code)(jnp.asarray(keys))
    llr = channel_llr(jnp.asarray(bob), 0.03)
    return code, keys, llr, syn


def test_interpret_mode_bit_exact_vs_xla(scenario):
    code, keys, llr, syn = scenario
    xla = make_batch_decoder(code, max_iters=40)(llr, syn)
    pal = make_pallas_decoder(code, max_iters=40, batch_tile=8,
                              interpret=True)(llr, syn)
    np.testing.assert_array_equal(np.asarray(pal.bits), np.asarray(xla.bits))
    np.testing.assert_array_equal(np.asarray(pal.iterations),
                                  np.asarray(xla.iterations))
    np.testing.assert_array_equal(np.asarray(pal.converged),
                                  np.asarray(xla.converged))


@pytest.mark.tpu
def test_tpu_bit_exact_vs_xla(scenario):
    code, keys, llr, syn = scenario
    # Pad the batch to one full hardware tile.
    B, bt = llr.shape[0], 128
    reps = bt // B
    llr_t = jnp.tile(llr, (reps, 1))
    syn_t = jnp.tile(syn, (reps, 1))
    xla = make_batch_decoder(code, max_iters=40)(llr_t, syn_t)
    pal = make_pallas_decoder(code, max_iters=40)(llr_t, syn_t)
    np.testing.assert_array_equal(np.asarray(pal.bits), np.asarray(xla.bits))
    np.testing.assert_array_equal(np.asarray(pal.iterations),
                                  np.asarray(xla.iterations))


def test_batch_must_be_tile_multiple(scenario):
    code, keys, llr, syn = scenario
    dec = make_pallas_decoder(code, max_iters=4, batch_tile=16, interpret=True)
    with pytest.raises(AssertionError, match="multiple"):
        dec(llr, syn)  # B=8 not a multiple of 16


def test_layered_interpret_bit_exact_vs_xla(scenario):
    code, keys, llr, syn = scenario
    xla = make_batch_decoder(code, max_iters=40, alg="layered")(llr, syn)
    pal = make_pallas_decoder(code, max_iters=40, batch_tile=8,
                              interpret=True, alg="layered")(llr, syn)
    np.testing.assert_array_equal(np.asarray(pal.bits), np.asarray(xla.bits))
    np.testing.assert_array_equal(np.asarray(pal.iterations),
                                  np.asarray(xla.iterations))
    np.testing.assert_array_equal(np.asarray(pal.converged),
                                  np.asarray(xla.converged))


@pytest.mark.tpu
def test_tpu_layered_bit_exact_vs_xla(scenario):
    code, keys, llr, syn = scenario
    B, bt = llr.shape[0], 128
    reps = bt // B
    llr_t = jnp.tile(llr, (reps, 1))
    syn_t = jnp.tile(syn, (reps, 1))
    xla = make_batch_decoder(code, max_iters=40, alg="layered")(llr_t, syn_t)
    pal = make_pallas_decoder(code, max_iters=40, alg="layered")(llr_t, syn_t)
    np.testing.assert_array_equal(np.asarray(pal.bits), np.asarray(xla.bits))
    np.testing.assert_array_equal(np.asarray(pal.iterations),
                                  np.asarray(xla.iterations))


@pytest.fixture(scope="module")
def scenario_z128():
    # z=128 (lane-aligned) so the transposed "bz" layout is constructible.
    code = make_regular_code(2048)
    assert code.z % 128 == 0
    rng = np.random.default_rng(7)
    B = 16
    keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
    qbers = np.repeat([0.005, 0.02, 0.04, 0.06], 4)
    noise = (rng.random((B, code.n)) < qbers[:, None]).astype(np.uint8)
    syn = make_batch_encoder(code)(jnp.asarray(keys))
    llr = channel_llr(jnp.asarray(keys ^ noise), 0.03)
    return code, llr, syn


@pytest.mark.parametrize("alg", ["minsum", "layered"])
def test_bz_layout_interpret_bit_exact_vs_xla(scenario_z128, alg):
    """Transposed (batch, z) tiles — z on lanes — must be value- and
    iteration-identical to the XLA decoder (and hence the golden model)."""
    code, llr, syn = scenario_z128
    xla = make_batch_decoder(code, max_iters=30, alg=alg)(llr, syn)
    pal = make_pallas_decoder(code, max_iters=30, batch_tile=8,
                              interpret=True, alg=alg, layout="bz")(llr, syn)
    np.testing.assert_array_equal(np.asarray(pal.bits), np.asarray(xla.bits))
    np.testing.assert_array_equal(np.asarray(pal.iterations),
                                  np.asarray(xla.iterations))
    np.testing.assert_array_equal(np.asarray(pal.converged),
                                  np.asarray(xla.converged))


@pytest.mark.tpu
@pytest.mark.parametrize("alg", ["minsum", "layered"])
def test_tpu_bz_layout_bit_exact_vs_xla(scenario_z128, alg):
    code, llr, syn = scenario_z128
    B, bt = llr.shape[0], 32
    reps = bt // B
    llr_t = jnp.tile(llr, (reps, 1))
    syn_t = jnp.tile(syn, (reps, 1))
    xla = make_batch_decoder(code, max_iters=30, alg=alg)(llr_t, syn_t)
    pal = make_pallas_decoder(code, max_iters=30, batch_tile=bt, alg=alg,
                              layout="bz")(llr_t, syn_t)
    np.testing.assert_array_equal(np.asarray(pal.bits), np.asarray(xla.bits))
    np.testing.assert_array_equal(np.asarray(pal.iterations),
                                  np.asarray(xla.iterations))
