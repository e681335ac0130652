"""Numeric sanity under jax debug instrumentation (SURVEY.md §6.2):
the decode/PA paths must be NaN-free even at extreme inputs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qtpu.ldpc.codes import make_regular_code
from qtpu.ldpc.decode import BIG_LLR, channel_llr, make_batch_decoder
from qtpu.ldpc.encode import make_batch_encoder
from qtpu import pa, prng


@pytest.fixture(autouse=True)
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def test_decode_no_nans_with_extreme_priors():
    code = make_regular_code(1024)
    rng = np.random.default_rng(0)
    key = rng.integers(0, 2, (2, code.n)).astype(np.uint8)
    syn = make_batch_encoder(code)(jnp.asarray(key))
    llr = np.asarray(channel_llr(jnp.asarray(key), 0.001)).copy()
    # Extreme mixture: huge shortening priors + zero punctured priors.
    llr[:, :64] = BIG_LLR
    llr[:, 64:128] = 0.0
    dec = make_batch_decoder(code, max_iters=20)
    res = dec(jnp.asarray(llr), syn)
    bits = np.asarray(res.bits)
    assert np.isfinite(np.asarray(res.iterations)).all()
    assert set(np.unique(bits)) <= {0, 1}


def test_sumprod_no_nans_at_saturated_llrs():
    code = make_regular_code(1024)
    rng = np.random.default_rng(1)
    key = rng.integers(0, 2, (2, code.n)).astype(np.uint8)
    syn = make_batch_encoder(code)(jnp.asarray(key))
    llr = np.where(key.astype(bool), -50.0, 50.0).astype(np.float32)
    dec = make_batch_decoder(code, max_iters=10, alg="sumprod")
    res = dec(jnp.asarray(llr), syn)
    np.testing.assert_array_equal(np.asarray(res.bits), key)


def test_pa_no_nans_large_block():
    k = prng.derive(prng.root_key(0), "pa", 0)
    n, m = 1 << 15, 1 << 14
    t = prng.random_bits(k, (n + m - 1,))
    x = prng.random_bits(prng.derive(k, "x"), (1, n))
    out = np.asarray(pa.toeplitz_hash_fft(t, x, m))
    assert set(np.unique(out)) <= {0, 1}
    # Cross-check a random subsample of output bits against the direct form.
    want = pa.toeplitz_hash_golden(np.asarray(t), np.asarray(x)[0], m)
    np.testing.assert_array_equal(out[0], want)
