"""Tests for entropy models: bit estimates, CDF tables, coder roundtrips."""

import numpy as np
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.entropy import (
    laplace_bits,
    gaussian_bits,
    BitEstimator,
    EntropyCoder,
    GaussianEncoder,
    FactorizedCoder,
    build_bit_estimator_tables,
    build_indexes_from_scales,
)


def test_laplace_bits_matches_analytic():
    # P(y=0) for laplace(0, b): 1 - exp(-0.5/b); bits = -log2(p + 1e-5)
    b = 2.0
    p0 = 1 - np.exp(-0.5 / b)
    bits = float(laplace_bits(jnp.array(0.0), jnp.array(b)))
    np.testing.assert_allclose(bits, -np.log2(p0 + 1e-5), rtol=1e-5)


def test_bits_nonnegative_and_monotone():
    y = jnp.arange(0, 20, dtype=jnp.float32)
    bits = np.asarray(laplace_bits(y, jnp.array(1.5)))
    assert (bits >= 0).all()
    assert (np.diff(bits) >= -1e-5).all()  # farther symbols cost more
    gbits = np.asarray(gaussian_bits(y, jnp.array(1.5)))
    assert (gbits >= 0).all()


def test_build_indexes_range():
    scales = jnp.array([0.0, 0.005, 0.01, 1.0, 64.0, 1e9])
    idx = np.asarray(build_indexes_from_scales(scales))
    assert idx[0] == 0 and idx[1] == 0 and idx[2] == 0
    assert idx[-1] == 255 and idx[-2] == 255
    assert 0 < idx[3] < 255


def test_gaussian_encoder_roundtrip():
    rng = np.random.default_rng(0)
    enc = GaussianEncoder("laplace")
    coder = EntropyCoder()
    enc.update(force=True, entropy_coder=coder)

    scales = rng.uniform(0.05, 8.0, size=(1, 1, 32, 32)).astype(np.float32)
    symbols = rng.laplace(scale=scales).round().astype(np.float32)

    coder.reset()
    enc.encode(symbols, scales)
    coder.flush()
    stream = coder.get_encoded_stream()
    assert len(stream) > 0

    coder.set_stream(stream)
    out = enc.decode_stream(scales)
    np.testing.assert_array_equal(out, symbols)


def test_gaussian_encoder_bits_close_to_estimate():
    """Real rANS bitrate should be close to the differentiable estimate."""
    rng = np.random.default_rng(1)
    enc = GaussianEncoder("laplace")
    coder = EntropyCoder()
    enc.update(force=True, entropy_coder=coder)

    scales = np.full((1, 1, 64, 64), 3.0, dtype=np.float32)
    symbols = rng.laplace(scale=3.0, size=scales.shape).round().astype(np.float32)
    est_bits = float(jnp.sum(laplace_bits(jnp.asarray(symbols), jnp.asarray(scales))))

    coder.reset()
    enc.encode(symbols, scales)
    coder.flush()
    real_bits = len(coder.get_encoded_stream()) * 8
    assert abs(real_bits - est_bits) / est_bits < 0.05, (real_bits, est_bits)


def test_bit_estimator_tables_and_roundtrip():
    rng = jax.random.PRNGKey(42)
    channels = 8
    model = BitEstimator(channels)
    params = model.init(rng, jnp.zeros((1, channels, 1, 1)))

    def cdf_fn(x):
        return model.apply(params, x, method=BitEstimator.get_cdf)

    cdf, cdf_len, offset = build_bit_estimator_tables(cdf_fn, channels)
    assert cdf.shape[0] == channels
    assert (cdf_len >= 3).all()

    coder = EntropyCoder()
    fac = FactorizedCoder(cdf, cdf_len, offset, channels, coder)

    z = np.random.default_rng(2).integers(-3, 4, size=(1, channels, 8, 8)).astype(np.float32)
    coder.reset()
    fac.encode(z)
    coder.flush()
    coder.set_stream(coder.get_encoded_stream())
    out = fac.decode_stream((8, 8))
    np.testing.assert_array_equal(out, z)


def test_update_idempotent_without_force():
    enc = GaussianEncoder("laplace")
    coder = EntropyCoder()
    enc.update(force=True, entropy_coder=coder)
    cdf1 = enc._cdf.copy()
    enc.update(force=False)
    np.testing.assert_array_equal(cdf1, enc._cdf)
